package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Timeframes

class TimeframesSpec extends AnyFunSuite {
  test("30m is 30 minutes — reference bug (30s, database_handler.py:175) fixed") {
    assert(Timeframes.durationMs("30m") == 30L * 60 * 1000)
  }
  test("vocabulary is closed and total (api_connector.py:194)") {
    assert(Timeframes.all.size == 15)
    assert(Timeframes.all.forall(Timeframes.durationMs.contains))
  }
  test("fixed-width window durations cover everything except calendar 1M") {
    assert(Timeframes.windowDuration.keySet == Timeframes.all.toSet - "1M")
    assert(Timeframes.windowDuration("1w") == "7 days")
  }
  test("durations are consistent multiples") {
    assert(Timeframes.durationMs("2h") == 2 * Timeframes.durationMs("1h"))
    assert(Timeframes.durationMs("1d") == 24 * Timeframes.durationMs("1h"))
    assert(Timeframes.durationMs("1w") == 7 * Timeframes.durationMs("1d"))
  }
}
