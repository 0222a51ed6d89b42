package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.OpsWalkthrough

/** Headless run of the unattended-operations scene (VERDICT r16 #6) —
  * asserts every action transition the one-pager claims: the stream
  * lands, the cadence cycles act exactly once then settle, the drifted
  * SQ index re-encodes and its saturation drops, the crash window
  * reports `blocked` without touching the layout, and the stream
  * replay (not a manual journal delete) is what unblocks the next
  * cycle. */
class OpsWalkthroughSpec extends AnyFunSuite with SparkTestBase {

  test("ops scene: stream → cycle → drift-reencode → blocked → replay → proceed") {
    val dir = java.nio.file.Files.createTempDirectory("ops-wt").toString
    val steps = OpsWalkthrough.run(spark, dir).toMap

    // streams landed on both families
    assert(steps("seed_band_index_rows").toLong > 0)
    assert(steps("streamed_band_rows").toLong >
      steps("seed_band_index_rows").toLong, "band stream appended nothing")
    assert(steps("streamed_sq_rows").toLong >
      steps("seed_sq_index_rows").toLong, "sq stream appended nothing")

    // cadence: act once, then settle
    assert(steps("band_cycle_1") == "compact", steps.toString)
    assert(steps("band_cycle_2") == "none", steps.toString)

    // the drifting batch saturates the old bounds; the cycle re-encodes;
    // the next cycle is settled and the monitored rate actually dropped
    assert(steps("sq_sat_rate").toDouble > 0.01,
      s"drift device failed to saturate: ${steps("sq_sat_rate")}")
    assert(steps("sq_cycle_1") == "reencode", steps.toString)
    assert(steps("sq_cycle_2") == "none", steps.toString)
    assert(steps("sq_sat_rate_after").toDouble <
      steps("sq_sat_rate").toDouble, "re-encode did not reduce saturation")

    // crash contract: blocked report, untouched layout, replay unblocks
    assert(steps("band_cycle_crashed") == "blocked", steps.toString)
    assert(steps("band_rows_unchanged") == "true",
      "a blocked cycle must not touch the layout")
    assert(steps("band_rows_after_replay").toLong >
      steps("streamed_band_rows").toLong, "replay appended nothing")
    assert(steps("band_cycle_after_replay") != "blocked", steps.toString)
  }
}
