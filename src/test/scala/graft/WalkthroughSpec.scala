package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.Walkthrough

/** Runs the reference README/Colab session end-to-end headless
  * (check → get → incremental extend → resample → SMA → preview/plot →
  * export → delete) and asserts every step's observable — the scripted
  * stand-in for the reference's notebook UI flow. */
class WalkthroughSpec extends AnyFunSuite with SparkTestBase {

  test("reference README session: every step lands with the expected shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft_walk").toString
    val steps = Walkthrough.run(spark, dir).toMap
    assert(steps("stored_info_initial") == 0L, "cold store not empty")
    assert(steps("check_before_load") == 0L, "cold store claimed coverage")
    assert(steps("get_data_day1") == 1440L) // one day of minutes
    assert(steps("check_after_load") == 1L, "loaded range not a cache hit")
    assert(steps("incremental_two_days") == 2880L)
    assert(steps("resample_4h") == 12L) // 2 days / 4h
    assert(steps("sma_non_null") == 12L - 19L.min(12L)) // pandas NaN prefix < n
    assert(steps("preview_rows") == 10L) // head 5 + tail 5
    assert(steps("plot_candles") <= 500L && steps("plot_candles") > 0L)
    assert(steps("plot_render_lines") == 12L, "chart render height")
    assert(steps("export_csv") == 2880L)
    assert(steps("export_parquet") == 2880L)
    assert(steps("stored_info_after_delete") == 0L, "delete left residue")
  }
}
