package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Coverage

/** Truth table for the cache-or-fetch probe (database_handler.py:257-307),
  * including the freshness branch (DB:288-295). */
class CoverageSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dur = 3600000L // 1h
  private val now = 1000 * dur

  // coverage: [100h, 500h] in dur units for symbol A; B has no metadata
  private def meta = Seq(("A", 100 * dur, 500 * dur))
    .toDF("symbol", "cov_start_ms", "cov_end_ms")

  private def probeOne(sym: String, s: Long, e: Long): (Boolean, Boolean) = {
    val req = Seq((sym, s, e)).toDF("symbol", "req_start_ms", "req_end_ms")
    val r = Coverage.probe(req, meta, Seq("symbol"), dur, now).collect()(0)
    (r.getAs[Boolean]("covered"), r.getAs[Boolean]("fresh_hit"))
  }

  test("contained range is a hit (DB:296-298)") {
    assert(probeOne("A", 200 * dur, 400 * dur) == (true, false))
  }
  test("end inside the last candle's duration still hits (cov_end + dur - 1)") {
    assert(probeOne("A", 200 * dur, 500 * dur + dur - 1) == (true, false))
  }
  test("end beyond coverage misses when coverage is stale") {
    // now - cov_end = 500h >> 2h tolerance
    assert(probeOne("A", 200 * dur, 600 * dur) == (false, false))
  }
  test("start before coverage misses") {
    assert(probeOne("A", 50 * dur, 400 * dur) == (false, false))
  }
  test("freshness branch: coverage ending within 2×dur of now tolerates a longer request (DB:288-295)") {
    val freshMeta = Seq(("A", 100 * dur, now - dur))
      .toDF("symbol", "cov_start_ms", "cov_end_ms")
    val req = Seq(("A", 200 * dur, now)).toDF("symbol", "req_start_ms", "req_end_ms")
    val r = Coverage.probe(req, freshMeta, Seq("symbol"), dur, now).collect()(0)
    assert(!r.getAs[Boolean]("covered") && r.getAs[Boolean]("fresh_hit"))
  }
  test("unknown symbol (no metadata row) is a clean miss") {
    assert(probeOne("B", 200 * dur, 400 * dur) == (false, false))
  }

  test("gaps: requested minus covered buckets (plan.md:79-80)") {
    val requested = (0L to 9L).map(i => i * dur).toDF("bucket")
    val covered = Seq(0L, 1 * dur, 2 * dur, 5 * dur, 9 * dur).toDF("bucket")
    val missing = Coverage.gaps(requested, covered, "bucket")
      .orderBy("bucket").as[Long].collect().toSeq
    assert(missing == Seq(3 * dur, 4 * dur, 6 * dur, 7 * dur, 8 * dur))
  }
}
