package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Ohlcv, RangeJoin}

/** RangeJoin (bucket-prekeyed interval joins) and mergeCandles
  * (incremental candle maintenance) semantics. */
class RangeJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  // random half-open intervals and points over a few keys; interval length
  // deliberately straddles the bucket width (some span 1 bucket, some 3)
  private val bucketMs = 1000L
  private lazy val intervals = (1 to 200).map { i =>
    val s = rnd.nextInt(20000).toLong
    ("k" + rnd.nextInt(3), i.toLong, s, s + 1 + rnd.nextInt(3000))
  }.toDF("key", "iv_id", "s_ms", "e_ms").cache()
  private lazy val points = (1 to 300).map { i =>
    ("k" + rnd.nextInt(3), 1000L + i, rnd.nextInt(22000).toLong)
  }.toDF("key", "pt_id", "p_ms").cache()

  test("pointInInterval equals the naive theta join, each pair exactly once") {
    val got = RangeJoin.pointInInterval(intervals, points, Seq("key"),
        "s_ms", "e_ms", "p_ms", bucketMs)
      .select("iv_id", "pt_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = intervals.as("a").join(points.as("b"),
        $"a.key" === $"b.key" && $"p_ms" >= $"s_ms" && $"p_ms" < $"e_ms")
      .select("iv_id", "pt_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.length == got.distinct.length, "pair emitted more than once")
    assert(want.nonEmpty, "degenerate fixture: no matches")
  }

  test("intervalOverlap equals the naive overlap join, each pair exactly once") {
    val right = (1 to 150).map { i =>
      val s = rnd.nextInt(20000).toLong
      ("k" + rnd.nextInt(3), 5000L + i, s, s + 1 + rnd.nextInt(2500))
    }.toDF("key", "r_id", "rs_ms", "re_ms")
    val got = RangeJoin.intervalOverlap(intervals, right, Seq("key"),
        "s_ms", "e_ms", "rs_ms", "re_ms", bucketMs)
      .select("iv_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = intervals.as("a").join(right.as("b"),
        $"a.key" === $"b.key" && $"s_ms" < $"re_ms" && $"rs_ms" < $"e_ms")
      .select("iv_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.length == got.distinct.length, "pair emitted more than once")
    assert(want.nonEmpty, "degenerate fixture: no matches")
  }

  test("physical plan is a hash/merge equi-join — no nested loop, no cartesian") {
    val plan = RangeJoin.pointInInterval(intervals, points, Seq("key"),
        "s_ms", "e_ms", "p_ms", bucketMs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    assert(!plan.contains("CartesianProduct"), plan.take(500))
  }

  test("empty interval (end == start) matches nothing and does not crash") {
    val iv = Seq(("k", 1L, 5000L, 5000L)).toDF("key", "iv_id", "s_ms", "e_ms")
    val pt = Seq(("k", 9L, 5000L)).toDF("key", "pt_id", "p_ms")
    assert(RangeJoin.pointInInterval(iv, pt, Seq("key"),
      "s_ms", "e_ms", "p_ms", bucketMs).isEmpty)
  }

  test("mergeCandles: partial(A) ∪ partial(B) re-merged ≡ partial(A ∪ B)") {
    val ticks = (1 to 500).map { _ =>
      ("S" + rnd.nextInt(3), msTs(rnd.nextInt(4 * 3600) * 1000L),
        1 + rnd.nextDouble() * 100)
    }.toDF("symbol", "ts", "price")
    // deterministic disjoint split (NOT time-ordered — merge must not care)
    val a = ticks.filter(hash(col("ts"), col("price")) % 2 === 0)
    val b = ticks.filter(hash(col("ts"), col("price")) % 2 =!= 0)
    val merged = Ohlcv.mergeCandles(
        Ohlcv.resampleTicksPartial(a, "1h").unionByName(
          Ohlcv.resampleTicksPartial(b, "1h")))
      .orderBy("symbol", "bucket").collect().toSeq
    val direct = Ohlcv.resampleTicksPartial(ticks, "1h")
      .orderBy("symbol", "bucket").collect().toSeq
    // volume is a float sum folded in different orders — compare to 1e-9
    assert(merged.length == direct.length)
    merged.zip(direct).foreach { case (m, d) =>
      assert(m.getString(0) == d.getString(0) && m.getTimestamp(1) == d.getTimestamp(1))
      Seq(2, 3, 4, 5).foreach(i => assert(m.getDouble(i) == d.getDouble(i),
        s"ohlc col $i differs: $m vs $d"))
      assert(math.abs(m.getDouble(6) - d.getDouble(6)) < 1e-9, "volume")
      assert(m.getLong(7) == d.getLong(7), "n")
    }
  }
}
