package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the range-join rewrite: the same theta join planned
  * as BroadcastNestedLoopJoin (what Spark does unaided) vs the bucketed
  * equi-join (graft.engine.RangeJoin / plans.RangeJoinRewrite).
  *
  * Usage: runMain graft.tools.RangeJoinBench [nIntervals] [nPoints]
  * Prints one JSON line with both timings. The BNLJ side is O(|L|·|R|)
  * comparisons — sizes are kept modest so the naive form finishes at all;
  * the gap widens quadratically from here, which is the point.
  */
object RangeJoinBench {
  def main(args: Array[String]): Unit = {
    val nIv = if (args.length > 0) args(0).toInt else 30000
    val nPt = if (args.length > 1) args(1).toInt else 30000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val span = 30L * 24 * 3600 * 1000 // 30 days of ms
    val intervals = spark.range(nIv).select(col("id").as("iv_id"),
        (pmod(hash(col("id")), lit(span))).cast("long").as("s_ms"))
      .withColumn("e_ms", col("s_ms") + 1800000L)
      .cache()
    val points = spark.range(nPt).select(col("id").as("pt_id"),
        (pmod(hash(col("id") * 7 + 3), lit(span))).cast("long").as("p_ms"))
      .cache()
    intervals.count(); points.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val cond = col("p_ms") >= col("s_ms") && col("p_ms") < col("e_ms")
    val (naiveSec, naiveN) = time {
      intervals.join(points, cond).count() // plans as BNLJ (no equi-key)
    }
    val (bucketedSec, bucketedN) = time {
      graft.engine.RangeJoin.pointInInterval(intervals, points, Seq(),
        "s_ms", "e_ms", "p_ms", bucketMs = 1800000L).count()
    }
    require(naiveN == bucketedN, s"result mismatch: $naiveN vs $bucketedN")
    println(s"""{"metric":"range_join","n_intervals":$nIv,"n_points":$nPt,""" +
      s""""matches":$naiveN,"bnlj_sec":$naiveSec,"bucketed_sec":$bucketedSec,""" +
      s""""speedup":${naiveSec / bucketedSec}}""")
    spark.stop()
  }
}
