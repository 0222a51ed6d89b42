package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Micro-benchmark for per-label adaptive sub-bucketing
  * ([[Similarity.blockedPairsAuto]], round 10): the sf0.1→sf1 decade
  * showed x50's fixed-plane within-label pair join growing 43× on 10×
  * rows when the blocking key's cardinality is fixed (10 labels).
  * Compares fixed `subPlanes = 2` vs the adaptive form on the same
  * embeddings table.
  *
  * Usage: runMain graft.tools.AutoPlanesBench <embDir> [reps]
  *   e.g. /root/testdata/sf0.1 then /tmp/graft_sf1
  */
object AutoPlanesBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = graft.engine.Tables.embeddings(spark, dir)
    val n = embs.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val c = f
      ((System.nanoTime() - t0) / 1e9, c)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val fixed = (1 to reps).map(_ => time(
      Similarity.blockedPairs(embs, "vec_id", "label", minCos = 0.4,
        subPlanes = 2).count()))
    val auto = (1 to reps).map(_ => time(
      Similarity.blockedPairsAuto(embs, "vec_id", "label",
        minCos = 0.4).count()))
    println(s"""{"metric":"auto_planes","dir":"$dir","rows":$n,""" +
      s""""fixed_pairs":${fixed.head._2},"auto_pairs":${auto.head._2},""" +
      f""""fixed_sec":${med(fixed.map(_._1))}%.3f,""" +
      f""""auto_sec":${med(auto.map(_._1))}%.3f}""")
    spark.stop()
  }
}
