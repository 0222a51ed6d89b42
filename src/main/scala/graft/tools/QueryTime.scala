package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Generic per-query timer for SCALING measurements outside Bench's
  * fixed lists: median of N reps after one uncounted warm-up rep (the
  * round-10 lesson — first executions carry JIT/IO inflation that
  * tabled 2× slope errors twice), each rep fully materialized through
  * the noop sink like Bench. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.QueryTime <sfDir> <reps> <query> [query ...]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val (sfDir, reps, names) = (args(0), args(1).toInt, args.drop(2).toSeq)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = names.map { n =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      def rep(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      rep() // warm-up, uncounted
      val xs = (1 to reps).map(_ => rep()).sorted
      n -> (xs(xs.size / 2), xs.head, xs.last)
    }
    println(s"""{"metric":"query_time","sf":"$sfDir","reps":$reps,""" +
      results.map { case (n, (med, mn, mx)) =>
        f""""$n":{"median":$med%.3f,"min":$mn%.3f,"max":$mx%.3f}"""
      }.mkString("\"queries\":{", ",", "}}"))
    spark.stop()
  }
}
