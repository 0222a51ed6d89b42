package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Crossover measurement for [[Dedup.lshCandidatesDeltaBulk]] vs the
  * broadcast-batch [[Dedup.lshCandidatesDelta]]: at what batch size does
  * broadcasting the batch's banded rows stop being the right plan? The
  * broadcast form pays O(batch) on every executor (and a driver
  * collect); the bulk form pays one batch-sized exchange but streams
  * the index through a shuffled-hash join off the bucketed scan. Same
  * synthetic signature scheme as [[BandIndexBench]].
  *
  * Usage: runMain graft.tools.BulkProbeBench [nHistory] [batchSizes csv]
  */
object BulkProbeBench {
  def main(args: Array[String]): Unit = {
    val nHist = if (args.length > 0) args(0).toInt else 2000000
    val batches = (if (args.length > 1) args(1) else "50000,500000,2000000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // let the broadcast form run at sizes a default conf would refuse
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sig(groupCol: org.apache.spark.sql.Column) =
      (0 until 16).map(i => (groupCol * 31 + i * 7).cast("long").as(s"m$i"))
    val hist = spark.range(nHist).select(
      (col("id").as("doc_id") +: sig((col("id") / 2).cast("long"))): _*)
    val dir = java.nio.file.Files.createTempDirectory("bulk-bench").toString
    Dedup.bandIndexSave(Dedup.bandIndexBuild(hist, "doc_id"),
      "bulk_bench_t", dir, nBuckets = 32)
    val loaded = Dedup.bandIndexLoad(spark, "bulk_bench_t", dir)

    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val rows = batches.map { nBatch =>
      val batch = spark.range(nHist, nHist.toLong + nBatch).select(
        (col("id").as("doc_id") +: sig(
          when(col("id") % 10 === 0, (col("id") % (nHist / 2)))
            .otherwise(col("id") * 1000 + 7))): _*)
      val nb = Dedup.lshCandidatesDeltaBulk(batch, loaded, "doc_id")
      val nd = Dedup.lshCandidatesDelta(batch, loaded, "doc_id")
      require(nb.count() == nd.count(), "paths disagree")
      val bulk = med((1 to 3).map(_ => time(nb.count())))
      val bcast = med((1 to 3).map(_ => time(nd.count())))
      f"""{"n_batch":$nBatch,"broadcast_sec":$bcast%.3f,"bulk_sec":$bulk%.3f}"""
    }
    println(s"""{"metric":"bulk_probe","n_history":$nHist,""" +
      s""""points":[${rows.mkString(",")}]}""")
    spark.sql("DROP TABLE IF EXISTS bulk_bench_t")
    spark.stop()
  }
}
