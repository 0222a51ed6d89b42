package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ext.Dedup

/** Dev tool: stage-by-stage wall-clock profile of the MinHash-LSH dedup
  * pipeline (x31/x44's cost structure), so optimization targets are
  * measured rather than guessed. Not part of the driver contract. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = Tables.documents(spark, sfDir)
    // one warm pass of everything
    noop(docs); noop(Dedup.hashedShingles(docs, "doc_id", "text"))

    time("scan only")(noop(docs))
    time("explode shingles (no hash)")(noop(
      docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("shingle"))))
    time("explode + md5 hash")(noop(
      Dedup.hashedShingles(docs, "doc_id", "text")))
    time(".. + distinct (old path)")(noop(
      Dedup.hashedShingleTable(docs, "doc_id", "text")))
    time("signatures (multiset)")(noop(
      Dedup.minhashSignatures(
        Dedup.hashedShingles(docs, "doc_id", "text"), "doc_id", 16)))
    time("signatures (per-row array)")(noop(
      docs.filter(size(Dedup.shingleHashArray(col("text"))) > 0)
        .select(col("doc_id"),
          Dedup.signatureArray(col("text"), 16).as("sig"))))
    time("lsh candidates")(noop(
      Dedup.lshCandidates(
        Dedup.minhashSignatures(
          Dedup.hashedShingles(docs, "doc_id", "text"), "doc_id", 16),
        "doc_id", 4, 4)))
    time("full x31")(noop(
      ext.ExtQueries.x31MinhashLsh.fn(spark, sfDir)))
    time("full x44")(noop(
      ext.ExtQueries.x44DedupClusters.fn(spark, sfDir)))
    spark.stop()
  }
}
