package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ext.Dedup

/** Dev tool for SCALING.md: per scale-factor volume counters of the
  * dedup pipeline (corpus size → shingle rows → LSH candidate pairs →
  * verified pairs), demonstrating candidate growth is corpus-linear —
  * the banded-LSH design claim — rather than corpus². One line per SF
  * dir passed as an arg. Not part of the driver contract. */
object ScaleStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[scalestats] dir docs shingle_rows lsh_cand_pairs verified_pairs")
    args.foreach { dir =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val docs = Tables.documents(spark, dir)
      val nDocs = docs.count()
      val sh = Dedup.hashedShingles(docs, "doc_id", "text")
      val nSh = sh.count()
      val cands = Dedup.lshCandidates(
        Dedup.minhashSignatures(sh, "doc_id", 16), "doc_id", 4, 4)
      val nCand = cands.count()
      val nVerified = Dedup.jaccardVerify(cands,
          Dedup.hashedShingles(docs, "doc_id", "text"), "doc_id")
        .filter(col("jaccard") >= 0.8).count()
      println(s"[scalestats] $dir $nDocs $nSh $nCand $nVerified")
    }
    spark.stop()
  }
}
