package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ext.Dedup

/** Dev probe for the r19 sf10 regression hunt: stages the CURRENT
  * x31 pipeline (post r18 signature swap, post r19 verify-tail swap)
  * piece by piece with sizes, one rep each, printing as it goes — so a
  * catastrophic stage is identified the moment it finishes rather than
  * after a full X31Probe median campaign. Not part of the driver
  * contract.
  *
  * Usage: runMain graft.tools.X31ScaleProbe [sfDir]
  */
object X31ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[x31scale] $label%-34s ${(System.nanoTime() - t0) / 1e9}%9.3f s")
      Console.flush()
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = Tables.documents(spark, sfDir)
    time("scan only")(noop(docs))
    val sigs = Dedup.signatureColumns(docs, "doc_id", "text", 16)
    time("signatureColumns (r18 swap)")(noop(sigs))
    time("signatures (old explode+agg)")(noop(
      Dedup.minhashSignatures(
        Dedup.hashedShingles(docs, "doc_id", "text"), "doc_id", 16)))
    val cands = Dedup.lshCandidates(sigs, "doc_id", bands = 4, rows = 4).cache()
    val nCands = time("lshCandidates count")(cands.count())
    println(s"[x31scale] candidate pairs: $nCands")
    val candIds = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
    val nIds = time("candIds count")(candIds.count())
    println(s"[x31scale] candidate docs: $nIds")
    val sets = Dedup.shingleSets(
      docs.join(candIds, Seq("doc_id"), "left_semi"), "doc_id", "text")
    time("shingleSets (cand-only, r19)")(noop(sets))
    time("jaccardVerifySets tail")(noop(
      Dedup.jaccardVerifySets(cands, sets, "doc_id")
        .filter(col("jaccard") >= 0.8)))
    time("old verify tail (collect_set)")(noop(
      Dedup.jaccardVerify(cands,
        Dedup.hashedShingles(
          docs.join(candIds, Seq("doc_id"), "left_semi"), "doc_id", "text"),
        "doc_id")
        .filter(col("jaccard") >= 0.8)))
    spark.stop()
  }
}
