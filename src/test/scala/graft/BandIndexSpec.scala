package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Dedup

/** Persistent LSH band index (round 10): the stored-table form of the
  * delta-dedup old side. Pins (1) exact candidate equivalence with the
  * in-memory cross-frame path, (2) the persist→append→reopen→probe
  * loop, (3) the scale property the design buys: the probe join does
  * not exchange the index side (bucketed by the join key), verified
  * against the same plan over an unbucketed copy. */
class BandIndexSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val sigs = Dedup.minhashSignatures(
    Dedup.hashedShingles(docs, "doc_id", "text"), "doc_id", 16).cache()
  private def newBatch = sigs.filter(col("doc_id") % 5 === 0)
  private def oldCorpus = sigs.filter(col("doc_id") % 5 =!= 0)

  private def asSet(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.select(col("id_new").cast("long"), col("id_old").cast("long"))
      .as[(Long, Long)].collect().toSet
  }

  test("delta probe against a built index ≡ in-memory cross-frame candidates") {
    val viaIndex = asSet(Dedup.lshCandidatesDelta(
      newBatch, Dedup.bandIndexBuild(oldCorpus, "doc_id"), "doc_id"))
    val viaAcross = asSet(Dedup.lshCandidatesAcross(newBatch, oldCorpus, "doc_id"))
    assert(viaIndex == viaAcross && viaIndex.nonEmpty)
  }

  test("persist → append → reopen: probes see appended docs; candidates match a full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx").toString
    // build+persist on part of the corpus, append the rest with NO rebuild
    val part1 = oldCorpus.filter(col("doc_id") % 3 =!= 0)
    val part2 = oldCorpus.filter(col("doc_id") % 3 === 0)
    Dedup.bandIndexSave(Dedup.bandIndexBuild(part1, "doc_id"),
      "band_idx_t", dir, nBuckets = 8)
    try {
      Dedup.bandIndexAppend(part2, "doc_id", "band_idx_t", dir, nBuckets = 8)
      val reopened = Dedup.bandIndexLoad(spark, "band_idx_t", dir)
      // sizes refresh covers the union (counts sum to all banded rows)
      val nBanded = reopened.banded.count()
      val nSized = reopened.sizes.agg(sum("bsz")).head.getLong(0)
      assert(nBanded == nSized, s"sizes stale: $nSized != $nBanded")
      val viaIndex = asSet(Dedup.lshCandidatesDelta(newBatch, reopened, "doc_id"))
      val viaAcross = asSet(Dedup.lshCandidatesAcross(newBatch, oldCorpus, "doc_id"))
      assert(viaIndex == viaAcross && viaIndex.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_t")
  }

  test("sizes swap crash recovery: load rolls an interrupted append forward") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-crash").toString
    Dedup.bandIndexSave(Dedup.bandIndexBuild(oldCorpus, "doc_id"),
      "band_idx_crash_t", dir, nBuckets = 8)
    try {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
      val expected = Dedup.bandIndexLoad(spark, "band_idx_crash_t", dir)
        .sizes.agg(sum("bsz")).head.getLong(0)
      // crash state A: after live→bak, before staged→live (both present,
      // no live sizes) — load must prefer the staged tree
      assert(fs.rename(p("sizes"), p("sizes.next")))
      fs.mkdirs(p("sizes.bak")) // an older, invalid backup
      val viaNext = Dedup.bandIndexLoad(spark, "band_idx_crash_t", dir)
      assert(viaNext.sizes.agg(sum("bsz")).head.getLong(0) == expected)
      assert(fs.exists(p("sizes")) && !fs.exists(p("sizes.next")))
      // crash state B: only the backup survives — load rolls back to it
      fs.delete(p("sizes.bak"), true)
      assert(fs.rename(p("sizes"), p("sizes.bak")))
      val viaBak = Dedup.bandIndexLoad(spark, "band_idx_crash_t", dir)
      assert(viaBak.sizes.agg(sum("bsz")).head.getLong(0) == expected)
      assert(fs.exists(p("sizes")) && !fs.exists(p("sizes.bak")))
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_crash_t")
  }

  test("probe plan: the index side never shuffles — batch broadcasts, " +
      "index is a map-side scan") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-plan").toString
    Dedup.bandIndexSave(Dedup.bandIndexBuild(oldCorpus, "doc_id"),
      "band_idx_plan_t", dir, nBuckets = 8)
    // file-backed probe input so the asserted plan carries no cached-plan
    // dump noise
    newBatch.write.mode("overwrite").parquet(s"$dir/newsigs")
    val probe = spark.read.parquet(s"$dir/newsigs")
    try {
      val loaded = Dedup.bandIndexLoad(spark, "band_idx_plan_t", dir)
      val df = Dedup.lshCandidatesDelta(probe, loaded, "doc_id")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the broadcast hints must hold regardless of stats: both probe
      // joins are BHJs, so NO band-key exchange exists anywhere — the
      // corpus-sized banded table is read exactly once, map-side, and the
      // only shuffle in the whole probe is the batch-sized distinct
      assert(raw"Exchange hashpartitioning\(band_idx".r
        .findFirstIn(plan).isEmpty,
        s"index side must not shuffle on band keys:\n$plan")
      assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
        s"expected broadcast probe joins in:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_plan_t")
  }
}
