package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Dedup, Maintenance, Pq, Similarity, Sq}

/** [[Maintenance]] — the one-call maintenance cycles (VERDICT r15 #5).
  * Pins the cycle contract per family: pinned action order (compact
  * before retrain before re-encode), at most ONE staged swap per
  * cycle, idempotence (a cycle that acted leaves the next cycle at
  * `none`), the blocked gate under a pending streaming journal, and
  * that a crash between steps heals at the top of the next cycle. */
class MaintenanceSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def corpus = spark.read.parquet(s"$sf/embeddings.parquet")
  private def fsOf(dir: String) = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
  private def p(dir: String, s: String) =
    new org.apache.hadoop.fs.Path(s"$dir/$s")

  test("ivfCycle: pinned order — rot compacts FIRST, the armed growth " +
      "retrain waits for the NEXT cycle (one staged swap per cycle), " +
      "the third cycle is none; probes stay exact throughout") {
    val dir = java.nio.file.Files.createTempDirectory("mc-ivf").toString
    Similarity.ivfSave(Similarity.ivfBuild(corpus.filter(col("vec_id") < 400),
      nCells = 2), "mc_ivf_t", dir, 2)
    try {
      // two appends = +1 file each → 3 files over 2 cells, rot past
      // the 1-file/cell cap
      val loaded = Similarity.ivfLoad(spark, "mc_ivf_t", dir)
      Seq(col("vec_id") >= 400 && col("vec_id") < 450,
          col("vec_id") >= 450).foreach { f =>
        Similarity.ivfAppendSave(
          Similarity.ivfAssign(loaded, corpus.filter(f), "vec_id"),
          "mc_ivf_t", dir, 2)
      }
      def cycle() = Maintenance.ivfCycle(spark, "mc_ivf_t", dir,
        maxFilesPerCell = 1, maxSkew = 1e9, minOccupiedFrac = 0.0,
        targetRowsPerCell = 10L)
      val c1 = cycle()
      assert(c1.action == "compact", s"cycle 1: $c1")
      // both triggers were armed; compact won and the cycle STOPPED —
      // the growth trigger is still pending and fires next cycle
      val c2 = cycle()
      assert(c2.action == "retrain", s"cycle 2: $c2")
      assert(c2.describe.getAs[Long]("n_cells") == 2L,
        "describe is the PRE-action state the decision was made on")
      val c3 = cycle()
      assert(c3.action == "none", s"cycle 3: $c3")
      assert(c3.describe.getAs[Long]("n_cells") == 50L,
        "retrain grew cells to ceil(500/10)")
      // end-to-end exactness after two swaps
      val healed = Similarity.ivfLoad(spark, "mc_ivf_t", dir)
      val q = corpus.filter(col("vec_id") === 7).select("embedding")
      assert(Similarity.ivfProbe(healed, q, "vec_id", nProbe = 50)
        .drop("cell").collect().toSeq
        == Similarity.bruteForceTopK(corpus, q, "vec_id").collect().toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS mc_ivf_t")
  }

  test("ivfCycle: pending streaming journal blocks every structural " +
      "action — reported, not thrown, and nothing is mutated") {
    val dir = java.nio.file.Files.createTempDirectory("mc-blk").toString
    Similarity.ivfSave(Similarity.ivfBuild(corpus, nCells = 2),
      "mc_blk_t", dir, 2)
    try {
      val fs = fsOf(dir)
      fs.create(p(dir, Dedup.StreamJournal)).close()
      val filesBefore = graft.engine.Store.dataFileCount(spark,
        s"$dir/assigned")
      // rot + growth both armed — the journal gate still wins
      val c = Maintenance.ivfCycle(spark, "mc_blk_t", dir,
        maxFilesPerCell = 1, maxSkew = 1e9, minOccupiedFrac = 0.0,
        targetRowsPerCell = 1L)
      assert(c.action == "blocked", s"$c")
      assert(c.detail.contains("replay"), c.detail)
      assert(graft.engine.Store.dataFileCount(spark, s"$dir/assigned")
        == filesBefore, "a blocked cycle must not touch the layout")
      fs.delete(p(dir, Dedup.StreamJournal), false)
    } finally spark.sql("DROP TABLE IF EXISTS mc_blk_t")
  }

  test("ivfCycle: a retrain crash window (staged centroids, stale " +
      "published frame, lost catalog entry) heals at the TOP of the " +
      "next cycle — the cycle's describe already sees the healed state") {
    val dir = java.nio.file.Files.createTempDirectory("mc-crash").toString
    Similarity.ivfSave(Similarity.ivfBuild(corpus, nCells = 4),
      "mc_cr_t", dir, 4)
    try {
      import spark.implicits._
      val oldCent = spark.read.parquet(s"$dir/centroids")
        .as[(Int, Seq[Double])].collect().toSeq
      Similarity.ivfRetrain(spark, "mc_cr_t", dir, nCells = 8)
      // reconstruct the worst crash point (the IvfIndexSpec device)
      val fs = fsOf(dir)
      assert(fs.rename(p(dir, "centroids"), p(dir, "assigned/_centroids")))
      oldCent.toDF("cell", "cent").coalesce(1).write.parquet(s"$dir/centroids")
      spark.sql("DROP TABLE `mc_cr_t`")

      val c = Maintenance.ivfCycle(spark, "mc_cr_t", dir)
      assert(c.action == "none", s"$c")
      assert(c.describe.getAs[Long]("n_cells") == 8L,
        "step-1 heal must publish the staged centroids before describe")
      assert(!fs.exists(p(dir, "assigned/_centroids")))
    } finally spark.sql("DROP TABLE IF EXISTS mc_cr_t")
  }

  test("sqCycle: planted bounds drift fires the re-encode arm (after " +
      "compact and retrain decline); the next cycle is none; raw = None " +
      "skips the bounds signal honestly") {
    val dir = java.nio.file.Files.createTempDirectory("mc-sq").toString
    val p0 = Sq.sqTrain(corpus)
    Sq.ivfSqSave(
      Sq.ivfSqEncode(Similarity.ivfBuild(corpus, nCells = 4), p0, "vec_id"),
      p0, "mc_sq_t", dir, 4)
    try {
      // the SqSpec drift device: 20% outliers scaled 10× appended
      // through the OLD bounds — they saturate at the clamp
      val outliers = corpus.limit((corpus.count() / 5).toInt)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(10.0f)).as("embedding"))
      val loaded = Similarity.ivfLoad(spark, "mc_sq_t", dir)
      Similarity.ivfAppendSave(
        Sq.sqEncode(Similarity.ivfAssign(loaded, outliers, "vec_id"),
            "embedding", p0)
          .select(col("vec_id"), col("cell"), col("codes"),
            col("recon_norm")), "mc_sq_t", dir, 4)
      spark.catalog.refreshTable("mc_sq_t")
      val rawAll = corpus.select("vec_id", "embedding").unionByName(outliers)
      // a codes-only cycle cannot evaluate the bounds signal — says so
      val cNoRaw = Maintenance.sqCycle(spark, "mc_sq_t", dir, raw = None,
        maxFilesPerCell = 64, maxSkew = 1e9, minOccupiedFrac = 0.0)
      assert(cNoRaw.action == "none" && cNoRaw.detail.contains("no raw"),
        s"$cNoRaw")
      // thresholds 0.05/0.2 sit ABOVE this corpus's clamp-bucket floor
      // (SqSpec measures that), so the r16 convergence guard lets the
      // re-encode proceed — and idempotence holds at the SAME
      // thresholds: cycle 2 is none because the re-encode actually
      // converged below them (cycle 1 at thresholds under the floor
      // would have REFUSED loudly instead of looping — the SqSpec
      // planted-floor test pins that branch)
      val c1 = Maintenance.sqCycle(spark, "mc_sq_t", dir,
        raw = Some(rawAll), idCol = "vec_id", maxFilesPerCell = 64,
        maxSkew = 1e9, minOccupiedFrac = 0.0,
        maxSatRate = 0.05, maxDimSatRate = 0.2)
      assert(c1.action == "reencode", s"cycle 1: $c1")
      assert(Sq.sqParamsOf(spark, dir) != p0, "bounds actually re-trained")
      val c2 = Maintenance.sqCycle(spark, "mc_sq_t", dir,
        raw = Some(rawAll), idCol = "vec_id", maxFilesPerCell = 64,
        maxSkew = 1e9, minOccupiedFrac = 0.0,
        maxSatRate = 0.05, maxDimSatRate = 0.2)
      assert(c2.action == "none", s"cycle 2: $c2")
    } finally spark.sql("DROP TABLE IF EXISTS mc_sq_t")
  }

  test("pqCycle: growth trigger fires the raw-access PQ retrain with " +
      "codebooks reopened from the index; the next cycle is none") {
    val dir = java.nio.file.Files.createTempDirectory("mc-pq").toString
    val cb = Pq.trainedCodebooks(corpus, "embedding", dim = 64, m = 4, k = 8)
    Pq.ivfPqSave(
      Pq.ivfPqEncode(Similarity.ivfBuild(corpus, nCells = 2), cb, "vec_id"),
      cb, "mc_pq_t", dir, 2)
    try {
      val raw = corpus.select("vec_id", "embedding")
      def cycle() = Maintenance.pqCycle(spark, "mc_pq_t", dir, raw,
        idCol = "vec_id", maxSkew = 1e9, minOccupiedFrac = 0.0,
        targetRowsPerCell = 10L)
      val c1 = cycle()
      assert(c1.action == "retrain", s"cycle 1: $c1")
      val c2 = cycle()
      assert(c2.action == "none", s"cycle 2: $c2")
      assert(c2.describe.getAs[Long]("n_cells") == 50L)
      // plain retrain (no usage fire): same codebook generation
      assert(Pq.pqCodebooksOf(spark, dir) == cb)
    } finally spark.sql("DROP TABLE IF EXISTS mc_pq_t")
  }

  test("bandIndexCycle: journal blocks, rot compacts, settled cycle is " +
      "none") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sigs = Dedup.minhashSignatures(
      Dedup.hashedShingles(docs, "doc_id", "text"), "doc_id", 16)
    val dir = java.nio.file.Files.createTempDirectory("mc-band").toString
    Dedup.bandIndexSave(
      Dedup.bandIndexBuild(sigs.filter(col("doc_id") % 3 =!= 0), "doc_id"),
      "mc_band_t", dir)
    try {
      val fs = fsOf(dir)
      fs.create(p(dir, Dedup.StreamJournal)).close()
      val cB = Maintenance.bandIndexCycle(spark, "mc_band_t", dir)
      assert(cB.action == "blocked", s"$cB")
      fs.delete(p(dir, Dedup.StreamJournal), false)
      // append = +1 file per touched bucket; force rot with a cap of 1
      Dedup.bandIndexAppend(sigs.filter(col("doc_id") % 3 === 0),
        "doc_id", "mc_band_t", dir)
      val c1 = Maintenance.bandIndexCycle(spark, "mc_band_t", dir,
        maxFilesPerBucket = 1)
      assert(c1.action == "compact", s"cycle 1: $c1")
      val c2 = Maintenance.bandIndexCycle(spark, "mc_band_t", dir,
        maxFilesPerBucket = 1)
      assert(c2.action == "none", s"cycle 2: $c2")
    } finally spark.sql("DROP TABLE IF EXISTS mc_band_t")
  }
}
