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

  test("incremental sizes merge: plan never reads the banded table; " +
      "result ≡ full re-aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-merge").toString
    val part1 = oldCorpus.filter(col("doc_id") % 3 =!= 0)
    val part2 = oldCorpus.filter(col("doc_id") % 3 === 0)
    Dedup.bandIndexSave(Dedup.bandIndexBuild(part1, "doc_id"),
      "band_idx_merge_t", dir, nBuckets = 8)
    try {
      // the append-cost contract, pinned at the PLAN level: the sizes
      // refresh reads the batch's banded rows and the persisted sizes
      // parquet — never the corpus-sized banded table
      val batchBanded = Dedup.bandIndexBuild(part2, "doc_id").banded
      val merged = Dedup.mergedSizes(spark, dir, batchBanded)
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("/banded") && !plan.contains("band_idx_merge_t"),
        s"sizes merge must not scan the banded table:\n$plan")
      // and the merged counts are exactly the full re-aggregate's
      Dedup.bandIndexAppend(part2, "doc_id", "band_idx_merge_t", dir,
        nBuckets = 8)
      val reopened = Dedup.bandIndexLoad(spark, "band_idx_merge_t", dir)
      val full = reopened.banded.groupBy("band_idx", "h")
        .agg(count(lit(1)).as("bsz"))
      assert(reopened.sizes.except(full).isEmpty &&
        full.except(reopened.sizes).isEmpty,
        "incrementally merged sizes diverged from the full re-aggregate")
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_merge_t")
  }

  test("append journal: interrupted append heals on load with the right " +
      "disposition; blind re-run is refused") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-journal").toString
    val part1 = oldCorpus.filter(col("doc_id") % 3 =!= 0)
    val part2 = oldCorpus.filter(col("doc_id") % 3 === 0)
    Dedup.bandIndexSave(Dedup.bandIndexBuild(part1, "doc_id"),
      "band_idx_jrnl_t", dir, nBuckets = 8)
    try {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
      val pre = Dedup.bandIndexLoad(spark, "band_idx_jrnl_t", dir)
        .sizes.agg(sum("bsz")).head.getLong(0)
      val batchN = Dedup.bandIndexBuild(part2, "doc_id").banded.count()
      def writeJournal(): Unit = {
        val out = fs.create(p("append.journal"), true)
        try out.write(s"$pre $batchN".getBytes("UTF-8")) finally out.close()
      }
      // crash BEFORE the banded append committed: journal present, banded
      // unchanged — heal reports the batch never landed (safe to re-run)
      writeJournal()
      assert(Dedup.healInterruptedAppend(spark, "band_idx_jrnl_t", dir)
        == "not-committed")
      assert(!fs.exists(p("append.journal")))
      // crash AFTER the banded append committed but before the sizes
      // swap: live sizes stale w.r.t. banded. Reconstruct that window by
      // completing a real append, then restoring the journal + a stale
      // sizes tree. Loading must heal: sizes match banded again, and the
      // disposition warns the batch IS in (a re-run would double-append).
      Dedup.bandIndexAppend(part2, "doc_id", "band_idx_jrnl_t", dir,
        nBuckets = 8)
      val staleSizes = Dedup.bandIndexBuild(part1, "doc_id") // pre-append counts
      staleSizes.sizes.write.mode("overwrite").parquet(s"$dir/sizes.stale")
      fs.delete(p("sizes"), true)
      assert(fs.rename(p("sizes.stale"), p("sizes")))
      writeJournal()
      // the refusal: appending over an unhealed journal must throw
      intercept[IllegalArgumentException] {
        Dedup.bandIndexAppend(part2, "doc_id", "band_idx_jrnl_t", dir,
          nBuckets = 8)
      }
      val healed = Dedup.bandIndexLoad(spark, "band_idx_jrnl_t", dir)
      val nBanded = healed.banded.count()
      assert(healed.sizes.agg(sum("bsz")).head.getLong(0) == nBanded,
        "heal must rebuild sizes to match the banded table")
      assert(!fs.exists(p("append.journal")))
      // probes over the healed index are equivalent to the in-memory path
      val viaIndex = asSet(Dedup.lshCandidatesDelta(newBatch, healed, "doc_id"))
      val viaAcross = asSet(Dedup.lshCandidatesAcross(newBatch, oldCorpus, "doc_id"))
      assert(viaIndex == viaAcross && viaIndex.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_jrnl_t")
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

  test("compaction after appends: file count collapses to the bucket " +
      "count, probe candidates unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-compact").toString
    val part = (r: Int) => oldCorpus.filter(col("doc_id") % 4 === r)
    Dedup.bandIndexSave(Dedup.bandIndexBuild(part(0), "doc_id"),
      "band_idx_cpt_t", dir, nBuckets = 8)
    try {
      (1 to 3).foreach(r =>
        Dedup.bandIndexAppend(part(r), "doc_id", "band_idx_cpt_t", dir,
          nBuckets = 8))
      def parquetFiles(): Int = {
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "banded"))
        try walk.filter(p => p.toString.endsWith(".parquet")).count().toInt
        finally walk.close()
      }
      val before = asSet(Dedup.lshCandidatesDelta(newBatch,
        Dedup.bandIndexLoad(spark, "band_idx_cpt_t", dir), "doc_id"))
      val filesBefore = parquetFiles()
      assert(filesBefore > 8,
        s"appends should accumulate files (got $filesBefore <= 8)")
      Dedup.compactBandIndex(spark, "band_idx_cpt_t", dir, nBuckets = 8)
      assert(parquetFiles() <= 8,
        s"compaction must leave at most one file per bucket, got ${parquetFiles()}")
      val reopened = Dedup.bandIndexLoad(spark, "band_idx_cpt_t", dir)
      // sizes untouched by compaction and still consistent with banded
      assert(reopened.sizes.agg(sum("bsz")).head.getLong(0)
        == reopened.banded.count())
      val after = asSet(Dedup.lshCandidatesDelta(newBatch, reopened, "doc_id"))
      assert(after == before && after.nonEmpty,
        "probe candidates must survive compaction")
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_cpt_t")
  }

  test("tombstone delete: probes ≡ a rebuild over retained docs; sizes " +
      "decremented incrementally; double-delete is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-del").toString
    Dedup.bandIndexSave(Dedup.bandIndexBuild(oldCorpus, "doc_id"),
      "band_idx_del_t", dir, nBuckets = 8)
    try {
      val victims = oldCorpus.filter(col("doc_id") % 7 === 1)
        .select("doc_id")
      val retained = oldCorpus.filter(col("doc_id") % 7 =!= 1)
      val removed = Dedup.bandIndexDelete(victims, "doc_id",
        "band_idx_del_t", dir)
      assert(removed > 0, "fixture must delete at least one indexed doc")
      val reopened = Dedup.bandIndexLoad(spark, "band_idx_del_t", dir)
      // the banded view hides the victims' rows...
      assert(reopened.banded.join(victims.withColumnRenamed("doc_id",
        "id_old"), Seq("id_old"), "left_semi").isEmpty)
      // ...and sizes match what a from-scratch build over the retained
      // docs computes — the mega-bucket cap equivalence depends on this
      val rebuilt = Dedup.bandIndexBuild(retained, "doc_id").sizes
      assert(reopened.sizes.except(rebuilt).isEmpty &&
        rebuilt.except(reopened.sizes).isEmpty,
        "decremented sizes diverged from a retained-docs rebuild")
      val viaIndex = asSet(Dedup.lshCandidatesDelta(newBatch, reopened,
        "doc_id"))
      val viaAcross = asSet(Dedup.lshCandidatesAcross(newBatch, retained,
        "doc_id"))
      assert(viaIndex == viaAcross && viaIndex.nonEmpty)
      // idempotence: same victims again (plus a never-indexed id) change
      // nothing — banded rows are not double-decremented. The re-delete
      // arrives with a DRIFTED integer width: new tombstones normalize
      // to the stored type (a mixed-width deletes dir would fail at read)
      val again = Dedup.bandIndexDelete(
        victims.union(spark.range(1).select(lit(999999L).as("doc_id")))
          .select(col("doc_id").cast("int")),
        "doc_id", "band_idx_del_t", dir)
      assert(again == 0L, s"double-delete must be a no-op, removed $again")
      val after = Dedup.bandIndexLoad(spark, "band_idx_del_t", dir)
      assert(after.sizes.except(rebuilt).isEmpty &&
        rebuilt.except(after.sizes).isEmpty)
      // the never-indexed id must NOT have been tombstoned (an
      // out-of-order delete staging one would block the id's FIRST
      // ingest until a compact): its later first append succeeds
      Dedup.bandIndexAppend(
        newBatch.limit(1).withColumn("doc_id", lit(999999L)),
        "doc_id", "band_idx_del_t", dir, nBuckets = 8)
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_del_t")
  }

  test("delete + append + compact: tombstones fold physically, deletes " +
      "clear, probe candidates unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-delcpt").toString
    val part1 = oldCorpus.filter(col("doc_id") % 3 =!= 0)
    val part2 = oldCorpus.filter(col("doc_id") % 3 === 0)
    Dedup.bandIndexSave(Dedup.bandIndexBuild(part1, "doc_id"),
      "band_idx_delcpt_t", dir, nBuckets = 8)
    try {
      val victims = part1.filter(col("doc_id") % 7 === 1).select("doc_id")
      assert(Dedup.bandIndexDelete(victims, "doc_id", "band_idx_delcpt_t",
        dir) > 0)
      // re-using a deleted id pre-compact is a documented conflict — and
      // an ENFORCED one (the tombstone would hide the re-appended rows)
      intercept[IllegalArgumentException] {
        Dedup.bandIndexAppend(part1.filter(col("doc_id") % 7 === 1),
          "doc_id", "band_idx_delcpt_t", dir, nBuckets = 8)
      }
      // append AFTER the delete: the sizes merge and the tombstone view
      // must compose (fresh ids only)
      Dedup.bandIndexAppend(part2, "doc_id", "band_idx_delcpt_t", dir,
        nBuckets = 8)
      val live = oldCorpus.filter(col("doc_id") % 7 =!= 1 ||
        col("doc_id") % 3 === 0)
      val before = asSet(Dedup.lshCandidatesDelta(newBatch,
        Dedup.bandIndexLoad(spark, "band_idx_delcpt_t", dir), "doc_id"))
      assert(before == asSet(Dedup.lshCandidatesAcross(newBatch, live,
        "doc_id")))
      Dedup.compactBandIndex(spark, "band_idx_delcpt_t", dir, nBuckets = 8)
      // tombstoned rows are physically gone: the RAW files now hold
      // exactly the live row count, and the tombstone set is cleared
      val reopened = Dedup.bandIndexLoad(spark, "band_idx_delcpt_t", dir)
      val liveN = reopened.banded.count()
      assert(spark.read.parquet(s"$dir/banded").count() == liveN,
        "compaction must remove tombstoned rows from the files")
      assert(!new java.io.File(s"$dir/deletes").exists(),
        "compaction must clear the folded tombstones")
      assert(reopened.sizes.agg(sum("bsz")).head.getLong(0) == liveN)
      assert(asSet(Dedup.lshCandidatesDelta(newBatch, reopened, "doc_id"))
        == before, "probe candidates must survive a tombstone-folding compact")
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_delcpt_t")
  }

  test("interrupted delete: journal heals with a safe disposition; " +
      "re-running the delete finishes the job") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-deljrnl").toString
    Dedup.bandIndexSave(Dedup.bandIndexBuild(oldCorpus, "doc_id"),
      "band_idx_deljrnl_t", dir, nBuckets = 8)
    try {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
      val victims = oldCorpus.filter(col("doc_id") % 7 === 1)
        .select("doc_id")
      val retained = oldCorpus.filter(col("doc_id") % 7 =!= 1)
      // crash AFTER tombstones landed, BEFORE the sizes swap: reconstruct
      // by completing a real delete, restoring pre-delete sizes, and
      // re-staging the journal the crash would have left behind
      val pre = Dedup.bandIndexLoad(spark, "band_idx_deljrnl_t", dir)
        .sizes.agg(sum("bsz")).head.getLong(0)
      val removed = Dedup.bandIndexDelete(victims, "doc_id",
        "band_idx_deljrnl_t", dir)
      Dedup.bandIndexBuild(oldCorpus, "doc_id").sizes
        .write.mode("overwrite").parquet(s"$dir/sizes.stale")
      fs.delete(p("sizes"), true)
      assert(fs.rename(p("sizes.stale"), p("sizes")))
      val out = fs.create(p("append.journal"), true)
      try out.write(s"$pre -$removed".getBytes("UTF-8")) finally out.close()
      // a new mutation over the unhealed journal is refused
      intercept[IllegalArgumentException] {
        Dedup.bandIndexDelete(victims, "doc_id", "band_idx_deljrnl_t", dir)
      }
      // load heals: sizes rebuilt against the LIVE (anti-tombstone) view
      val healed = Dedup.bandIndexLoad(spark, "band_idx_deljrnl_t", dir)
      val rebuilt = Dedup.bandIndexBuild(retained, "doc_id").sizes
      assert(healed.sizes.except(rebuilt).isEmpty &&
        rebuilt.except(healed.sizes).isEmpty,
        "heal must rebuild sizes minus tombstoned rows")
      // and the documented property: re-running the delete is a no-op
      assert(Dedup.bandIndexDelete(victims, "doc_id", "band_idx_deljrnl_t",
        dir) == 0L)
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_deljrnl_t")
  }

  test("bulk probe: candidates ≡ broadcast form; exactly one band-key " +
      "exchange (the batch side) — the index joins off its bucketed scan") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-bulk").toString
    Dedup.bandIndexSave(Dedup.bandIndexBuild(oldCorpus, "doc_id"),
      "band_idx_bulk_t", dir, nBuckets = 8)
    try {
      val loaded = Dedup.bandIndexLoad(spark, "band_idx_bulk_t", dir)
      val bulk = Dedup.lshCandidatesDeltaBulk(newBatch, loaded, "doc_id")
      assert(asSet(bulk) == asSet(Dedup.lshCandidatesDelta(newBatch,
        loaded, "doc_id")) && asSet(bulk).nonEmpty,
        "bulk probe diverged from the broadcast form")
      bulk.collect()
      // AQE's toString prints the final AND initial plans — count
      // exchanges in the final section only
      val plan = bulk.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // one band-key exchange total = the BATCH side only; a demoted
      // (non-bucketed) index scan would force a second one
      assert(raw"Exchange hashpartitioning\(band_idx".r
        .findAllIn(plan).length == 1,
        s"expected exactly one band-key exchange (batch side only):\n$plan")
      // and no sort of the corpus-sized index: the batch side builds the
      // hash map, the index streams
      assert(plan.contains("ShuffledHashJoin"),
        s"expected a shuffled-hash join (index streams unsorted):\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_bulk_t")
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

  test("auto probe: broadcast form under the session threshold, bulk " +
      "form above it; outputs identical on both branches") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-auto").toString
    Dedup.bandIndexSave(Dedup.bandIndexBuild(oldCorpus, "doc_id"),
      "band_idx_auto_t", dir, nBuckets = 8)
    try {
      val loaded = Dedup.bandIndexLoad(spark, "band_idx_auto_t", dir)
      val expected = asSet(Dedup.lshCandidatesDelta(newBatch, loaded,
        "doc_id"))
      // the policy itself: a micro-batch fits the default 10MB budget,
      // a multi-million-row backfill doesn't, and thr = -1 (broadcasts
      // disabled) forces bulk at ANY size
      assert(Dedup.deltaProbePrefersBroadcast(spark, 1000L, 4))
      assert(!Dedup.deltaProbePrefersBroadcast(spark, 10000000000L, 4))
      // small declared batch → the zero-exchange broadcast plan
      val small = Dedup.lshCandidatesDeltaAuto(newBatch, loaded, "doc_id",
        batchRows = 1000L)
      small.collect()
      val smallPlan = small.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(raw"Exchange hashpartitioning\(band_idx".r
        .findFirstIn(smallPlan).isEmpty,
        s"auto(small) must take the broadcast form:\n$smallPlan")
      // huge declared batch → the bulk plan (one batch-side exchange,
      // shuffled-hash into the bucketed index scan)
      val big = Dedup.lshCandidatesDeltaAuto(newBatch, loaded, "doc_id",
        batchRows = 100000000L)
      big.collect()
      val bigPlan = big.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(bigPlan.contains("ShuffledHashJoin"),
        s"auto(big) must take the bulk form:\n$bigPlan")
      // undeclared size → the probe counts the batch itself and still
      // lands on the broadcast form at this fixture's scale
      assert(asSet(small) == expected && asSet(big) == expected &&
        asSet(Dedup.lshCandidatesDeltaAuto(newBatch, loaded, "doc_id"))
          == expected && expected.nonEmpty,
        "auto probe output must be branch-independent")
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_auto_t")
  }

  test("interrupted compaction swap: load rolls the completed rewrite " +
      "forward and probes work") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-swap").toString
    Dedup.bandIndexSave(Dedup.bandIndexBuild(oldCorpus, "doc_id"),
      "band_idx_swap_t", dir, nBuckets = 8)
    try {
      val before = asSet(Dedup.lshCandidatesDelta(newBatch,
        Dedup.bandIndexLoad(spark, "band_idx_swap_t", dir), "doc_id"))
      // reconstruct the crash window between compactBucketed's two
      // renames: no live banded dir; the COMPLETED rewrite sits at
      // __compacting (here: the table itself, which compaction would
      // have rewritten 1:1) and the pre-compact tree at __old
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
      assert(fs.rename(p("banded"), p("banded__compacting")))
      fs.mkdirs(p("banded__old"))
      val healed = Dedup.bandIndexLoad(spark, "band_idx_swap_t", dir)
      assert(fs.exists(p("banded")) && !fs.exists(p("banded__compacting"))
        && !fs.exists(p("banded__old")),
        "heal must restore the live dir and clear the swap leftovers")
      val after = asSet(Dedup.lshCandidatesDelta(newBatch, healed, "doc_id"))
      assert(after == before && after.nonEmpty,
        "probe must see the rolled-forward index")
      // idempotent: a second load finds a healthy tree
      Dedup.bandIndexLoad(spark, "band_idx_swap_t", dir)
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_swap_t")
  }

  test("compact-on-rot policy: no-op under the file budget, compacts " +
      "above it, probe candidates unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("band-idx-rot").toString
    val part = (r: Int) => oldCorpus.filter(col("doc_id") % 4 === r)
    Dedup.bandIndexSave(Dedup.bandIndexBuild(part(0), "doc_id"),
      "band_idx_rot_t", dir, nBuckets = 8)
    try {
      (1 to 3).foreach(r =>
        Dedup.bandIndexAppend(part(r), "doc_id", "band_idx_rot_t", dir,
          nBuckets = 8))
      val files = graft.engine.Store.dataFileCount(spark, s"$dir/banded")
      assert(files > 8, s"appends should accumulate rot (got $files)")
      val before = asSet(Dedup.lshCandidatesDelta(newBatch,
        Dedup.bandIndexLoad(spark, "band_idx_rot_t", dir), "doc_id"))
      // generous budget → below threshold, nothing happens
      assert(!Dedup.maybeCompactBandIndex(spark, "band_idx_rot_t", dir,
        nBuckets = 8, maxFilesPerBucket = 100))
      assert(graft.engine.Store.dataFileCount(spark, s"$dir/banded")
        == files, "a declined policy check must not touch the files")
      // tight budget → the rot exceeds it and the rewrite runs
      assert(Dedup.maybeCompactBandIndex(spark, "band_idx_rot_t", dir,
        nBuckets = 8, maxFilesPerBucket = 1))
      assert(graft.engine.Store.dataFileCount(spark, s"$dir/banded") <= 8)
      // idempotent: a fresh check right after finds no rot
      assert(!Dedup.maybeCompactBandIndex(spark, "band_idx_rot_t", dir,
        nBuckets = 8, maxFilesPerBucket = 1))
      val after = asSet(Dedup.lshCandidatesDelta(newBatch,
        Dedup.bandIndexLoad(spark, "band_idx_rot_t", dir), "doc_id"))
      assert(after == before && after.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_rot_t")
  }

  test("bandIndexDescribe: sizes-frame health report, zero banded scans, " +
      "READ-ONLY over an unhealed journal") {
    val dir = java.nio.file.Files.createTempDirectory("band-desc").toString
    val idx = Dedup.bandIndexBuild(oldCorpus, "doc_id")
    Dedup.bandIndexSave(idx, "band_desc_t", dir, nBuckets = 8)
    try {
      import spark.implicits._
      val victims = oldCorpus.select("doc_id").limit(2)
      val removedIds = victims.collect().map(_.getLong(0)).toSet
      assert(Dedup.bandIndexDelete(victims, "doc_id", "band_desc_t", dir) > 0L)

      val d = Dedup.bandIndexDescribe(spark, dir).collect()(0)
      assert(d.getAs[Boolean]("sizes_present"))
      assert(!d.getAs[Boolean]("append_journal")
        && !d.getAs[Boolean]("stream_journal"))
      assert(d.getAs[Long]("tombstoned_ids") == removedIds.size.toLong)
      // banded_rows comes from the MAINTAINED sizes frame and must agree
      // with the live banded table post-delete (sizes were decremented)
      val live = spark.read.parquet(s"$dir/banded")
        .join(broadcast(victims.select(col("doc_id").as("id_old"))),
          Seq("id_old"), "left_anti").count()
      assert(d.getAs[Long]("banded_rows") == live,
        "sizes roll-up must match the live banded table")
      assert(d.getAs[Long]("buckets") > 0
        && d.getAs[Long]("max_bucket") >= 1L
        && d.getAs[Double]("avg_bucket") > 0.0)
      assert(d.getAs[Int]("data_files") >= 1)

      // an unhealed mutation journal is REPORTED, not healed: mutations
      // refuse over it, describe still answers and leaves it in place
      val jrnl = new java.io.File(s"$dir/append.journal")
      java.nio.file.Files.writeString(jrnl.toPath, "10 5")
      val d2 = Dedup.bandIndexDescribe(spark, dir).collect()(0)
      assert(d2.getAs[Boolean]("append_journal"),
        "pending heal not surfaced")
      assert(jrnl.exists, "describe must not heal the journal")
      assert(d2.getAs[Long]("banded_rows") == d.getAs[Long]("banded_rows"))
    } finally spark.sql("DROP TABLE IF EXISTS band_desc_t")
  }
}
