package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Dedup, Similarity}
import graft.streaming.IndexIngest

/** Streaming maintenance of the persisted similarity indexes
  * ([[graft.streaming.IndexIngest]]): a document / embedding stream
  * drives the SAME per-ingest mutations the batch layer ships, so a
  * stream-maintained index must be bit-identical to a batch-built one —
  * and micro-batch replays (foreachBatch is at-least-once) must not
  * double-append. */
class StreamingIndexIngestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id").cast("long"), col("text"))
  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")

  private def sigsOf(d: org.apache.spark.sql.DataFrame) =
    Dedup.minhashSignatures(
      Dedup.hashedShingles(d, "doc_id", "text"), "doc_id", 16)

  test("streamed band-index appends ≡ a batch build over the same docs; " +
      "probes equivalent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("bi-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bi-ckpt").toString
    val history = docs.filter(col("doc_id") % 5 =!= 0)
    // seed index: the first third of history (streams append the rest)
    val seed = history.filter(col("doc_id") % 3 === 0)
    Dedup.bandIndexSave(Dedup.bandIndexBuild(sigsOf(seed), "doc_id"),
      "bi_stream_t", dir, nBuckets = 8)
    try {
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch(IndexIngest.bandIndexSink(
          IndexIngest.docSigs("doc_id", "text"), "doc_id", "bi_stream_t",
          dir, nBuckets = 8))
        .option("checkpointLocation", ckpt).start()
      val rest = history.filter(col("doc_id") % 3 =!= 0)
        .as[(Long, String)].collect().toSeq
      val (b1, b2) = rest.splitAt(rest.size / 2)
      try {
        Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()

      val streamed = Dedup.bandIndexLoad(spark, "bi_stream_t", dir)
      val rebuilt = Dedup.bandIndexBuild(sigsOf(history), "doc_id")
      // banded rows and sizes are exactly the batch build's
      assert(streamed.banded.except(rebuilt.banded).isEmpty &&
        rebuilt.banded.except(streamed.banded).isEmpty,
        "stream-maintained banded rows diverged from a batch build")
      assert(streamed.sizes.except(rebuilt.sizes).isEmpty &&
        rebuilt.sizes.except(streamed.sizes).isEmpty,
        "stream-maintained sizes diverged from a batch build")
      // probe equivalence against the in-memory cross-frame path
      val batch = sigsOf(docs.filter(col("doc_id") % 5 === 0))
      val viaIndex = Dedup.lshCandidatesDelta(batch, streamed, "doc_id")
        .as[(Long, Long)].collect().toSet
      val viaAcross = Dedup.lshCandidatesAcross(batch, sigsOf(history),
        "doc_id").as[(Long, Long)].collect().toSet
      assert(viaIndex == viaAcross && viaIndex.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS bi_stream_t")
  }

  test("sink rot budget: a long-running stream keeps its own file count " +
      "bounded via the compact-on-rot policy; index still ≡ batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("bi-rot-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bi-rot-ckpt").toString
    val history = docs.filter(col("doc_id") % 5 =!= 0)
    val seed = history.filter(col("doc_id") % 4 === 0)
    Dedup.bandIndexSave(Dedup.bandIndexBuild(sigsOf(seed), "doc_id"),
      "bi_rot_stream_t", dir, nBuckets = 8)
    try {
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch(IndexIngest.bandIndexSink(
          IndexIngest.docSigs("doc_id", "text"), "doc_id",
          "bi_rot_stream_t", dir, nBuckets = 8, maxFilesPerBucket = 1))
        .option("checkpointLocation", ckpt).start()
      val rest = history.filter(col("doc_id") % 4 =!= 0)
        .as[(Long, String)].collect().toSeq
      // six micro-batches: without the budget this accumulates up to one
      // file per bucket per batch; with maxFilesPerBucket=1 every batch
      // whose rot exceeds 8 files triggers the bucketed rewrite
      val batches = rest.grouped(math.max(1, rest.size / 6)).toSeq
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
      assert(graft.engine.Store.dataFileCount(spark, s"$dir/banded") <= 16,
        "rot budget must keep the banded file count near one per bucket")
      val streamed = Dedup.bandIndexLoad(spark, "bi_rot_stream_t", dir)
      val rebuilt = Dedup.bandIndexBuild(sigsOf(history), "doc_id")
      assert(streamed.banded.except(rebuilt.banded).isEmpty &&
        rebuilt.banded.except(streamed.banded).isEmpty,
        "compact-on-rot stream diverged from a batch build")
      assert(streamed.sizes.except(rebuilt.sizes).isEmpty &&
        rebuilt.sizes.except(streamed.sizes).isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS bi_rot_stream_t")
  }

  test("band-index sink: replayed batch id is a no-op; every crash " +
      "window classifies correctly (no double-append, no skipped batch)") {
    val dir = java.nio.file.Files.createTempDirectory("bi-replay").toString
    val history = sigsOf(docs.filter(col("doc_id") % 5 =!= 0))
    val part1 = history.filter(col("doc_id") % 3 === 0)
    val part2 = history.filter(col("doc_id") % 3 === 1)
    val part3 = history.filter(col("doc_id") % 3 === 2)
    val part4 = sigsOf(docs.filter(col("doc_id") % 5 === 0))
    Dedup.bandIndexSave(Dedup.bandIndexBuild(part1, "doc_id"),
      "bi_replay_t", dir, nBuckets = 8)
    try {
      val sink = IndexIngest.bandIndexSink(identity, "doc_id",
        "bi_replay_t", dir, nBuckets = 8)
      def physical(): Long = spark.table("bi_replay_t").count()
      def sizesTotal(): Long = Dedup.bandIndexLoad(spark, "bi_replay_t",
        dir).sizes.agg(sum("bsz")).head.getLong(0)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
      def journal(id: Long, pre: Long, n: Long): Unit = {
        val out = fs.create(p("stream.journal"), true)
        try out.write(s"$id $pre $n".getBytes("UTF-8")) finally out.close()
      }
      sink(part2, 0L)
      val after0 = physical()
      // plain replay (epoch committed): must be a no-op
      sink(part2, 0L)
      assert(physical() == after0, "replayed batch double-appended")

      // crash window A — THE window the index's own journal cannot see:
      // batch 1's append fully committed (its inner journal cleared),
      // crash before the epoch write. Reconstruct exactly that state:
      // stage the sink journal, run the real append, leave epoch at 0.
      val n3 = part3.count() * 4
      journal(1L, physical(), n3)
      Dedup.bandIndexAppend(part3, "doc_id", "bi_replay_t", dir,
        nBuckets = 8)
      val after1 = physical()
      assert(after1 == after0 + n3)
      sink(part3, 1L) // the replay
      assert(physical() == after1,
        "committed-but-unmarked batch was re-appended on replay")
      assert(IndexIngest.committedEpoch(spark, dir) == 1L)
      assert(!fs.exists(p("stream.journal")), "journal must clear")

      // crash window B: journal staged, append never started
      journal(2L, physical(), 123L)
      sink(part4, 2L)
      assert(physical() > after1, "not-committed batch was skipped")
      assert(IndexIngest.committedEpoch(spark, dir) == 2L)
      val after2 = physical()

      // crash window C: epoch committed but journal clear crashed —
      // the STALE journal (old batch id) must be discarded, not used
      // to classify the NEW batch as committed
      journal(2L, after1, after2 - after1)
      val part5 = part2.withColumn("doc_id", col("doc_id") + 1000000)
      sink(part5, 3L)
      assert(physical() > after2,
        "stale journal mis-classified a new batch as committed")
      assert(IndexIngest.committedEpoch(spark, dir) == 3L)

      // crash window D: epoch committed, journal clear crashed, and the
      // stream restarts on the SAME batch id with no further traffic —
      // the replay lands in the skip branch, which must drop the stale
      // journal (classifyReplay's delete only runs for a newer id), or
      // compaction stays refused forever on an idle stream
      val after3 = physical()
      journal(3L, after2, after3 - after2)
      sink(part5, 3L) // replay of the already-committed batch
      assert(physical() == after3, "skip-branch replay must not append")
      assert(!fs.exists(p("stream.journal")),
        "skip branch must clear a journal at/behind the epoch")
      Dedup.compactBandIndex(spark, "bi_replay_t", dir, nBuckets = 8)

      // sizes stayed consistent through every window (and compaction)
      assert(sizesTotal() == physical(),
        "sizes diverged from the banded table across crash recoveries")
    } finally spark.sql("DROP TABLE IF EXISTS bi_replay_t")
  }

  test("streamed IVF appends: new vectors probeable, replay is a no-op, " +
      "index ≡ assign-and-append by hand") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("ivf-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivf-ckpt").toString
    val nCells = 8
    val half = embs.filter(col("vec_id") % 2 === 0)
    Similarity.ivfSave(Similarity.ivfBuild(half, nCells = nCells),
      "ivf_stream_t", dir, nCells)
    try {
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      // the stream carries the table's FULL row (append schema contract
      // is the caller's, exactly as with ivfAppendSave by hand)
      val input = MemoryStream[(Long, Seq[Float], Int)]
      // rot budget active: the sink must fold its own file accumulation
      // (the band-sink twin of this is pinned in its own test)
      val q = input.toDF().toDF("vec_id", "embedding", "label").writeStream
        .foreachBatch(IndexIngest.ivfSink("vec_id", "embedding",
          "ivf_stream_t", dir, nCells, maxFilesPerCell = 1))
        .option("checkpointLocation", ckpt).start()
      val rest = embs.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("embedding"),
          col("label").cast("int"))
        .as[(Long, Seq[Float], Int)].collect().toSeq
      val (b1, b2) = rest.splitAt(rest.size / 2)
      try {
        Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()

      val streamed = Similarity.ivfLoad(spark, "ivf_stream_t", dir)
      assert(streamed.assigned.count() == embs.count(),
        "stream-maintained index must hold the full corpus")
      // every streamed vector got the same cell the batch path assigns
      val expect = Similarity.ivfAssign(streamed,
        embs.filter(col("vec_id") % 2 =!= 0), "vec_id")
        .select(col("vec_id").cast("long"), col("cell").cast("int"))
      val got = streamed.assigned
        .filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("cell").cast("int"))
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        "streamed cell assignment diverged from ivfAssign")
      // an odd (streamed) vector is its own nearest neighbor
      val qv = embs.filter(col("vec_id") === 7).select("embedding")
      val top = Similarity.ivfProbe(streamed, qv, "vec_id", k = 1).collect()
      assert(top.length == 1 &&
        top(0).getAs[Number]("vec_id").longValue() == 7L)

      // the rot budget held: at most ~one file per cell plus the last
      // batch's un-compacted appends
      assert(graft.engine.Store.dataFileCount(spark, s"$dir/assigned")
        <= 2 * nCells,
        "ivf sink rot budget must bound the assigned file count")

      // replay: re-invoke the sink with the last committed batch id
      val sink = IndexIngest.ivfSink("vec_id", "embedding", "ivf_stream_t",
        dir, nCells)
      val n = spark.table("ivf_stream_t").count()
      sink(b2.toDF("vec_id", "embedding", "label"), 1L)
      assert(spark.table("ivf_stream_t").count() == n,
        "replayed IVF batch double-appended")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_stream_t")
  }

  test("streamed IVF appends through the hierarchical quantizer " +
      "(nSuper): stream ≡ batch ivfAssignHier, replay still a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("ivfh-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivfh-ckpt").toString
    val nCells = 8
    val nSuper = 2
    val half = embs.filter(col("vec_id") % 2 === 0)
    Similarity.ivfSave(Similarity.ivfBuild(half, nCells = nCells),
      "ivfh_stream_t", dir, nCells)
    try {
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, Seq[Float], Int)]
      val q = input.toDF().toDF("vec_id", "embedding", "label").writeStream
        .foreachBatch(IndexIngest.ivfSink("vec_id", "embedding",
          "ivfh_stream_t", dir, nCells, nSuper = nSuper))
        .option("checkpointLocation", ckpt).start()
      val rest = embs.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("embedding"),
          col("label").cast("int"))
        .as[(Long, Seq[Float], Int)].collect().toSeq
      val (b1, b2) = rest.splitAt(rest.size / 2)
      try {
        Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()

      val streamed = Similarity.ivfLoad(spark, "ivfh_stream_t", dir)
      assert(streamed.assigned.count() == embs.count(),
        "stream-maintained index must hold the full corpus")
      // the sink's hierarchy is DERIVED state: rebuilding it from the
      // reloaded centroids reproduces the identical quantizer
      // (ivfSuperBuild's contract), so the batch twin of what the sink
      // did per epoch is ivfAssignHier through that rebuild — same
      // rows, same cells
      val hq = Similarity.ivfSuperBuild(streamed, nSuper)
      val expect = Similarity.ivfAssignHier(hq,
        embs.filter(col("vec_id") % 2 =!= 0), "vec_id")
        .select(col("vec_id").cast("long"), col("cell").cast("int"))
      val got = streamed.assigned
        .filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("cell").cast("int"))
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        "streamed cell assignment diverged from batch ivfAssignHier")
      // a streamed vector is reachable through the hier probe path
      val qv = embs.filter(col("vec_id") === 7).select("embedding")
      val top = Similarity.ivfProbeHier(streamed, hq, qv, "vec_id",
        nProbeSuper = nSuper, k = 1).collect()
      assert(top.length == 1 &&
        top(0).getAs[Number]("vec_id").longValue() == 7L)

      // replay protocol is untouched by the assignment path: re-invoke
      // with the last committed batch id — no double-append
      val sink = IndexIngest.ivfSink("vec_id", "embedding",
        "ivfh_stream_t", dir, nCells, nSuper = nSuper)
      val n = spark.table("ivfh_stream_t").count()
      sink(b2.toDF("vec_id", "embedding", "label"), 1L)
      assert(spark.table("ivfh_stream_t").count() == n,
        "replayed hier-assigned IVF batch double-appended")
    } finally spark.sql("DROP TABLE IF EXISTS ivfh_stream_t")
  }

  test("streamed growth retrain: the ivfMaybeRetrain hook fires " +
      "mid-stream, the quantizer grows, and the stream continues " +
      "appending under the new modulus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("ivfr-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivfr-ckpt").toString
    val nCells = 2
    // small enough that epoch 1's live rows (half + b1) clear the
    // 2·target·nCells growth bound, and the GROWN count's own bound
    // stays above epoch 2's total — exactly one mid-stream fire
    val target = 50L
    val half = embs.filter(col("vec_id") % 2 === 0)
    Similarity.ivfSave(Similarity.ivfBuild(half, nCells = nCells),
      "ivfr_stream_t", dir, nCells)
    try {
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, Seq[Float], Int)]
      val q = input.toDF().toDF("vec_id", "embedding", "label").writeStream
        .foreachBatch(IndexIngest.ivfSink("vec_id", "embedding",
          "ivfr_stream_t", dir, nCells,
          retrainRowsPerCell = target))
        .option("checkpointLocation", ckpt).start()
      val rest = embs.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("embedding"),
          col("label").cast("int"))
        .as[(Long, Seq[Float], Int)].collect().toSeq
      val (b1, b2) = rest.splitAt(rest.size / 2)
      try {
        Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()

      // epoch 1 committed half+b1 rows under 2 cells — far past the
      // growth bound (live > 2·target·nCells) — so the hook re-fit to
      // ceil(live/target) cells; epoch 2 then appended under the NEW
      // modulus (well below ITS growth bound: no second fire)
      val liveAtFire = half.count() + b1.size
      val grown = (liveAtFire + target - 1) / target
      val d = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d.getAs[Long]("n_cells") == grown,
        s"mid-stream growth re-fit to ceil($liveAtFire/$target)")
      val streamed = Similarity.ivfLoad(spark, "ivfr_stream_t", dir)
      assert(streamed.assigned.count() == embs.count(),
        "stream-maintained index must hold the full corpus")
      // b2 streamed AFTER the re-fit: its cells must be the batch
      // assignment against the RETRAINED quantizer
      val b2ids = b2.map(_._1)
      val expect = Similarity.ivfAssign(streamed,
        embs.filter(col("vec_id").isin(b2ids: _*)), "vec_id")
        .select(col("vec_id").cast("long"), col("cell").cast("int"))
      val got = streamed.assigned
        .filter(col("vec_id").isin(b2ids: _*))
        .select(col("vec_id").cast("long"), col("cell").cast("int"))
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        "post-retrain streamed assignment diverged from batch ivfAssign")
      // exhaustive probe over the grown quantizer is exact
      val qv = embs.filter(col("vec_id") === 7).select("embedding")
      assert(Similarity.ivfProbe(streamed, qv, "vec_id",
          nProbe = grown.toInt, k = 5).drop("cell").collect().toSeq
        == Similarity.bruteForceTopK(embs, qv, "vec_id", k = 5)
          .collect().toSeq,
        "exhaustive probe must stay exact across a mid-stream retrain")
      // replay against the grown index: a fresh sink instance derives
      // the modulus from the PUBLISHED count (the declared nCells=2 is
      // stale by design here) and the no-op protocol holds
      val sink = IndexIngest.ivfSink("vec_id", "embedding",
        "ivfr_stream_t", dir, nCells, retrainRowsPerCell = target)
      val n = spark.table("ivfr_stream_t").count()
      sink(b2.toDF("vec_id", "embedding", "label"), 1L)
      assert(spark.table("ivfr_stream_t").count() == n,
        "replayed batch double-appended across a retrain")
    } finally spark.sql("DROP TABLE IF EXISTS ivfr_stream_t")
  }

  test("streamed IVF-PQ appends: the encode hook maintains a compressed " +
      "index ≡ batch pqEncode, probeable, replay-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.Pq
    val dir = java.nio.file.Files.createTempDirectory("pq-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pq-ckpt").toString
    val nCells = 8
    val half = embs.filter(col("vec_id") % 2 === 0)
    val cb = Pq.trainedCodebooks(embs, "embedding", dim = 64, m = 8, k = 16)
    val enc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => Pq.pqEncode(df, "embedding", cb)
        .select(col("vec_id"), col("cell"), col("codes"), col("recon_norm"))
    Similarity.ivfSave(
      Pq.ivfPqEncode(Similarity.ivfBuild(half, nCells = nCells), cb, "vec_id"),
      "pq_stream_t", dir, nCells)
    try {
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, Seq[Float], Int)]
      val q = input.toDF().toDF("vec_id", "embedding", "label").writeStream
        .foreachBatch(IndexIngest.ivfSink("vec_id", "embedding",
          "pq_stream_t", dir, nCells, encode = enc))
        .option("checkpointLocation", ckpt).start()
      val rest = embs.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("embedding"),
          col("label").cast("int"))
        .as[(Long, Seq[Float], Int)].collect().toSeq
      val (b1, b2) = rest.splitAt(rest.size / 2)
      try {
        Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()

      val streamed = Similarity.ivfLoad(spark, "pq_stream_t", dir)
      assert(streamed.assigned.count() == embs.count())
      // streamed codes + recon_norm ≡ the batch encode of the same rows
      // against the same codebooks (assignment against the shared coarse
      // quantizer, encode against cb — both deterministic)
      val expect = enc(Similarity.ivfAssign(streamed,
          embs.filter(col("vec_id") % 2 =!= 0), "vec_id"))
        .select(col("vec_id").cast("long"), col("cell").cast("int"),
          col("codes"), col("recon_norm"))
      val got = streamed.assigned.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("cell").cast("int"),
          col("codes"), col("recon_norm"))
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        "streamed PQ encode diverged from the batch path")
      // a streamed vector is its own ADC nearest neighbor after rerank
      val qv = embs.filter(col("vec_id") === 7).select("embedding")
      val top = Pq.ivfPqProbe(streamed, cb, qv, "vec_id", k = 1,
        rerankWith = Some(embs)).collect()
      assert(top.length == 1 &&
        top(0).getAs[Number]("vec_id").longValue() == 7L)
      // replay guard holds through the encode hook
      val sink = IndexIngest.ivfSink("vec_id", "embedding", "pq_stream_t",
        dir, nCells, encode = enc)
      val n = spark.table("pq_stream_t").count()
      sink(b2.toDF("vec_id", "embedding", "label"), 1L)
      assert(spark.table("pq_stream_t").count() == n,
        "replayed PQ batch double-appended")
    } finally spark.sql("DROP TABLE IF EXISTS pq_stream_t")
  }

  test("streamed RESIDUAL IVF-PQ appends: the residual encode hook " +
      "(closing over the static centroids) ≡ batch pqEncodeResidual, " +
      "probeable through the residual probe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.Pq
    val dir = java.nio.file.Files.createTempDirectory("pqres-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pqres-ckpt").toString
    val nCells = 8
    val half = embs.filter(col("vec_id") % 2 === 0)
    val built = Similarity.ivfBuild(half, nCells = nCells)
    val cbRes = Pq.trainedResidualCodebooks(built.assigned, "embedding",
      built, dim = 64, m = 8, k = 16)
    Similarity.ivfSave(Pq.ivfPqEncodeResidual(built, cbRes, "vec_id"),
      "pqres_stream_t", dir, nCells)
    try {
      // the hook closes over the saved index's STATIC centroid frame —
      // the same offline-artifact contract as the sink's own quantizer
      val idx = Similarity.ivfLoad(spark, "pqres_stream_t", dir)
      val enc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        df => Pq.pqEncodeResidual(df, "embedding", cbRes, idx)
          .select(col("vec_id"), col("cell"), col("codes"), col("recon_norm"))
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, Seq[Float], Int)]
      val q = input.toDF().toDF("vec_id", "embedding", "label").writeStream
        .foreachBatch(IndexIngest.ivfSink("vec_id", "embedding",
          "pqres_stream_t", dir, nCells, encode = enc))
        .option("checkpointLocation", ckpt).start()
      val rest = embs.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("embedding"),
          col("label").cast("int"))
        .as[(Long, Seq[Float], Int)].collect().toSeq
      try { input.addData(rest); q.processAllAvailable() } finally q.stop()

      val streamed = Similarity.ivfLoad(spark, "pqres_stream_t", dir)
      assert(streamed.assigned.count() == embs.count())
      val expect = enc(Similarity.ivfAssign(streamed,
          embs.filter(col("vec_id") % 2 =!= 0), "vec_id"))
        .select(col("vec_id").cast("long"), col("cell").cast("int"),
          col("codes"), col("recon_norm"))
      val got = streamed.assigned.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("cell").cast("int"),
          col("codes"), col("recon_norm"))
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        "streamed residual encode diverged from the batch path")
      val qv = embs.filter(col("vec_id") === 7).select("embedding")
      val top = Pq.ivfPqProbeResidual(streamed, cbRes, qv, "vec_id", k = 1,
        rerankWith = Some(embs)).collect()
      assert(top.length == 1 &&
        top(0).getAs[Number]("vec_id").longValue() == 7L)
    } finally spark.sql("DROP TABLE IF EXISTS pqres_stream_t")
  }

  test("streamed z-order appends: rows land exactly-once, replay is a " +
      "no-op, the rot policy re-clusters in-stream, compaction refuses " +
      "over a live journal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.engine.{Store, Tables}
    val dir = java.nio.file.Files.createTempDirectory("z-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("z-ckpt").toString
    val path = s"$dir/events_z"
    val cols = Seq("user_id", "ts")
    val nFiles = 4
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"), col("ts"), col("value"))
    val half = ev.filter(col("event_id") % 2 === 0)
    val rest = ev.filter(col("event_id") % 2 =!= 0)
    Store.saveZOrdered(half, path, cols, nFiles = nFiles)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    // aggressive rot budget: the stream must re-cluster itself
    val q = input.toDF().toDF("event_id", "user_id", "ts", "value")
      .writeStream
      .foreachBatch(IndexIngest.zOrderSink(path, cols,
        reclusterNFiles = nFiles, maxFiles = nFiles))
      .option("checkpointLocation", ckpt).start()
    val rows = rest
      .as[(Long, Long, java.sql.Timestamp, Double)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    try {
      Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val back = spark.read.parquet(path)
    assert(back.count() == ev.count() &&
      back.except(ev).isEmpty && ev.except(back).isEmpty,
      "stream-maintained z-dir must hold exactly the union")
    // rot budget held: every batch tripped the policy (nFiles + 1 >
    // maxFiles), so the dir is freshly re-clustered
    assert(Store.dataFileCount(spark, path) == nFiles,
      "in-stream re-cluster must restore the file budget")
    // replay: re-invoke with the last committed batch id — no-op
    val sink = IndexIngest.zOrderSink(path, cols)
    val n = spark.read.parquet(path).count()
    sink(b2.toDF("event_id", "user_id", "ts", "value"), 1L)
    assert(spark.read.parquet(path).count() == n,
      "replayed z batch double-appended")
    // a live stream journal must block operator-invoked re-clustering
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val jp = new org.apache.hadoop.fs.Path(
      s"${path}__stream/${graft.ext.Dedup.StreamJournal}")
    val out = fs.create(jp)
    out.write("9 0 0".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    try intercept[IllegalArgumentException] {
      Store.compactZOrdered(spark, path, cols, nFiles = nFiles)
    } finally fs.delete(jp, false)
  }

  test("z-order sink crash windows: a torn append heals via the " +
      "pre-append manifest (rows ≡ batch-only replay); an interrupted " +
      "compact swap heals at sink entry; no-manifest still stops loudly") {
    import graft.engine.{Store, Tables}
    val dir = java.nio.file.Files.createTempDirectory("z-torn").toString
    val path = s"$dir/events_z"
    val meta = s"${path}__stream"
    val cols = Seq("user_id", "ts")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"), col("ts"), col("value"))
    val base = ev.filter(col("event_id") % 2 === 0)
    val batch = ev.filter(col("event_id") % 2 =!= 0)
    Store.saveZOrdered(base, path, cols, nFiles = 4)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

    // --- simulate a crash INSIDE batch 0's append job commit: manifest
    // and journal staged (what the sink writes pre-mutation), then only
    // PART of the batch's files landed
    val preFiles = Store.dataFileList(spark, path)
    val pre = base.count()
    val batchN = batch.count()
    graft.ext.Dedup.writeFileAtomic(fs,
      new org.apache.hadoop.fs.Path(s"$meta/stream.manifest"),
      ("0" +: preFiles).mkString("\n"))
    graft.ext.Dedup.writeFileAtomic(fs,
      new org.apache.hadoop.fs.Path(s"$meta/${graft.ext.Dedup.StreamJournal}"),
      s"0 $pre $batchN")
    Store.appendZOrdered(batch.limit((batchN / 3).toInt), path, cols)
    val tornCount = spark.read.parquet(path).count()
    assert(tornCount != pre && tornCount != pre + batchN,
      "test setup must be a genuinely torn state")

    // --- restart replays batch 0: the sink must delete the partial
    // files via the manifest and re-append exactly once
    IndexIngest.zOrderSink(path, cols)(batch, 0L)
    val healed = spark.read.parquet(path)
    assert(healed.count() == ev.count() &&
      healed.except(ev).isEmpty && ev.except(healed).isEmpty,
      "torn append must heal to exactly base + batch")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$meta/stream.manifest")), "manifest must clear after the commit")

    // --- an interrupted compact swap (live dir renamed away, rewrite
    // complete) heals at the next sink invocation instead of dying in
    // the pre-count (the r11 advisory)
    val p = new org.apache.hadoop.fs.Path(path)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(path + "__compacting")))
    IndexIngest.zOrderSink(path, cols)(batch.limit(5), 1L)
    spark.catalog.refreshByPath(path)
    assert(spark.read.parquet(path).count() == ev.count() + 5,
      "sink must heal the swap debris, then append batch 1")

    // --- same torn window with NO manifest: still a loud operator stop
    val pre2Files = Store.dataFileList(spark, path)
    val pre2 = ev.count() + 5
    graft.ext.Dedup.writeFileAtomic(fs,
      new org.apache.hadoop.fs.Path(s"$meta/${graft.ext.Dedup.StreamJournal}"),
      s"2 $pre2 $batchN")
    Store.appendZOrdered(batch.limit(7), path, cols)
    val e = intercept[IllegalStateException] {
      IndexIngest.zOrderSink(path, cols)(batch, 2L)
    }
    assert(e.getMessage.contains("no usable pre-append manifest"),
      e.getMessage)
    // manual repair path still works: restore pre state + clear journal
    Store.deleteFilesNotIn(spark, path, pre2Files.toSet)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$meta/${graft.ext.Dedup.StreamJournal}"), false)
    spark.catalog.refreshByPath(path)
    assert(spark.read.parquet(path).count() == pre2)
  }

  test("retrain policy armed on a compressed sink fails FAST at first " +
      "load, not at whatever epoch the policy first fires") {
    import graft.ext.Sq
    val dir = java.nio.file.Files.createTempDirectory("sqr-fast").toString
    val p = Sq.sqTrain(embs)
    Similarity.ivfSave(
      Sq.ivfSqEncode(Similarity.ivfBuild(embs, nCells = 4), p, "vec_id"),
      "sqr_fast_t", dir, 4)
    try {
      val sink = IndexIngest.ivfSink("vec_id", "embedding", "sqr_fast_t",
        dir, 4, encode = df => Sq.sqEncode(df, "embedding", p)
          .select(col("vec_id"), col("cell"), col("codes"),
            col("recon_norm")),
        retrainRowsPerCell = 1000000L) // armed, far from firing
      val e = intercept[IllegalArgumentException] {
        sink(embs.limit(3).toDF(), 0L)
      }
      assert(e.getMessage.contains("compressed"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sqr_fast_t")
  }

  test("sqParams on a RAW sink fails FAST too (the converse " +
      "misconfiguration: the SQ retrain path decodes codes the raw " +
      "layout doesn't have)") {
    import graft.ext.Sq
    val dir = java.nio.file.Files.createTempDirectory("sqr-raw").toString
    val p = Sq.sqTrain(embs)
    Similarity.ivfSave(Similarity.ivfBuild(embs, nCells = 4),
      "sqr_raw_t", dir, 4)
    try {
      val sink = IndexIngest.ivfSink("vec_id", "embedding", "sqr_raw_t",
        dir, 4, retrainRowsPerCell = 1000000L, sqParams = Some(p))
      val e = intercept[IllegalArgumentException] {
        sink(embs.limit(3).toDF(), 0L)
      }
      assert(e.getMessage.contains("drop sqParams"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sqr_raw_t")
  }

  test("streamed SQ growth retrain: the armed compressed sink re-fits " +
      "cells mid-stream via the decode path (VERDICT r13 #2) — codes " +
      "ride through unchanged, post-retrain appends assign by the raw " +
      "rule, replay guard holds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.Sq
    val dir = java.nio.file.Files.createTempDirectory("sqg-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sqg-ckpt").toString
    val nCells = 2
    val target = 50L // the raw growth-retrain test's calibration
    val half = embs.filter(col("vec_id") % 2 === 0)
    val p = Sq.sqTrain(embs)
    val enc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => Sq.sqEncode(df, "embedding", p)
        .select(col("vec_id"), col("cell"), col("codes"), col("recon_norm"))
    Similarity.ivfSave(
      Sq.ivfSqEncode(Similarity.ivfBuild(half, nCells = nCells), p, "vec_id"),
      "sqg_stream_t", dir, nCells)
    try {
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, Seq[Float], Int)]
      val q = input.toDF().toDF("vec_id", "embedding", "label").writeStream
        .foreachBatch(IndexIngest.ivfSink("vec_id", "embedding",
          "sqg_stream_t", dir, nCells, encode = enc,
          retrainRowsPerCell = target, sqParams = Some(p)))
        .option("checkpointLocation", ckpt).start()
      val rest = embs.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("embedding"),
          col("label").cast("int"))
        .as[(Long, Seq[Float], Int)].collect().toSeq
      val (b1, b2) = rest.splitAt(rest.size / 2)
      try {
        Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()

      // epoch 1 fired the growth trigger through the SQ form: the cell
      // count grew exactly as the raw sink's (shared trigger), and the
      // layout stayed compressed
      val liveAtFire = half.count() + b1.size
      val grown = (liveAtFire + target - 1) / target
      val d = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d.getAs[Long]("n_cells") == grown,
        s"mid-stream SQ growth re-fit to ceil($liveAtFire/$target)")
      val streamed = Similarity.ivfLoad(spark, "sqg_stream_t", dir)
      assert(streamed.assigned.count() == embs.count())
      assert(!streamed.assigned.columns.contains("embedding"),
        "the retrain must not decompress the layout")
      // EVERY row's codes + recon_norm equal the batch encode — the
      // retrain only moved cells, never payloads
      val expectPayload = Sq.sqEncode(embs, "embedding", p)
        .select(col("vec_id").cast("long"), col("codes"), col("recon_norm"))
      val gotPayload = streamed.assigned
        .select(col("vec_id").cast("long"), col("codes"), col("recon_norm"))
      assert(gotPayload.except(expectPayload).isEmpty &&
        expectPayload.except(gotPayload).isEmpty,
        "codes/recon_norm drifted across the compressed retrain")
      // retrained-compressed ≡ retrain-on-raw at the assignment rule:
      // b2 streamed AFTER the re-fit, so its cells must be the batch
      // ivfAssign of the RAW embeddings against the retrained quantizer
      // — the identical post-retrain contract the raw sink test pins
      val b2ids = b2.map(_._1)
      val expect = Similarity.ivfAssign(streamed,
        embs.filter(col("vec_id").isin(b2ids: _*)), "vec_id")
        .select(col("vec_id").cast("long"), col("cell").cast("int"))
      val got = streamed.assigned
        .filter(col("vec_id").isin(b2ids: _*))
        .select(col("vec_id").cast("long"), col("cell").cast("int"))
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        "post-retrain streamed SQ assignment diverged from batch ivfAssign")
      // a streamed vector survives the retrain probe-reachable
      val qv = embs.filter(col("vec_id") === 7).select("embedding")
      val top = Sq.ivfSqProbe(streamed, p, qv, "vec_id", k = 1).collect()
      assert(top.length == 1 &&
        top(0).getAs[Number]("vec_id").longValue() == 7L)
      // replay protocol across the retrain: fresh sink, committed batch
      val sink = IndexIngest.ivfSink("vec_id", "embedding", "sqg_stream_t",
        dir, nCells, encode = enc, retrainRowsPerCell = target,
        sqParams = Some(p))
      val n = spark.table("sqg_stream_t").count()
      sink(b2.toDF("vec_id", "embedding", "label"), 1L)
      assert(spark.table("sqg_stream_t").count() == n,
        "replayed batch double-appended across a compressed retrain")
    } finally spark.sql("DROP TABLE IF EXISTS sqg_stream_t")
  }

  test("streamed IVF-SQ appends: the SQ encode hook maintains a " +
      "compressed index ≡ batch sqEncode, probeable, replay-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.Sq
    val dir = java.nio.file.Files.createTempDirectory("sq-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sq-ckpt").toString
    val nCells = 8
    val half = embs.filter(col("vec_id") % 2 === 0)
    // bounds trained on the FULL corpus once, offline — streamed rows
    // must encode in-range (out-of-range would saturate, not break)
    val p = Sq.sqTrain(embs)
    val enc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => Sq.sqEncode(df, "embedding", p)
        .select(col("vec_id"), col("cell"), col("codes"), col("recon_norm"))
    Similarity.ivfSave(
      Sq.ivfSqEncode(Similarity.ivfBuild(half, nCells = nCells), p, "vec_id"),
      "sq_stream_t", dir, nCells)
    try {
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, Seq[Float], Int)]
      val q = input.toDF().toDF("vec_id", "embedding", "label").writeStream
        .foreachBatch(IndexIngest.ivfSink("vec_id", "embedding",
          "sq_stream_t", dir, nCells, encode = enc))
        .option("checkpointLocation", ckpt).start()
      val rest = embs.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("embedding"),
          col("label").cast("int"))
        .as[(Long, Seq[Float], Int)].collect().toSeq
      val (b1, b2) = rest.splitAt(rest.size / 2)
      try {
        Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()

      val streamed = Similarity.ivfLoad(spark, "sq_stream_t", dir)
      assert(streamed.assigned.count() == embs.count())
      // streamed codes + recon_norm ≡ the batch encode of the same rows
      // (assignment against the shared coarse quantizer, encode against
      // the fixed bounds — both deterministic)
      val expect = enc(Similarity.ivfAssign(streamed,
          embs.filter(col("vec_id") % 2 =!= 0), "vec_id"))
        .select(col("vec_id").cast("long"), col("cell").cast("int"),
          col("codes"), col("recon_norm"))
      val got = streamed.assigned.filter(col("vec_id") % 2 =!= 0)
        .select(col("vec_id").cast("long"), col("cell").cast("int"),
          col("codes"), col("recon_norm"))
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        "streamed SQ encode diverged from the batch path")
      // a streamed vector is its own SQ nearest neighbor (no rerank
      // needed — SQ8 reconstruction error can't displace a self-match)
      val qv = embs.filter(col("vec_id") === 7).select("embedding")
      val top = Sq.ivfSqProbe(streamed, p, qv, "vec_id", k = 1).collect()
      assert(top.length == 1 &&
        top(0).getAs[Number]("vec_id").longValue() == 7L)
      // replay guard holds through the encode hook
      val sink = IndexIngest.ivfSink("vec_id", "embedding", "sq_stream_t",
        dir, nCells, encode = enc)
      val n = spark.table("sq_stream_t").count()
      sink(b2.toDF("vec_id", "embedding", "label"), 1L)
      assert(spark.table("sq_stream_t").count() == n,
        "replayed batch double-appended through the SQ encode hook")
    } finally spark.sql("DROP TABLE IF EXISTS sq_stream_t")
  }
}
