package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Similarity

/** IVF build/probe split (VERDICT r7 item 7 / r8 item 7): the KMeans
  * coarse quantizer is fit ONCE ([[Similarity.ivfBuild]]), the index
  * persists as parquet (assigned corpus bucketed by cell + tiny centroid
  * frame), and every subsequent query is probe-only — no re-fit, and the
  * probe's literal `cell IN (…)` filter bucket-prunes the persisted scan
  * to nProbe of nCells buckets. */
class IvfIndexSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def corpus = spark.read.parquet(s"$sf/embeddings.parquet")

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("L2DistF32: the codegen squared-L2 kernel is bit-identical to " +
      "the HOF fold it replaced, on every adjacent corpus pair") {
    val a = corpus.select(col("vec_id"), col("embedding").as("ea"))
    val b = corpus.select((col("vec_id") + 1).as("vec_id"),
      col("embedding").as("eb"))
    val rows = a.join(b, "vec_id")
      .select(
        Similarity.l2sq(col("ea"), col("eb")).as("kernel"),
        aggregate(zip_with(
            transform(col("ea"), x => x.cast("double")),
            transform(col("eb"), x => x.cast("double")),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()
    assert(rows.length == corpus.count() - 1)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"kernel ${r.getDouble(0)} != hof ${r.getDouble(1)}"))
  }

  test("LshBucketF: the codegen bucket kernel is bit-identical to the " +
      "per-plane HOF chain on every corpus row (both plane widths in use)") {
    Seq(4, 16).foreach { nPlanes =>
      val planes = Similarity.hyperplanes(nPlanes, 64)
      val rows = corpus.select(
        Similarity.lshBucket(col("embedding"), planes).as("kernel"),
        Similarity.lshBucketHof(col("embedding"), planes).as("hof"))
        .collect()
      assert(rows.length == corpus.count())
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"nPlanes=$nPlanes: kernel ${r.getLong(0)} != hof ${r.getLong(1)}"))
    }
  }

  test("LshBucketF: 63 planes (bits 0..62) fill the non-negative long " +
      "range the HOF chain handled — valid and HOF-identical; 64 refuses") {
    val planes63 = Similarity.hyperplanes(63, 64)
    val rows = corpus.limit(20).select(
      Similarity.lshBucket(col("embedding"), planes63).as("kernel"),
      Similarity.lshBucketHof(col("embedding"), planes63).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"63 planes: kernel ${r.getLong(0)} != hof ${r.getLong(1)}")
      assert(r.getLong(0) >= 0L, "bits 0..62 stay non-negative")
    }
    val e = intercept[IllegalArgumentException](
      corpus.select(Similarity.lshBucket(col("embedding"),
        Similarity.hyperplanes(64, 64))))
    assert(e.getMessage.contains("63"), e.getMessage)
  }

  test("codesWidth: null-codes rows are skipped, not NPE'd (ADVICE r14) — " +
      "all-null and empty frames are None, the first non-null row wins") {
    import spark.implicits._
    val allNull = Seq[(Long, Seq[Int])]((1L, null), (2L, null))
      .toDF("vec_id", "codes")
    assert(Similarity.codesWidth(allNull).isEmpty,
      "an all-null frame carries no width — guards must skip, not NPE")
    val mixed = Seq[(Long, Seq[Int])]((1L, null), (2L, Seq(1, 2, 3)))
      .toDF("vec_id", "codes")
    assert(Similarity.codesWidth(mixed).contains(3),
      "the probe must find the first non-null row")
    assert(Similarity.codesWidth(allNull.limit(0)).isEmpty)
  }

  test("one-shot ivfTopK ≡ build-once + probe (same seed, same cells)") {
    val q = corpus.filter(col("vec_id") === 1).select("embedding")
    val oneShot = Similarity.ivfTopK(corpus, q, "vec_id").collect().toSeq
    val idx = Similarity.ivfBuild(corpus)
    val split = Similarity.ivfProbe(idx, q, "vec_id").collect().toSeq
    assert(oneShot == split)
  }

  test("persisted index: probe-only reuse across queries, bucket-pruned scan") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    val nCells = 16
    val built = Similarity.ivfBuild(corpus, nCells = nCells)
    Similarity.ivfSave(built, "ivf_assigned", dir, nCells)
    try {
      val loaded = Similarity.ivfLoad(spark, "ivf_assigned", dir)
      // two different queries against ONE persisted index — no rebuild:
      // the probe path only touches the loaded DataFrames (type-level,
      // IvfIndex carries no model), and results match the in-memory index.
      Seq(1L, 7L).foreach { qid =>
        val q = corpus.filter(col("vec_id") === qid).select("embedding")
        val fromLoaded = Similarity.ivfProbe(loaded, q, "vec_id").collect().toSeq
        val fromBuilt = Similarity.ivfProbe(built, q, "vec_id").collect().toSeq
        assert(fromLoaded == fromBuilt, s"query $qid diverged")
        assert(fromLoaded.size == 10)
      }
      // scale evidence: the probe's cell IN (...) literal filter must
      // bucket-prune the bucketed scan (nProbe=2 of 16 buckets read).
      // autoBucketedScan would demote the scan to non-bucketed here —
      // this probe has no exchange to save and the rule ignores pruning
      // (the IN filter still file-prunes via parquet stats, since
      // saveBucketed writes one file per cell) — so pin it on to assert
      // the bucket-pruning evidence itself.
      withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        val q = corpus.filter(col("vec_id") === 1).select("embedding")
        val plan = Similarity.ivfProbe(loaded, q, "vec_id")
          .queryExecution.executedPlan.toString
        // regex, not an exact string: tolerant of whitespace/format drift
        // across Spark versions while still pinning 2-of-16 pruning
        assert(raw"SelectedBucketsCount:\s*2\s+out of\s+16".r
          .findFirstIn(plan).isDefined,
          s"expected bucket pruning in:\n$plan")
      }
      // Under DEFAULT conf (autoBucketedScan on) the probe scan is demoted
      // to non-bucketed — there pruning comes from the pushed `cell IN (…)`
      // filter against parquet stats, one file per cell (saveBucketed).
      // Assert that path too, since it is the configuration production runs.
      locally {
        val q = corpus.filter(col("vec_id") === 1).select("embedding")
        val plan = Similarity.ivfProbe(loaded, q, "vec_id")
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
        assert(raw"In\(cell,".r.findFirstIn(pushed).isDefined,
          s"expected cell IN (…) pushed to the index scan under default conf:\n$plan")
      }
    } finally spark.sql("DROP TABLE IF EXISTS ivf_assigned")
  }

  test("incremental maintenance: ivfAssign ≡ KMeans transform; append extends a persisted index") {
    // 1. assignment equivalence: re-assigning the BUILD corpus through
    // the broadcast-argmin path must reproduce KMeans' own cells exactly
    // (same distance, same lowest-index tie rule)
    val built = Similarity.ivfBuild(corpus, nCells = 8)
    val re = Similarity.ivfAssign(built, corpus, "vec_id")
      .select("vec_id", "cell")
    val drift = re.except(built.assigned.select("vec_id", "cell")).count() +
      built.assigned.select("vec_id", "cell").except(re).count()
    assert(drift == 0, s"ivfAssign diverged from KMeans transform on $drift rows")

    // 2. end-to-end: build+persist on half the corpus, assign+append the
    // other half with NO re-fit, reopen, probe for an appended vector
    val dir = java.nio.file.Files.createTempDirectory("ivf-append").toString
    val half = corpus.filter(col("vec_id") % 2 === 0)
    val rest = corpus.filter(col("vec_id") % 2 =!= 0)
    val idx = Similarity.ivfBuild(half, nCells = 8)
    Similarity.ivfSave(idx, "ivf_append_t", dir, 8)
    try {
      val loaded = Similarity.ivfLoad(spark, "ivf_append_t", dir)
      Similarity.ivfAppendSave(
        Similarity.ivfAssign(loaded, rest, "vec_id"), "ivf_append_t", dir, 8)
      val reopened = Similarity.ivfLoad(spark, "ivf_append_t", dir)
      assert(reopened.assigned.count() == corpus.count(),
        "appended index must hold the full corpus")
      // an appended (odd-id) vector must find itself as its own nearest
      // neighbor through the probe path
      val q = corpus.filter(col("vec_id") === 7).select("embedding")
      val top = Similarity.ivfProbe(reopened, q, "vec_id", k = 1).collect()
      assert(top.length == 1 && top(0).getAs[Number]("vec_id").longValue() == 7L,
        s"appended vector not probeable: ${top.toSeq}")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_append_t")
  }

  test("compaction after appends: one file per cell, bucket pruning and " +
      "probe results survive") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-compact").toString
    val nCells = 8
    // build on a sixth of the corpus, append the rest as FIVE batches —
    // each append adds one file per touched cell
    val base = corpus.filter(col("vec_id") % 6 === 0)
    val idx = Similarity.ivfBuild(base, nCells = nCells)
    Similarity.ivfSave(idx, "ivf_compact_t", dir, nCells)
    try {
      (1 to 5).foreach { r =>
        val batch = corpus.filter(col("vec_id") % 6 === r)
        val loaded = Similarity.ivfLoad(spark, "ivf_compact_t", dir)
        Similarity.ivfAppendSave(
          Similarity.ivfAssign(loaded, batch, "vec_id"),
          "ivf_compact_t", dir, nCells)
      }
      def parquetFiles(): Int = {
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "assigned"))
        try walk.filter(p => p.toString.endsWith(".parquet")).count().toInt
        finally walk.close()
      }
      val loaded = Similarity.ivfLoad(spark, "ivf_compact_t", dir)
      assert(loaded.assigned.count() == corpus.count())
      val q = corpus.filter(col("vec_id") === 7).select("embedding")
      val before = Similarity.ivfProbe(loaded, q, "vec_id").collect().toSeq
      val filesBefore = parquetFiles()
      assert(filesBefore > nCells,
        s"appends should accumulate files (got $filesBefore <= $nCells)")
      Similarity.ivfCompact(spark, "ivf_compact_t", dir, nCells)
      // one file per (non-empty) cell afterwards
      assert(parquetFiles() <= nCells,
        s"compaction must leave at most one file per cell, got ${parquetFiles()}")
      val reopened = Similarity.ivfLoad(spark, "ivf_compact_t", dir)
      assert(Similarity.ivfProbe(reopened, q, "vec_id").collect().toSeq == before,
        "probe results must survive compaction")
      // the scale property compaction must NOT break: bucket pruning
      withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        val plan = Similarity.ivfProbe(reopened, q, "vec_id")
          .queryExecution.executedPlan.toString
        // nProbe=2 cells select ≤2 buckets (two cells can murmur3-collide
        // into one of the 8) — what must NOT appear is an unpruned scan
        assert(raw"SelectedBucketsCount:\s*[12]\s+out of\s+8".r
          .findFirstIn(plan).isDefined,
          s"bucket pruning must survive compaction:\n$plan")
      }
    } finally spark.sql("DROP TABLE IF EXISTS ivf_compact_t")
  }

  test("ivfAssign refuses null embeddings (a null cell row would vanish " +
      "into the null bucket, unreachable by any probe)") {
    val built = Similarity.ivfBuild(corpus, nCells = 8)
    val embType = corpus.schema("embedding").dataType
    val withNull = corpus.limit(2).select("vec_id", "embedding")
      .union(corpus.limit(1).select(
        (col("vec_id") + 1000000).as("vec_id"),
        lit(null).cast(embType).as("embedding")))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfAssign(built, withNull, "vec_id")
    }
    assert(e.getMessage.contains("null"), e.getMessage)
    // and the clean slice still assigns
    assert(Similarity.ivfAssign(built,
      corpus.limit(2).select("vec_id", "embedding"), "vec_id")
      .filter(col("cell").isNull).isEmpty)
  }

  test("compact-on-rot policy: no-op under the file budget, compacts " +
      "above it, probe results unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-rot").toString
    val nCells = 8
    val base = corpus.filter(col("vec_id") % 4 === 0)
    Similarity.ivfSave(Similarity.ivfBuild(base, nCells = nCells),
      "ivf_rot_t", dir, nCells)
    try {
      (1 to 3).foreach { r =>
        val loaded = Similarity.ivfLoad(spark, "ivf_rot_t", dir)
        Similarity.ivfAppendSave(
          Similarity.ivfAssign(loaded,
            corpus.filter(col("vec_id") % 4 === r), "vec_id"),
          "ivf_rot_t", dir, nCells)
      }
      val files = graft.engine.Store.dataFileCount(spark, s"$dir/assigned")
      assert(files > nCells, s"appends should accumulate rot (got $files)")
      val q = corpus.filter(col("vec_id") === 7).select("embedding")
      val before = Similarity.ivfProbe(
        Similarity.ivfLoad(spark, "ivf_rot_t", dir), q, "vec_id")
        .collect().toSeq
      // generous budget → below threshold, nothing happens
      assert(!Similarity.ivfMaybeCompact(spark, "ivf_rot_t", dir, nCells,
        maxFilesPerCell = 100))
      assert(graft.engine.Store.dataFileCount(spark, s"$dir/assigned")
        == files, "a declined policy check must not touch the files")
      // tight budget → the rot exceeds it and the rewrite runs
      assert(Similarity.ivfMaybeCompact(spark, "ivf_rot_t", dir, nCells,
        maxFilesPerCell = 1))
      assert(graft.engine.Store.dataFileCount(spark, s"$dir/assigned")
        <= nCells)
      assert(!Similarity.ivfMaybeCompact(spark, "ivf_rot_t", dir, nCells,
        maxFilesPerCell = 1), "fresh check after a compact must find no rot")
      assert(Similarity.ivfProbe(
        Similarity.ivfLoad(spark, "ivf_rot_t", dir), q, "vec_id")
        .collect().toSeq == before,
        "probe results must survive the policy-triggered compaction")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_rot_t")
  }

  test("two-level quantizer: exhaustive settings reproduce the flat " +
      "forms exactly; hier assignment is self-consistent") {
    val nCells = 8
    val built = Similarity.ivfBuild(corpus, nCells = nCells)

    // 1. nSuper=1 ⇒ one super holds every cell ⇒ level 2 argmins over
    // ALL centroids in cell order — bit-identical to the flat ivfAssign
    val one = Similarity.ivfSuperBuild(built, nSuper = 1)
    val hier1 = Similarity.ivfAssignHier(one, corpus, "vec_id")
      .select("vec_id", "cell")
    val flat = Similarity.ivfAssign(built, corpus, "vec_id")
      .select("vec_id", "cell")
    assert(hier1.except(flat).count() + flat.except(hier1).count() == 0,
      "nSuper=1 hier assignment must equal the flat argmin exactly")

    // 2. probe with nProbeSuper = nSuper considers every cell ⇒ the
    // hierarchical cell ranking equals the flat one, results identical
    val sq = Similarity.ivfSuperBuild(built, nSuper = 3)
    val q = corpus.filter(col("vec_id") === 1).select("embedding")
    val flatProbe = Similarity.ivfProbe(built, q, "vec_id").collect().toSeq
    val hierProbe = Similarity.ivfProbeHier(built, sq, q, "vec_id",
      nProbeSuper = 3).collect().toSeq
    assert(hierProbe == flatProbe,
      "nProbeSuper = nSuper hier probe must equal the flat probe")

    // 3. self-consistency at a REAL hierarchy (nSuper √-ish, probe 1
    // super): every assigned cell is a child of the row's level-1 super
    // (the quantizer's defining invariant), and an assigned vector is
    // found by the same super-path that assigned it
    val assigned = Similarity.ivfAssignHier(sq, corpus, "vec_id")
    val childPairs = sq.children
      .select(col("super"), explode(col("cands")).as("c"))
      .select(col("super").as("_sup2"), col("c.cell").as("cell"))
    val withSuper = corpus
      .withColumn("_pos", org.apache.spark.sql.GraftBridge.column(
        graft.functions.NearestCentroidF(
          org.apache.spark.sql.GraftBridge.expression(col("embedding")),
          sq.superCents)))
      .withColumn("_sup", element_at(
        array(sq.superIds.map(lit(_)): _*), col("_pos") + 1))
      .select(col("vec_id"), col("_sup"))
    // each cell is owned by exactly ONE super; the row's assigned cell
    // must be owned by the row's nearest super
    assert(childPairs.groupBy("cell").count().filter(col("count") > 1)
      .isEmpty, "a cell must belong to exactly one super")
    val broken = assigned.select("vec_id", "cell").join(withSuper, "vec_id")
      .join(childPairs, "cell")
      .filter(col("_sup") =!= col("_sup2"))
    assert(broken.isEmpty, "every assigned cell must be owned by the " +
      "row's nearest super")
    val self = Similarity.ivfProbeHier(
      Similarity.IvfIndex(assigned, built.centroids), sq,
      corpus.filter(col("vec_id") === 7).select("embedding"), "vec_id",
      nProbeSuper = 1, nProbe = 1, k = 1).collect()
    assert(self.length == 1 &&
      self(0).getAs[Number]("vec_id").longValue() == 7L,
      s"hier-assigned vector must be reachable through the hier probe: ${self.toSeq}")
  }

  test("auto-hier: probe entry points default to hierarchical ranking " +
      "above AutoHierCells and stay flat below; exhaustive auto ≡ flat") {
    import spark.implicits._
    // below the threshold: no auto hierarchy — the flat path unchanged
    assert(Similarity.ivfBuild(corpus, nCells = 8).autoSuper.isEmpty,
      "a small index must not auto-build a hierarchy")

    // a >AutoHierCells quantizer, constructed directly (the auto rule
    // depends only on the centroid frame — no 300-cell KMeans needed):
    // 300 deterministic well-spread centroids, corpus assigned flat
    val nCells = 300
    val cents = (0 until nCells).map { c =>
      (c, (0 until 64).map(i => math.sin(c * 37 + i * 13) * 5.0).toArray)
    }.toDF("cell", "cent")
    val proto = Similarity.IvfIndex(spark.emptyDataFrame, cents)
    val index = Similarity.IvfIndex(
      Similarity.ivfAssign(proto, corpus, "vec_id"), cents)
    val auto = index.autoSuper
    assert(auto.isDefined,
      "the auto hierarchy must build above AutoHierCells")

    // exhaustive nProbeSuper considers every super ⇒ the auto-hier
    // ranking ≡ flat; the flat reference is the ≡-pinned one-super
    // hierarchy (the degenerate form the first test above pins ≡ flat)
    val nSupers = auto.get.superIds.length
    val q = corpus.filter(col("vec_id") === 1).select("embedding")
    val flatRef = Similarity.ivfProbeHier(index,
      Similarity.ivfSuperBuild(index, 1), q, "vec_id",
      nProbeSuper = 1, nProbe = 3).collect().toSeq
    val autoProbe = Similarity.ivfProbe(index, q, "vec_id", nProbe = 3,
      nProbeSuper = nSupers).collect().toSeq
    assert(autoProbe == flatRef,
      "exhaustive auto-hier single probe must equal the flat ranking")

    // the bulk path takes the same auto fallback
    val queries = corpus.filter(col("vec_id").isin(1L, 7L))
      .select(col("vec_id").as("q_id"), col("embedding"))
    val bulkFlat = Similarity.ivfProbeBulk(index, queries, "q_id",
      "vec_id", nProbe = 3, superQ = Some(Similarity.ivfSuperBuild(index, 1)),
      nProbeSuper = 1).collect().toSeq
    val bulkAuto = Similarity.ivfProbeBulk(index, queries, "q_id",
      "vec_id", nProbe = 3, nProbeSuper = nSupers).collect().toSeq
    assert(bulkAuto == bulkFlat,
      "exhaustive auto-hier bulk probe must equal the flat ranking")
  }

  test("bulk raw-IVF probe ≡ per-query ivfProbe; hierarchical bulk " +
      "ranking ≡ flat at exhaustive settings") {
    val nCells = 8
    val qids = Seq(1L, 7L, 21L, 42L)
    val searched = corpus.filter(!col("vec_id").isin(qids: _*))
    val built = Similarity.ivfBuild(searched, nCells = nCells)
    val queries = corpus.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q_id"), col("embedding"))

    val bulk = Similarity.ivfProbeBulk(built, queries, "q_id", "vec_id",
        nProbe = 2, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    val seq = qids.sorted.flatMap { q =>
      Similarity.ivfProbe(built,
        corpus.filter(col("vec_id") === q).select("embedding"),
        "vec_id", nProbe = 2, k = 10).collect()
        .map(r => (q, r.getLong(0), r.getDouble(2))).toSeq
    }
    assert(bulk == seq,
      s"bulk != sequential:\n bulk=${bulk.take(5)}\n seq=${seq.take(5)}")

    // hierarchical ranking with nProbeSuper = nSuper considers every
    // cell — bulk results identical to the flat bulk form
    val sq = Similarity.ivfSuperBuild(built, nSuper = 3)
    val hier = Similarity.ivfProbeBulk(built, queries, "q_id", "vec_id",
      nProbe = 2, k = 10, superQ = Some(sq), nProbeSuper = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(hier == bulk,
      "exhaustive hier bulk ranking must equal the flat bulk probe")

    // and the PQ bulk probe takes the same hierarchy
    val cb = graft.ext.Pq.trainedCodebooks(searched, "embedding",
      dim = 64, m = 8, k = 16)
    val encIdx = graft.ext.Pq.ivfPqEncode(built, cb, "vec_id")
    val pqFlat = graft.ext.Pq.ivfPqProbeBulk(encIdx, cb, queries,
      "q_id", "vec_id", nProbe = 2).collect().toSeq
    val pqHier = graft.ext.Pq.ivfPqProbeBulk(encIdx, cb, queries,
      "q_id", "vec_id", nProbe = 2, superQ = Some(sq), nProbeSuper = 3)
      .collect().toSeq
    assert(pqHier == pqFlat,
      "exhaustive hier ranking must equal the flat PQ bulk probe")
  }

  test("tombstone delete: probes skip deleted vectors immediately; " +
      "double-delete is a no-op; compact folds physically") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-del").toString
    val nCells = 8
    val idx = Similarity.ivfBuild(corpus, nCells = nCells)
    Similarity.ivfSave(idx, "ivf_del_t", dir, nCells)
    try {
      val q = corpus.filter(col("vec_id") === 7).select("embedding")
      val loaded = Similarity.ivfLoad(spark, "ivf_del_t", dir)
      val top = Similarity.ivfProbe(loaded, q, "vec_id", k = 1).collect()
      assert(top(0).getAs[Number]("vec_id").longValue() == 7L)
      // delete the query vector itself: the previous top-1 must vanish
      // from a RELOADED index without any rewrite of the assigned table
      val n = Similarity.ivfDelete(
        corpus.filter(col("vec_id") === 7).select("vec_id"), "vec_id",
        "ivf_del_t", dir)
      assert(n == 1L)
      val afterDel = Similarity.ivfLoad(spark, "ivf_del_t", dir)
      val top2 = Similarity.ivfProbe(afterDel, q, "vec_id", k = 10).collect()
      assert(top2.nonEmpty &&
        !top2.exists(_.getAs[Number]("vec_id").longValue() == 7L),
        s"deleted vector still probeable: ${top2.toSeq}")
      assert(afterDel.assigned.count() == corpus.count() - 1)
      // idempotent: same id again → no-op; a NEVER-INDEXED id is
      // skipped too (an out-of-order delete must not stage a tombstone
      // that would block the vector's first ingest)
      assert(Similarity.ivfDelete(
        corpus.filter(col("vec_id") === 7).select("vec_id"), "vec_id",
        "ivf_del_t", dir) == 0L)
      assert(Similarity.ivfDelete(
        spark.range(1).select(lit(999999L).as("vec_id")), "vec_id",
        "ivf_del_t", dir) == 0L)
      // re-appending a tombstoned id pre-compact is refused (the
      // tombstone would hide the new row too)
      intercept[IllegalArgumentException] {
        Similarity.ivfAppendSave(
          Similarity.ivfAssign(afterDel,
            corpus.filter(col("vec_id") === 7), "vec_id"),
          "ivf_del_t", dir, nCells)
      }
      // compact folds the tombstone: physical row drops, deletes clear,
      // probe results unchanged
      val before = Similarity.ivfProbe(afterDel, q, "vec_id").collect().toSeq
      Similarity.ivfCompact(spark, "ivf_del_t", dir, nCells)
      assert(spark.read.parquet(s"$dir/assigned").count()
        == corpus.count() - 1,
        "compaction must remove tombstoned rows from the files")
      assert(!new java.io.File(s"$dir/deletes").exists(),
        "compaction must clear the folded tombstones")
      val reopened = Similarity.ivfLoad(spark, "ivf_del_t", dir)
      assert(Similarity.ivfProbe(reopened, q, "vec_id").collect().toSeq
        == before, "probe results must survive a tombstone-folding compact")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_del_t")
  }

  test("ivfDescribe: metadata health report is accurate and READ-ONLY " +
      "(journal and tombstones untouched by a describe)") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-desc").toString
    val nCells = 8
    val half = corpus.filter(col("vec_id") % 2 === 0)
    val rest = corpus.filter(col("vec_id") % 2 =!= 0)
    Similarity.ivfSave(Similarity.ivfBuild(half, nCells = nCells),
      "ivf_desc_t", dir, nCells)
    try {
      val loaded = Similarity.ivfLoad(spark, "ivf_desc_t", dir)
      Similarity.ivfAppendSave(Similarity.ivfAssign(loaded, rest, "vec_id"),
        "ivf_desc_t", dir, nCells)
      import spark.implicits._
      val victims = Seq(4L).toDF("vec_id")
      assert(Similarity.ivfDelete(victims, "vec_id", "ivf_desc_t", dir) == 1L)
      // stage a streaming-ingest journal the way the sink does, so the
      // report must surface pending-replay state
      val jrnl = new java.io.File(s"$dir/${graft.ext.Dedup.StreamJournal}")
      java.nio.file.Files.writeString(jrnl.toPath, "0 1")

      val d = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d.getAs[Long]("n_cells") == nCells.toLong)
      assert(d.getAs[Int]("dim") == 64)
      assert(d.getAs[Long]("physical_rows") == corpus.count(),
        "physical rows include tombstone-hidden rows")
      assert(d.getAs[Long]("tombstoned_ids") == 1L)
      val files = d.getAs[Int]("data_files")
      assert(files > nCells && files <= 2 * nCells,
        s"save + one append must show rot between 1 and 2 files/cell: $files")
      assert(d.getAs[Double]("files_per_cell") == files.toDouble / nCells)
      assert(d.getAs[Boolean]("stream_journal"), "pending replay not surfaced")
      assert(!d.getAs[Boolean]("auto_hier"), "8 cells is below the hier default")

      val b = Similarity.ivfDescribe(spark, dir, cellBalance = true).collect()(0)
      assert(b.getAs[Long]("occupied_cells") <= nCells.toLong
        && b.getAs[Long]("occupied_cells") > 0)
      assert(b.getAs[Long]("cell_rows_min") <= b.getAs[Long]("cell_rows_max"))
      assert(math.abs(b.getAs[Double]("cell_rows_avg")
          * b.getAs[Long]("occupied_cells") - corpus.count()) < 1e-6,
        "balance stats must roll up to the physical row count")
      assert(b.getAs[Double]("cell_skew") >= 1.0)

      // read-only: both describes left the journal and tombstones in place
      assert(jrnl.exists, "describe must not heal or clear a journal")
      assert(spark.read.parquet(s"$dir/deletes").count() == 1L,
        "describe must not fold tombstones")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_desc_t")
    }
  }

  test("ivfRetrain: quantizer re-fit on live rows under a NEW cell count; " +
      "catalog bucket spec follows; tombstones folded; exhaustive probe exact") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-retrain").toString
    val half = corpus.filter(col("vec_id") % 2 === 0)
    val rest = corpus.filter(col("vec_id") % 2 =!= 0)
    Similarity.ivfSave(Similarity.ivfBuild(half, nCells = 4),
      "ivf_rt_t", dir, 4)
    try {
      val loaded = Similarity.ivfLoad(spark, "ivf_rt_t", dir)
      Similarity.ivfAppendSave(Similarity.ivfAssign(loaded, rest, "vec_id"),
        "ivf_rt_t", dir, 4)
      import spark.implicits._
      assert(Similarity.ivfDelete(Seq(4L).toDF("vec_id"), "vec_id",
        "ivf_rt_t", dir) == 1L)

      val re = Similarity.ivfRetrain(spark, "ivf_rt_t", dir, nCells = 8)

      assert(re.centroids.count() == 8L, "retrained quantizer shape")
      val d = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d.getAs[Long]("n_cells") == 8L)
      assert(d.getAs[Long]("tombstoned_ids") == 0L, "retrain folds tombstones")
      assert(d.getAs[Int]("data_files") <= 8,
        "at most one file per new bucket (empty hash buckets write none)")
      assert(d.getAs[Long]("physical_rows") == corpus.count() - 1,
        "live rows only: the tombstoned id is gone from the files")
      assert(spark.read.parquet(s"$dir/assigned")
        .filter(col("vec_id") === 4).isEmpty)
      val desc = spark.sql("DESCRIBE FORMATTED `ivf_rt_t`")
        .select("col_name", "data_type").collect()
        .map(r => r.getString(0).trim -> r.getString(1).trim).toMap
      assert(desc("Num Buckets").trim.toInt == 8,
        "catalog bucket spec must follow the new modulus")
      // exhaustive probing of the retrained index is EXACT regardless of
      // where KMeans put the new cells: ≡ brute force over live rows
      val q = corpus.filter(col("vec_id") === 7).select("embedding")
      val brute = Similarity.bruteForceTopK(
        corpus.filter(col("vec_id") =!= 4), q, "vec_id").collect().toSeq
      val probed = Similarity.ivfProbe(re, q, "vec_id", nProbe = 8)
        .drop("cell").collect().toSeq
      assert(probed == brute, "exhaustive probe must be exact post-retrain")
      // bucket pruning survives the re-registration (2 of 8 new buckets)
      withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        val plan = Similarity.ivfProbe(re, q, "vec_id")
          .queryExecution.executedPlan.toString
        assert(raw"SelectedBucketsCount:\s*2\s+out of\s+8".r
          .findFirstIn(plan).isDefined,
          s"expected bucket pruning in:\n$plan")
      }
    } finally spark.sql("DROP TABLE IF EXISTS ivf_rt_t")
  }

  test("ivfMaybeRetrain: no fire when balanced; skew measured over LIVE " +
      "rows (tombstoned hot cell does not fire); fires on a live hot " +
      "cell folding tombstones; growth trigger grows the cell count") {
    import org.apache.spark.sql.expressions.Window
    val dir = java.nio.file.Files.createTempDirectory("ivf-mr").toString
    Similarity.ivfSave(Similarity.ivfBuild(corpus, nCells = 4),
      "ivf_mr_t", dir, 4)
    try {
      assert(!Similarity.ivfMaybeRetrain(spark, "ivf_mr_t", dir,
        maxSkew = 2.5), "a freshly KMeans-fit index must not fire")

      // a hot batch: every member of vec 1's cell, re-appended 12x —
      // all land in ONE cell of the original quantizer
      val loaded = Similarity.ivfLoad(spark, "ivf_mr_t", dir)
      // snapshot the member set EAGERLY: `loaded.assigned` is the live
      // catalog table, and a lazy frame would re-evaluate over the
      // mutated index after each append below
      val mem = loaded.assigned
        .filter(col("cell") === loaded.assigned
          .filter(col("vec_id") === 1).select("cell").head.getInt(0))
        .select(col("vec_id"), col("embedding"), col("label"))
        .withColumn("rn", row_number().over(Window.orderBy("vec_id")))
        .localCheckpoint()
      def hotBatch(base: Long) = (0 until 6).map(r => mem.select(
        (col("rn") + lit(base + 10000L * r)).as("vec_id"),
        col("embedding"), col("label"))).reduce(_ union _)

      // batch A appended then fully tombstoned: PHYSICAL skew is heavy,
      // LIVE rows are the balanced original — must NOT fire
      val hotA = hotBatch(100000L)
      Similarity.ivfAppendSave(
        Similarity.ivfAssign(loaded, hotA, "vec_id"), "ivf_mr_t", dir, 4)
      val nHot = hotA.count()
      assert(Similarity.ivfDelete(hotA.select("vec_id"), "vec_id",
        "ivf_mr_t", dir) == nHot)
      assert(!Similarity.ivfMaybeRetrain(spark, "ivf_mr_t", dir,
        maxSkew = 2.5),
        "a hot cell that is entirely tombstones needs a compact, not a re-fit")

      // batch B live: the hot cell is real now — fires, and the retrain
      // folds batch A's tombstones away
      Similarity.ivfAppendSave(
        Similarity.ivfAssign(Similarity.ivfLoad(spark, "ivf_mr_t", dir),
          hotBatch(200000L), "vec_id"), "ivf_mr_t", dir, 4)
      assert(Similarity.ivfMaybeRetrain(spark, "ivf_mr_t", dir,
        maxSkew = 2.5), "a live hot cell must fire")
      val d = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d.getAs[Long]("n_cells") == 4L, "no target: cell count kept")
      assert(d.getAs[Long]("tombstoned_ids") == 0L)
      assert(d.getAs[Long]("physical_rows") == corpus.count() + nHot,
        "live rows only: batch A gone, batch B present")

      // growth trigger: live rows far above target*nCells — fires even
      // balanced, and the quantizer GROWS to ceil(live/target)
      val liveRows = corpus.count() + nHot
      val target = liveRows / 16
      assert(Similarity.ivfMaybeRetrain(spark, "ivf_mr_t", dir,
        maxSkew = 1e9, minOccupiedFrac = 0.0,
        targetRowsPerCell = target), "outgrown quantizer must fire")
      val d2 = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d2.getAs[Long]("n_cells") ==
        (liveRows + target - 1) / target,
        "cell count must grow to ceil(live/target)")
      assert(!Similarity.ivfMaybeRetrain(spark, "ivf_mr_t", dir,
        maxSkew = 1e9, minOccupiedFrac = 0.0,
        targetRowsPerCell = target), "freshly sized: no re-fire")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_mr_t")
  }

  test("ivfRetrain crash window: a swap that landed without its commit " +
      "(staged centroids, stale published frame, no catalog entry) heals on load") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-rcrash").toString
    Similarity.ivfSave(Similarity.ivfBuild(corpus, nCells = 4),
      "ivf_rc_t", dir, 4)
    try {
      import spark.implicits._
      // keep the PRE-retrain centroid frame to play the stale survivor
      val oldCent = spark.read.parquet(s"$dir/centroids")
        .as[(Int, Seq[Double])].collect().toSeq
      Similarity.ivfRetrain(spark, "ivf_rc_t", dir, nCells = 8)
      // reconstruct the worst crash point: new centroids still staged
      // inside the assigned tree, the OLD frame back at the published
      // location, and the catalog entry lost mid-re-registration
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/centroids"),
        new org.apache.hadoop.fs.Path(s"$dir/assigned/_centroids")))
      oldCent.toDF("cell", "cent").coalesce(1).write.parquet(s"$dir/centroids")
      spark.sql("DROP TABLE `ivf_rc_t`")

      val healed = Similarity.ivfLoad(spark, "ivf_rc_t", dir)
      assert(healed.centroids.count() == 8L,
        "load must publish the staged (new) centroids over the stale frame")
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/assigned/_centroids")), "staged frame must be consumed")
      val desc = spark.sql("DESCRIBE FORMATTED `ivf_rc_t`")
        .select("col_name", "data_type").collect()
        .map(r => r.getString(0).trim -> r.getString(1).trim).toMap
      assert(desc("Num Buckets").trim.toInt == 8,
        "load must re-register the catalog under the new modulus")
      val q = corpus.filter(col("vec_id") === 7).select("embedding")
      assert(Similarity.ivfProbe(healed, q, "vec_id", nProbe = 8)
        .drop("cell").collect().toSeq
        == Similarity.bruteForceTopK(corpus, q, "vec_id").collect().toSeq,
        "healed index must probe exactly")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_rc_t")
  }

  test("auto-hier across a retrain: a retrain that crosses the 256-cell " +
      "threshold hands probes the hierarchical ranking by DEFAULT on the " +
      "next load — no caller change; nProbeSuper = 0 opts back to exact " +
      "flat") {
    // synthetic spread-out corpus: 1,200 distinct dim-8 vectors, so the
    // growth re-fit below genuinely lands >256 cells
    // id + 1 keeps the zero vector out: a cosine has no direction for it
    val syn = spark.range(1200).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        j => sin((col("id") + lit(1)) * (j + lit(1)) * lit(0.7305)))
        .as("embedding"))
      .localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("ivf-ah").toString
    Similarity.ivfSave(Similarity.ivfBuild(syn, nCells = 4),
      "ivf_ah_t", dir, 4)
    try {
      assert(Similarity.ivfLoad(spark, "ivf_ah_t", dir).autoSuper.isEmpty,
        "below the threshold probes stay flat")
      val re = Similarity.ivfRetrain(spark, "ivf_ah_t", dir, nCells = 300)
      val d = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d.getAs[Long]("n_cells") > 256L && d.getAs[Boolean]("auto_hier"),
        "the retrained index must cross the threshold for this pin")
      // the handle ivfRetrain returns AND a fresh load both auto-build
      // the hierarchy — the caller re-derives nothing (VERDICT r13 #5)
      assert(re.autoSuper.isDefined, "retrain's own handle defaults to hier")
      val loaded = Similarity.ivfLoad(spark, "ivf_ah_t", dir)
      assert(loaded.autoSuper.isDefined, "reloaded handle defaults to hier")
      val q = syn.filter(col("vec_id") === 7).select("embedding")
      val viaDefault = Similarity.ivfProbe(loaded, q, "vec_id",
        nProbe = 4, k = 5).collect().toSeq
      val viaExplicit = Similarity.ivfProbeHier(loaded,
        loaded.autoSuper.get, q, "vec_id", nProbeSuper = 2, nProbe = 4,
        k = 5).collect().toSeq
      assert(viaDefault == viaExplicit,
        "the default probe must BE the hierarchical ranking")
      // the per-call opt-out (ADVICE r13): nProbeSuper = 0 forces the
      // exact flat ranking — exhaustive, it reproduces brute force
      val nCells = d.getAs[Long]("n_cells").toInt
      assert(Similarity.ivfProbe(loaded, q, "vec_id", nProbe = nCells,
          k = 5, nProbeSuper = 0).drop("cell").collect().toSeq
        == Similarity.bruteForceTopK(syn, q, "vec_id", k = 5)
          .collect().toSeq,
        "nProbeSuper = 0 must recover the exact flat ranking")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_ah_t")
  }

  test("auto-hier at the production cell count: probe-after-RETRAIN at " +
      "4,096 cells ranks hierarchically by default; the flat opt-out " +
      "stays exact") {
    // a 64x64 grid, one distinct vector per target cell (the
    // IVF_ASSIGN_BENCH cell count, dim kept tiny so the suite pays
    // seconds, not a corpus-sized fit). The pre-retrain state is a
    // plain parquet tree — ivfRetrain reads the PATH, so the spec
    // exercises the real flow: KMeans k=4096 re-fit, 4,096-bucket
    // staged save, swap, finalize, load.
    val grid = spark.range(4096).select(col("id").as("vec_id"),
      array((floor(col("id") / 64) + lit(1)).cast("double"),
        (col("id") % 64 + lit(1)).cast("double")).as("embedding"),
      lit(0).as("cell"))
      .localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("ivf-ah4k").toString
    grid.write.parquet(s"$dir/assigned")
    // stale 1-cell quantizer as the pre-retrain published state
    spark.range(1).select(col("id").cast("int").as("cell"),
        array(lit(32.0), lit(32.0)).as("cent"))
      .coalesce(1).write.parquet(s"$dir/centroids")
    try {
      val re = Similarity.ivfRetrain(spark, "ivf_ah4k_t", dir,
        nCells = 4096)
      val d = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d.getAs[Long]("n_cells") > 256L &&
        d.getAs[Boolean]("auto_hier"),
        s"retrained to ${d.getAs[Long]("n_cells")} cells — must cross " +
          "the threshold")
      assert(re.autoSuper.isDefined,
        "retrain's own handle defaults to hier at 4,096 cells")
      val loaded = Similarity.ivfLoad(spark, "ivf_ah4k_t", dir)
      assert(loaded.autoSuper.isDefined,
        "reloaded handle defaults to hier at 4,096 cells")
      // 2081 -> (33, 34): coprime components, so NO other grid point
      // is collinear (cos 1.0) with it — the self-match is unique even
      // if KMeans merges neighboring cells
      val q = grid.filter(col("vec_id") === 2081).select("embedding")
      val hier = Similarity.ivfProbe(loaded, q, "vec_id", nProbe = 4,
        k = 3).collect().toSeq
      assert(hier == Similarity.ivfProbeHier(loaded, loaded.autoSuper.get,
          q, "vec_id", nProbeSuper = 2, nProbe = 4, k = 3).collect().toSeq,
        "default probe at 4,096 cells must BE the hierarchical ranking")
      val flat = Similarity.ivfProbe(loaded, q, "vec_id", nProbe = 4,
        k = 3, nProbeSuper = 0).collect()
      assert(flat.head.getLong(0) == 2081L && flat.head.getDouble(2) == 1.0,
        "flat opt-out: the exact ranking finds the self-match")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_ah4k_t")
  }

  test("centroid-count/bucket-modulus contract (ADVICE r13): ivfSave " +
      "refuses a mismatch; retrain publishes the ACTUAL count as the " +
      "modulus when KMeans returns fewer centers") {
    // 90 rows, only 3 distinct embeddings — KMeans cannot return 8 cells
    // % 3 + 1 keeps the zero vector out (cosine needs a direction)
    val dup = spark.range(90).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(3)),
        j => (col("id") % 3 + lit(1)).cast("double") * (j + lit(1)))
        .as("embedding"))
      .localCheckpoint()
    val degenerate = Similarity.ivfBuild(dup, nCells = 8)
    val actual = degenerate.centroids.count()
    assert(actual < 8L, "fixture must be degenerate for this pin")
    val dir = java.nio.file.Files.createTempDirectory("ivf-mm").toString
    val e = intercept[IllegalArgumentException](
      Similarity.ivfSave(degenerate, "ivf_mm_t", dir, 8))
    assert(e.getMessage.contains("fewer"), e.getMessage)
    // a consistent save at the actual count works, and a RETRAIN asked
    // for 8 cells publishes what KMeans returned — modulus == published
    // centroid count by construction, so bucket pruning stays correct
    Similarity.ivfSave(degenerate, "ivf_mm_t", dir, actual.toInt)
    try {
      Similarity.ivfRetrain(spark, "ivf_mm_t", dir, nCells = 8)
      val d = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d.getAs[Long]("n_cells") < 8L, "KMeans cannot invent cells")
      val desc = spark.sql("DESCRIBE FORMATTED `ivf_mm_t`")
        .select("col_name", "data_type").collect()
        .map(r => r.getString(0).trim -> r.getString(1).trim).toMap
      assert(desc("Num Buckets").trim.toLong == d.getAs[Long]("n_cells"),
        "published centroid count must be the bucket modulus")
      // exhaustive probe stays exact over the honest (smaller) quantizer
      val q = dup.filter(col("vec_id") === 1).select("embedding")
      val healed = Similarity.ivfLoad(spark, "ivf_mm_t", dir)
      assert(Similarity.ivfProbe(healed, q, "vec_id",
          nProbe = d.getAs[Long]("n_cells").toInt, k = 3)
        .drop("cell").collect().toSeq
        == Similarity.bruteForceTopK(dup, q, "vec_id", k = 3)
          .collect().toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS ivf_mm_t")
  }

  test("empty-index guards (ADVICE r13): a fully-tombstoned index " +
      "no-ops ivfMaybeRetrain instead of NPE-ing the maintenance job; " +
      "describe(cellBalance) over an empty assigned frame returns null " +
      "balance columns") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-empty").toString
    val eight = corpus.limit(8).localCheckpoint()
    Similarity.ivfSave(Similarity.ivfBuild(eight, nCells = 2),
      "ivf_eg_t", dir, 2)
    try {
      assert(Similarity.ivfDelete(eight.select("vec_id"), "vec_id",
        "ivf_eg_t", dir) == 8L)
      assert(!Similarity.ivfMaybeRetrain(spark, "ivf_eg_t", dir,
        maxSkew = 1.5, minOccupiedFrac = 1.0, targetRowsPerCell = 1L),
        "zero live rows: nothing to fit — must no-op, not throw")
      // physically empty assigned tree (the post-compact-of-everything
      // shape): balance aggregates have no rows to describe
      val dir2 = java.nio.file.Files.createTempDirectory("ivf-empty2").toString
      spark.read.parquet(s"$dir/assigned").limit(0)
        .write.parquet(s"$dir2/assigned")
      spark.read.parquet(s"$dir/centroids")
        .write.parquet(s"$dir2/centroids")
      val d = Similarity.ivfDescribe(spark, dir2, cellBalance = true)
        .collect()(0)
      assert(d.getAs[Long]("occupied_cells") == 0L)
      assert(d.isNullAt(d.fieldIndex("cell_rows_max")) &&
        d.isNullAt(d.fieldIndex("cell_skew")),
        "empty balance must be honest nulls, not an NPE")
    } finally spark.sql("DROP TABLE IF EXISTS ivf_eg_t")
  }
}
