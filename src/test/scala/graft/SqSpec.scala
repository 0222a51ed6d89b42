package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Similarity, Sq}

/** Scalar quantization ([[Sq]]): code-rule semantics, the
  * reconstruction-error bound, persistence, and the IVF composition
  * over the column-agnostic index-maintenance layer. The
  * train/encode/score path is hash-checked cross-engine by x97_sq_adc;
  * these tests pin what the oracle can't see — the clamp/degenerate
  * edges, the error bound the compression promises, the exact-rerank
  * contract, and that an SQ index rides save/load + bucket-pruned
  * probes unchanged. */
class SqSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def corpus = spark.read.parquet(s"$sf/embeddings.parquet")
  private def queryVec(qid: Long): IndexedSeq[Double] =
    corpus.filter(col("vec_id") === qid)
      .select(transform(col("embedding"), x => x.cast("double")).as("q"))
      .head.getSeq[Double](0).toIndexedSeq

  test("codeOf: half-up rounding, saturating clamp, degenerate dim") {
    import graft.functions.SqEncodeF.codeOf
    assert(codeOf(0.0, 0.0, 1.0, 256) == 0)
    assert(codeOf(1.0, 0.0, 1.0, 256) == 255)
    // 0.5 scales to 127.5 → half-up → 128 (the tie rule both engines
    // share on non-negative values)
    assert(codeOf(0.5, 0.0, 1.0, 256) == 128)
    // the first half-step boundary rounds UP to code 1
    assert(codeOf(0.5 / 255.0, 0.0, 1.0, 256) == 1)
    // out-of-range saturates (append-after-train drift), never wraps
    assert(codeOf(-3.0, 0.0, 1.0, 256) == 0)
    assert(codeOf(42.0, 0.0, 1.0, 256) == 255)
    // zero-spread dimension encodes to 0 (and decodes to lo: step 0)
    assert(codeOf(5.0, 5.0, 5.0, 256) == 0)
    // two-level quantizer degenerates to a sign bit
    assert(codeOf(0.49, 0.0, 1.0, 2) == 0)
    assert(codeOf(0.51, 0.0, 1.0, 2) == 1)
  }

  test("sqTrain: bounds are the exact per-dim min/max, partitioning-" +
      "independent; ragged embeddings fail loudly") {
    val p = Sq.sqTrain(corpus)
    assert(p.dim == 64 && p.levels == 256)
    val p2 = Sq.sqTrain(corpus.repartition(7))
    assert(p == p2, "min/max must not depend on partitioning")
    // spot-check dim 0 against a direct aggregate
    val r = corpus.agg(
      min(element_at(col("embedding"), 1).cast("double")),
      max(element_at(col("embedding"), 1).cast("double"))).head
    assert(p.lo(0) == r.getDouble(0) && p.hi(0) == r.getDouble(1))
    val ragged = corpus.limit(10).select(col("vec_id"),
      when(col("vec_id") % 2 === 0, slice(col("embedding"), 1, 32))
        .otherwise(col("embedding")).as("embedding"))
    val e = intercept[IllegalArgumentException](Sq.sqTrain(ragged))
    assert(e.getMessage.contains("ragged"))
  }

  test("reconstruction error: |x - decode(encode(x))| <= step/2 on " +
      "every dimension of every in-range row (the SQ promise)") {
    val p = Sq.sqTrain(corpus)
    val rows = Sq.sqEncode(corpus, "embedding", p)
      .select(transform(col("embedding"), x => x.cast("double")),
        Sq.sqDecodeCol(col("codes"), p))
      .collect()
    assert(rows.length == corpus.count())
    rows.foreach { r =>
      val x = r.getSeq[Double](0)
      val xh = r.getSeq[Double](1)
      assert(x.length == 64 && xh.length == 64)
      (0 until 64).foreach { i =>
        // half-up rounding puts x within half a step of its code's
        // reconstruction; + 1e-12 for the scale/rescale fp slop
        assert(math.abs(x(i) - xh(i)) <= p.step(i) / 2 + 1e-12,
          s"dim $i: x=${x(i)} xh=${xh(i)} step=${p.step(i)}")
      }
    }
  }

  test("sqTrainQuantile under a heavy tail: one outlier no longer " +
      "taxes every row's resolution — bulk reconstruction error drops " +
      "by orders of magnitude; the outlier itself saturates") {
    // poison dim 0 of ONE row with a value 1e6 — the z-order heavy-tail
    // fixture's device applied to quantization
    val poisoned = corpus.select(col("vec_id"),
      when(col("vec_id") === 3,
        concat(array(lit(1e6f)), slice(col("embedding"), 2, 63)))
        .otherwise(col("embedding")).as("embedding"))
    val pMinMax = Sq.sqTrain(poisoned)
    val pQuant = Sq.sqTrainQuantile(poisoned, lowQ = 0.01, highQ = 0.99)
    // min/max spends the code range spanning the outlier: step(0) is
    // ~1e6/255; quantile bounds stay on the bulk (steps ~the clean
    // corpus's scale)
    assert(pQuant.step(0) < pMinMax.step(0) / 1000,
      s"quantile step ${pQuant.step(0)} vs minmax ${pMinMax.step(0)}")
    // bulk rows: MEAN dim-0 reconstruction error (the max is owned by
    // the deliberately clipped 1% tails under quantile bounds, and by
    // everything under min/max bounds — where the whole bulk collapses
    // to code 0 and the error is each value's distance from lo)
    def dim0Err(p: Sq.SqParams): Double =
      Sq.sqEncode(poisoned.filter(col("vec_id") =!= 3), "embedding", p)
        .select(abs(element_at(col("embedding"), 1).cast("double") -
          element_at(Sq.sqDecodeCol(col("codes"), p), 1)).as("e"))
        .agg(avg("e")).head.getDouble(0)
    val (errMM, errQ) = (dim0Err(pMinMax), dim0Err(pQuant))
    assert(errQ < errMM / 50, s"bulk err: quantile $errQ vs minmax $errMM")
    // the poisoned row saturates at the upper bound instead of breaking
    val out = Sq.sqEncode(poisoned.filter(col("vec_id") === 3),
      "embedding", pQuant).select(element_at(col("codes"), 1)).head.getInt(0)
    assert(out == 255, "out-of-range value must saturate at levels-1")
  }

  test("params: save/load round-trips exactly; recon_norm is the " +
      "reconstruction's own L2 norm") {
    val p = Sq.sqTrain(corpus, levels = 16)
    val dir = java.nio.file.Files.createTempDirectory("sq-params").toString
    Sq.sqParamsSave(spark, p, dir)
    assert(Sq.sqParamsLoad(spark, dir) == p)
    val r = Sq.sqEncode(corpus.limit(20), "embedding", p)
      .select(col("recon_norm"), Sq.sqDecodeCol(col("codes"), p)).collect()
    r.foreach { row =>
      val xh = row.getSeq[Double](1)
      assert(row.getDouble(0) ==
        math.sqrt(xh.foldLeft(0.0)((a, v) => a + v * v)),
        "stored recon_norm must equal the decode's sequential self-fold")
    }
  }

  test("SqAdcF: the fused decode+dot kernel is bit-identical to the " +
      "two-kernel dot(decode(codes), q) form on every corpus row") {
    import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
    val p = Sq.sqTrain(corpus)
    val q = queryVec(0L)
    val qlit = array(q.map(lit(_)): _*)
    val rows = Sq.sqEncode(corpus, "embedding", p)
      .select(
        toCol(graft.functions.SqAdcF(toExpr(col("codes")), p.lo, p.step, q))
          .as("fused"),
        Similarity.dot(Sq.sqDecodeCol(col("codes"), p), qlit)
          .as("twoKernel"))
      .collect()
    assert(rows.length == corpus.count())
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"fused ${r.getDouble(0)} != two-kernel ${r.getDouble(1)}")
    }
  }

  test("sqTopK at 256 levels: near-exact — top-10 ids overlap brute " +
      "force >= 9/10 and the top-1 matches") {
    val p = Sq.sqTrain(corpus)
    val q = queryVec(0L)
    val got = Sq.sqTopK(Sq.sqEncode(corpus.filter(col("vec_id") =!= 0),
      "embedding", p), p, q, "vec_id", k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceTopK(corpus.filter(col("vec_id") =!= 0),
      corpus.filter(col("vec_id") === 0), "vec_id", k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got.head == exact.head, "SQ8 must not miss the top-1 neighbor")
    assert(got.toSet.intersect(exact.toSet).size >= 9,
      s"SQ8 top-10 drifted: got $got vs exact $exact")
  }

  test("rerank: covering candidates (factor spanning the corpus) " +
      "reproduce the exact brute-force top-k bit for bit") {
    val p = Sq.sqTrain(corpus)
    val q = queryVec(0L)
    val full = corpus.filter(col("vec_id") =!= 0)
    val n = full.count().toInt
    val got = Sq.sqTopK(Sq.sqEncode(full, "embedding", p), p, q, "vec_id",
      k = 5, rerankWith = Some(full.select("vec_id", "embedding")),
      rerankFactor = n) // shortlist = whole corpus ⇒ rerank ≡ exact
    val exact = Similarity.bruteForceTopK(full,
      corpus.filter(col("vec_id") === 0), "vec_id", k = 5)
    assert(got.collect().toSeq == exact.collect().toSeq)
  }

  test("IVF-SQ: encoded index rides save/load + bucket-pruned probes; " +
      "exhaustive probe == flat sqTopK; pred filters inside the cells") {
    val full = corpus.filter(col("vec_id") =!= 0)
    val p = Sq.sqTrain(full)
    val nCells = 4
    val index = Similarity.ivfBuild(full, nCells = nCells)
    val dir = java.nio.file.Files.createTempDirectory("sq-ivf").toString
    Similarity.ivfSave(Sq.ivfSqEncode(index, p, "vec_id"),
      "sq_ivf_t", dir, nCells)
    try {
      val loaded = Similarity.ivfLoad(spark, "sq_ivf_t", dir)
      val qdf = corpus.filter(col("vec_id") === 0)
      // exhaustive (nProbe = nCells) probe over the loaded index must
      // equal the flat scorer over the full encoded corpus
      val exhaustive = Sq.ivfSqProbe(loaded, p, qdf, "vec_id",
        nProbe = nCells, k = 10).collect().toSeq
      val flat = Sq.sqTopK(Sq.sqEncode(full, "embedding", p), p,
        queryVec(0L), "vec_id", k = 10).collect().toSeq
      assert(exhaustive == flat)
      // filtered probe: every id satisfies the predicate, and the
      // result equals post-filtering the exhaustive scorer
      val filtered = Sq.ivfSqProbe(loaded, p, qdf, "vec_id",
        nProbe = nCells, k = 10, pred = Some(col("vec_id") % 3 === 1))
        .collect().toSeq
      assert(filtered.nonEmpty && filtered.forall(_.getLong(0) % 3 == 1))
      val flatFiltered = Sq.sqTopK(
        Sq.sqEncode(full.filter(col("vec_id") % 3 === 1), "embedding", p),
        p, queryVec(0L), "vec_id", k = 10).collect().toSeq
      assert(filtered == flatFiltered)
      // narrow probe scans only the probed cells' buckets (the prune
      // is the point of the layout) and still finds in-cell neighbors
      val narrow = Sq.ivfSqProbe(loaded, p, qdf, "vec_id",
        nProbe = 1, k = 5).collect()
      assert(narrow.length == 5)
      // scale evidence (the PqSpec assertion, SQ form): the probe's
      // scan bucket-prunes via the pushed cell IN literal and never
      // reads a raw embedding column — the 3.4× byte win IS the feature
      val plan = Sq.ivfSqProbe(loaded, p, qdf, "vec_id", nProbe = 2)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val pushed = plan.linesIterator
        .filter(_.contains("PushedFilters")).mkString
      assert(raw"In\(cell,".r.findFirstIn(pushed).isDefined,
        s"expected pushed cell IN pruning in:\n$pushed")
      assert(!plan.contains("embedding"),
        "SQ probe plan references the raw embedding column")
      // hierarchical cell ranking plugs into the SQ probe: exhaustive
      // nProbeSuper (= nSuper) must equal the flat ranking exactly
      val sup = Similarity.ivfSuperBuild(loaded, nSuper = 2)
      assert(Sq.ivfSqProbe(loaded, p, qdf, "vec_id", nProbe = 2, k = 5,
          superQ = Some(sup), nProbeSuper = 2).collect().toSeq ==
        Sq.ivfSqProbe(loaded, p, qdf, "vec_id", nProbe = 2, k = 5)
          .collect().toSeq,
        "exhaustive hier ranking must equal the flat SQ probe")
      // bulk ≡ per-query: same ids AND same scores for every query —
      // the decoded view's re-folded norm is bit-identical to the
      // stored recon_norm, so the equivalence is exact, not approximate
      val qIds = Seq(1L, 7L, 13L, 100L)
      val queries = full.filter(col("vec_id").isin(qIds: _*))
        .select(col("vec_id").as("q_id"), col("embedding"))
      val bulk = Sq.ivfSqProbeBulk(loaded, p, queries, "q_id", "vec_id",
        nProbe = 2, k = 5).collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) =>
          q -> rs.map(r => (r.getLong(1), r.getDouble(3))).toSeq }
      qIds.foreach { qid =>
        val per = Sq.ivfSqProbe(loaded, p,
          full.filter(col("vec_id") === qid), "vec_id", nProbe = 2, k = 5)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(bulk(qid) == per,
          s"bulk probe diverged from per-query at q=$qid")
      }
      // bulk two-stage rerank ≡ per-query rerank (the shared-tail
      // contract carried through the decoded view)
      val rrBulk = Sq.ivfSqProbeBulk(loaded, p, queries, "q_id", "vec_id",
          nProbe = 2, k = 5, rerankWith = Some(full), rerankFactor = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
      val rrSeq = qIds.sorted.flatMap { qid =>
        Sq.ivfSqProbe(loaded, p, full.filter(col("vec_id") === qid),
          "vec_id", nProbe = 2, k = 5, rerankWith = Some(full),
          rerankFactor = 3).collect()
          .map(r => (qid, r.getLong(0), r.getDouble(1))).toSeq
      }
      assert(rrBulk == rrSeq, "bulk rerank diverged from per-query")
    } finally spark.sql("DROP TABLE IF EXISTS sq_ivf_t")
  }

  test("ivfSqRetrain: cells re-fit on the decoded view, codes NEVER " +
      "re-encoded, tombstones folded, modulus follows — the compressed " +
      "retrain shares the raw form's whole contract") {
    val dir = java.nio.file.Files.createTempDirectory("sq-retrain").toString
    val half = corpus.filter(col("vec_id") % 2 === 0)
    val rest = corpus.filter(col("vec_id") % 2 =!= 0)
    val p = Sq.sqTrain(corpus)
    Similarity.ivfSave(
      Sq.ivfSqEncode(Similarity.ivfBuild(half, nCells = 4), p, "vec_id"),
      "sq_rt_t", dir, 4)
    try {
      val loaded = Similarity.ivfLoad(spark, "sq_rt_t", dir)
      // append the other half through the raw-assign + encode pipeline
      // (assignment on raw embeddings, the sink's shape), tombstone one
      Similarity.ivfAppendSave(
        Sq.sqEncode(Similarity.ivfAssign(loaded, rest, "vec_id"),
          "embedding", p)
          .select(col("vec_id"), col("cell"), col("codes"),
            col("recon_norm")),
        "sq_rt_t", dir, 4)
      import spark.implicits._
      assert(Similarity.ivfDelete(Seq(4L).toDF("vec_id"), "vec_id",
        "sq_rt_t", dir) == 1L)
      // snapshot payloads pre-retrain: the retrain must carry them
      // through BYTE-IDENTICAL (only `cell` may change)
      val before = spark.read.parquet(s"$dir/assigned")
        .select(col("vec_id").cast("long"), col("codes"), col("recon_norm"))
        .collect().map(r => r.getLong(0) ->
          (r.getSeq[Int](1), r.getDouble(2))).toMap

      // a raw retrain on the compressed layout refuses, pointing here
      val eRaw = intercept[IllegalArgumentException](
        Similarity.ivfRetrain(spark, "sq_rt_t", dir, nCells = 8))
      assert(eRaw.getMessage.contains("ivfSqRetrain"), eRaw.getMessage)

      val re = Sq.ivfSqRetrain(spark, "sq_rt_t", dir, nCells = 8, p = p)

      assert(re.centroids.count() == 8L, "retrained quantizer shape")
      val d = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d.getAs[Long]("n_cells") == 8L)
      assert(d.getAs[Long]("tombstoned_ids") == 0L, "retrain folds tombstones")
      assert(d.getAs[Long]("physical_rows") == corpus.count() - 1,
        "live rows only: the tombstoned id is gone from the files")
      val desc = spark.sql("DESCRIBE FORMATTED `sq_rt_t`")
        .select("col_name", "data_type").collect()
        .map(r => r.getString(0).trim -> r.getString(1).trim).toMap
      assert(desc("Num Buckets").trim.toInt == 8,
        "catalog bucket spec must follow the new modulus")
      val after = spark.read.parquet(s"$dir/assigned")
      assert(!after.columns.contains("embedding"),
        "the fit-only decoded view must not leak into the layout")
      after.select(col("vec_id").cast("long"), col("codes"),
          col("recon_norm")).collect().foreach { r =>
        assert(before(r.getLong(0)) == ((r.getSeq[Int](1), r.getDouble(2))),
          s"payload changed across retrain for id ${r.getLong(0)}")
      }
      // retrained-compressed ≡ retrain-on-raw at the assignment RULE:
      // every row's new cell is the argmin against the new centroids of
      // its DECODED vector — the same self-consistency the raw retrain
      // has (ivfBuild ≡ ivfAssign, pinned above), applied to the only
      // vector view a compressed layout owns. (Exact cell-for-cell ≡ a
      // raw-index retrain is not pinnable: seeded KMeans is partition-
      // deterministic and the two layouts' file sizes differ.)
      val reloaded = Similarity.ivfLoad(spark, "sq_rt_t", dir)
      val decoded = reloaded.assigned
        .withColumn("embedding", Sq.sqDecodeCol(col("codes"), p))
        .select(col("vec_id"), col("embedding"))
      val expect = Similarity.ivfAssign(reloaded, decoded, "vec_id")
        .select(col("vec_id").cast("long"), col("cell").cast("int"))
      val got = reloaded.assigned
        .select(col("vec_id").cast("long"), col("cell").cast("int"))
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        "retrained cells must be the decoded view's argmin assignment")
      // exhaustive probe over the retrained index ≡ the flat SQ scorer
      // over the surviving corpus — exact regardless of the new cells
      val qdf = corpus.filter(col("vec_id") === 0)
      val exhaustive = Sq.ivfSqProbe(reloaded, p, qdf, "vec_id",
        nProbe = 8, k = 10).collect().toSeq
      val flat = Sq.sqTopK(
        Sq.sqEncode(corpus.filter(col("vec_id") =!= 4), "embedding", p),
        p, queryVec(0L), "vec_id", k = 10).collect().toSeq
      assert(exhaustive == flat, "exhaustive probe must be exact post-retrain")

      // the converse guard: ivfSqRetrain on a RAW layout refuses
      val rawDir = java.nio.file.Files.createTempDirectory("sq-rt-raw").toString
      Similarity.ivfSave(Similarity.ivfBuild(half, nCells = 4),
        "sq_rt_raw_t", rawDir, 4)
      try {
        val eSq = intercept[IllegalArgumentException](
          Sq.ivfSqRetrain(spark, "sq_rt_raw_t", rawDir, nCells = 8, p = p))
        assert(eSq.getMessage.contains("ivfRetrain"), eSq.getMessage)
      } finally spark.sql("DROP TABLE IF EXISTS sq_rt_raw_t")
    } finally spark.sql("DROP TABLE IF EXISTS sq_rt_t")
  }

  test("ivfSqMaybeRetrain: shared trigger, compressed retrain form — " +
      "growth fires and the quantizer grows; freshly sized: no re-fire") {
    val dir = java.nio.file.Files.createTempDirectory("sq-mr").toString
    val p = Sq.sqTrain(corpus)
    Similarity.ivfSave(
      Sq.ivfSqEncode(Similarity.ivfBuild(corpus, nCells = 2), p, "vec_id"),
      "sq_mr_t", dir, 2)
    try {
      val live = corpus.count()
      val target = live / 8
      assert(Sq.ivfSqMaybeRetrain(spark, "sq_mr_t", dir, p,
        maxSkew = 1e9, minOccupiedFrac = 0.0,
        targetRowsPerCell = target), "outgrown quantizer must fire")
      val d = Similarity.ivfDescribe(spark, dir).collect()(0)
      assert(d.getAs[Long]("n_cells") == (live + target - 1) / target,
        "cell count must grow to ceil(live/target)")
      assert(!Sq.ivfSqMaybeRetrain(spark, "sq_mr_t", dir, p,
        maxSkew = 1e9, minOccupiedFrac = 0.0,
        targetRowsPerCell = target), "freshly sized: no re-fire")
    } finally spark.sql("DROP TABLE IF EXISTS sq_mr_t")
  }

  test("sqSaturation / sqDescribe / sqSaturationExceeded: the clamp-" +
      "saturation drift signal — baseline ~2/n per dim on min/max " +
      "bounds, a planted out-of-bounds append lights up, the hook fires") {
    val p = Sq.sqTrain(corpus)
    val n = corpus.count()
    val enc = Sq.sqEncode(corpus, "embedding", p)
    val base = Sq.sqSaturation(enc, p.levels).collect()
    assert(base.length == 64, "one row per dimension")
    base.foreach { r =>
      assert(r.getLong(1) == n, "per-dim sample count is the row count")
      // min/max bounds put the trained extremes AT the clamp: >= 1 row
      // at each end, and the whole-dim rate stays a small fraction
      assert(r.getLong(2) >= 1L && r.getLong(3) >= 1L,
        s"dim ${r.getInt(0)}: trained extremes must sit at the clamp")
      assert(r.getAs[Int]("c_max") == p.levels - 1,
        "min/max training puts the max at the top code")
      assert(r.getAs[Double]("sat_rate") < 0.1,
        s"dim ${r.getInt(0)}: baseline saturation should be marginal")
    }

    // plant drift: 10% extra rows, embeddings scaled 10x — far outside
    // the trained bounds on any dim with real spread, saturating a mix
    // of both ends
    val outliers = corpus.limit((n / 10).toInt)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(10.0f)).as("embedding"))
    val drifted = Sq.sqEncode(corpus.select("vec_id", "embedding")
      .union(outliers), "embedding", p)
    val sat = Sq.sqSaturation(drifted, p.levels).collect()
    val worst = sat.map(_.getAs[Double]("sat_rate")).max
    assert(worst >= 0.05,
      s"planted 10% out-of-bounds rows must move the rate, got $worst")

    // persisted-index form: save the drifted frame as an IVF-SQ index,
    // describe it, and check the threshold hook's verdicts both ways
    val dir = java.nio.file.Files.createTempDirectory("sq-sat").toString
    val raw = corpus.select("vec_id", "embedding").union(outliers)
    Similarity.ivfSave(
      Sq.ivfSqEncode(Similarity.ivfBuild(raw, nCells = 4), p, "vec_id"),
      "sq_sat_t", dir, 4)
    try {
      val d = Sq.sqDescribe(spark, dir, p.levels).collect()(0)
      assert(d.getAs[Long]("rows_sampled") == raw.count())
      assert(d.getAs[Int]("dim") == 64)
      val overall = d.getAs[Double]("sat_rate")
      assert(overall > 0.0 && math.abs(overall -
        (d.getAs[Double]("sat_lo_rate") + d.getAs[Double]("sat_hi_rate")))
        < 1e-12)
      assert(d.getAs[Double]("max_dim_sat_rate") >= overall,
        "the worst dimension bounds the average from above")
      assert(Sq.sqSaturationExceeded(spark, dir, p.levels,
        maxSatRate = 0.01, maxDimSatRate = 0.05),
        "planted drift past both thresholds must fire")
      assert(!Sq.sqSaturationExceeded(spark, dir, p.levels,
        maxSatRate = 0.5, maxDimSatRate = 0.99),
        "lenient thresholds must not fire")
      // per-dim trigger: a corpus-wide threshold the average passes can
      // still fire on the worst dimension alone
      assert(Sq.sqSaturationExceeded(spark, dir, p.levels,
        maxSatRate = 1.0,
        maxDimSatRate = d.getAs[Double]("max_dim_sat_rate") / 2))
      // tombstone fold (r15, the pqDescribe rule): deleting the planted
      // outliers silences the alarm WITHOUT a compact — deleted vectors
      // must not keep firing a monitoring job
      Similarity.ivfDelete(outliers.select("vec_id"), "vec_id",
        "sq_sat_t", dir)
      val dLive = Sq.sqDescribe(spark, dir, p.levels).collect()(0)
      assert(dLive.getAs[Long]("rows_sampled") == n,
        "tombstoned rows must fold out of the describe scan")
      assert(dLive.getAs[Double]("sat_rate") < d.getAs[Double]("sat_rate"),
        "folding the drifted rows must drop the rate toward baseline")
      assert(!Sq.sqSaturationExceeded(spark, dir, p.levels,
        maxSatRate = 0.05, maxDimSatRate = 0.2),
        "with the drifted rows tombstoned, the live index is healthy")
    } finally spark.sql("DROP TABLE IF EXISTS sq_sat_t")

    // empty index: honest null row, no NPE in a monitoring call
    val emptyDir = java.nio.file.Files.createTempDirectory("sq-sat0").toString
    enc.limit(0).select("vec_id", "codes", "recon_norm")
      .write.parquet(s"$emptyDir/assigned")
    val e = Sq.sqDescribe(spark, emptyDir, p.levels).collect()(0)
    assert(e.getAs[Long]("rows_sampled") == 0L && e.isNullAt(
      e.fieldIndex("sat_rate")))
  }

  test("saturation with params: degenerate dims are masked (no eternal " +
      "false alarm), levels come from the params, and a claimed level " +
      "count the codes don't fit refuses loudly") {
    // plant ONE constant dimension — the zero-padded-feature shape
    val const = corpus.select(col("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, lit(1.5f)).otherwise(x)).as("embedding"))
    val p = Sq.sqTrain(const)
    assert(p.step(0) == 0.0, "fixture: dim 0 must be degenerate")
    val dir = java.nio.file.Files.createTempDirectory("sq-degen").toString
    Sq.ivfSqSave(Sq.ivfSqEncode(Similarity.ivfBuild(const, nCells = 2),
      p, "vec_id"), p, "sq_dg_t", dir, 2)
    try {
      // WITHOUT params: dim 0 encodes to 0 forever -> 100% lo-sat,
      // which the naive hook reads as permanent drift
      assert(Sq.sqSaturationExceeded(spark, dir, p.levels),
        "naive (no-params) monitoring false-fires on a constant dim")
      // WITH params: the degenerate dim is masked and reported, the
      // healthy remainder stays under the default thresholds
      val d = Sq.sqDescribe(spark, dir, params = Some(p)).collect()(0)
      assert(d.getAs[Int]("degenerate_dims") == 1)
      assert(d.getAs[Int]("dim") == 63,
        "rates must roll up over the non-degenerate dims only")
      assert(!Sq.sqSaturationExceeded(spark, dir, params = Some(p)),
        "params-aware monitoring must not false-fire on degeneracy")
      // claimed levels must fit the codes: an SQ8 index monitored as
      // SQ4 would silently zero the hi-saturation signal — refuse
      val eLv = intercept[IllegalArgumentException](
        Sq.sqDescribe(spark, dir, levels = 16))
      assert(eLv.getMessage.contains("levels"), eLv.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sq_dg_t")
  }

  test("compressed-layout cross-guards: SQ params against PQ-wide codes " +
      "refuse everywhere the mixup could corrupt (batch retrain, armed " +
      "sink); PQ retrain refuses a duplicate-id raw frame") {
    import graft.ext.Pq
    val p = Sq.sqTrain(corpus)
    val cb = Pq.trainedCodebooks(corpus, "embedding", dim = 64, m = 8, k = 16)
    val dir = java.nio.file.Files.createTempDirectory("sq-cross").toString
    // a PQ-encoded index: codes are m=8 wide, not dim=64
    Pq.ivfPqSave(Pq.ivfPqEncode(Similarity.ivfBuild(corpus, nCells = 4),
      cb, "vec_id"), cb, "sq_cx_t", dir, 4)
    try {
      val eRt = intercept[IllegalArgumentException](
        Sq.ivfSqRetrain(spark, "sq_cx_t", dir, nCells = 8, p = p))
      assert(eRt.getMessage.contains("width"), eRt.getMessage)
      val sink = graft.streaming.IndexIngest.ivfSink("vec_id", "embedding",
        "sq_cx_t", dir, 4, encode = df => Sq.sqEncode(df, "embedding", p)
          .select(col("vec_id"), col("cell"), col("codes"),
            col("recon_norm")),
        retrainRowsPerCell = 1000000L, sqParams = Some(p))
      val eSink = intercept[IllegalArgumentException](
        sink(corpus.limit(3).toDF(), 0L))
      assert(eSink.getMessage.contains("width"), eSink.getMessage)
      // empty-at-first-load (ADVICE r14): a fully-TOMBSTONED PQ index
      // has an empty LIVE view — the one state the live probe cannot
      // see — but its files still tell the m-wide layout, so the armed
      // sink must STILL fail at first load (the probe runs on the
      // physical frame), before any mixed-width rows could land
      Similarity.ivfDelete(corpus.select("vec_id"), "vec_id",
        "sq_cx_t", dir)
      assert(Similarity.ivfLoad(spark, "sq_cx_t", dir)
        .assigned.isEmpty, "live view must be empty after the delete")
      val sink2 = graft.streaming.IndexIngest.ivfSink("vec_id",
        "embedding", "sq_cx_t", dir, 4,
        encode = df => Sq.sqEncode(df, "embedding", p)
          .select(col("vec_id"), col("cell"), col("codes"),
            col("recon_norm")),
        retrainRowsPerCell = 1000000L, sqParams = Some(p))
      val eSink2 = intercept[IllegalArgumentException](
        sink2(corpus.limit(3).toDF(), 0L))
      assert(eSink2.getMessage.contains("width"), eSink2.getMessage)
      // and the keyed-raw contract: duplicates would multiply rows
      val dup = corpus.select("vec_id", "embedding")
        .union(corpus.limit(1).select("vec_id", "embedding"))
      val eDup = intercept[IllegalArgumentException](
        Pq.ivfPqRetrain(spark, "sq_cx_t", dir, nCells = 8, raw = dup,
          idCol = "vec_id", cb = cb))
      assert(eDup.getMessage.contains("duplicate"), eDup.getMessage)
      // the SQ->PQ direction: PQ codebooks against dim-wide SQ codes
      // refuse before any re-encode could destroy them
      val sqDir = java.nio.file.Files.createTempDirectory("sq-cx2").toString
      Sq.ivfSqSave(Sq.ivfSqEncode(Similarity.ivfBuild(corpus, nCells = 4),
        p, "vec_id"), p, "sq_cx2_t", sqDir, 4)
      try {
        val ePq = intercept[IllegalArgumentException](
          Pq.ivfPqRetrain(spark, "sq_cx2_t", sqDir, nCells = 8,
            raw = corpus, idCol = "vec_id", cb = cb, residual = true))
        assert(ePq.getMessage.contains("-wide"), ePq.getMessage)
      } finally spark.sql("DROP TABLE IF EXISTS sq_cx2_t")
    } finally spark.sql("DROP TABLE IF EXISTS sq_cx_t")
  }

  test("ivfSqSave: params ride next to the index (the decode key an " +
      "index must not outlive) and survive the retrain swap untouched") {
    val dir = java.nio.file.Files.createTempDirectory("sq-save").toString
    val p = Sq.sqTrain(corpus, levels = 64)
    Sq.ivfSqSave(Sq.ivfSqEncode(Similarity.ivfBuild(corpus, nCells = 4),
      p, "vec_id"), p, "sq_sv_t", dir, 4)
    try {
      // a FRESH consumer reopens index + params from the path alone
      assert(Sq.sqParamsOf(spark, dir) == p)
      val loaded = Similarity.ivfLoad(spark, "sq_sv_t", dir)
      val qdf = corpus.filter(col("vec_id") === 7)
      val top = Sq.ivfSqProbe(loaded, Sq.sqParamsOf(spark, dir), qdf,
        "vec_id", k = 1).collect()
      assert(top.length == 1 &&
        top(0).getAs[Number]("vec_id").longValue() == 7L)
      // the retrain's staged swap replaces assigned+centroids; params
      // are bounds state, deliberately outside it
      Sq.ivfSqRetrain(spark, "sq_sv_t", dir, nCells = 8, p = p)
      assert(Sq.sqParamsOf(spark, dir) == p,
        "params must survive the retrain swap byte-for-byte")
    } finally spark.sql("DROP TABLE IF EXISTS sq_sv_t")
  }

  test("ivfSqRetrain crash window: a swap that landed without its " +
      "commit heals on the next load — the raw retrain's contract, " +
      "pinned on the COMPRESSED layout") {
    val dir = java.nio.file.Files.createTempDirectory("sq-rcrash").toString
    val p = Sq.sqTrain(corpus)
    Similarity.ivfSave(
      Sq.ivfSqEncode(Similarity.ivfBuild(corpus, nCells = 4), p, "vec_id"),
      "sq_rc_t", dir, 4)
    try {
      import spark.implicits._
      val oldCent = spark.read.parquet(s"$dir/centroids")
        .as[(Int, Seq[Double])].collect().toSeq
      Sq.ivfSqRetrain(spark, "sq_rc_t", dir, nCells = 8, p = p)
      // reconstruct the worst crash point: new centroids still staged
      // inside the assigned tree, the OLD frame back at the published
      // location, the catalog entry lost mid-re-registration
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/centroids"),
        new org.apache.hadoop.fs.Path(s"$dir/assigned/_centroids")))
      oldCent.toDF("cell", "cent").coalesce(1).write.parquet(s"$dir/centroids")
      spark.sql("DROP TABLE `sq_rc_t`")

      val healed = Similarity.ivfLoad(spark, "sq_rc_t", dir)
      assert(healed.centroids.count() == 8L,
        "load must publish the staged (new) centroids over the stale frame")
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/assigned/_centroids")), "staged frame must be consumed")
      // the healed compressed index probes exactly at exhaustive nProbe
      val qdf = corpus.filter(col("vec_id") === 0)
      val exhaustive = Sq.ivfSqProbe(healed, p, qdf, "vec_id",
        nProbe = 8, k = 10).collect().toSeq
      val flat = Sq.sqTopK(Sq.sqEncode(corpus, "embedding", p), p,
        queryVec(0L), "vec_id", k = 10).collect().toSeq
      assert(exhaustive == flat, "healed compressed index must probe exactly")
    } finally spark.sql("DROP TABLE IF EXISTS sq_rc_t")
  }

  test("sqReencodeIndex: the bounds-drift remedy (VERDICT r14 #4) — " +
      "planted out-of-bounds appends fire the hook, the raw-access " +
      "re-encode restores baseline saturation with params swapped " +
      "alongside, probes exact throughout; guards refuse raw/PQ/" +
      "uncovering inputs") {
    val dir = java.nio.file.Files.createTempDirectory("sq-reenc").toString
    val p0 = Sq.sqTrain(corpus)
    Sq.ivfSqSave(
      Sq.ivfSqEncode(Similarity.ivfBuild(corpus, nCells = 4), p0, "vec_id"),
      p0, "sq_re_t", dir, 4)
    try {
      // planted drift: 20% extra rows scaled 10× appended through the
      // OLD bounds — they saturate at the clamp (x99's drift shape)
      val outliers = corpus.limit((corpus.count() / 5).toInt)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(10.0f)).as("embedding"))
      val loaded = Similarity.ivfLoad(spark, "sq_re_t", dir)
      Similarity.ivfAppendSave(
        Sq.sqEncode(Similarity.ivfAssign(loaded, outliers, "vec_id"),
            "embedding", p0)
          .select(col("vec_id"), col("cell"), col("codes"),
            col("recon_norm")),
        "sq_re_t", dir, 4)
      spark.catalog.refreshTable("sq_re_t")
      assert(Sq.sqSaturationExceeded(spark, dir, params = Some(p0),
        maxSatRate = 0.01, maxDimSatRate = 0.05),
        "planted out-of-bounds appends must fire the hook")

      // the unattended policy wrapper: reads its own persisted params,
      // fires the re-encode, and a second call no-ops (the
      // maybe-retrain cadence contract)
      val rawAll = corpus.select("vec_id", "embedding").unionByName(outliers)
      // thresholds 0.05/0.2 are ABOVE this corpus's clamp-bucket floor
      // (the post-refit assert below measures exactly that), so the
      // r16 convergence guard passes and the re-encode proceeds; the
      // refusal branch is pinned by the planted-floor test below
      val fired = Sq.ivfSqMaybeReencode(spark, "sq_re_t", dir,
        raw = rawAll, idCol = "vec_id",
        maxSatRate = 0.05, maxDimSatRate = 0.2)
      assert(fired.nonEmpty, "saturation past thresholds must fire")
      assert(Sq.ivfSqMaybeReencode(spark, "sq_re_t", dir,
        raw = rawAll, idCol = "vec_id",
        maxSatRate = 0.05, maxDimSatRate = 0.2).isEmpty,
        "freshly re-encoded: no re-fire")
      // quantile bounds clip their tails BY DESIGN — thresholds at or
      // below the design saturation would re-fire (and rewrite the
      // index) every cycle; the wrapper refuses the misconfiguration
      // (review r15)
      val eQ = intercept[IllegalArgumentException](
        Sq.ivfSqMaybeReencode(spark, "sq_re_t", dir,
          raw = rawAll, idCol = "vec_id",
          maxSatRate = 0.05, maxDimSatRate = 0.2,
          quantile = Some((0.05, 0.95))))
      assert(eQ.getMessage.contains("re-fires"), eQ.getMessage)

      // the one-call remedy itself, exercised directly: re-train bounds
      // on the raw live corpus, re-encode, staged swap (idempotent over
      // the wrapper's run — same corpus, same fit)
      val (re, pNew) = Sq.sqReencodeIndex(spark, "sq_re_t", dir,
        nCells = 4, raw = rawAll, idCol = "vec_id")
      assert(pNew == fired.get,
        "same raw corpus, same deterministic fit — wrapper ≡ direct call")
      assert(pNew != p0, "bounds must actually re-train")
      // min/max over the same rows is order-independent and exact, so
      // the published params ARE the direct fit on the raw corpus
      assert(pNew == Sq.sqTrain(rawAll))
      assert(Sq.sqParamsOf(spark, dir) == pNew,
        "the staged swap must publish the new params alongside the codes")
      assert(re.centroids.count() == 4L)

      // saturation back to the min/max baseline: the re-encoded index's
      // per-dim frame EQUALS a fresh encode under the new params
      // (deterministic end to end), and the hook stops firing
      assert(!Sq.sqSaturationExceeded(spark, dir, params = Some(pNew),
        maxSatRate = 0.05, maxDimSatRate = 0.2),
        "re-encode must restore baseline saturation")
      val after = Sq.sqSaturation(
        spark.read.parquet(s"$dir/assigned"), pNew.levels)
        .collect().map(_.toSeq).toSet
      val fresh = Sq.sqSaturation(
        Sq.sqEncode(rawAll, "embedding", pNew), pNew.levels)
        .collect().map(_.toSeq).toSet
      assert(after == fresh,
        "re-encoded codes must match a fresh encode under the new params")

      // probes exact throughout: exhaustive probe over the re-encoded
      // index == the flat scorer on a fresh encode with the new params
      val qdf = corpus.filter(col("vec_id") === 1)
      val exhaustive = Sq.ivfSqProbe(re, pNew, qdf, "vec_id",
        nProbe = 4, k = 10).collect().toSeq
      val flat = Sq.sqTopK(Sq.sqEncode(rawAll, "embedding", pNew), pNew,
        queryVec(1L), "vec_id", k = 10).collect().toSeq
      assert(exhaustive == flat, "re-encoded index must probe exactly")

      // coverage guard: a raw frame missing live ids refuses
      val eCov = intercept[IllegalArgumentException](
        Sq.sqReencodeIndex(spark, "sq_re_t", dir, nCells = 4,
          raw = rawAll.filter(col("vec_id") < 100), idCol = "vec_id"))
      assert(eCov.getMessage.contains("missing"), eCov.getMessage)

      // quantile form: heavy-tail bounds — strictly inside the min/max
      // fit on spread dims, and the clipped tails saturate BY DESIGN
      // (higher baseline rate than the min/max form's ~2/n)
      val (_, pQ) = Sq.sqReencodeIndex(spark, "sq_re_t", dir,
        nCells = 4, raw = rawAll, idCol = "vec_id",
        quantile = Some((0.05, 0.95)))
      assert(Sq.sqParamsOf(spark, dir) == pQ)
      val inside = pQ.lo.indices.count(i =>
        pQ.lo(i) > pNew.lo(i) && pQ.hi(i) < pNew.hi(i))
      assert(inside > 32,
        s"middle-90% bounds must sit inside min/max on most dims: $inside/64")
      val satQ = Sq.sqDescribe(spark, dir, params = Some(pQ)).head
        .getAs[Double]("sat_rate")
      assert(satQ > 0.05,
        s"~10% clipped tails must read as saturation, got $satQ")
    } finally spark.sql("DROP TABLE IF EXISTS sq_re_t")

    // raw-layout guard: nothing to re-encode
    val rawDir = java.nio.file.Files.createTempDirectory("sq-re-raw").toString
    Similarity.ivfSave(Similarity.ivfBuild(corpus, nCells = 4),
      "sq_re_raw_t", rawDir, 4)
    try {
      val eRaw = intercept[IllegalArgumentException](
        Sq.sqReencodeIndex(spark, "sq_re_raw_t", rawDir, nCells = 4,
          raw = corpus.select("vec_id", "embedding"), idCol = "vec_id"))
      assert(eRaw.getMessage.contains("ivfRetrain"), eRaw.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sq_re_raw_t")

    // PQ-layout guard: m-wide codes are not an SQ layout of this corpus
    val pqDir = java.nio.file.Files.createTempDirectory("sq-re-pq").toString
    val cb = graft.ext.Pq.trainedCodebooks(corpus, "embedding",
      dim = 64, m = 8, k = 16)
    graft.ext.Pq.ivfPqSave(
      graft.ext.Pq.ivfPqEncode(Similarity.ivfBuild(corpus, nCells = 4),
        cb, "vec_id"), cb, "sq_re_pq_t", pqDir, 4)
    try {
      val ePq = intercept[IllegalArgumentException](
        Sq.sqReencodeIndex(spark, "sq_re_pq_t", pqDir, nCells = 4,
          raw = corpus.select("vec_id", "embedding"), idCol = "vec_id"))
      assert(ePq.getMessage.contains("m-wide"), ePq.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS sq_re_pq_t")
  }

  test("ivfSqMaybeReencode: a corpus whose clamp-bucket floor sits " +
      "above the firing thresholds is REFUSED before the staged swap " +
      "(review r16) — no re-encode can converge, so proceeding would " +
      "rewrite the index every cycle") {
    import spark.implicits._
    // binary ±1 embeddings: under ANY fresh min/max fit every value
    // sits AT a bound, so the post-re-encode saturation floor is
    // exactly 1.0 — above every sane threshold
    val bin = (0L until 64L).map(i =>
        (i, IndexedSeq.fill(8)(if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val p0 = Sq.sqTrain(bin)
    val dir = java.nio.file.Files.createTempDirectory("sq-floor").toString
    Sq.ivfSqSave(
      Sq.ivfSqEncode(Similarity.ivfBuild(bin, nCells = 2), p0, "vec_id"),
      p0, "sq_floor_t", dir, 2)
    try {
      val e = intercept[IllegalArgumentException](
        Sq.ivfSqMaybeReencode(spark, "sq_floor_t", dir,
          raw = bin, idCol = "vec_id",
          maxSatRate = 0.5, maxDimSatRate = 0.5))
      assert(e.getMessage.contains("cannot converge"), e.getMessage)
      assert(Sq.sqParamsOf(spark, dir) == p0,
        "a refused re-encode must leave the index untouched")
    } finally spark.sql("DROP TABLE IF EXISTS sq_floor_t")
  }
}
