package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}

/** IVF-PQ measurement (the x90/PqSpec capability's honest numbers):
  * index bytes, probe wall-clock, and recall@10 for the compressed ADC
  * path vs the raw-embedding IVF probe on the SAME corpus, cells and
  * queries — plus the trained-vs-deterministic codebook recall gap and
  * the rerank-factor curve.
  *
  * Corpus: the sf embeddings replicated `reps`× with a deterministic
  * per-replica sinusoidal perturbation (no RNG — reruns bit-stable).
  * Small perturbations cluster replicas around their originals, which
  * is the clustered shape real embedding corpora have (and the shape
  * PQ/IVF exploit); the raw sf corpus alone is i.i.d.-random — PQ's
  * worst case, carried in the output as the `unclustered_` fields for
  * honesty.
  *
  * Usage: runMain graft.tools.PqBench [sfDir] [reps] [nQueries]
  */
object PqBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 50
    val nQ = if (args.length > 2) args(2).toInt else 20
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    val maxId = base.agg(max("vec_id")).head.getLong(0) + 1
    val corpus = base.crossJoin(
        spark.range(reps).select(col("id").cast("int").as("rep")))
      .select(
        (col("vec_id") + col("rep") * maxId).as("vec_id"),
        transform(col("embedding"),
          (x, i) => (x.cast("double") +
            sin(col("vec_id") * 131 + col("rep") * 17 + i) * 0.05)
            .cast("float")).as("embedding"))
      .cache()
    val n = corpus.count()
    val dim = 64
    val nCells = 16

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(p: String): Long = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    }
    def ids(df: DataFrame): Set[Long] =
      df.select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet

    // queries: every (n/nQ)-th original vector, searched corpus excludes them
    val qIds = (0 until nQ).map(_.toLong * 7L)
    val searched = corpus.filter(!col("vec_id").isin(qIds: _*)).cache()
    searched.count()
    def queryDf(q: Long): DataFrame =
      corpus.filter(col("vec_id") === q).select("embedding")

    val truth: Map[Long, Set[Long]] = qIds.map { q =>
      q -> ids(Similarity.bruteForceTopK(searched, queryDf(q), "vec_id"))
    }.toMap
    def recallOf(top: Map[Long, Set[Long]]): Double =
      qIds.map(q => truth(q).intersect(top(q)).size / 10.0).sum / qIds.length

    // one coarse quantizer + one codebook set, shared by every variant
    val cbTrained = Pq.trainedCodebooks(
      corpus.sample(withReplacement = false, math.min(1.0, 20000.0 / n),
        seed = 42), "embedding", dim, m = 8, k = 16)
    val cbDet = Pq.deterministicCodebooks(dim, m = 8, k = 16)
    val (built, buildSec) = time {
      val idx = Similarity.ivfBuild(searched, nCells = nCells)
      idx.assigned.cache().count(); idx
    }

    // persisted footprint: raw vs PQ-encoded assigned table
    val tmp = java.nio.file.Files.createTempDirectory("pqbench").toString
    Similarity.ivfSave(built, "pqb_raw", s"$tmp/raw", nCells)
    Similarity.ivfSave(
      Pq.ivfPqEncode(built, cbTrained, "vec_id"), "pqb_pq", s"$tmp/pq", nCells)
    val rawBytes = dirBytes(s"$tmp/raw/assigned")
    val pqBytes = dirBytes(s"$tmp/pq/assigned")

    val rawIdx = Similarity.ivfLoad(spark, "pqb_raw", s"$tmp/raw")
    val pqIdx = Similarity.ivfLoad(spark, "pqb_pq", s"$tmp/pq")

    def probeAll(f: Long => DataFrame): (Map[Long, Set[Long]], Double) =
      time { qIds.map(q => q -> ids(f(q))).toMap }

    val (exactTop, exactSec) = probeAll(q =>
      Similarity.ivfProbe(rawIdx, queryDf(q), "vec_id", nProbe = 2))
    val (adcTop, adcSec) = probeAll(q =>
      Pq.ivfPqProbe(pqIdx, cbTrained, queryDf(q), "vec_id", nProbe = 2))
    val (rrTop, rrSec) = probeAll(q =>
      Pq.ivfPqProbe(pqIdx, cbTrained, queryDf(q), "vec_id", nProbe = 2,
        rerankWith = Some(searched), rerankFactor = 4))

    // rerank-factor curve (ADC candidates are nested prefixes — recall
    // is monotone; the curve shows where it saturates)
    val factorCurve = Seq(2, 4, 8, 16).map { f =>
      val (top, sec) = probeAll(q =>
        Pq.ivfPqProbe(pqIdx, cbTrained, queryDf(q), "vec_id", nProbe = 2,
          rerankWith = Some(searched), rerankFactor = f))
      f"""{"factor":$f,"recall":${recallOf(top)}%.3f,"sec":$sec%.2f}"""
    }

    // trained-vs-deterministic codebooks on the UNCLUSTERED raw sf
    // corpus (PQ's worst case — reported for honesty, full-scan ADC)
    val rawSearched = base.filter(col("vec_id") =!= 0)
    val rawTruth = ids(Similarity.bruteForceTopK(rawSearched,
      base.filter(col("vec_id") === 0).select("embedding"), "vec_id"))
    val rawQ = base.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")).as("q"))
      .head.getSeq[Double](0).toIndexedSeq
    def rawRecall(cb: Pq.PqCodebooks): Double = {
      val top = ids(Pq.pqTopK(Pq.pqEncode(rawSearched, "embedding", cb),
        cb, rawQ, "vec_id", k = 10, rerankWith = Some(rawSearched),
        rerankFactor = 4))
      rawTruth.intersect(top).size / 10.0
    }
    val cbTrainedRaw = Pq.trainedCodebooks(rawSearched, "embedding", dim,
      m = 8, k = 16)

    // residual encoding (r12 — the FAISS IVFADC form): same (m, k)
    // budget, codes quantize x − cent(cell). Report ADC recall and the
    // rerank point against the raw-PQ numbers above, plus index bytes
    // (expected ≈ equal — the schema is identical).
    val cbRes = Pq.trainedResidualCodebooks(
      built.assigned.sample(withReplacement = false,
        math.min(1.0, 20000.0 / n), seed = 42),
      "embedding", built, dim, m = 8, k = 16)
    val resIdx = Pq.ivfPqEncodeResidual(built, cbRes, "vec_id")
    Similarity.ivfSave(resIdx, "pqb_res", s"$tmp/res", nCells)
    val resBytes = dirBytes(s"$tmp/res/assigned")
    val resLoaded = Similarity.ivfLoad(spark, "pqb_res", s"$tmp/res")
    val (resTop, resSec) = probeAll(q =>
      Pq.ivfPqProbeResidual(resLoaded, cbRes, queryDf(q), "vec_id",
        nProbe = 2))
    val (resRrTop, resRrSec) = probeAll(q =>
      Pq.ivfPqProbeResidual(resLoaded, cbRes, queryDf(q), "vec_id",
        nProbe = 2, rerankWith = Some(searched), rerankFactor = 4))

    // bulk ADC probe race (VERDICT r11 #3): a 100-query retrieval
    // workload — sequential per-query driver-LUT probes vs ONE
    // distributed bulk pass. Results must agree row-for-row (the
    // PqSpec equivalence, re-asserted here on the bench corpus).
    // candidate ids filtered through the corpus FIRST (ADVICE r12): a
    // corpus lacking any hard-coded id would abort the sequential side
    // on ivfPqProbe's 'empty query frame' require
    val bulkCandidates = (0 until 100).map(i => i.toLong * 3L + 1L)
    val bulkQueries = corpus.filter(col("vec_id").isin(bulkCandidates: _*))
      .select(col("vec_id").as("q_id"), col("embedding")).cache()
    val bulkIds = bulkQueries.select("q_id").collect()
      .map(_.getLong(0)).sorted.toIndexedSeq
    val nBulkQ = bulkIds.length.toLong
    val (seqTop, seqSec) = time {
      bulkIds.map { q =>
        q -> ids(Pq.ivfPqProbe(pqIdx, cbTrained,
          corpus.filter(col("vec_id") === q).select("embedding"),
          "vec_id", nProbe = 2))
      }.toMap
    }
    val (bulkRows, bulkSec) = time {
      Pq.ivfPqProbeBulk(pqIdx, cbTrained, bulkQueries, "q_id", "vec_id",
        nProbe = 2).collect()
    }
    val bulkTop = bulkRows.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val bulkAgree = bulkIds.count(q =>
      bulkTop.getOrElse(q, Set.empty) == seqTop(q)).toDouble / bulkIds.size

    // ---- clustered fixture (VERDICT r12 #4): a corpus where residual
    // encoding MUST win, so the pqEncodeResidual recall claim is backed
    // by a measured number. 16 well-separated deterministic centers
    // (magnitude 10) + small intra-cluster noise (0.3): raw vectors'
    // variance is dominated by the center offsets, so plain PQ spends
    // its whole (m, k) budget spanning centers and cannot resolve
    // within-cluster neighbors; residuals remove the centers and the
    // same budget quantizes the 0.3-scale noise. Same m/k/nProbe as the
    // main fixture; no RNG — sinusoidal, reruns bit-stable.
    val nClu = 50000L
    val cluCorpus = spark.range(nClu).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (sin((col("id") % 16) * 37 + i * 13) * 10.0 +
            sin(col("id") * 131 + i * 7) * 0.3).cast("float"))
          .as("embedding"))
      .cache()
    cluCorpus.count()
    val cluQIds = (0 until nQ).map(i => i.toLong * 41L + 1L)
    val cluSearched = cluCorpus.filter(!col("vec_id").isin(cluQIds: _*))
      .cache()
    cluSearched.count()
    def cluQueryDf(q: Long): DataFrame =
      cluCorpus.filter(col("vec_id") === q).select("embedding")
    val cluTruth: Map[Long, Set[Long]] = cluQIds.map { q =>
      q -> ids(Similarity.bruteForceTopK(cluSearched, cluQueryDf(q),
        "vec_id"))
    }.toMap
    def cluRecallOf(top: Map[Long, Set[Long]]): Double =
      cluQIds.map(q => cluTruth(q).intersect(top(q)).size / 10.0)
        .sum / cluQIds.length
    val cluBuilt = {
      val idx = Similarity.ivfBuild(cluSearched, nCells = nCells)
      idx.assigned.cache().count(); idx
    }
    val cluSample = cluBuilt.assigned.sample(withReplacement = false,
      math.min(1.0, 20000.0 / nClu), seed = 42)
    val cluCbPlain = Pq.trainedCodebooks(cluSample, "embedding", dim,
      m = 8, k = 16)
    val cluCbRes = Pq.trainedResidualCodebooks(cluSample, "embedding",
      cluBuilt, dim, m = 8, k = 16)
    val cluPlainIdx = Pq.ivfPqEncode(cluBuilt, cluCbPlain, "vec_id")
    val cluResIdx = Pq.ivfPqEncodeResidual(cluBuilt, cluCbRes, "vec_id")
    cluPlainIdx.assigned.cache().count()
    cluResIdx.assigned.cache().count()
    def cluProbeAll(f: Long => DataFrame): Map[Long, Set[Long]] =
      cluQIds.map(q => q -> ids(f(q))).toMap
    val cluPlainTop = cluProbeAll(q =>
      Pq.ivfPqProbe(cluPlainIdx, cluCbPlain, cluQueryDf(q), "vec_id",
        nProbe = 2))
    val cluResTop = cluProbeAll(q =>
      Pq.ivfPqProbeResidual(cluResIdx, cluCbRes, cluQueryDf(q), "vec_id",
        nProbe = 2))

    println(
      f"""{"metric":"pq_bench","sf":"$dir","n_vectors":$n,"n_queries":$nQ,""" +
      f""""n_cells":$nCells,"m":8,"k":16,"build_sec":$buildSec%.2f,""" +
      f""""raw_index_bytes":$rawBytes,"pq_index_bytes":$pqBytes,""" +
      f""""bytes_ratio":${rawBytes.toDouble / pqBytes}%.2f,""" +
      f""""probe_exact_sec":$exactSec%.2f,"probe_adc_sec":$adcSec%.2f,""" +
      f""""probe_rerank4_sec":$rrSec%.2f,""" +
      f""""recall_exact":${recallOf(exactTop)}%.3f,""" +
      f""""recall_adc":${recallOf(adcTop)}%.3f,""" +
      f""""recall_rerank4":${recallOf(rrTop)}%.3f,""" +
      s""""rerank_curve":[${factorCurve.mkString(",")}],""" +
      f""""unclustered_trained_recall":${rawRecall(cbTrainedRaw)}%.3f,""" +
      f""""unclustered_det_recall":${rawRecall(cbDet)}%.3f,""" +
      f""""bulk_n_queries":$nBulkQ,"bulk_seq_sec":$seqSec%.2f,""" +
      f""""bulk_bulk_sec":$bulkSec%.2f,""" +
      f""""bulk_speedup":${seqSec / bulkSec}%.1f,""" +
      f""""bulk_agree":$bulkAgree%.3f,""" +
      f""""residual_index_bytes":$resBytes,""" +
      f""""recall_adc_residual":${recallOf(resTop)}%.3f,""" +
      f""""recall_rerank4_residual":${recallOf(resRrTop)}%.3f,""" +
      f""""probe_adc_residual_sec":$resSec%.2f,""" +
      f""""probe_rerank4_residual_sec":$resRrSec%.2f,""" +
      f""""clustered_n_vectors":$nClu,""" +
      f""""clustered_recall_adc":${cluRecallOf(cluPlainTop)}%.3f,""" +
      f""""clustered_recall_adc_residual":${cluRecallOf(cluResTop)}%.3f}""")

    spark.sql("DROP TABLE IF EXISTS pqb_raw")
    spark.sql("DROP TABLE IF EXISTS pqb_pq")
    spark.sql("DROP TABLE IF EXISTS pqb_res")
    spark.stop()
  }
}
