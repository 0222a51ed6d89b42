package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity, Sq}

/** Scalar-quantization measurement (the x97/SqSpec capability's honest
  * numbers): index bytes and probe recall@10/wall-clock for the SQ8
  * path against BOTH neighbors on the compression curve — the raw
  * exact IVF probe (the quality ceiling) and IVF-PQ ADC (the
  * compression ceiling) — on the same corpus, cells, and queries as
  * PqBench's main fixture (replicated sf embeddings, deterministic
  * sinusoidal perturbation, no RNG — reruns bit-stable). Also the
  * bulk-vs-sequential race for [[Sq.ivfSqProbeBulk]] (agreement must
  * be 100% — the SqSpec equivalence, re-asserted at bench scale).
  *
  * Usage: runMain graft.tools.SqBench [sfDir] [reps] [nQueries]
  */
object SqBench {
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

    val built = {
      val idx = Similarity.ivfBuild(searched, nCells = nCells)
      idx.assigned.cache().count(); idx
    }
    val (p, trainSec) = time(Sq.sqTrain(searched))
    val cbPq = Pq.trainedCodebooks(
      corpus.sample(withReplacement = false, math.min(1.0, 20000.0 / n),
        seed = 42), "embedding", dim, m = 8, k = 16)

    val tmp = java.nio.file.Files.createTempDirectory("sqbench").toString
    Similarity.ivfSave(built, "sqb_raw", s"$tmp/raw", nCells)
    Similarity.ivfSave(Sq.ivfSqEncode(built, p, "vec_id"),
      "sqb_sq", s"$tmp/sq", nCells)
    Similarity.ivfSave(Pq.ivfPqEncode(built, cbPq, "vec_id"),
      "sqb_pq", s"$tmp/pq", nCells)
    val rawBytes = dirBytes(s"$tmp/raw/assigned")
    val sqBytes = dirBytes(s"$tmp/sq/assigned")
    val pqBytes = dirBytes(s"$tmp/pq/assigned")

    val rawIdx = Similarity.ivfLoad(spark, "sqb_raw", s"$tmp/raw")
    val sqIdx = Similarity.ivfLoad(spark, "sqb_sq", s"$tmp/sq")
    val pqIdx = Similarity.ivfLoad(spark, "sqb_pq", s"$tmp/pq")

    def probeAll(f: Long => DataFrame): (Map[Long, Set[Long]], Double) =
      time { qIds.map(q => q -> ids(f(q))).toMap }

    val (exactTop, exactSec) = probeAll(q =>
      Similarity.ivfProbe(rawIdx, queryDf(q), "vec_id", nProbe = 2))
    val (sqTop, sqSec) = probeAll(q =>
      Sq.ivfSqProbe(sqIdx, p, queryDf(q), "vec_id", nProbe = 2))
    val (sqRrTop, sqRrSec) = probeAll(q =>
      Sq.ivfSqProbe(sqIdx, p, queryDf(q), "vec_id", nProbe = 2,
        rerankWith = Some(searched), rerankFactor = 4))
    val (pqTop, pqSec) = probeAll(q =>
      Pq.ivfPqProbe(pqIdx, cbPq, queryDf(q), "vec_id", nProbe = 2))

    // the QT_4bit point (levels = 16): half a byte of information per
    // dim — where on the recall curve the next halving of code bytes
    // lands, and how much the exact rerank recovers
    val p4 = Sq.sqTrain(searched, levels = 16)
    Similarity.ivfSave(Sq.ivfSqEncode(built, p4, "vec_id"),
      "sqb_sq4", s"$tmp/sq4", nCells)
    val sq4Bytes = dirBytes(s"$tmp/sq4/assigned")
    val sq4Idx = Similarity.ivfLoad(spark, "sqb_sq4", s"$tmp/sq4")
    val (sq4Top, sq4Sec) = probeAll(q =>
      Sq.ivfSqProbe(sq4Idx, p4, queryDf(q), "vec_id", nProbe = 2))
    val (sq4RrTop, sq4RrSec) = probeAll(q =>
      Sq.ivfSqProbe(sq4Idx, p4, queryDf(q), "vec_id", nProbe = 2,
        rerankWith = Some(searched), rerankFactor = 4))

    // SQ4 physical nibble packing (VERDICT r13 #6): SQ4 stores 0..15
    // codes one per INT32 array element and leans on parquet's
    // bit-packed encoding; packing TWO nibbles per element halves the
    // array length — does that buy real bytes/scan time, or does
    // parquet's encoding already capture it? Same flat layout for both
    // sides; the packed scan unpacks inline via shiftright/AND (codegen
    // arithmetic — an adopted form would fold the unpack into
    // SqDecodeF, so this measures the packed READ fairly).
    val enc4 = Sq.sqEncode(searched, "embedding", p4)
      .select(col("vec_id"), col("codes"), col("recon_norm"))
    val packed4 = enc4.select(col("vec_id"),
      transform(sequence(lit(0), lit(dim / 2 - 1)), i =>
        element_at(col("codes"), i * 2 + 1) +
          shiftleft(element_at(col("codes"), i * 2 + 2), 4)).as("codes"),
      col("recon_norm"))
    enc4.write.mode("overwrite").parquet(s"$tmp/sq4_flat")
    packed4.write.mode("overwrite").parquet(s"$tmp/sq4_packed")
    val sq4FlatBytes = dirBytes(s"$tmp/sq4_flat")
    val sq4PackedBytes = dirBytes(s"$tmp/sq4_packed")
    val unpackCol = flatten(transform(col("codes"),
      x => array(x.bitwiseAND(lit(15)), shiftright(x, 4))))
    val qv = corpus.filter(col("vec_id") === 1).select(
      transform(col("embedding"), x => x.cast("double")).as("q"))
      .head.getSeq[Double](0).toIndexedSeq
    def scanRace(path: String, unpack: Boolean): (Seq[Long], Double) = {
      val reads = spark.read.parquet(path)
      val codes = if (unpack) unpackCol else col("codes")
      // full-scan decode+score+top-k — the compressed-read hot path
      time {
        reads.withColumn("cos_sq",
            round(Similarity.dot(Sq.sqDecodeCol(codes, p4),
              array(qv.map(lit(_)): _*)) /
              (col("recon_norm") * lit(math.sqrt(
                qv.foldLeft(0.0)((a, x) => a + x * x)))), 6))
          .orderBy(col("cos_sq").desc, col("vec_id"))
          .select(col("vec_id").cast("long")).limit(10)
          .collect().map(_.getLong(0)).toSeq
      }
    }
    // warm BOTH paths once (each side has its own codegen/JIT to pay —
    // warming only flat would bias the race against packed)
    scanRace(s"$tmp/sq4_flat", unpack = false)
    scanRace(s"$tmp/sq4_packed", unpack = true)
    val (flatIds, flatScanSec) = scanRace(s"$tmp/sq4_flat", unpack = false)
    val (packedIds, packedScanSec) = scanRace(s"$tmp/sq4_packed", unpack = true)
    require(flatIds == packedIds,
      "packed scan must score identically to the flat layout")

    // bulk-vs-sequential race (ids filtered through the corpus first)
    val bulkCandidates = (0 until 100).map(i => i.toLong * 3L + 1L)
    val bulkQueries = corpus.filter(col("vec_id").isin(bulkCandidates: _*))
      .select(col("vec_id").as("q_id"), col("embedding")).cache()
    val bulkIds = bulkQueries.select("q_id").collect()
      .map(_.getLong(0)).sorted.toIndexedSeq
    val (seqTop, seqSec) = time {
      bulkIds.map { q =>
        q -> ids(Sq.ivfSqProbe(sqIdx, p,
          corpus.filter(col("vec_id") === q).select("embedding"),
          "vec_id", nProbe = 2))
      }.toMap
    }
    val (bulkRows, bulkSec) = time {
      Sq.ivfSqProbeBulk(sqIdx, p, bulkQueries, "q_id", "vec_id",
        nProbe = 2).collect()
    }
    val bulkTop = bulkRows.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val bulkAgree = bulkIds.count(q =>
      bulkTop.getOrElse(q, Set.empty) == seqTop(q)).toDouble / bulkIds.size

    println(
      f"""{"metric":"sq_bench","n":$n,"dim":$dim,"n_cells":$nCells,""" +
      f""""n_queries":$nQ,"train_sec":$trainSec%.2f,""" +
      f""""raw_bytes":$rawBytes,"sq_bytes":$sqBytes,"pq_bytes":$pqBytes,""" +
      f""""sq_compression":${rawBytes.toDouble / sqBytes}%.2f,""" +
      f""""pq_compression":${rawBytes.toDouble / pqBytes}%.2f,""" +
      f""""recall_exact_probe":${recallOf(exactTop)}%.3f,""" +
      f""""recall_sq":${recallOf(sqTop)}%.3f,""" +
      f""""recall_sq_rerank":${recallOf(sqRrTop)}%.3f,""" +
      f""""recall_pq_adc":${recallOf(pqTop)}%.3f,""" +
      f""""sq4_bytes":$sq4Bytes,""" +
      f""""sq4_compression":${rawBytes.toDouble / sq4Bytes}%.2f,""" +
      f""""recall_sq4":${recallOf(sq4Top)}%.3f,""" +
      f""""recall_sq4_rerank":${recallOf(sq4RrTop)}%.3f,""" +
      f""""probe_sec_sq4":$sq4Sec%.2f,"probe_sec_sq4_rerank":$sq4RrSec%.2f,""" +
      f""""sq4_flat_bytes":$sq4FlatBytes,"sq4_packed_bytes":$sq4PackedBytes,""" +
      f""""sq4_packed_bytes_ratio":${sq4FlatBytes.toDouble / sq4PackedBytes}%.2f,""" +
      f""""sq4_scan_sec_flat":$flatScanSec%.2f,""" +
      f""""sq4_scan_sec_packed":$packedScanSec%.2f,""" +
      f""""probe_sec_exact":$exactSec%.2f,"probe_sec_sq":$sqSec%.2f,""" +
      f""""probe_sec_sq_rerank":$sqRrSec%.2f,"probe_sec_pq":$pqSec%.2f,""" +
      f""""bulk_queries":${bulkIds.length},"bulk_seq_sec":$seqSec%.2f,""" +
      f""""bulk_sec":$bulkSec%.2f,""" +
      f""""bulk_speedup":${seqSec / bulkSec}%.2f,""" +
      f""""bulk_agreement":$bulkAgree%.3f}""")
    spark.stop()
  }
}
