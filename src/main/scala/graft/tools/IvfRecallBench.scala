package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ext.{CurationQueries, Similarity}

/** Recall sweep for the ANN estimators — the follow-up x88 calls for.
  * x88 ships the honest number for the DETERMINISTIC label-cell
  * quantizer (recall@10 ≈ 0.1–0.5 on the synthetic corpus: labels are
  * not geometry). This tool measures what the production trained
  * quantizer buys on the SAME query sample (x88's: every 50th vector
  * among the first 500) and how recall trades against probe cost along
  * nProbe — the knob an operator actually turns at 100 TB, where each
  * +1 nProbe reads one more cell's worth of files. Points:
  *
  *   - KMeans IVF ([[Similarity.ivfBuild]]/[[Similarity.ivfProbe]],
  *     nCells=16) at nProbe ∈ 1, 2, 4, 8 — recall@10 vs summed probe
  *     wall time over the sample;
  *   - the 8-plane hyperplane-LSH path ([[Similarity.lshTopK]]) — the
  *     bucket-pruned alternative;
  *   - x88's label-cell estimator (mean of the registered query's
  *     per-query recall column) for cross-reference.
  *
  * Ground truth is exact brute-force cosine top-10
  * ([[Similarity.bruteForceTopK]]) per query. All rankings round
  * cosines at 6 with id tiebreaks (the x34/x85 determinism rule), so
  * reruns are bit-stable.
  *
  * Usage: runMain graft.tools.IvfRecallBench [sfDir]
  */
object IvfRecallBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val embs = Tables.embeddings(spark, dir)
    val k = 10
    // x88's sample: queries held out of the searched corpus
    val queryRows = embs
      .filter(col("vec_id") % 50 === 0 && col("vec_id") < 500)
      .select(col("vec_id"), col("embedding")).collect()
    val corpus = embs
      .filter(col("vec_id") % 50 =!= 0 || col("vec_id") >= 500)
      .cache()
    corpus.count()

    def ids(df: DataFrame): Set[Long] =
      df.select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    def oneQuery(r: org.apache.spark.sql.Row): DataFrame =
      embs.filter(col("vec_id") === r.getAs[Number]("vec_id").longValue())
        .select("embedding")
    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val truth: Map[Long, Set[Long]] = queryRows.map { r =>
      r.getAs[Number]("vec_id").longValue() ->
        ids(Similarity.bruteForceTopK(corpus, oneQuery(r), "vec_id", k = k))
    }.toMap
    def recallOf(top: Long => Set[Long]): Double =
      queryRows.map { r =>
        val q = r.getAs[Number]("vec_id").longValue()
        truth(q).intersect(top(q)).size.toDouble / truth(q).size
      }.sum / queryRows.length

    val idx = Similarity.ivfBuild(corpus, nCells = 16)
    idx.assigned.cache().count()
    val points = Seq(1, 2, 4, 8).map { nProbe =>
      val (tops, sec) = time {
        queryRows.map { r =>
          r.getAs[Number]("vec_id").longValue() ->
            ids(Similarity.ivfProbe(idx, oneQuery(r), "vec_id",
              nProbe = nProbe, k = k))
        }.toMap
      }
      val rec = recallOf(tops)
      f"""{"nProbe":$nProbe,"recall":$rec%.3f,"probe_sec_total":$sec%.2f}"""
    }

    // SQ8-compressed probes at the same nProbe points (r13): the claim
    // "scalar quantization costs no recall" must hold at every probe
    // width, not just the nProbe=2 point SQ_BENCH_r13 carries — the
    // reconstruction error is per-dim bounded, but rank inversions
    // near the top-k boundary are only excluded by measurement
    val sqp = graft.ext.Sq.sqTrain(corpus)
    val sqIdx = graft.ext.Sq.ivfSqEncode(idx, sqp, "vec_id")
    sqIdx.assigned.cache().count()
    val sqPoints = Seq(1, 2, 4, 8).map { nProbe =>
      val (tops, sec) = time {
        queryRows.map { r =>
          r.getAs[Number]("vec_id").longValue() ->
            ids(graft.ext.Sq.ivfSqProbe(sqIdx, sqp, oneQuery(r), "vec_id",
              nProbe = nProbe, k = k))
        }.toMap
      }
      f"""{"nProbe":$nProbe,"recall":${recallOf(tops)}%.3f,""" +
        f""""probe_sec_total":$sec%.2f}"""
    }

    // two-level ranking (r12): what the hierarchy's approximation
    // costs in recall at the SAME nProbe — the flat ranking considers
    // all 16 cells, the hier form only the top-nProbeSuper supers'
    // children. nProbeSuper = nSuper (4) is exhaustive ⇒ must match
    // the flat nProbe=2 point exactly.
    val sq = Similarity.ivfSuperBuild(idx, nSuper = 4)
    val hierPoints = Seq(1, 2, 4).map { nps =>
      val (tops, sec) = time {
        queryRows.map { r =>
          r.getAs[Number]("vec_id").longValue() ->
            ids(Similarity.ivfProbeHier(idx, sq, oneQuery(r), "vec_id",
              nProbeSuper = nps, nProbe = 2, k = k))
        }.toMap
      }
      f"""{"nProbeSuper":$nps,"recall":${recallOf(tops)}%.3f,""" +
        f""""probe_sec_total":$sec%.2f}"""
    }

    val lshRecall = recallOf { q =>
      val r = queryRows.find(
        _.getAs[Number]("vec_id").longValue() == q).get
      ids(Similarity.lshTopK(corpus, oneQuery(r), "vec_id", k = k))
    }

    // the deterministic label-cell estimator, straight from the x88 row
    val x88 = CurationQueries.all("x88_ivf_recall").fn(spark, dir)
      .agg(avg(col("recall"))).head.getDouble(0)

    println(f"""{"metric":"ivf_recall","sf":"$dir","k":$k,""" +
      f""""n_queries":${queryRows.length},""" +
      f""""label_cells_nprobe2_recall":$x88%.3f,""" +
      f""""lsh_8plane_recall":$lshRecall%.3f,""" +
      s""""kmeans_ivf_points":[${points.mkString(",")}],""" +
      s""""sq8_ivf_points":[${sqPoints.mkString(",")}],""" +
      s""""hier_nsuper4_nprobe2_points":[${hierPoints.mkString(",")}]}""")
    spark.stop()
  }
}
