package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Micro-benchmark for the IVF build/probe split (round 9, VERDICT r7
  * item 7): quantifies what amortizing the KMeans coarse-quantizer fit
  * buys. Compares, over the same Q query vectors on a deterministic
  * synthetic corpus:
  *
  *   A. Q one-shot [[Similarity.ivfTopK]] calls — Q KMeans fits (the
  *      pre-split shape the verdict flagged);
  *   B. one [[Similarity.ivfBuild]] + Q [[Similarity.ivfProbe]] calls —
  *      the index build amortized across the query stream.
  *
  * At 100 TB the gap widens with corpus size: the fit is a full-corpus
  * iterative job, the probe touches nProbe/nCells of the data (and
  * bucket-prunes to that fraction of FILES against an ivfSave'd index).
  *
  * Usage: runMain graft.tools.IvfBench [nRows] [nQueries]
  */
object IvfBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val q = if (args.length > 1) args(1).toInt else 8
    val (dim, nCells, nProbe) = (64, 64, 4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic embeddings: element j of row i is a fixed
    // trig mix of (i, j) — clustered enough for KMeans to separate
    val corpus = spark.range(n).select(col("id").as("vec_id"),
        expr(s"transform(sequence(0, ${dim - 1}), " +
          "j -> cast(sin(id % 16 + j * 0.37) + cos(id * 0.011 + j) as float))")
          .as("embedding"))
      .cache()
    corpus.count()
    val queries = (0 until q).map(i =>
      corpus.filter(col("vec_id") === i.toLong * (n / q)).select("embedding"))

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // A: one-shot per query (re-fits the quantizer every time)
    val oneShot = time {
      queries.foreach(qdf =>
        Similarity.ivfTopK(corpus, qdf, "vec_id", nCells = nCells,
          nProbe = nProbe).collect())
    }
    // B: build once, probe per query
    var idx: Similarity.IvfIndex = null
    val build = time {
      idx = Similarity.ivfBuild(corpus, nCells = nCells)
      idx.assigned.cache().count()
      idx.centroids.cache().count()
    }
    val probes = time {
      queries.foreach(qdf =>
        Similarity.ivfProbe(idx, qdf, "vec_id", nProbe = nProbe).collect())
    }

    println(s"""{"metric":"ivf_bench","rows":$n,"queries":$q""" +
      s""","one_shot_sec":${f"$oneShot%.2f"},"build_sec":${f"$build%.2f"}""" +
      s""","probe_total_sec":${f"$probes%.2f"}""" +
      s""","amortized_speedup":${f"${oneShot / (build + probes)}%.2f"}""" +
      s""","per_probe_vs_one_shot":${f"${(oneShot / q) / (probes / q)}%.2f"}}""")
    spark.stop()
  }
}
