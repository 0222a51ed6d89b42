package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Races the two IVF cell-assignment forms across coarse-quantizer
  * sizes (VERDICT r10 #3): the codegen argmin expression
  * ([[Similarity.ivfAssign]], zero row expansion) vs the
  * crossJoin+window form it replaced ([[Similarity.ivfAssignViaJoin]],
  * batch × nCells intermediate rows + per-id sort). Both are exact and
  * agree row-for-row (asserted per cell count); the question is the
  * slope in nCells — at a realistic 100 TB quantizer (thousands of
  * cells) the join form's intermediate row count is the batch size
  * multiplied by it.
  *
  * The quantizer is NOT re-fit per cell count with KMeans (that would
  * measure the fit): synthetic centroid frames of the right shape are
  * enough, since assignment cost only depends on (nCells, dim, batch).
  *
  * Usage: runMain graft.tools.IvfAssignBench [nBatch] [dim] [reps]
  */
object IvfAssignBench {
  def main(args: Array[String]): Unit = {
    val nBatch = if (args.length > 0) args(0).toInt else 200000
    val dim = if (args.length > 1) args(1).toInt else 64
    val reps = if (args.length > 2) args(2).toInt else 3
    val cellCounts = Seq(16, 256, 4096)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val batch = spark.range(nBatch).select(col("id").as("vec_id"),
        expr(s"transform(sequence(0, ${dim - 1}), " +
          "j -> cast(sin(id % 16 + j * 0.37) + cos(id * 0.011 + j) as float))")
          .as("embedding"))
      .cache()
    batch.count()

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)

    // the join form is raced only where its batch × nCells row expansion
    // is affordable to even execute — at 4096 cells a 200k batch is 819M
    // intermediate rows of interpreted dim-64 HOF folds (hours); that
    // unrunnability IS the finding. Agreement there is still checked on
    // a small sample.
    val joinRaceMax = 256
    val sampleN = 2000
    val lines = cellCounts.map { nCells =>
      // deterministic synthetic centroids, same trig family as the data
      val cents = (0 until nCells).map { c =>
        (c, Array.tabulate(dim)(j =>
          math.sin(c % 16 + j * 0.37) + math.cos(c * 0.013 + j)))
      }.toDF("cell", "cent")
      val idx = Similarity.IvfIndex(batch.limit(0), cents)
      val sample = batch.filter(col("vec_id") < sampleN)
      val drift = Similarity.ivfAssign(idx, sample, "vec_id")
        .select("vec_id", "cell")
        .except(Similarity.ivfAssignViaJoin(idx, sample, "vec_id")
          .select("vec_id", "cell")).count()
      require(drift == 0, s"paths disagree at nCells=$nCells: $drift rows")
      // force the cell column to actually evaluate: a bare count() lets
      // Catalyst PRUNE the assignment expression away entirely (measured
      // 0.07s "assignments" at 4096 cells — a scan count, not work)
      def force(df: org.apache.spark.sql.DataFrame): Unit = {
        df.agg(sum(col("cell").cast("long"))).head
        ()
      }
      val viaExpr = Similarity.ivfAssign(idx, batch, "vec_id")
        .select("vec_id", "cell")
      val exprSec = med((1 to reps).map(_ => time(force(viaExpr))))
      val joinPart = if (nCells <= joinRaceMax) {
        val viaJoin = Similarity.ivfAssignViaJoin(idx, batch, "vec_id")
          .select("vec_id", "cell")
        val joinSec = med((1 to reps).map(_ => time(force(viaJoin))))
        f""","join_sec":$joinSec%.3f"""
      } else ""","join_sec":null"""
      // two-level form (VERDICT r11 #2): nSuper = √nCells; per-row work
      // is O((√n + n/√n)·dim) vs the flat form's O(n·dim), and the
      // driver-held matrix shrinks to √nCells×dim. Agreement with the
      // flat argmin is reported, not required — the hierarchy is its
      // own (self-consistent) quantizer and boundary rows may differ.
      val nSuper = math.max(2, math.sqrt(nCells.toDouble).round.toInt)
      val sq = Similarity.ivfSuperBuild(idx, nSuper)
      val viaHier = Similarity.ivfAssignHier(sq, batch, "vec_id")
        .select("vec_id", "cell")
      val hierSec = med((1 to reps).map(_ => time(force(viaHier))))
      // denominator = the sample's ACTUAL row count: with nBatch <
      // sampleN the vec_id filter yields fewer rows than sampleN, and
      // dividing by the constant would under-report agreement
      val agree = Similarity.ivfAssignHier(sq, sample, "vec_id")
        .select("vec_id", "cell")
        .intersect(Similarity.ivfAssign(idx, sample, "vec_id")
          .select("vec_id", "cell")).count().toDouble /
        math.min(nBatch, sampleN)
      // bulk cell-RANKING race (r14): bulkProbeCells evaluates one
      // squared-L2 per (query × centroid) row — flat: Q·nCells of them
      // per batch. The codegen kernel (L2DistF32) vs the interpreted
      // HOF fold it replaced, same Q=1000 synthetic queries, forced
      // through the same windowed top-2 cut; both verified to rank
      // identically on a sample before timing.
      val qn = 1000
      val qd = spark.range(qn).select(col("id").as("q_id"),
          expr(s"transform(sequence(0, ${dim - 1}), " +
            "j -> cast(sin(id % 16 + j * 0.37) + cos(id * 0.017 + j) " +
            "as double))").as("_q"))
        .cache()
      qd.count()
      val centsD = cents.select(col("cell"),
        expr("transform(cent, x -> cast(x as double))").as("_cent"))
      def rankedDf(dist: org.apache.spark.sql.Column,
          queries: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("q_id")
          .orderBy(col("_dist").asc, col("cell").asc)
        queries.crossJoin(broadcast(centsD))
          .withColumn("_dist", round(dist, 6))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= 2)
          .select("q_id", "cell")
      }
      val hofDist = aggregate(
        zip_with(col("_cent"), col("_q"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
      val kernelDist = graft.ext.Similarity.l2sq(col("_cent"), col("_q"))
      val qs = qd.limit(50)
      require(rankedDf(kernelDist, qs).except(rankedDf(hofDist, qs))
          .isEmpty &&
        rankedDf(hofDist, qs).except(rankedDf(kernelDist, qs)).isEmpty,
        s"kernel and HOF rankings disagree at nCells=$nCells")
      def rankRace(dist: org.apache.spark.sql.Column): Double =
        med((1 to reps).map(_ =>
          time { rankedDf(dist, qd).count(); () }))
      val rankKernelSec = rankRace(kernelDist)
      val rankHofSec = rankRace(hofDist)
      f""""n$nCells":{"argmin_sec":$exprSec%.3f,"hier_sec":$hierSec%.3f,""" +
        f""""hier_nsuper":$nSuper,"hier_agree":$agree%.4f,""" +
        f""""bulk_rank_kernel_sec":$rankKernelSec%.3f,""" +
        f""""bulk_rank_hof_sec":$rankHofSec%.3f$joinPart}"""
    }
    println(s"""{"metric":"ivf_assign","n_batch":$nBatch,"dim":$dim,""" +
      s""""reps":$reps,${lines.mkString(",")}}""")
    spark.stop()
  }
}
