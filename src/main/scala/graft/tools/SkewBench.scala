package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Skew

/** Micro-benchmark for explicit skew salting ([[graft.engine.Skew]]):
  * a Zipf-ish fact table where ONE key carries half the rows, shuffled-hash
  * joined against a mid-size dimension — plain join vs salted join, and
  * plain grouped aggregate vs two-stage salted aggregate. AQE is disabled
  * so the measurement isolates the salting itself (AQE's skew splitting
  * only covers the sort-merge-join case; salted aggregation has no AQE
  * equivalent).
  *
  * A second mode races the two mega-bucket guard forms of
  * [[graft.ext.Dedup.lshCandidates]] on a boilerplate-heavy corpus where
  * one band bucket dwarfs the rest (VERDICT r9 item 3): the shipped
  * spill-safe WINDOW count (hot bucket counted in ONE task, WindowExec
  * spills) vs the partial-aggregatable groupBy-count + semi-join guard
  * (skew-immune count, one extra exchange of the banded rows).
  *
  * Usage: runMain graft.tools.SkewBench [nFactRows] [nKeys]
  *        runMain graft.tools.SkewBench lsh [nDocs] [hotDivisor]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("lsh")) { lshGuardRace(args.drop(1)); return }
    val nFact = if (args.length > 0) args(0).toInt else 4000000
    val nKeys = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 90% of the facts on key 0, the rest uniform — the hot-symbol shape
    val fact = spark.range(nFact).select(col("id"),
        when(col("id") % 10 < 9, 0L)
          .otherwise(pmod(col("id"), lit(nKeys.toLong))).as("k"),
        (col("id") % 97).cast("double").as("v"))
      .cache()
    val dim = spark.range(nKeys).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("label")).cache()
    fact.count(); dim.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val (plainJoinSec, r1) = time {
      fact.join(dim, "k").groupBy("label").count().count()
    }
    val (saltedJoinSec, r2) = time {
      Skew.saltedJoin(fact, dim, "k", col("id"), buckets = 32)
        .groupBy("label").count().count()
    }
    require(r1 == r2, s"salted join changed results: $r1 vs $r2")

    val (plainAggSec, a1) = time {
      fact.groupBy("k").agg(sum(col("v")), count(lit(1))).count()
    }
    val (saltedAggSec, a2) = time {
      Skew.saltedAgg(fact, Seq("k"), col("id"), 32,
        partial = Seq(sum(col("v")).as("pv"), count(lit(1)).as("pn")),
        merge = Seq(sum(col("pv")).as("v"), sum(col("pn")).as("n"))).count()
    }
    require(a1 == a2, s"salted agg changed results: $a1 vs $a2")

    println(s"""{"metric":"skew","n_fact":$nFact,"n_keys":$nKeys,""" +
      s""""plain_join_sec":$plainJoinSec,"salted_join_sec":$saltedJoinSec,""" +
      s""""plain_agg_sec":$plainAggSec,"salted_agg_sec":$saltedAggSec}""")
    spark.stop()
  }

  /** Window-count vs groupBy-count mega-bucket guard at the skew point:
    * `1/hotDivisor` of the docs share ONE full minhash signature (the
    * boilerplate pathology — they collide in every band), the rest pair
    * up in 2-doc buckets. Both forms must emit the same candidate set
    * (the mega bucket is dropped either way). */
  private def lshGuardRace(args: Array[String]): Unit = {
    import graft.ext.Dedup
    val nDocs = if (args.length > 0) args(0).toInt else 4000000
    val hotDiv = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nHot = nDocs / hotDiv
    // hot docs: identical signature (all zeros) → one nHot-row bucket per
    // band; cold docs: stable 2-doc buckets keyed by id div 2
    val sigCols = (0 until 16).map { i =>
      when(col("id") < nHot, lit(0L))
        .otherwise((col("id") / 2).cast("long") * 31 + i).as(s"m$i")
    }
    val sigs = spark.range(nDocs)
      .select((col("id").as("doc_id") +: sigCols): _*).cache()
    sigs.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // alternate forms across reps so a contention window can't define
    // one side; report medians
    val reps = 3
    val (winTimes, grpTimes) =
      (Vector.newBuilder[Double], Vector.newBuilder[Double])
    var (nWin, nGrp) = (-1L, -1L)
    (1 to reps).foreach { _ =>
      val (tw, rw) = time(Dedup.lshCandidates(sigs, "doc_id").count())
      val (tg, rg) = time(Dedup.lshCandidatesGroupByGuard(sigs, "doc_id").count())
      winTimes += tw; grpTimes += tg; nWin = rw; nGrp = rg
    }
    require(nWin == nGrp, s"guard forms disagree: $nWin vs $nGrp pairs")
    def med(xs: Vector[Double]): Double = xs.sorted.apply(xs.size / 2)
    println(s"""{"metric":"lsh_guard","n_docs":$nDocs,"n_hot":$nHot,""" +
      s""""pairs":$nWin,"reps":$reps,""" +
      f""""window_guard_sec":${med(winTimes.result())}%.3f,""" +
      f""""groupby_guard_sec":${med(grpTimes.result())}%.3f}""")
    spark.stop()
  }
}
