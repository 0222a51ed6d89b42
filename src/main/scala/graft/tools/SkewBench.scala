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
  * Usage: runMain graft.tools.SkewBench [nFactRows] [nKeys]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
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
}
