package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Skew

/** Scale-path mechanics: salted aggregation/join correctness, and
  * bucketed tables giving shuffle-free sort-merge joins (the co-location
  * strategy SCALING.md prescribes for repeated large-large joins). */
class SkewBucketingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("saltedAgg equals plain aggregation on skewed data") {
    val rnd = new scala.util.Random(3)
    // hot key: 90% of rows on one symbol
    val rows = (1 to 5000).map { i =>
      (if (rnd.nextInt(10) == 0) "COLD" + rnd.nextInt(5) else "HOT",
        i.toLong, rnd.nextDouble() * 10)
    }
    val df = rows.toDF("symbol", "id", "volume")
    val plain = df.groupBy("symbol")
      .agg(sum("volume").as("volume"), count(lit(1)).as("n"))
      .orderBy("symbol").collect().toSeq
    val salted = Skew.saltedAgg(df, Seq("symbol"), col("id"), 16,
      partial = Seq(sum(col("volume")).as("v"), count(lit(1)).as("c")),
      merge = Seq(sum(col("v")).as("volume"), sum(col("c")).as("n")))
      .orderBy("symbol").collect().toSeq
    assert(salted.map(_.getString(0)) == plain.map(_.getString(0)))
    salted.zip(plain).foreach { case (s, p) =>
      assert(math.abs(s.getDouble(1) - p.getDouble(1)) < 1e-6)
      assert(s.getLong(2) == p.getLong(2))
    }
  }

  test("saltedJoin equals plain join on a hot fact key") {
    val fact = (1 to 2000).map(i => ("HOT", i)).toDF("k", "v")
      .union(Seq(("A", 1), ("B", 2)).toDF("k", "v"))
    val dim = Seq(("HOT", "hot dim"), ("A", "a dim"), ("C", "unmatched"))
      .toDF("k", "d")
    val plain = fact.join(dim, "k")
    val salted = Skew.saltedJoin(fact, dim, "k", col("v"), 8)
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().orderBy("k").collect().toSeq ==
      plain.groupBy("k").count().orderBy("k").collect().toSeq)
  }

  test("bucketed tables join without an exchange (co-located SMJ)") {
    // in-memory catalog forgets tables between JVMs but the warehouse dir
    // survives → clear both the catalog entry and the stale location
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("li_b", "o_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    val li = (1L to 1000L).map(k => (k % 100, k, k * 1.0))
      .toDF("l_orderkey", "id", "qty")
    val o = (0L until 100L).map(k => (k, s"P$k")).toDF("o_orderkey", "prio")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")
    val joined = spark.table("li_b").join(spark.table("o_b"),
      col("l_orderkey") === col("o_orderkey"))
    // disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
