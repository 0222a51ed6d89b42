package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.RangeJoinRewrite

/** RangeJoinRewrite optimizer rule: a natural theta range-join must plan
  * as a bucketed hash equi-join (never BNLJ) with identical results —
  * including negative domains and boundary values. */
class RangeJoinRuleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  // spans both negative and positive values so floor-vs-truncate division
  // differences would misbucket if the rule got sign handling wrong
  private lazy val intervals = (1 to 150).map { i =>
    val s = rnd.nextInt(20000).toLong - 10000
    (i.toLong, s, s + 1 + rnd.nextInt(3000))
  }.toDF("iv_id", "s_ms", "e_ms")
  private lazy val points = (1 to 200).map { i =>
    (1000L + i, rnd.nextInt(22000).toLong - 11000)
  }.toDF("pt_id", "p_ms")

  private def thetaJoin(): DataFrame =
    intervals.join(points, $"p_ms" >= $"s_ms" && $"p_ms" < $"e_ms")
      .select("iv_id", "pt_id")

  private def withRule[A](bucket: Long = 1000L)(f: => A): A = {
    spark.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    spark.conf.set("spark.graft.rangeJoin.bucket", bucket.toString)
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
    }
  }

  test("theta range-join rewrites to an equi-join with identical results") {
    val want = thetaJoin().collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(want.nonEmpty)
    withRule() {
      val df = thetaJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        "rule did not fire:\n" + plan.take(800))
      assert(plan.contains("_graft_bucket"), plan.take(800))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sorted.toSeq == want.sorted.toSeq)
      assert(got.length == got.distinct.length, "pair duplicated by rewrite")
    }
  }

  test("rule leaves equi-joins alone") {
    withRule() {
      val withKey = intervals.withColumn("k", $"iv_id" % 3)
      val ptKey = points.withColumn("k", $"pt_id" % 3)
      val plan = withKey.join(ptKey,
          withKey("k") === ptKey("k") && $"p_ms" >= $"s_ms" && $"p_ms" < $"e_ms")
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("_graft_bucket"),
        "rule fired on a join that already has an equi-key")
    }
  }

  test("rule respects the broadcast threshold guard") {
    spark.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    try {
      // default 10MB threshold: these tiny frames SHOULD broadcast-NLJ
      val plan = thetaJoin().queryExecution.optimizedPlan.toString
      assert(!plan.contains("_graft_bucket"),
        "rule fired although one side is broadcastable")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("wide/sentinel intervals survive: salted wide branch, identical results") {
    // open-ended sentinel ends (Long.MaxValue/2) and month-wide intervals
    // would explode a naive bucket sequence into billions of rows
    val iv = (Seq((900L, 0L, Long.MaxValue / 2),          // sentinel "open"
        (901L, -5000L, 90L * 86400000)) ++                // ~3 months wide
      (1 to 50).map { i =>
        val s = rnd.nextInt(20000).toLong
        (i.toLong, s, s + 1 + rnd.nextInt(2000))          // narrow
      }).toDF("iv_id", "s_ms", "e_ms")
    val want = iv.as("a").join(points.as("b"),
        $"p_ms" >= $"s_ms" && $"p_ms" < $"e_ms")
      .select("iv_id", "pt_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    withRule() {
      val df = iv.join(points, $"p_ms" >= $"s_ms" && $"p_ms" < $"e_ms")
        .select("iv_id", "pt_id")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_salt"), "wide branch missing:\n" + plan.take(800))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sorted.toSeq == want.sorted.toSeq)
      assert(got.length == got.distinct.length, "pair duplicated across branches")
    }
  }

  test("property: rewrite ≡ naive theta join across random corpora and bucket sizes") {
    // randomized shapes: mixed narrow/wide/empty/sentinel intervals and
    // negative domains, checked against the un-rewritten join at several
    // bucket granularities (incl. 1 — maximal explosion pressure — and a
    // bucket far larger than every interval)
    val prnd = new scala.util.Random(91)
    (1 to 3).foreach { round =>
      val iv = (1 to 80).map { i =>
        val s = prnd.nextInt(40000).toLong - 20000
        val width = prnd.nextInt(4) match {
          case 0 => 0L                              // empty (e == s)
          case 1 => 1L + prnd.nextInt(50)           // narrow
          case 2 => 1L + prnd.nextInt(20000)        // spans many buckets
          case _ => Long.MaxValue / 4                // sentinel-wide
        }
        (i.toLong, s, s + width)
      }.toDF("iv_id", "s_ms", "e_ms")
      val pt = (1 to 120).map { i =>
        (1000L + i, prnd.nextInt(48000).toLong - 24000)
      }.toDF("pt_id", "p_ms")
      val want = iv.join(pt, $"p_ms" >= $"s_ms" && $"p_ms" < $"e_ms")
        .select("iv_id", "pt_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      Seq(1L, 97L, 1000L, 1000000L).foreach { bucket =>
        withRule(bucket) {
          val got = iv.join(pt, $"p_ms" >= $"s_ms" && $"p_ms" < $"e_ms")
            .select("iv_id", "pt_id").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          assert(got.length == got.distinct.length,
            s"round $round bucket $bucket: duplicated pairs")
          assert(got.sorted.toSeq == want,
            s"round $round bucket $bucket: result diverged")
        }
      }
    }
  }

  test("overflow-wide interval (Long.Min..Long.Max bounds, bucket=1) takes the wide branch") {
    // lastBucket - firstBucket overflows Long here; a raw `< maxBuckets`
    // check would see a negative diff, misclassify the interval as narrow,
    // and explode the bucket Sequence. The guard must route it wide.
    val iv = Seq((1L, Long.MinValue + 10, Long.MaxValue - 10),
      (2L, 100L, 200L)).toDF("iv_id", "s_ms", "e_ms")
    val pt = Seq((10L, 0L), (11L, 150L), (12L, 300L)).toDF("pt_id", "p_ms")
    val want = Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 11L))
    withRule(bucket = 1L) {
      val df = iv.join(pt, $"p_ms" >= $"s_ms" && $"p_ms" < $"e_ms")
        .select("iv_id", "pt_id")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_salt"), "wide branch missing:\n" + plan.take(800))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want)
    }
  }

  test("boundary semantics: inclusive start, exclusive end, across bucket edges") {
    val iv = Seq((1L, 0L, 2000L), (2L, -3000L, -1000L)).toDF("iv_id", "s_ms", "e_ms")
    val pt = Seq((10L, 0L), (11L, 1999L), (12L, 2000L), (13L, -3000L),
      (14L, -1001L), (15L, -1000L)).toDF("pt_id", "p_ms")
    val want = Set((1L, 10L), (1L, 11L), (2L, 13L), (2L, 14L))
    withRule() {
      val got = iv.join(pt, $"p_ms" >= $"s_ms" && $"p_ms" < $"e_ms")
        .select("iv_id", "pt_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want)
    }
  }
}
