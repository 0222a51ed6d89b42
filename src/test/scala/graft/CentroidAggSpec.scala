package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Similarity

/** Bit-identity pin for the r17 explode-free centroid aggregate
  * ([[graft.functions.CentroidAggF]], VERDICT r16 order #5): every value
  * it produces must equal — to the BIT — what the posexplode →
  * decimal-sum → collect/sort reference pipeline
  * ([[Similarity.centroidsViaPosexplode]]) produces, including the
  * adversarial lanes (NaN, ±Inf, null elements, null arrays, ragged
  * lengths, values past the decimal(20,7) cast-overflow limit, values
  * at the round/cast re-rounding boundary). The PqSpec PqDecodeF
  * convention: the fast kernel is pinned against the slow form it
  * replaced, and the x73/x85 DuckDB oracles hash-check the wired paths
  * end-to-end on top. */
class CentroidAggSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val embSchema = StructType(Seq(
    StructField("g", IntegerType, nullable = false),
    StructField("emb", ArrayType(DoubleType, containsNull = true),
      nullable = true)))

  private def frame(rows: Seq[(Int, Seq[java.lang.Double])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (g, a) =>
          Row(g, if (a == null) null else a.map(x => x: Any))
        }, 3),
      embSchema)

  /** Collect `(g, cent)` as g → element list; null-safe, bit-strict. */
  private def collectCents(df: org.apache.spark.sql.DataFrame)
      : Map[Int, Seq[Option[Long]]] =
    df.collect().map { r =>
      val g = r.getInt(0)
      val cent = r.getSeq[java.lang.Double](1)
      g -> cent.map(d => Option(d)
        .map(x => java.lang.Double.doubleToRawLongBits(x.doubleValue)))
    }.toMap

  private def bothForms(rows: Seq[(Int, Seq[java.lang.Double])]) = {
    val df = frame(rows)
    val fast = collectCents(
      df.groupBy("g").agg(Similarity.centroid(col("emb")).as("cent"))
        .filter(col("cent").isNotNull).select("g", "cent"))
    val ref = collectCents(
      Similarity.centroidsViaPosexplode(df, "g", "emb").select("g", "cent"))
    (fast, ref)
  }

  test("property: bit-identical to the posexplode reference on adversarial random frames") {
    val rnd = new scala.util.Random(20260816L)
    // value lanes the exploded pipeline treats distinctly: plain floats,
    // exact 7-decimal boundaries (HALF_UP ties), sub-rounding noise,
    // NaN/±Inf (round passes through, cast nulls), nulls, and doubles
    // whose round(·,7) re-rounds differently at the cast (>15
    // significant digits). Magnitudes past decimal(20,7) (≥1e13) are
    // NOT an identity lane: the engine runs default ansi=true, where
    // the exploded form's decimal cast itself THROWS — pinned in the
    // refusal test below. (The 9.2e11..1e13 band the r17 single-long
    // buffer refused IS an identity lane since the 128-bit widening —
    // pinned in its own test.)
    def value(): java.lang.Double = rnd.nextInt(12) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case 3 => null
      case 4 => (rnd.nextInt(20000001) - 10000000) / 1e7 // exact scale-7
      case 5 => (rnd.nextInt(2000001) - 1000000) / 1e7 + 5e-9 // tie-ish
      case 6 => (rnd.nextDouble() * 2 - 1) * 1e9 // large but sum-safe
      case 7 => (rnd.nextDouble() * 2 - 1) * 1e-9 // sub-scale noise
      case 8 => -0.0
      case 9 => // re-round lane: 18 significant digits force the cast's
        // second HALF_UP rounding of round(.,7)'s double (magnitude 6e10
        // predates the 128-bit widening, when worst-case cell sums had
        // to stay under the old ~9.2e11 single-long refusal threshold;
        // kept — the re-round boundary is what the lane exercises)
        (if (rnd.nextBoolean()) 1 else -1) * (61728394506.1234567 + rnd.nextDouble())
      case _ => (rnd.nextDouble() * 2 - 1) * (if (rnd.nextBoolean()) 1 else 1e4)
    }
    (1 to 5).foreach { trial =>
      val rows = (1 to 300).map { _ =>
        val g = rnd.nextInt(7)
        val emb: Seq[java.lang.Double] = rnd.nextInt(10) match {
          case 0 => null // null array: posexplode emits nothing
          case 1 => Seq.empty // empty array: same
          case 2 => Seq.fill(rnd.nextInt(3) + 1)(value()) // ragged short
          case _ => Seq.fill(6)(value())
        }
        (g, emb)
      }
      val (fast, ref) = bothForms(rows)
      assert(fast == ref, s"trial $trial: fast vs posexplode diverge")
    }
  }

  test("explicit semantics: count includes NaN/Inf/null elements, sum skips them") {
    // one group, 4 rows, dim 2:
    //   e0: 1.0, 2.0, NaN(count-only), 3.0     → sum 6.0 / count 4 = 1.5
    //   e1: 0.5, null(count-only), 1.5, +Inf   → sum 2.0 / count 4 = 0.5
    val rows = Seq[(Int, Seq[java.lang.Double])](
      (1, Seq(1.0, 0.5)),
      (2, Seq(2.0, null)),
      (3, Seq(Double.NaN, 1.5)),
      (4, Seq(3.0, Double.PositiveInfinity))).map { case (_, e) => (0, e) }
    val (fast, ref) = bothForms(rows)
    assert(fast == ref)
    assert(fast(0) == Seq(
      Some(java.lang.Double.doubleToRawLongBits(1.5)),
      Some(java.lang.Double.doubleToRawLongBits(0.5))))
  }

  test("an element with no finite contribution is null; an all-null group drops") {
    val rows = Seq[(Int, Seq[java.lang.Double])](
      (0, Seq(1.0, Double.NaN)),
      (0, Seq(2.0, Double.NaN)),
      (1, null), (1, null)) // group 1: posexplode emits nothing
    val (fast, ref) = bothForms(rows)
    assert(fast == ref)
    assert(fast(0)(1).isEmpty, "all-NaN element must be null")
    assert(!fast.contains(1), "all-null-array group must drop like the inner join did")
  }

  test("ragged arrays: per-element counts match posexplode's element-existence counts") {
    val rows = Seq[(Int, Seq[java.lang.Double])](
      (0, Seq(1.0, 10.0, 100.0)),
      (0, Seq(3.0)), // e0 count 2; e1/e2 count 1
      (0, Seq(5.0, 20.0)))
    val (fast, ref) = bothForms(rows)
    assert(fast == ref)
    assert(fast(0) == Seq(3.0, 15.0, 100.0).map(d =>
      Some(java.lang.Double.doubleToRawLongBits(d))))
  }

  test("float input is bit-identical to the d()-widened double input") {
    val rnd = new scala.util.Random(7L)
    val f = (1 to 200).map(i =>
      (i % 5, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("g", "emb") // ARRAY<FLOAT>
    val fast = collectCents(
      f.groupBy("g").agg(Similarity.centroid(col("emb")).as("cent"))
        .filter(col("cent").isNotNull).select("g", "cent"))
    val ref = collectCents(
      Similarity.centroidsViaPosexplode(f, "g", "emb").select("g", "cent"))
    assert(fast == ref)
  }

  test("128-bit sums: extreme-but-valid data the exploded form handled " +
      "stays bit-identical (ADVICE r17 — the single-long buffer refused here)") {
    // one row at 9e11 fit a scale-7 long; TWO overflowed it — the r17
    // kernel refused while the exploded decimal(30,7) sum was fine.
    // Now both forms agree to the bit.
    val sumLane = Seq[(Int, Seq[java.lang.Double])](
      (0, Seq(9e11)), (0, Seq(9e11)), (0, Seq(9e11)))
    val (fastS, refS) = bothForms(sumLane)
    assert(fastS == refS, "long-capacity sum lane diverged")
    // a SINGLE value inside decimal(20,7) but past scale-7 long capacity
    // (|x| in (9.2e11, 1e13)) — previously refused, now identical
    val valLane = Seq[(Int, Seq[java.lang.Double])](
      (0, Seq(5e12)), (0, Seq(-5e12, 3e12)), (1, Seq(9.9e12)))
    val (fastV, refV) = bothForms(valLane)
    assert(fastV == refV, "wide single-value lane diverged")
    // mixed signs crossing the low-word carry repeatedly
    val carryLane = (1 to 40).map(i => (0,
      Seq[java.lang.Double](if (i % 2 == 0) 9.2233e12 else -9.2233e12)))
    val (fastC, refC) = bothForms(carryLane)
    assert(fastC == refC, "carry-crossing lane diverged")
  }

  test("overflow refuses loudly exactly where the exploded form ANSI-throws, never wraps") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    def assertRefuses(rows: Seq[(Int, Seq[java.lang.Double])], what: String) = {
      val e = intercept[Exception] {
        frame(rows).groupBy("g")
          .agg(Similarity.centroid(col("emb")).as("cent")).collect()
      }
      assert(msgs(e).exists(_.contains("centroidsViaPosexplode")),
        s"$what must name the reference form, got: ${msgs(e).mkString(" | ")}")
    }
    // past the decimal(20,7) cliff (>=1e13) the DEPLOYED exploded form
    // throws too (default ansi=true) — crash-on-garbage is the existing
    // semantics, the kernel names where the semantics come from
    assertRefuses(Seq((0, Seq(2e13))), "past-decimal-cliff value")
    val refE = intercept[Exception] {
      Similarity.centroidsViaPosexplode(
        frame(Seq((0, Seq[java.lang.Double](2e13)))), "g", "emb").collect()
    }
    assert(msgs(refE).exists(_.contains("Decimal(20, 7)")),
      s"reference form must ANSI-throw past the cliff, got: " +
        msgs(refE).mkString(" | "))
  }

  test("128-bit accumulate: carry, sign, and the decimal(30,7) sum limit " +
      "— production-path helpers vs BigInt reference") {
    import graft.functions.{CentroidAggF, CentroidState}
    def st() = new CentroidState(1, new Array[Long](1), new Array[Long](1),
      new Array[Long](1), new Array[Long](1))
    def sumOf(s: CentroidState): BigInt =
      BigInt(CentroidAggF.sumToBigDecimal(s.sumsHi(0), s.sumsLo(0))
        .unscaledValue())
    // property: accumulate ≡ BigInt addition across sign/carry lanes
    // (values bounded by the per-value decimal(20,7) cap, as in update)
    val rnd = new scala.util.Random(1818L)
    val cap = BigInt(10).pow(20) - 1
    (1 to 200).foreach { trial =>
      val s = st()
      var ref = BigInt(0)
      (1 to 30).foreach { _ =>
        val v = (BigInt(rnd.nextLong()).abs.pow(2) % cap) *
          (if (rnd.nextBoolean()) 1 else -1)
        val lo = (v & ((BigInt(1) << 64) - 1)).toLong
        val hi = (v >> 64).toLong
        CentroidAggF.accumulate(s, 0, hi, lo)
        ref += v
        assert(sumOf(s) == ref, s"trial $trial: 128-bit add diverged from BigInt")
      }
    }
    // the limit is EXACT: a sum of 10^30−1 (decimal(30,7) max unscaled)
    // is representable; one more scale-7 unit refuses. Seed the state at
    // limit−1 directly (update() would need 1e11 capped adds to get
    // here) and take the last step through the production add.
    def seeded(v: BigInt) = {
      val s = st()
      s.sumsHi(0) = (v >> 64).toLong
      s.sumsLo(0) = (v & ((BigInt(1) << 64) - 1)).toLong
      s
    }
    val limit = BigInt(10).pow(30) - 1
    val almost = seeded(limit - 1)
    CentroidAggF.accumulate(almost, 0, 0L, 1L) // lands exactly ON the limit
    assert(sumOf(almost) == limit)
    val e = intercept[IllegalStateException] {
      CentroidAggF.accumulate(almost, 0, 0L, 1L) // one unit past refuses
    }
    assert(e.getMessage.contains("decimal(30,7)"), e.getMessage)
    // negative side is symmetric
    val neg = seeded(-(limit - 1))
    CentroidAggF.accumulate(neg, 0, -1L, -1L) // adds −1 → exactly −limit
    assert(sumOf(neg) == -limit)
    val e2 = intercept[IllegalStateException] {
      CentroidAggF.accumulate(neg, 0, -1L, -1L)
    }
    assert(e2.getMessage.contains("decimal(30,7)"), e2.getMessage)
  }

  test("graft_centroid reaches SQL via the registry, matches the Column form, arity fails loudly") {
    graft.functions.VectorExpressions.register(spark)
    val rows = Seq[(Int, Seq[java.lang.Double])](
      (0, Seq(1.0, 4.0)), (0, Seq(3.0, Double.NaN)), (1, Seq(10.0, 20.0)))
    frame(rows).createOrReplaceTempView("cent_sql_t")
    val sql = collectCents(spark.sql(
      "SELECT g, graft_centroid(emb) AS cent FROM cent_sql_t GROUP BY g"))
    val (fast, _) = bothForms(rows)
    assert(sql == fast, "SQL registry form diverged from the Column form")
    // wrong arity fails LOUDLY naming the function (the dotBuilder rule)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_centroid(emb, emb) FROM cent_sql_t").collect()
    }
    assert(e.getMessage.contains("graft_centroid"), e.getMessage)
    // the extensions installer injects it without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
  }

  test("wired paths stay identical: semanticDedup centroids on a realistic frame") {
    val rnd = new scala.util.Random(99L)
    val embs = (1L to 500L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val b = embs.withColumn("bucket", Similarity.lshBucket(
      col("embedding"), Similarity.hyperplanes(4, 16)))
    val fast = collectCents(
      b.groupBy("bucket").agg(Similarity.centroid(col("embedding")).as("cent"))
        .filter(col("cent").isNotNull)
        .select(col("bucket").cast("int"), col("cent")))
    val ref = collectCents(
      Similarity.centroidsViaPosexplode(b, "bucket", "embedding")
        .select(col("bucket").cast("int"), col("cent")))
    assert(fast == ref)
  }
}
