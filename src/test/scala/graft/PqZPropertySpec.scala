package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Store
import graft.ext.Pq

/** ScalaCheck properties for the round-11 kernels — generated inputs,
  * driver-side reference implementations that replicate the EXACT
  * arithmetic (same IEEE ops in the same order), so expectations are
  * bit-level, not tolerance-level, wherever the ops allow:
  *
  *  - PQ encode (`NearestCentroidF` over slices): codes equal the
  *    reference argmin for arbitrary float vectors and codebooks;
  *  - PQ ADC (`PqAdcF`): the scored approximate cosine equals the
  *    reference LUT fold / (recon · ‖q‖);
  *  - Z-order (`Store.withZValue`): the Morton value equals the
  *    reference interleave of min–max-scaled cells for arbitrary long
  *    pairs and bit widths.
  *
  * Sample counts small — every sample runs real Spark jobs. */
class PqZPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def check(name: String, p: Prop, samples: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(samples), p)
    assert(res.passed, s"$name: $res")
  }

  test("property: PQ encode ≡ reference argmin; ADC cosine ≡ reference " +
      "LUT fold, for arbitrary vectors and seeds") {
    val dim = 8
    val m = 2
    val k = 3
    val gen = for {
      seed <- Gen.choose(0L, 1000L)
      n <- Gen.choose(1, 12)
      vecs <- Gen.listOfN(n,
        Gen.listOfN(dim, Gen.choose(-1000, 1000).map(_ / 100.0f)))
      q <- Gen.listOfN(dim, Gen.choose(-1000, 1000).map(_ / 100.0))
    } yield (seed, vecs, q.toIndexedSeq)
    check("pq", Prop.forAll(gen) { case (seed, vecs, q) =>
      val cb = Pq.deterministicCodebooks(dim, m, k, seed)
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "embedding")
      val got = Pq.pqEncode(df, "embedding", cb)
        .withColumn("s", Pq.adcCosine(col("codes"), col("recon_norm"), q, cb))
        .select("id", "codes", "recon_norm", "s")
        .collect().map(r => r.getLong(0) ->
          ((r.getSeq[Int](1), r.getDouble(2), r.getDouble(3)))).toMap
      val lut = Pq.adcLut(q, cb)
      val qn = math.sqrt(q.foldLeft(0.0)((a, x) => a + x * x))
      vecs.zipWithIndex.forall { case (v, i) =>
        // reference argmin: same element-order double fold, first-min tie
        val codes = (0 until m).map { s =>
          val slice = v.slice(s * (dim / m), (s + 1) * (dim / m))
          (0 until k).minBy { c =>
            val cw = cb.cents(s)(c)
            slice.zipWithIndex.foldLeft(0.0) { case (a, (x, j)) =>
              val d = x.toDouble - cw(j); a + d * d }
          } // minBy keeps the FIRST minimum — the NearestCentroidF rule
        }
        val recon = math.sqrt(codes.zipWithIndex
          .foldLeft(0.0) { case (a, (c, s)) => a + cb.normSq(s)(c) })
        val adc = codes.zipWithIndex
          .foldLeft(0.0) { case (a, (c, s)) => a + lut(s)(c) }
        val (gc, gr, gs) = got(i.toLong)
        gc == codes && gr == recon &&
          math.abs(gs - adc / (recon * qn)) <= 1e-12 * math.max(1.0, math.abs(gs))
      }
    })
  }

  test("property: z-order value ≡ reference interleave of min–max-scaled " +
      "cells, for arbitrary long pairs and bit widths") {
    val gen = for {
      bits <- Gen.choose(2, 16)
      n <- Gen.choose(2, 20)
      xs <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
      ys <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
    } yield (bits, xs.zip(ys))
    check("zorder", Prop.forAll(gen) { case (bits, pts) =>
      val df = pts.toDF("x", "y")
      val got = Store.withZValue(df, Seq("x", "y"), bits)
        .select("x", "y", "_z").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val maxCell = ((1L << bits) - 1).toDouble
      val (xs, ys) = (pts.map(_._1), pts.map(_._2))
      def cell(v: Long, mn: Long, mx: Long): Long =
        if (mx > mn)
          math.floor((v.toDouble - mn.toDouble) /
            (mx.toDouble - mn.toDouble) * maxCell).toLong
        else 0L
      pts.forall { case (x, y) =>
        val (cx, cy) = (cell(x, xs.min, xs.max), cell(y, ys.min, ys.max))
        val ref = (0 until bits).foldLeft(0L) { (acc, b) =>
          acc + (((cx >> b) & 1L) << (b * 2)) + (((cy >> b) & 1L) << (b * 2 + 1))
        }
        got((x, y)) == ref
      }
    })
  }

  // ------------------------------------------------------------ round 12

  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftBridge.column(e)
  private def toExpr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftBridge.expression(c)

  test("property: BucketIdF ≡ reference upper bound, including duplicate " +
      "boundaries and values exactly ON a boundary") {
    val gen = for {
      raw <- Gen.nonEmptyListOf(Gen.choose(-100, 100).map(_ / 10.0))
      // values drawn from the boundary pool (exact hits) and off-grid
      vs <- Gen.nonEmptyListOf(Gen.oneOf(
        Gen.oneOf(raw), Gen.choose(-1500, 1500).map(_ / 100.0)))
    } yield (raw.sorted.toIndexedSeq, vs)
    check("bucketid", Prop.forAll(gen) { case (bnds, vs) =>
      val got = vs.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("id", "v")
        .withColumn("b", toCol(graft.functions.BucketIdF(
          toExpr(col("v")), bnds)))
        .select("id", "b").collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      vs.zipWithIndex.forall { case (v, i) =>
        got(i) == bnds.count(_ <= v) // upper bound, duplicates included
      }
    })
  }

  test("property: NearestInArrayF over a candidate column ≡ " +
      "NearestCentroidF over the same matrix (id-sorted candidates, " +
      "first-min ties)") {
    val dim = 4
    val gen = for {
      nc <- Gen.choose(1, 6)
      cents <- Gen.listOfN(nc,
        Gen.listOfN(dim, Gen.choose(-100, 100).map(_ / 10.0)))
      n <- Gen.choose(1, 8)
      // draw vectors from the centroid pool too: exact ties exercise
      // the first-min rule in both kernels
      vecs <- Gen.listOfN(n, Gen.oneOf(
        Gen.oneOf(cents), Gen.listOfN(dim, Gen.choose(-100, 100).map(_ / 10.0))))
    } yield (cents.map(_.toIndexedSeq).toIndexedSeq, vecs)
    check("nearestInArray", Prop.forAll(gen) { case (cents, vecs) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "emb")
        .withColumn("emb", transform(col("emb"), x => x.cast("double")))
      val cands = array(cents.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("cell"),
          array(c.map(lit(_)): _*).as("cent"))
      }: _*)
      val got = df
        .withColumn("a", toCol(graft.functions.NearestInArrayF(
          toExpr(col("emb")), toExpr(cands))))
        .withColumn("b", toCol(graft.functions.NearestCentroidF(
          toExpr(col("emb")), cents)))
        .select("a", "b").collect()
      got.forall(r => r.getInt(0) == r.getInt(1))
    })
  }

  test("property: PqAdcPairF over a LUT column ≡ PqAdcF with the same " +
      "LUT as a reference object, for arbitrary codes") {
    val gen = for {
      m <- Gen.choose(1, 4)
      k <- Gen.choose(1, 5)
      lut <- Gen.listOfN(m,
        Gen.listOfN(k, Gen.choose(-1000, 1000).map(_ / 100.0)))
      n <- Gen.choose(1, 8)
      codes <- Gen.listOfN(n, Gen.listOfN(m, Gen.choose(0, k - 1)))
    } yield (m, k, lut.map(_.toIndexedSeq).toIndexedSeq, codes)
    check("adcPair", Prop.forAll(gen) { case (m, k, lut, codes) =>
      val flat = array(lut.flatten.map(lit(_)): _*)
      val got = codes.zipWithIndex.map { case (c, i) => (i, c) }
        .toDF("id", "codes")
        .withColumn("a", toCol(graft.functions.PqAdcPairF(
          toExpr(col("codes")), toExpr(flat), k)))
        .withColumn("b", toCol(graft.functions.PqAdcF(
          toExpr(col("codes")), lut)))
        .select("a", "b").collect()
      // bit-identical: both fold lut(s)(code_s) in ascending s
      got.forall(r => r.getDouble(0) == r.getDouble(1))
    })
  }

  test("property: SqEncodeF ≡ reference codeOf per element (degenerate " +
      "and out-of-range included); SqDecodeF is bit-exact; the " +
      "quantization lattice is a fixpoint (re-encode of a decode is " +
      "the identity on codes)") {
    val gen = for {
      dim <- Gen.choose(2, 8)
      levels <- Gen.oneOf(2, 16, 256)
      // bounds: lo <= hi, with a genuine chance of degenerate dims
      bounds <- Gen.listOfN(dim, for {
        lo <- Gen.choose(-1000, 1000).map(_ / 10.0)
        w <- Gen.oneOf(Gen.const(0.0),
          Gen.choose(1, 2000).map(_ / 10.0))
      } yield (lo, lo + w))
      n <- Gen.choose(1, 10)
      // inputs scaled to land in-range, at the edges, and OUTSIDE
      vecs <- Gen.listOfN(n, Gen.listOfN(dim,
        Gen.choose(-1500, 2500).map(_ / 1000.0f)))
    } yield (bounds.toIndexedSeq, levels, vecs)
    check("sq", Prop.forAll(gen) { case (bounds, levels, vecs) =>
      val lo = bounds.map(_._1)
      val hi = bounds.map(_._2)
      val p = graft.ext.Sq.SqParams(lo, hi, levels)
      // t in [-1.5, 2.5] maps each raw gen value across the dim's range
      val scaled = vecs.map(v => v.zipWithIndex.map { case (t, i) =>
        (lo(i) + t * (hi(i) - lo(i))).toFloat })
      val got = scaled.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "embedding")
        .withColumn("codes", graft.ext.Sq.sqEncodeCol(col("embedding"), p))
        .withColumn("dec", graft.ext.Sq.sqDecodeCol(col("codes"), p))
        .withColumn("recode", graft.ext.Sq.sqEncodeCol(col("dec"), p))
        .select("id", "codes", "dec", "recode").collect()
        .map(r => r.getLong(0) ->
          ((r.getSeq[Int](1), r.getSeq[Double](2), r.getSeq[Int](3)))).toMap
      scaled.zipWithIndex.forall { case (v, i) =>
        val (codes, dec, recode) = got(i.toLong)
        codes.length == v.length && v.indices.forall { j =>
          val c = graft.functions.SqEncodeF.codeOf(
            v(j).toDouble, lo(j), hi(j), levels)
          // encode matches the shared scalar rule; decode is the exact
          // affine map; a lattice point re-encodes to ITSELF (the
          // half-up window absorbs the scale/rescale fp error)
          codes(j) == c && dec(j) == lo(j) + c * p.step(j) &&
            recode(j) == c
        }
      }
    })
  }
}
