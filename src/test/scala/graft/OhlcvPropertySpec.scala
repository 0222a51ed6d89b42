package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Ohlcv, Store}

/** ScalaCheck property tests (SURVEY §5.3): resample invariants, merge
  * associativity, upsert last-writer-wins — over generated tick sets, not
  * hand-picked fixtures. Sample counts are kept small because every sample
  * runs real Spark jobs. */
class OhlcvPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def check(name: String, p: Prop, samples: Int = 12): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(samples), p)
    assert(res.passed, s"$name: $res")
  }

  private val tickGen: Gen[List[(String, Long, Double)]] =
    Gen.nonEmptyListOf(for {
      sym <- Gen.oneOf("A", "B")
      t <- Gen.choose(0L, 4L * 3600 * 1000) // 4h span → up to 5 hourly buckets
      p <- Gen.choose(1, 10000).map(_ / 100.0) // 2-decimal prices
    } yield (sym, t, p))

  test("resample invariants: bounds, volume conservation, bucket count") {
    check("resample", Prop.forAll(tickGen) { ticks =>
      val df = ticks.map { case (s, t, p) => (s, msTs(t), p) }
        .toDF("symbol", "ts", "price")
      val out = Ohlcv.resampleTicks(df, "1h").collect()
      val volOk = math.abs(out.map(_.getAs[Double]("volume")).sum -
        ticks.map(_._3).sum) < 1e-6
      val boundsOk = out.forall { r =>
        val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"))
        l <= o && o <= h && l <= c && c <= h
      }
      val nOk = out.map(_.getAs[Long]("n")).sum == ticks.length
      val bucketBound = out.length <= ticks.map(_._1).distinct.length * 5
      volOk && boundsOk && nOk && bucketBound
    })
  }

  test("merge property: any 2-way split of ticks re-merges to the direct candle") {
    val gen = for {
      ticks <- tickGen
      mask <- Gen.listOfN(ticks.length, Gen.oneOf(true, false))
    } yield (ticks, mask)
    check("merge", Prop.forAll(gen) { case (ticks, mask) =>
      val (a, b) = ticks.zip(mask).partition(_._2)
      def mk(xs: List[((String, Long, Double), Boolean)]) =
        xs.map { case ((s, t, p), _) => (s, msTs(t), p) }
          .toDF("symbol", "ts", "price")
      val merged = Ohlcv.mergeCandles(
          Ohlcv.resampleTicksPartial(mk(a), "1h").unionByName(
            Ohlcv.resampleTicksPartial(mk(b), "1h")))
        .orderBy("symbol", "bucket")
        .select("symbol", "bucket", "open", "high", "low", "close", "n")
        .collect().toSeq
      val direct = Ohlcv.resampleTicksPartial(
          ticks.map { case (s, t, p) => (s, msTs(t), p) }
            .toDF("symbol", "ts", "price"), "1h")
        .orderBy("symbol", "bucket")
        .select("symbol", "bucket", "open", "high", "low", "close", "n")
        .collect().toSeq
      merged == direct
    }, samples = 10)
  }

  test("upsert property: last writer wins on every PK, others survive") {
    val rowGen = Gen.listOfN(30, for {
      t <- Gen.choose(0L, 10L).map(_ * 1000)
      c <- Gen.choose(0, 1000).map(_ / 10.0)
    } yield (t, c))
    check("upsert", Prop.forAll(rowGen, rowGen) { (ex, in) =>
      def mk(xs: List[(Long, Double)]) =
        xs.map { case (t, c) => (msTs(t), "S", "1m", c) }
          .toDF("ts", "symbol", "timeframe", "close")
          .dropDuplicates(Store.pk)
      val exD = mk(ex)
      val inD = mk(in)
      val out = Store.upsert(exD, inD).collect()
        .map(r => r.getAs[java.sql.Timestamp]("ts").getTime ->
          r.getAs[Double]("close")).toMap
      val exM = exD.collect().map(r =>
        r.getAs[java.sql.Timestamp]("ts").getTime -> r.getAs[Double]("close")).toMap
      val inM = inD.collect().map(r =>
        r.getAs[java.sql.Timestamp]("ts").getTime -> r.getAs[Double]("close")).toMap
      out == (exM ++ inM) // incoming overrides, union of keys, nothing else
    }, samples = 10)
  }
}
