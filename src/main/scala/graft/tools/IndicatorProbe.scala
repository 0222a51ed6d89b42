package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Indicators, Ohlcv, Tables}

/** Dev probe, r20: decompose q50_bollinger / q56_atr wall-clock into
  * sub-pipeline times (resample agg only → +window → +sort) so the
  * "two window passes / serial window stage" hypothesis is measured,
  * not assumed. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.IndicatorProbe [sfDir] [reps]
  */
object IndicatorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def closes = Ohlcv.resampleTicks(Tables.events(spark, sfDir), "1h",
      symbolCol = "user_id", tsCol = "ts", priceCol = "value")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      f // warm
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[iprobe] $label%-34s med ${xs(xs.size / 2)}%7.3f  min ${xs.head}%7.3f  max ${xs.last}%7.3f")
      Console.flush()
    }

    timed("agg only (resampleTicks)") { noop(closes) }
    timed("agg + bollinger window") {
      noop(Indicators.bollinger(closes, "user_id", n = 20, k = 2.0))
    }
    timed("agg + window + project") {
      noop(Indicators.bollinger(closes, "user_id", n = 20, k = 2.0)
        .select(col("user_id"), unix_millis(col("bucket")).as("bucket_ms"),
          round(col("close"), 4).as("close"), col("mid"), col("upper"),
          col("lower")))
    }
    timed("q50 full (+orderBy)") {
      noop(graft.SparkEntry.queries("q50_bollinger")(spark, sfDir))
    }
    timed("agg + atr windows") {
      noop(Indicators.atr(closes, "user_id", n = 14))
    }
    timed("q56 full (+orderBy)") {
      noop(graft.SparkEntry.queries("q56_atr")(spark, sfDir))
    }

    // variant race: fold the row_number full-window guard into the
    // sliding frame (count-in-frame == n ⟺ rn >= n) so the window op
    // runs one frame processor instead of two
    import org.apache.spark.sql.expressions.Window
    def dec4(c: org.apache.spark.sql.Column) =
      round(c, 4).cast("decimal(18,4)")
    timed("bollinger count-guard variant") {
      val order = Window.partitionBy("user_id").orderBy("bucket")
      val win = order.rowsBetween(-19, 0)
      val withSums = closes
        .withColumn("_c", dec4(col("close")))
        .withColumn("_c2",
          round(col("_c").cast("double") * col("_c").cast("double"), 8)
            .cast("decimal(28,8)"))
        .withColumn("_cnt", count(lit(1)).over(win))
        .withColumn("_s1", sum(col("_c")).over(win))
        .withColumn("_s2", sum(col("_c2")).over(win))
        .filter(col("_cnt") === 20)
      val mean = col("_s1").cast("double") / 20
      val varPop = greatest(
        (col("_s2").cast("double") -
          col("_s1").cast("double") * col("_s1").cast("double") / 20) / 20,
        lit(0.0))
      noop(withSums
        .withColumn("mid", round(mean, 6))
        .withColumn("upper", round(mean + sqrt(varPop) * 2.0, 6))
        .withColumn("lower", round(mean - sqrt(varPop) * 2.0, 6))
        .select(col("user_id"), col("bucket"), col("close"), col("mid"),
          col("upper"), col("lower")))
    }
    timed("atr count-guard variant") {
      val order = Window.partitionBy("user_id").orderBy("bucket")
      val win = order.rowsBetween(-13, 0)
      noop(closes
        .withColumn("_h", dec4(col("high")))
        .withColumn("_l", dec4(col("low")))
        .withColumn("_c", dec4(col("close")))
        .withColumn("_pc", lag(col("_c"), 1).over(order))
        .filter(col("_pc").isNotNull)
        .withColumn("tr", greatest(
          col("_h") - col("_l"),
          abs(col("_h") - col("_pc")),
          abs(col("_l") - col("_pc"))).cast("decimal(19,4)"))
        .withColumn("_cnt", count(lit(1)).over(win))
        .withColumn("_st", sum(col("tr")).over(win))
        .filter(col("_cnt") === 14)
        .withColumn("atr", round(col("_st").cast("double") / 14, 6))
        .select(col("user_id"), col("bucket"),
          col("tr").cast("double").as("tr"), col("atr")))
    }
    spark.stop()
  }
}
