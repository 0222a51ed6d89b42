package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables

/** Dev probe, r20: same-JVM A/B of q26's one-scan tagged form vs the
  * old two-scan union form. Not part of the driver contract.
  * Usage: runMain graft.tools.Q26Probe [sfDir] [reps]
  */
object Q26Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => DataFrame): Unit = {
      noop(f) // warm
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q26probe] $label%-22s med ${xs(xs.size / 2)}%7.3f  min ${xs.head}%7.3f  max ${xs.last}%7.3f")
      Console.flush()
    }

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def finish(tagged: DataFrame): DataFrame = tagged
      .withColumn("asof_view_ms",
        last(when(col("side") === 0, unix_millis(col("ts"))),
          ignoreNulls = true).over(w))
      .withColumn("asof_value",
        last(when(col("side") === 0, col("value")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"), col("asof_view_ms"),
        col("asof_value"))
      .orderBy("event_id")

    timed("old two-scan union") {
      val ev = Tables.events(spark, sfDir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"), lit(0).as("side"),
          lit(null).cast("long").as("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), lit(1).as("side"),
          col("event_id"))
      finish(views.unionByName(purchases))
    }
    timed("new one-scan tagged") {
      val ev = Tables.events(spark, sfDir)
      finish(ev.filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("ts"), col("value"),
          when(col("event_type") === "purchase", lit(1)).otherwise(lit(0))
            .as("side"),
          when(col("event_type") === "purchase", col("event_id"))
            .as("event_id")))
    }
    spark.stop()
  }
}
