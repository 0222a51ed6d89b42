package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables
import graft.ext.Dedup

/** Dev probe, r20: race duplicateSpans' shipped agg+join form (2 shingle
  * kernel passes) against a fused groupBy(h, doc)+window form (1 kernel
  * pass, dup test as a window count over the aggregated frame — the x66
  * shape). Asserts result equality before timing. Not driver contract.
  * Usage: runMain graft.tools.X80Probe [sfDir] [reps]
  */
object X80Probe {
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

    val (k, minSpanTokens) = (3, 4)
    def docs = Tables.documents(spark, sfDir)

    def fusedSpans: DataFrame = {
      val byPos = Window.partitionBy("doc_id").orderBy("pos")
      val hits = Dedup.fanOut(docs).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          posexplode(Dedup.shingleHashArray(col("text"), k))
            .as(Seq("pos", "h")))
        .groupBy(col("h"), col("doc_id"))
        .agg(max(col("n_tokens")).as("n_tokens"),
          collect_list(col("pos")).as("_ps"))
        .withColumn("_nd", count(lit(1)).over(Window.partitionBy("h")))
        .filter(col("_nd") >= 2)
      hits.select(col("doc_id"), col("n_tokens"),
          explode(col("_ps")).as("pos"))
        .withColumn("_brk",
          when(col("pos") - lag(col("pos"), 1).over(byPos) <= k, lit(0))
            .otherwise(lit(1)))
        .withColumn("_grp", sum(col("_brk"))
          .over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "n_tokens", "_grp")
        .agg((max(col("pos")) - min(col("pos")) + k).cast("long")
          .as("span_tokens"))
        .filter(col("span_tokens") >= minSpanTokens)
        .groupBy("doc_id", "n_tokens")
        .agg(sum(col("span_tokens")).as("dup_tokens"),
          count(lit(1)).as("n_spans"),
          max(col("span_tokens")).as("longest_span"))
        .withColumn("dup_ratio", col("dup_tokens") / col("n_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
          col("n_spans"), col("longest_span"), col("dup_ratio"))
    }
    def shipped: DataFrame =
      Dedup.duplicateSpans(docs, "doc_id", "text", k, minSpanTokens)

    // equality first (orderBy doc_id, full collect diff)
    val a = shipped.orderBy("doc_id").collect().toSeq
    val b = fusedSpans.orderBy("doc_id").collect().toSeq
    require(a == b, s"MISMATCH: shipped ${a.size} rows vs fused ${b.size}")
    println(s"[x80probe] equality OK (${a.size} rows)")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => DataFrame): Unit = {
      noop(f)
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[x80probe] $label%-18s med ${xs(xs.size / 2)}%7.3f  min ${xs.head}%7.3f  max ${xs.last}%7.3f")
      Console.flush()
    }
    timed("shipped agg+join")(shipped.orderBy("doc_id"))
    timed("fused window")(fusedSpans.orderBy("doc_id"))
    spark.stop()
  }
}
