package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.Dedup

/** Stage decomposition for x31_minhash_lsh's epoch bimodality
  * (BENCH_GATE_ISO_r18: 2.0–2.2s club vs 3.4–6.0s club across
  * sessions, code unchanged — the armed r19 watch item). The full
  * query is one wall-clock number; when an epoch flags, this probe
  * says WHICH stage moved:
  *
  *   sigs  — shingle hash + 16-permutation MinHash aggregate
  *           (CPU-bound codegen, one shuffle)
  *   cands — LSH banding + window bucket guard + collect/pair-expand
  *           + distinct (two shuffles, spill-sensitive)
  *   full  — the registered x31 pipeline (adds candidate-only shingle
  *           re-join + exact-Jaccard verify)
  *
  * Protocol matches QueryTime: one uncounted warm-up rep, then the
  * median of `reps` fully-materialized (noop sink) executions, cache
  * cleared between reps. One JSON line to stdout.
  *
  * Usage: runMain graft.tools.X31Probe [sfDir] [reps]
  */
object X31Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = graft.engine.Tables.documents(spark, sfDir)
    def sigs = Dedup.signatureColumns(docs, "doc_id", "text", 16)

    def medianOf(build: => org.apache.spark.sql.DataFrame): Double = {
      def rep(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        build.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      rep() // uncounted warm-up
      val xs = Seq.fill(reps)(rep()).sorted
      xs(xs.length / 2)
    }

    val stages = Seq(
      "sigs" -> (() => sigs),
      "cands" -> (() => Dedup.lshCandidates(sigs, "doc_id")),
      "full" -> (() => graft.SparkEntry.queries("x31_minhash_lsh")(spark, sfDir)))
    val meds = stages.map { case (n, b) => n -> medianOf(b()) }
    val load = scala.io.Source.fromFile("/proc/loadavg").mkString
      .split(' ').take(3).mkString(" ")
    // Locale.ROOT: "%.3f".format follows the JVM default locale, and a
    // comma-decimal locale would emit invalid JSON (ADVICE r18 #4)
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"x31_stages","unit":"sec","reps":$reps,""" +
      meds.map { case (n, v) => s""""$n":${fmt(v)}""" }
        .mkString(",") +
      s""","loadavg":"$load","sf":"$sfDir"}""")
    spark.stop()
  }
}
