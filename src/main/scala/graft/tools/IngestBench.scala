package graft.tools

import org.apache.spark.sql.SparkSession

/** Ingest-throughput measurement for the DSv2 kline source — the number
  * to hold against the reference's hard ceiling of ≈10,000 candles/s
  * (1,000-row pages × ≤10 req/s, BASELINE.md rows 1–3).
  * Usage: runMain graft.tools.IngestBench [nSymbols] [days]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nSymbols = if (args.length > 0) args(0).toInt else 8
    val days = if (args.length > 1) args(1).toInt else 30
    val cpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val symbols = (1 to nSymbols).map(i => s"SYM${i}USDT").mkString(",")
    val t0 = 1704067200000L
    def run(): Long = spark.read.format("graft.sources.KlineSource")
      .option("symbols", symbols).option("timeframe", "1m")
      .option("startMs", t0.toString)
      .option("endMs", (t0 + days * 86400000L).toString)
      .load().write.mode("overwrite").format("noop").save() match {
      case _ => nSymbols.toLong * days * 1440
    }
    run() // warm-up
    val start = System.nanoTime()
    val rows = run()
    val sec = (System.nanoTime() - start) / 1e9
    println(f"""{"metric":"ingest_rows_per_sec","value":${rows / sec}%.0f,"rows":$rows,"sec":$sec%.3f,"symbols":$nSymbols,"days":$days}""")
    spark.stop()
  }
}
