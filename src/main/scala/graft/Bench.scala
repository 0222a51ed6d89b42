package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout (driver contract).
  *
  * Runs the headline subset (`SparkEntry.benchQueries`) against
  * `SPARK_GRAFT_SF_DIR`. Each query is fully materialized through the noop
  * sink (so final sorts/projections are not optimized away, unlike
  * `count()`), after a warm-up pass at sf0.001 that JITs the common
  * codepaths out of the measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.benchQueries
    def run(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()

    names.foreach { n => // warm-up: JIT + codegen caches, tiny data
      try run(n, "/root/testdata/sf0.001")
      catch { case _: Throwable => () }
    }
    // a crashing query must not masquerade as a fast one: its entry is -1,
    // its error is listed, and it contributes nothing to the total
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val err = try { run(name, sfDir); None }
      catch { case t: Throwable =>
        Some(Option(t.getMessage).getOrElse(t.getClass.getName).take(120)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, e) =>
        "\"" + k + "\":" + (if (e.isDefined) "-1" else v.toString) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
        // strip everything JSON strings can't carry raw (quotes,
        // backslashes, ALL control chars), not just newlines
        "\"" + k + "\":\"" + e.replaceAll("[\\p{Cntrl}\"\\\\]", " ") + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    // round-2+ operators, timed OUTSIDE the headline so "value"/"queries"
    // stay comparable to the recorded baseline across rounds
    val extraNames = Seq("q40_range_join", "q41_incremental_resample",
      "x48_pack_sequences", "x50_embed_dedup")
      .filter(SparkEntry.queries.contains)
    extraNames.foreach { n =>
      try run(n, "/root/testdata/sf0.001") catch { case _: Throwable => () }
    }
    val extra = extraNames.map { name =>
      val t0 = System.nanoTime()
      val ok = try { run(name, sfDir); true } catch { case _: Throwable => false }
      "\"" + name + "\":" +
        (if (ok) ((System.nanoTime() - t0) / 1e9).toString else "-1")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"extra":$extra,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
