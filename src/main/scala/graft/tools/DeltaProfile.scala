package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ext.Dedup

/** Per-stage profile of `x67_delta_dedup` (VERDICT r9 item 2: widest
  * spread in the driver artifact, 3.30–8.77s median 4.67s; local r9
  * spread was 2.67–3.02s). Decomposes the query into its three
  * materialization points and reps each, so a variance source local to
  * one stage (the candidate `distinct()`, the index-side window count,
  * the candidate-side re-shingle) shows up as that stage's spread
  * rather than an opaque total.
  *
  * Usage: runMain graft.tools.DeltaProfile [sfDir] [reps] [warmup01]
  * `warmup01`=1 first runs the full query once at sf0.001 (the Bench
  * harness's warm-up), isolating what that warm-up does and doesn't
  * absorb of the first-measurement cost.
  * Emits one JSON line per rep plus a summary line.
  */
object DeltaProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val warmup = args.length > 2 && args(2) == "1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    if (warmup) {
      val t = time(noop(graft.SparkEntry
        .queries("x67_delta_dedup")(spark, "/root/testdata/sf0.001")))
      println(f"""{"warmup_sf0001_sec":$t%.3f}""")
    }

    val perStage = Array.fill(4)(Vector.newBuilder[Double])
    (1 to reps).foreach { rep =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val docs = Tables.documents(spark, sfDir)
      val sigs = Dedup.minhashSignatures(
        Dedup.hashedShingles(docs, "doc_id", "text"), "doc_id", 16)
      // stage 1: cross-frame banding + join + distinct, cached (the
      // query's own cache point)
      val cands = Dedup.lshCandidatesAcross(
          sigs.filter(col("doc_id") % 5 === 0),
          sigs.filter(col("doc_id") % 5 =!= 0), "doc_id")
        .select(col("id_new").as("id_a"), col("id_old").as("id_b"))
        .cache()
      val t1 = time(cands.count())
      // stage 2: candidate-id distinct + semi-join re-shingle
      val candIds = cands
        .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
        .distinct()
      val shCand = Dedup.hashedShingles(
        docs.join(candIds, Seq("doc_id"), "left_semi"), "doc_id", "text")
      val t2 = time(noop(shCand))
      // stage 3: exact-Jaccard verify + best-match window + sort
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("id_a")
        .orderBy(col("jaccard").desc, col("id_b"))
      val t3 = time(noop(
        Dedup.jaccardVerify(cands, shCand, "doc_id")
          .filter(col("jaccard") >= 0.8)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("id_a").as("id_new"), col("id_b").as("id_old"),
            col("common"), col("jaccard"))
          .orderBy("id_new")))
      cands.unpersist()
      val total = t1 + t2 + t3
      Seq(t1, t2, t3, total).zipWithIndex.foreach { case (t, i) =>
        perStage(i) += t
      }
      println(f"""{"rep":$rep,"cands_sec":$t1%.3f,"reshingle_sec":$t2%.3f,"verify_sec":$t3%.3f,"total_sec":$total%.3f}""")
    }
    val names = Seq("cands", "reshingle", "verify", "total")
    val summary = names.zip(perStage.map(_.result())).map { case (n, xs) =>
      f""""$n":{"min":${xs.min}%.3f,"med":${xs.sorted.apply(xs.size / 2)}%.3f,"max":${xs.max}%.3f}"""
    }.mkString(",")
    println(s"""{"metric":"delta_profile","sf":"$sfDir","reps":$reps,$summary}""")
    spark.stop()
  }
}
