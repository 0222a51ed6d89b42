package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity}
import graft.engine.Tables

/** One-off decomposition of x50's sf1 cost (round 15): pair-generation
  * vs connected-components, and the CC small-graph dispatch at edge
  * counts past [[Dedup.SmallGraphEdges]] where the NODE count is tiny
  * (union-find memory is O(nodes); edges stream). Evidence for the
  * x50 scale adjudication in BENCH_NOTES — not part of the driver
  * contract. */
object X50Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[x50probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // fault the input once before ANY timed row so every stage below is
    // page-cache-warm uniformly (r16 — the estimate stage would
    // otherwise absorb the cold read that pre-r16 probe rows charged to
    // "pairs materialize", breaking cross-round row comparability)
    Tables.embeddings(spark, sfDir).count()
    // r16: the output-scale pre-flight — the same O(buckets) count the
    // armed maxPairs guard reads, priced before anything joins. The cap
    // is THE registered x50's cap (ExtQueries.PairOutputCap), never a
    // probe-local copy that could silently desynchronize.
    val cap = graft.ext.ExtQueries.PairOutputCap
    // likewise the keying params (review r17): reference the registered
    // x50's AutoTarget/AutoMaxPlanes, never probe-local literals that
    // would silently measure a different keying if the registered
    // defaults move
    val tgt = graft.ext.ExtQueries.AutoTarget
    val mp = graft.ext.ExtQueries.AutoMaxPlanes
    val est = t("estimate (pre-flight)")(
      Similarity.estimateBlockedPairsAuto(
        Tables.embeddings(spark, sfDir), "label",
        targetBucket = tgt, maxPlanes = mp))
    println(s"[x50probe] candidate_pairs=$est")
    if (est > cap) {
      // the registered x50's armed form: price the refusal an
      // unattended job pays INSTEAD of materializing a quadratic
      // answer (the unguarded sf10 run filled 78 GB of disk in the CC
      // checkpoint before failing — SF10_BENCH_r16 run 1)
      t(s"armed refusal (cap $cap)")(
        try {
          Similarity.blockedPairsAuto(Tables.embeddings(spark, sfDir),
            "vec_id", "label", minCos = 0.4, targetBucket = tgt,
            maxPlanes = mp, maxPairs = cap)
          println("[x50probe] UNEXPECTED: guard did not fire")
        } catch { case e: IllegalArgumentException =>
          println(s"[x50probe] refused: ${e.getMessage.take(100)}") })
      println("[x50probe] candidate space over the cap — skipping the " +
        "quadratic materialization (semanticDedup is the scale path)")
      spark.stop(); return
    }
    val pairs = Similarity.blockedPairsAuto(Tables.embeddings(spark, sfDir),
        "vec_id", "label", minCos = 0.4, targetBucket = tgt, maxPlanes = mp)
      .select("id_a", "id_b")
    val p = t("pairs materialize")(pairs.localCheckpoint(true))
    val e = t("edge count")(p.count())
    val n = t("node count")(p.select(explode(array(col("id_a"),
      col("id_b")))).distinct().count())
    println(s"[x50probe] edges=$e nodes=$n")
    // post-r15 the DEFAULT dispatch at this shape IS the union-find
    // (node-count second chance) — force the loop explicitly so the
    // two rows keep measuring different code paths (review r15)
    t("cc distributed (forced loop)")(
      Dedup.connectedKeepers(p, smallGraphEdges = 0L,
          smallGraphNodes = 0L)
        .write.format("noop").mode("overwrite").save())
    t("cc union-find (default dispatch at this shape)")(
      Dedup.connectedKeepers(p)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
