package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.ExtQueries

/** Training-pipeline operator invariants (x47–x49) beyond the oracle
  * equality the driver gate already enforces. */
class PipelineOpsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("x47 stratified split: md5 bucketing is deterministic, rates stratify") {
    val a = ExtQueries.x47StratifiedSplit.fn(spark, dir).collect()
    val b = ExtQueries.x47StratifiedSplit.fn(spark, dir).collect()
    assert(a.toSeq == b.toSeq, "sampling must not depend on run/partitioning")
    val ids = a.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "a doc sampled twice")
    assert(a.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")))
    val total = spark.read.parquet(s"$dir/documents.parquet")
    val enAll = total.filter(col("lang") === "en").count().toDouble
    val enKept = a.count(_.getAs[String]("lang") == "en").toDouble
    // md5 buckets are uniform-ish; 80% nominal, generous band for 218 docs
    assert(enKept / enAll > 0.6 && enKept / enAll < 0.95,
      s"en keep-rate ${enKept / enAll} not ~0.8")
  }

  test("x84 leak-safe split: near-dup groups never straddle a split boundary") {
    val out = ExtQueries.x84LeakSafeSplit.fn(spark, dir).collect()
    assert(out.length ==
      spark.read.parquet(s"$dir/documents.parquet").count(),
      "every doc must be assigned a split")
    val byGroup = out.groupBy(_.getAs[Long]("group_id"))
    // the test corpus has planted near-dups — the invariant must be
    // exercised, not vacuous
    val multi = byGroup.filter(_._2.length >= 2)
    assert(multi.nonEmpty, "no multi-doc group at sf0.001 — vacuous test")
    multi.foreach { case (g, rows) =>
      assert(rows.map(_.getAs[String]("split")).distinct.length == 1,
        s"group $g straddles splits")
    }
    // the group key must really be doing work: some clustered member's
    // OWN md5 bucket would have put it in a different split than its
    // group's (otherwise doc-keyed hashing would accidentally pass)
    def bucketOf(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    def splitOf(b: Long): String =
      if (b % 10 < 8) "train" else if (b % 10 == 8) "val" else "test"
    val rescued = multi.values.flatten.exists { r =>
      r.getAs[Long]("doc_id") != r.getAs[Long]("group_id") &&
        splitOf(bucketOf(r.getAs[Long]("doc_id"))) !=
          r.getAs[String]("split")
    }
    assert(rescued,
      "no member whose own hash disagrees with its group split — weak corpus")
  }

  test("x48 packing: bins are contiguous per lang and conserve tokens") {
    val out = ExtQueries.x48PackSequences.fn(spark, dir).collect()
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).sorted
      assert(bins.head == 0L, s"$lang: first bin ${bins.head}")
      assert(bins.zip(bins.tail).forall { case (x, y) => y == x + 1 },
        s"$lang: bins not contiguous")
    }
    val packedTokens = out.map(_.getAs[Long]("total_tokens")).sum
    val directTokens = spark.read.parquet(s"$dir/documents.parquet")
      .select(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0)
    assert(packedTokens == directTokens, "packing dropped or duplicated tokens")
  }

  test("x48 distributed prefix sum ≡ single-window packing on a skewed corpus") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 95% of docs in one language — the skew that would serialize a
    // single lang-partitioned window into one task
    val docs = (0L until 2000L).map { i =>
      (i, if (i % 20 == 0) "de" else "en", (1 + rnd.nextInt(300)).toLong)
    }.toDF("doc_id", "lang", "tokens")
    val got = graft.ext.Packing
      .packDocs(docs, "doc_id", "lang", "tokens", budget = 256, chunkSize = 64)
      .select("doc_id", "cum", "bin")
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = docs.withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("bin", floor((col("cum") - col("tokens")) / 256))
      .select("doc_id", "cum", "bin")
    assert(got.except(want).count() == 0 && want.except(got).count() == 0,
      "chunked prefix sum diverged from the single-window form")
  }

  test("x53 quantization: reconstruction error ≤ half a quantization step, cosine ≈ 1") {
    val out = ExtQueries.x53QuantizeEmbeddings.fn(spark, dir).collect()
    assert(out.nonEmpty)
    // per-vector step = (max-min)/255; affine quantization bounds the
    // reconstruction error by step/2 (+ fp slack)
    val steps = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), ((array_max(transform(col("embedding"),
        x => x.cast("double"))) - array_min(transform(col("embedding"),
        x => x.cast("double")))) / 255.0).as("step"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      val (id, err, cos) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      assert(err <= steps(id) / 2 + 1e-12, s"vec $id err $err > step/2")
      assert(cos > 0.999, s"vec $id cosine fidelity $cos")
    }
  }

  test("packing property: chunked ≡ single-window for random corpora and chunk sizes") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    for (seed <- Seq(3, 17); chunkSize <- Seq(1, 7, 64, 5000)) {
      val rnd = new scala.util.Random(seed)
      // sparse, non-contiguous ids — chunk assignment must not assume density
      val docs = (0 until 500).map { _ =>
        (rnd.nextInt(100000).toLong, "L" + rnd.nextInt(3),
          (1 + rnd.nextInt(400)).toLong)
      }.distinctBy(_._1).toDF("doc_id", "lang", "tokens")
      val got = graft.ext.Packing
        .packDocs(docs, "doc_id", "lang", "tokens", 256, chunkSize)
        .select("doc_id", "cum", "bin")
      val want = docs.withColumn("cum", sum(col("tokens")).over(w))
        .withColumn("bin", floor((col("cum") - col("tokens")) / 256))
        .select("doc_id", "cum", "bin")
      assert(got.except(want).count() == 0 && want.except(got).count() == 0,
        s"seed $seed chunkSize $chunkSize diverged")
    }
  }

  test("x54 repetition: duplicated 3-grams raise the ratio; short docs are null") {
    import spark.implicits._
    val sh = graft.ext.Dedup.shingles(col("text"))
    val out = Seq(
      (1L, "a b c a b c a b c"), // 7 grams, 3 distinct → 1 - 3/7
      (2L, "w x"),               // <3 tokens → null
      (3L, "p q r s")            // 2 grams, both unique → 0.0
    ).toDF("doc_id", "text")
      .select(col("doc_id"), size(sh).cast("long").as("n"),
        size(array_distinct(sh)).cast("long").as("d"))
      .withColumn("r", when(col("n") === 0, lit(null).cast("double"))
        .otherwise(lit(1.0d) - col("d") / col("n")))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(out(1L).getDouble(3) == 1.0 - 3.0 / 7.0)
    assert(out(2L).isNullAt(3))
    assert(out(3L).getDouble(3) == 0.0)
  }

  test("x49 decontamination: flags exactly the docs sharing a benchmark 3-gram") {
    val out = ExtQueries.x49Decontaminate.fn(spark, dir).collect()
    assert(out.forall(_.getAs[Long]("doc_id") >= 25), "benchmark doc flagged")
    assert(out.forall(_.getAs[Long]("n_shared") >= 1))
    // a doc that IS a benchmark doc's text must be flagged (self-overlap):
    // construct the check from data — any duplicate text across the split
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val dupAcross = docs.filter(col("doc_id") < 25).select(col("text"))
      .intersect(docs.filter(col("doc_id") >= 25).select(col("text")))
      .count()
    val flagged = out.map(_.getAs[Long]("doc_id")).toSet
    if (dupAcross > 0) {
      val dupIds = docs.filter(col("doc_id") >= 25)
        .join(docs.filter(col("doc_id") < 25).select(col("text")), Seq("text"),
          "left_semi")
        .filter(size(split(col("text"), " ")) >= 3) // needs ≥1 shingle
        .select("doc_id").collect().map(_.getLong(0))
      assert(dupIds.forall(flagged.contains), "exact cross-split dup not flagged")
    }
  }

  test("x70 linear classifier: score matches a hand-rolled reference; keep thresholds it") {
    import spark.implicits._
    import graft.ext.{Dedup, TextAnalysis}
    val docs = Seq((1L, "alpha beta gamma"), (2L, "one"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.hashedLinearScore(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // reference scorer: same md5-60-bit hash, same weight formula, in JVM
    def base(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val h = (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
      (h >>> 4) % Dedup.P
    }
    def score(text: String): (Long, Long) = {
      val t = text.split(" ", -1)
      val feats = t.toSeq ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      val s = feats.map(g =>
        TextAnalysis.lmWeight((base(g) % TextAnalysis.LmDim).toInt).toLong).sum
      (feats.size.toLong, s)
    }
    Seq(1L -> "alpha beta gamma", 2L -> "one", 3L -> "a b c d e").foreach {
      case (id, text) =>
        val (nf, ss) = score(text)
        assert(out(id).getAs[Long]("n_feat") == nf, s"doc $id n_feat")
        assert(out(id).getAs[Long]("score_sum") == ss, s"doc $id score_sum")
        assert(out(id).getAs[Double]("score") == ss.toDouble / nf)
        assert(out(id).getAs[Boolean]("keep") == (ss.toDouble / nf > 0.0))
    }
    // weight table is the documented stand-in: bounded and symmetric-ish
    val ws = (0 until TextAnalysis.LmDim).map(TextAnalysis.lmWeight)
    assert(ws.min >= -1000 && ws.max <= 1000)
  }

  test("x56 builder is lazy: constructing the frame runs zero Spark jobs") {
    // Regression pin for the round-11 fix: the unigram-LM scorer used an
    // eager `.head` for the corpus total, running a FULL corpus job at
    // plan-CONSTRUCTION time (before any caller consumed the result) —
    // the exact anti-pattern x69's lazy-broadcast-scalar device exists to
    // avoid. The one job construction legitimately fires is parquet
    // schema inference (`parquet at Tables.scala` — a footer read, file-
    // count-bounded metadata, no row scan); ANY other job at construction
    // is an eager action over corpus rows and must fail here. Listener
    // delivery is async, so poll until the observed set is stable.
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.add(s.stageInfos.map(_.name).mkString("|"))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      ExtQueries.x56UnigramScore.fn(spark, dir) // construct only
      val deadline = System.nanoTime() + 5000000000L
      var stableSince = System.nanoTime()
      var seen = jobs.size
      while (System.nanoTime() < deadline &&
          System.nanoTime() - stableSince < 500000000L) {
        Thread.sleep(20)
        if (jobs.size != seen) { seen = jobs.size; stableSince = System.nanoTime() }
      }
      val eager = jobs.toArray(Array.empty[String])
        .filterNot(_.contains("parquet at"))
      assert(eager.isEmpty,
        s"query construction started eager Spark job(s) " +
          s"[${eager.mkString("; ")}] — " +
          "the corpus total must stay a lazy broadcast scalar")
      // and the lazy form still computes: consuming it now runs the jobs
      assert(ExtQueries.x56UnigramScore.fn(spark, dir).limit(1).count() == 1L)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache() // x56 caches its vocab frame
    }
  }
}
