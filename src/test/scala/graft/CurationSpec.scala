package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Dedup, Retrieval, Similarity, TextAnalysis}

/** Behavioral invariants for the x71–x75 curation operators (the driver's
  * oracle gate pins exact values; these pin the semantics on constructed
  * corpora where the right answer is obvious). */
class CurationSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("bm25: term-rich short doc outranks term-poor long doc") {
    val docs = Seq(
      (1L, "spark join window spark join window spark"),
      (2L, "spark " + Seq.fill(200)("filler").mkString(" ")),
      (3L, Seq.fill(50)("noise").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, Seq("spark", "join", "window"),
      "doc_id", "text", k = 10).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L),
      "doc 3 matches nothing; doc 1 must outrank doc 2")
    assert(out(0).getAs[Double]("bm25") > out(1).getAs[Double]("bm25"))
    assert(out(0).getAs[Long]("n_terms") == 3L)
    assert(out(1).getAs[Long]("n_terms") == 1L)
  }

  test("dsir: on-target docs weigh above off-target docs") {
    val target = Seq((100L, "alpha beta gamma alpha beta"))
      .toDF("doc_id", "text")
    val source = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "omega psi chi omega psi"),
      (3L, "alpha omega beta psi"))
      .toDF("doc_id", "text")
    val w = Retrieval.dsirWeights(source, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("dsir_weight")).toMap
    // the ORDERING is the invariant; absolute sign is smoothing-dominated
    // at toy corpus size (add-half over 4096 buckets)
    assert(w(1L) > w(3L) && w(3L) > w(2L),
      s"expected on-target > mixed > off-target, got $w")
  }

  test("dsir: slice form is bit-identical to the two-frame form") {
    // target = the lang slice of source — the x72 shape; every bucket
    // class is exercised: shared, source-only, null lang (not counted)
    val source = Seq(
      (1L, "en", "alpha beta gamma alpha"),
      (2L, "de", "omega psi chi omega psi"),
      (3L, "en", "alpha omega beta psi"),
      (4L, null.asInstanceOf[String], "gamma chi gamma"),
      (5L, "fr", "alpha alpha alpha"))
      .toDF("doc_id", "lang", "text")
    val twoFrame = Retrieval.dsirWeights(
      source, source.filter(col("lang") === "en"), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val slice = Retrieval.dsirWeightsSlice(
      source, col("lang") === "en", "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(slice == twoFrame,
      s"slice form diverged:\n$slice\nvs\n$twoFrame")
  }

  test("rrf fusion: both-source docs outrank single-source docs, values exact") {
    val lex = Seq((1L, 9.0), (2L, 8.0), (3L, 7.0)).toDF("doc_id", "s1")
    val sem = Seq((1L, 0.9), (4L, 0.8), (5L, 0.7)).toDF("doc_id", "s2")
    val out = Retrieval.rrfFuse(lex, sem, "doc_id", "s1", "s2", k = 10)
      .collect()
    assert(out.head.getAs[Long]("doc_id") == 1L) // rank 1 in BOTH sources
    assert(out.head.getAs[Double]("rrf") == 2.0 / 61)
    // a doc present in one source only contributes one reciprocal
    val d2 = out.find(_.getAs[Long]("doc_id") == 2L).get
    assert(d2.getAs[Double]("rrf") == 1.0 / 62)
    assert(d2.isNullAt(d2.fieldIndex("sem_rank")))
    // every two-source doc outranks every equal-or-worse single-source doc
    assert(out.map(_.getAs[Long]("doc_id")).take(1).toSeq == Seq(1L))
  }

  test("semantic dedup: identical vectors collapse to one keeper") {
    val v = Array.fill(64)(0.5f)
    val other = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val embs = Seq((1L, v), (2L, v), (3L, v), (4L, other))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(embs, "vec_id", tau = 0.99)
      .collect()
    val dupRows = out.filter(r => Seq(1L, 2L, 3L).contains(
      r.getAs[Long]("vec_id")))
    // identical vectors share a bucket; centroid == the vector → cos 1
    assert(dupRows.map(_.getAs[Long]("bucket")).distinct.length == 1)
    assert(dupRows.count(_.getAs[Boolean]("is_keeper")) == 1)
    assert(dupRows.count(_.getAs[String]("action") == "drop") == 2)
    // the lone distinct vector keeps (keeper of its own bucket, or diverse)
    val loner = out.find(_.getAs[Long]("vec_id") == 4L).get
    assert(loner.getAs[String]("action") == "keep")
  }

  test("source overlap: identical sources J=1, disjoint pairs absent") {
    val docs = Seq(
      (1L, "srcA", "a b c d e f g h"),
      (2L, "srcB", "a b c d e f g h"),
      (3L, "srcC", "q r s t u v w x"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlap(docs).collect()
    assert(out.length == 1, "only the overlapping pair appears")
    val r = out.head
    assert(r.getAs[String]("src_a") == "srcA" &&
      r.getAs[String]("src_b") == "srcB")
    assert(r.getAs[Double]("jaccard") == 1.0)
  }

  test("bigram LM: corpus-typical transitions score below unseen ones") {
    val typical = Seq.fill(30)("alpha beta").mkString(" ")
    val docs = Seq(
      (1L, typical), (2L, typical), (3L, typical),
      (4L, "alpha beta " * 5 + "alpha beta"),
      (5L, "zeta eta theta iota kappa " * 3 + "zeta"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramXent(docs, "doc_id", "text", vocabK = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("xent")).toMap
    // docs 1-4 are made of the dominant alpha→beta / beta→alpha loop;
    // doc 5's tokens fall outside the top-4 vocab and its <unk> runs are
    // its own rare transitions
    assert(out(1L) < out(5L), s"typical ${out(1L)} !< atypical ${out(5L)}")
    assert(out(4L) < out(5L))
  }

  test("contamination spans: a planted benchmark passage is localized") {
    val bench = "copy this exact benchmark passage of twelve particular" +
      " tokens here now"
    val prefix = Seq.tabulate(10)(i => s"lead$i").mkString(" ")
    val suffix = Seq.tabulate(10)(i => s"tail$i").mkString(" ")
    val train = Seq(
      (100L, s"$prefix $bench $suffix"),
      (101L, Seq.tabulate(40)(i => s"clean$i").mkString(" ")))
      .toDF("doc_id", "text")
    val benchDf = Seq((0L, bench)).toDF("doc_id", "text")
    val out = Dedup.contaminationSpans(train, benchDf, "doc_id", "text",
      k = 3, minRunShingles = 3).collect()
    assert(out.length == 1, s"expected exactly the planted pair, got ${out.length}")
    val r = out.head
    assert(r.getAs[Long]("doc_id") == 100L)
    assert(r.getAs[Long]("bench_id") == 0L)
    // the benchmark is 11 tokens → 9 shingles, all shared, one island
    // starting right after the 10-token prefix
    assert(r.getAs[Long]("match_tokens") == 11L)
    assert(r.getAs[Int]("start_pos") == 10)
  }

  test("gopher rules are stream-composable: streamed verdicts equal batch") {
    // the bundle is pure per-row expressions (zero shuffles), so it
    // applies to a stream unchanged — the stateless ingest-filter shape
    val dir = java.nio.file.Files.createTempDirectory("graft_gstream").toString
    val docs = Seq(
      (1L, Seq.tabulate(40)(i => s"tok$i").mkString(" ") + " the of"),
      (2L, "the of tiny"),
      (3L, "the of " + Seq.fill(50)("dup").mkString(" ")))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = TextAnalysis.gopherRules(stream, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gopher_stream").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("gopher_stream").orderBy("doc_id").collect().toSeq
    val want = TextAnalysis.gopherRules(spark.read.parquet(s"$dir/in"),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(got == want)
  }

  test("duplicate spans: a shared passage localizes in both docs") {
    // 6 shared tokens → 4 shared trigram positions → span = 6 tokens
    val docs = Seq(
      (1L, "a1 a2 s1 s2 s3 s4 s5 s6 a3 a4"),            // 10 tokens
      (2L, "b1 b2 b3 s1 s2 s3 s4 s5 s6 b4 b5 b6"),      // 12 tokens
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"))           // nothing shared
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", k = 3,
      minSpanTokens = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L), "doc 3 shares nothing")
    for ((id, nTok) <- Seq(1L -> 10L, 2L -> 12L)) {
      assert(out(id).getAs[Long]("dup_tokens") == 6L)
      assert(out(id).getAs[Long]("n_spans") == 1L)
      assert(out(id).getAs[Long]("longest_span") == 6L)
      assert(out(id).getAs[Long]("n_tokens") == nTok)
      assert(out(id).getAs[Double]("dup_ratio") == 6.0 / nTok)
    }
  }

  test("duplicate spans: distant shared passages stay separate spans") {
    val p1 = "s1 s2 s3 s4 s5 s6"
    val p2 = "t1 t2 t3 t4 t5 t6"
    val docs = Seq(
      (1L, s"f1 f2 $p1 g1 g2 g3 g4 $p2 h1 h2"),
      (2L, s"$p2 z1 z2 z3 z4 z5 z6 z7 $p1"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", k = 3,
      minSpanTokens = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_spans") == 2L)
    assert(out(1L).getAs[Long]("dup_tokens") == 12L)
    assert(out(1L).getAs[Long]("longest_span") == 6L)
    assert(out(2L).getAs[Long]("n_spans") == 2L)
    assert(out(2L).getAs[Long]("dup_tokens") == 12L)
  }

  test("duplicate spans: adjacent coverage merges, a one-token hole splits") {
    // doc1 holds "s1..s6" contiguously; doc2 holds "s1 s2 s3" and
    // "s4 s5 s6" separately (never the bridging trigrams). doc1's dup
    // positions are exactly k=3 apart — token intervals [2,4] and [5,7]
    // are ADJACENT, one contiguous 6-token region, one span.
    val merged = Seq(
      (1L, "a1 a2 s1 s2 s3 s4 s5 s6 a3 a4"),
      (2L, "b1 b2 s1 s2 s3 b3 b4 s4 s5 s6 b5 b6"))
      .toDF("doc_id", "text")
    val m = Dedup.duplicateSpans(merged, "doc_id", "text", k = 3,
      minSpanTokens = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("n_spans") == 1L)
    assert(m(1L).getAs[Long]("longest_span") == 6L)
    assert(m(1L).getAs[Long]("dup_tokens") == 6L)
    // with a one-token hole between the shared halves the regions are
    // separate 3-token spans — each below minSpanTokens=4, so none emit
    val hole = Seq(
      (1L, "a1 a2 s1 s2 s3 zz s4 s5 s6 a3 a4"),
      (2L, "b1 b2 s1 s2 s3 b3 b4 s4 s5 s6 b5 b6"))
      .toDF("doc_id", "text")
    val h = Dedup.duplicateSpans(hole, "doc_id", "text", k = 3,
      minSpanTokens = 4).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!h.contains(1L))
  }

  test("duplicate spans: sub-threshold and within-doc-only repeats drop") {
    val docs = Seq(
      (1L, "a1 a2 w1 w2 w3 a3 a4 a5"),       // shares exactly one trigram
      (2L, "b1 b2 b3 w1 w2 w3 b4 b5"),       // (3 tokens < minSpanTokens=4)
      (3L, "r1 r2 r3 r1 r2 r3 r1 r2 r3"))    // self-repeat, no partner doc
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", k = 3,
      minSpanTokens = 4).collect()
    assert(out.isEmpty,
      "3-token overlap is sub-threshold; within-doc repeats need no scrub")
  }

  test("x81 temperature mix: tail languages boost, head languages damp") {
    val out = graft.ext.CurationQueries.x81TemperatureMix
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.length >= 2)
    // renormalized temperature distribution sums to 1 (mod round(6))
    val pSum = out.map(_.getAs[Double]("p_temp")).sum
    assert(math.abs(pSum - 1.0) < 1e-4, s"p_temp sums to $pSum")
    // α<1 ⇒ boost = p^(α−1)/Z decreases in share: every pair ordered by
    // n_docs must order opposite by boost (>= not >: near-equal shares
    // can legitimately round(·,6) to the same boost)
    for {
      a <- out; b <- out
      if a.getAs[Long]("n_docs") < b.getAs[Long]("n_docs")
    } assert(a.getAs[Double]("boost") >= b.getAs[Double]("boost"))
    // boosts straddle 1: a proper reweighting, not a uniform scale
    assert(out.map(_.getAs[Double]("boost")).max > 1.0)
    assert(out.map(_.getAs[Double]("boost")).min < 1.0)
  }

  test("x82 quality gate: keeps exactly the per-source low-repetition quartile") {
    val dir = "/root/testdata/sf0.001"
    val kept = graft.ext.CurationQueries.x82QualityGate.fn(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    // independent driver-side reference: same score, same rank rule
    val scored = graft.engine.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val t = r.getAs[String]("text").split(" ", -1)
        val grams = if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSeq
                    else Seq.empty
        (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          grams.size.toLong, grams.distinct.size.toLong)
      }
      .filter(_._3 > 0)
    val want = scored.groupBy(_._2).flatMap { case (_, rows) =>
      val ranked = rows
        .map { case (id, _, n, d) => (id, 1.0d - d.toDouble / n) }
        .sortBy { case (id, ratio) => (ratio, id) }
      val nKeep = (0.25 * (ranked.length - 1)).floor.toInt + 1
      ranked.take(nKeep).map(_._1).toSeq
    }.toSet
    assert(kept == want)
  }

  test("duplicate spans property: any planted shared passage is recovered exactly") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      l <- Gen.choose(4, 12)   // passage length ≥ minSpanTokens
      a1 <- Gen.choose(0, 6); b1 <- Gen.choose(0, 6)
      a2 <- Gen.choose(0, 6); b2 <- Gen.choose(0, 6)
    } yield (l, a1, b1, a2, b2)
    val p = Prop.forAll(gen) { case (l, a1, b1, a2, b2) =>
      val passage = (0 until l).map(i => s"sh$i")
      def doc(pre: Int, suf: Int, tag: String) =
        ((0 until pre).map(i => s"${tag}p$i") ++ passage ++
          (0 until suf).map(i => s"${tag}s$i")).mkString(" ")
      val docs = Seq(
        (1L, doc(a1, b1, "a")), (2L, doc(a2, b2, "b")),
        (3L, (0 until 30).map(i => s"u$i").mkString(" ")))
        .toDF("doc_id", "text")
      val out = Dedup.duplicateSpans(docs, "doc_id", "text", k = 3,
        minSpanTokens = 4).collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      out.keySet == Set(1L, 2L) &&
        Seq(1L, 2L).forall { id =>
          out(id).getAs[Long]("dup_tokens") == l.toLong &&
          out(id).getAs[Long]("n_spans") == 1L &&
          out(id).getAs[Long]("longest_span") == l.toLong
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, s"planted-passage recovery: $res")
  }


  test("x85 deterministic IVF: in-cell search is exact, probe recall holds") {
    val dir = "/root/testdata/sf0.001"
    val embs = graft.engine.Tables.embeddings(spark, dir)
    val corpus = embs.filter(col("vec_id") =!= 0)
    val q = embs.filter(col("vec_id") === 0)
    val ivf = Similarity.ivfDeterministicTopK(corpus, q, "vec_id", "label",
      nProbe = 2, k = 10).collect()
    assert(ivf.length == 10)
    // within the probed cells the search is EXACT: restricting brute
    // force to those labels must reproduce the IVF result identically
    val probedLabels = ivf.map(_.getAs[Int]("label")).toSet
    val inCell = Similarity.bruteForceTopK(
      corpus.filter(col("label").isin(probedLabels.toSeq: _*)), q,
      "vec_id", k = 10).collect()
    assert(ivf.map(_.getAs[Long]("vec_id")).toSeq ==
      inCell.map(_.getAs[Long]("vec_id")).toSeq)
    // against the GLOBAL exact top-10 the 2-of-10-cell probe keeps
    // useful recall (printed for the record; bound generous)
    val exact = Similarity.bruteForceTopK(corpus, q, "vec_id", k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = ivf.map(_.getAs[Long]("vec_id")).count(exact.contains) / 10.0
    info(s"x85 recall@10 vs exact: $recall")
    assert(recall >= 0.2, s"recall collapsed: $recall")
  }
  test("gopher rules: each gate isolates its own failure mode") {
    val good = ("good", (Seq.tabulate(40)(i => s"word$i") ++
      Seq("the", "of", "the", "of")).mkString(" "))
    val tooShort = ("short", "the of tiny")
    val repetitive = ("rep", ("the of " +
      Seq.fill(60)("spam").mkString(" ")))
    val docs = Seq(good, tooShort, repetitive).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getAs[String]("doc_id") -> r).toMap
    assert(out("good").getAs[Boolean]("pass"))
    assert(!out("short").getAs[Boolean]("size_ok"))
    assert(!out("rep").getAs[Boolean]("rep_ok"))
    assert(!out("rep").getAs[Boolean]("diversity_ok"))
    assert(!out("short").getAs[Boolean]("pass"))
    assert(!out("rep").getAs[Boolean]("pass"))
  }
}
