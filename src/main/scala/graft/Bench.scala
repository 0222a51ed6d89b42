package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — two JSON lines on stdout (driver contract).
  *
  * Line 1 is the FULL artifact (medians, spreads, errors, truncation);
  * line 2 is a ~140-byte compact summary with the same `"metric"`/
  * `"value"`/`"n_measured"`/`"n_truncated"` fields and no per-query
  * maps. The driver records only the tail of stdout, which clipped the
  * head of the single ~4 KB line in rounds 5–6 (`parsed: null`); the
  * compact line always fits the tail window whole, and the full line
  * orders its bulky maps first so the per-query medians ALSO land in
  * the tail. See [[artifactLines]].
  *
  * Runs the headline subset (`SparkEntry.benchQueries`) against
  * `SPARK_GRAFT_SF_DIR`. Each query is fully materialized through the noop
  * sink (so final sorts/projections are not optimized away, unlike
  * `count()`), after a warm-up pass at sf0.001 that JITs the common
  * codepaths out of the measurement.
  *
  * Methodology (round 4, hardened round 5):
  *  - each query is measured `SPARK_GRAFT_REPS` times (default 3) and the
  *    MEDIAN is reported (true median: mean of the middle two when the rep
  *    count is even), with min/max recorded in `"spread"`;
  *  - reps are interleaved ROUND-ROBIN (q1 rep1, q2 rep1, …, q1 rep2, …)
  *    so one transient host-contention window cannot define every rep of a
  *    single query — with sequential reps, the r3 driver run had rep-2/3 of
  *    the two heaviest queries land in one such window and their medians
  *    report the spike;
  *  - before EVERY measurement all engine state is dropped:
  *    `spark.catalog.clearCache()` for SQL caches AND an explicit unpersist
  *    of every persistent RDD — `localCheckpoint` blocks (connected
  *    components) live at the RDD layer and survive clearCache, otherwise
  *    accumulating across reps until the ContextCleaner gets to them;
  *  - a query whose reps CUMULATIVELY exceed 2× `SPARK_GRAFT_REP_BUDGET_SEC`
  *    (default 30) is not measured again — under heavy host contention the
  *    bench must stay bounded rather than keep re-running a pathological
  *    measurement. The budget never stops a query before its SECOND rep:
  *    in the r4 driver run a single contention spike (q50 rep 1 = 97.2s vs
  *    1.6s local) blew the cumulative budget on rep 1 and became the
  *    query's only — and therefore median — data point. With the two-rep
  *    floor the spiked query gets one clean rep to average against
  *    (median-of-2 halves the spike; more reps usually bury it), while a
  *    genuinely slow query still stops after two reps (bounded at ~4×
  *    budget worst-case);
  *  - ALL sections — headline and `extra` — run under this same loop and
  *    report median + min/max spread + first error, so a contention window
  *    is visible as spread in the artifact instead of masquerading as a
  *    regression;
  *  - the sf dir's files are faulted into the OS page cache once before
  *    measuring (tens of MB), so the first measured query doesn't pay
  *    cold-read latency the later ones don't.
  */
object Bench {

  /** Extras the driver run measures by default. q62_correlation_full is
    * DELIBERATELY absent: ~152s/rep at sf0.1 (S²-by-contract) starved the
    * round-5 driver run past its wall-clock (BENCH_NOTES r6); it re-enters
    * only via SPARK_GRAFT_EXTRA_Q62=1. EntrySpec pins this exclusion so a
    * future edit can't silently re-create the rc-124 failure. */
  private[graft] val defaultExtras: Seq[String] = Seq(
    "q40_range_join", "q41_incremental_resample", "x48_pack_sequences",
    "x50_embed_dedup", "x66_boilerplate", "x67_delta_dedup",
    "q50_bollinger", "x71_bm25", "x72_dsir", "x73_semantic_dedup",
    "x80_dup_spans", "q56_atr",
    // round-11: the PQ encode+ADC path (x90, sub-second) — tracked so
    // codebook/kernel regressions surface in the per-round artifact
    "x90_pq_adc",
    // round-12: the bulk ADC probe (per-query LUTs as data), the
    // residual-encoding path, and the filtered probe — same rationale,
    // all ~sub-second
    "x91_pq_bulk_probe", "x92_pq_residual", "x93_filtered_ann",
    // round-13: the bulk raw-IVF probe, the hierarchical two-level
    // ranking, the two-stage ADC→exact rerank, and the scalar-
    // quantization encode/score path — same rationale, all ~sub-second
    "x94_ivf_bulk_probe", "x95_hier_probe", "x96_pq_rerank",
    "x97_sq_adc",
    // round-18: the deterministic-IVF probe — the third wired path of
    // the CentroidAggF kernel (with x73/x93), tracked so centroid
    // regressions surface on every path; ~sub-second
    "x85_ann_ivf_det")

  /** Per-query measurement summary: (median, min, max, first error). */
  private[graft] type Reading = (Double, Double, Double, Option[String])

  private[graft] def median(xs: Seq[Double]): Double = {
    val v = xs.sorted
    if (v.length % 2 == 1) v(v.length / 2)
    else (v(v.length / 2 - 1) + v(v.length / 2)) / 2
  }

  /** Round-robin reps over `names`; per query: median/min/max/error.
    * A query that crashes on ANY rep reports -1 and its first error (a
    * crashing query must not masquerade as a fast one); a query whose
    * reps cumulatively exceed 2× the rep budget gets no further reps —
    * but never fewer than two reps total, so a single contention spike
    * cannot be a query's only data point (r4: q50 97.2s driver vs 1.6s
    * local, single-rep median). The GLOBAL deadline is checked before
    * every measurement: once exceeded no further reps run, queries with
    * at least one rep keep their median, and queries with none are
    * returned in the second element (truncated) rather than reported
    * as errors — partial results still produce a parseable artifact.
    * Extracted to object level (pure over `measureOnce`/`overDeadline`)
    * so BenchSpec can drive the deadline/budget paths without Spark. */
  private[graft] def roundRobin(names: Seq[String], reps: Int,
      repBudgetSec: Double, overDeadline: () => Boolean,
      measureOnce: String => Either[String, Double])
      : (Seq[(String, Reading)], Seq[String]) = {
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
    val errs = scala.collection.mutable.Map.empty[String, String]
    val stopped = scala.collection.mutable.Set.empty[String]
    for (_ <- 1 to reps; n <- names
         if !errs.contains(n) && !stopped(n) && !overDeadline())
      measureOnce(n) match {
        case Right(sec) =>
          times(n) = times.getOrElse(n, Vector.empty) :+ sec
          if (times(n).length >= 2 && times(n).sum > 2 * repBudgetSec)
            stopped += n
        // a failure past the deadline is the WATCHDOG's cancellation,
        // not the query's fault: keep any medians already gathered
        // (query → stopped) instead of poisoning the query to -1
        case Left(e) => if (overDeadline()) stopped += n else errs(n) = e
      }
    val truncated = names.filter(n =>
      !errs.contains(n) && times.getOrElse(n, Vector.empty).isEmpty)
    val measured = names.filterNot(truncated.contains).map { n =>
      val t = times.getOrElse(n, Vector.empty)
      if (errs.contains(n) || t.isEmpty) n -> (-1d, -1d, -1d, errs.get(n))
      else n -> (median(t), t.min, t.max, None)
    }
    (measured, truncated)
  }

  /** The two stdout artifact lines (extracted for BenchSpec).
    *
    * FULL line first: every reading — medians, spreads, errors,
    * truncation — in one JSON object. Field ORDER is deliberate: the
    * driver records only the last ~2 KB of stdout, so the bulky spread /
    * error maps come FIRST and the per-query median maps + headline
    * `"value"` come LAST, inside the surviving tail (r5/r6 lesson: with
    * `"value"` at the head of a ~4 KB line, two consecutive rounds'
    * official artifacts had `parsed: null`).
    *
    * COMPACT line second (~140 bytes, no per-query maps): guaranteed to
    * fit any tail window whole, so whichever line the driver's parser
    * finds last, it parses. `n_measured`/`n_truncated` ride on BOTH
    * lines so a deadline-truncated run is self-describing — `"value"`
    * sums only measured headline medians and would otherwise flatter a
    * partial run. */
  private[graft] def artifactLines(results: Seq[(String, Reading)],
      extraResults: Seq[(String, Reading)], truncated: Seq[String],
      reps: Int, elapsedSec: Double, sfDir: String): (String, String) = {
    def mediansJson(rs: Seq[(String, Reading)]) =
      rs.map { case (k, (med, _, _, e)) =>
          "\"" + k + "\":" + (if (e.isDefined) "-1" else med.toString) }
        .mkString("{", ",", "}")
    def spreadJson(rs: Seq[(String, Reading)]) =
      rs.collect { case (k, (_, lo, hi, None)) =>
          "\"" + k + "\":{\"min\":" + lo + ",\"max\":" + hi + "}" }
        .mkString("{", ",", "}")
    def errorsJson(rs: Seq[(String, Reading)]) =
      rs.collect { case (k, (_, _, _, Some(e))) =>
          // strip everything JSON strings can't carry raw (quotes,
          // backslashes, ALL control chars), not just newlines
          "\"" + k + "\":\"" + e.replaceAll("[\\p{Cntrl}\"\\\\]", " ") + "\"" }
        .mkString("{", ",", "}")
    val total = results.collect { case (_, (med, _, _, None)) => med }.sum
    val nMeasured = (results ++ extraResults)
      .count { case (_, (med, _, _, e)) => e.isEmpty && med >= 0 }
    val truncatedJson = truncated.map("\"" + _ + "\"").mkString("[", ",", "]")
    val elapsed = "%.1f".format(elapsedSec)
    val counts = s""""reps":$reps,"n_measured":$nMeasured,""" +
      s""""n_truncated":${truncated.size}"""
    val full = s"""{"metric":"total","unit":"sec",$counts,""" +
      s""""spread":${spreadJson(results)},""" +
      s""""extra_spread":${spreadJson(extraResults)},""" +
      s""""extra_errors":${errorsJson(extraResults)},""" +
      s""""errors":${errorsJson(results)},"truncated":$truncatedJson,""" +
      s""""queries":${mediansJson(results)},""" +
      s""""extra":${mediansJson(extraResults)},""" +
      s""""value":$total,"elapsed_sec":$elapsed,"sf":"$sfDir"}"""
    val compact = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s"""$counts,"elapsed_sec":$elapsed,"sf":"$sfDir"}"""
    (full, compact)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    // default 3 (5 was round 5's default and, combined with a ~152s query in
    // the extras, pushed the DRIVER run past its wall-clock: BENCH_r05.json
    // is rc 124 with no JSON line — 5 stays available as an opt-in)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val repBudgetSec =
      sys.env.getOrElse("SPARK_GRAFT_REP_BUDGET_SEC", "30").toDouble
    // GLOBAL wall-clock budget: when exceeded, stop measuring and still
    // print the JSON line with whatever medians exist ("truncated" lists the
    // queries that never got a rep) — a partial artifact beats rc 124 with
    // no artifact at all. 2400s default sits well inside the driver's
    // observed timeout while leaving ~40 min for a contended host.
    val totalBudgetSec =
      sys.env.getOrElse("SPARK_GRAFT_TOTAL_BUDGET_SEC", "2400").toDouble
    val benchStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - benchStart) / 1e9
    def overDeadline: Boolean = elapsedSec > totalBudgetSec
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()

    /** Drop ALL engine state a previous measurement may have left: SQL
      * caches and RDD-level persisted blocks (localCheckpoints).
      * BLOCKING unpersist (r12, the q56/x80 watch item): with
      * `blocking = false` a localCheckpoint-heavy neighbor's blocks are
      * still draining through the BlockManager when the next query's
      * rep starts — the flagged queries' driver medians carried exactly
      * that signature two rounds running. Blocking makes each rep's
      * starting state deterministic; the wait is a uniform few ms paid
      * by every rep, not a per-query bias. */
    // SPARK_GRAFT_UNPERSIST_BLOCKING=0 reverts to the pre-r12
    // non-blocking form — a controlled-race knob only (BENCH_NOTES r13
    // drift decomposition), never the measured default
    val unpersistBlocking =
      !sys.env.get("SPARK_GRAFT_UNPERSIST_BLOCKING").contains("0")
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = unpersistBlocking))
    }

    /** One timed, state-isolated execution. */
    def measureOnce(name: String): Either[String, Double] = {
      clearState()
      val t0 = System.nanoTime()
      try { run(name, sfDir); Right((System.nanoTime() - t0) / 1e9) }
      catch { case t: Throwable =>
        Left(Option(t.getMessage).getOrElse(t.getClass.getName).take(120)) }
    }

    // Watchdog: the deadline check between measurements cannot stop a
    // measurement that HANGS — exactly the failure that leaves no
    // artifact (rc 124). One rep-budget past the global deadline, cancel
    // every running job (repeatedly — AQE/retries may start new ones):
    // the in-flight measurement surfaces as a cancellation, the loop is
    // already past `overDeadline` so nothing new starts, and the JSON
    // line prints. Daemon thread — dies with the JVM; `benchDone` stops
    // the loop once the artifact lines are out, and the cancel call is
    // guarded — after spark.stop() it throws on the stopped context,
    // spraying a daemon stack trace into stdout AFTER the JSON lines
    // (harmless to the artifact, alarming to log-scraping harnesses).
    @volatile var benchDone = false
    val watchdog = new Thread(() => {
      while (!benchDone) {
        val sleepMs =
          ((totalBudgetSec + repBudgetSec - elapsedSec) * 1000).toLong
        if (sleepMs > 0) Thread.sleep(math.min(sleepMs, 5000))
        else {
          try spark.sparkContext.cancelAllJobs()
          catch { case scala.util.control.NonFatal(_) => () }
          Thread.sleep(5000)
        }
      }
    }, "graft-bench-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()

    // fault the benchmark inputs into the OS page cache (bench hygiene:
    // cold-read latency belongs to no single query)
    Option(new java.io.File(sfDir).listFiles).getOrElse(Array.empty)
      .filter(_.isFile).foreach { f =>
        val in = new java.io.FileInputStream(f)
        val buf = new Array[Byte](1 << 20)
        try { while (in.read(buf) >= 0) () } finally in.close()
      }

    // SPARK_GRAFT_ONLY=a,b,c → measure ONLY the named queries (filters
    // headline AND extras). Exists for the scaling-curve decades past
    // sf1 (SCALING.md: sf10 runs the six most-expensive queries under a
    // bounded wall-clock, not the full 34-query list), never for driver
    // or BENCH_LOCAL runs — those artifacts must keep the full list so
    // rounds stay comparable. Unset (the default) is a no-op.
    val onlySet = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    // the extras gating knobs are read HERE, before the ONLY validation,
    // so the fail-fast can check the names against the list this run
    // will actually measure (review r17: the old check used an
    // always-everything `tracked` set, so SPARK_GRAFT_ONLY=
    // q62_correlation_full without SPARK_GRAFT_EXTRA_Q62=1 — or an
    // extra under SKIP_EXTRAS=1 — passed the require yet measured zero
    // queries and wrote the normal-looking empty artifact the guard was
    // added to prevent). Semantics of each knob documented at their
    // use sites below.
    val skipExtras = sys.env.get("SPARK_GRAFT_SKIP_EXTRAS").contains("1")
    val dropExtras = sys.env.get("SPARK_GRAFT_DROP_EXTRAS")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val effectiveExtras: Seq[String] =
      (if (skipExtras) Seq.empty[String]
       else defaultExtras ++
         (if (sys.env.get("SPARK_GRAFT_EXTRA_Q62").contains("1"))
            Seq("q62_correlation_full") else Seq.empty[String]))
        .filter(SparkEntry.queries.contains)
        .filterNot(dropExtras)
    // a typo'd name would otherwise filter to nothing and the run
    // would record a normal-looking ~0s artifact measuring nothing —
    // fail fast on any name the bench does not track (review r16) and
    // on any tracked name the current gating excludes (review r17)
    onlySet.foreach { s =>
      val allTracked = SparkEntry.benchQueries.toSet ++ defaultExtras +
        "q62_correlation_full"
      val effective = SparkEntry.benchQueries.toSet ++ effectiveExtras
      val unknown = s -- allTracked
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names ${unknown.mkString(", ")} — not " +
          "bench-tracked queries (headline + extras are: " +
          s"${allTracked.toSeq.sorted.mkString(", ")})")
      val gatedOff = s -- effective
      require(gatedOff.isEmpty,
        s"SPARK_GRAFT_ONLY names ${gatedOff.mkString(", ")} — tracked " +
          "but gated OFF this run: q62_correlation_full needs " +
          "SPARK_GRAFT_EXTRA_Q62=1; extras need SPARK_GRAFT_SKIP_EXTRAS " +
          "unset and the name absent from SPARK_GRAFT_DROP_EXTRAS")
    }
    def onlyFilter(ns: Seq[String]): Seq[String] =
      onlySet.fold(ns)(s => ns.filter(s))

    val names = onlyFilter(SparkEntry.benchQueries)
    names.foreach { n => // warm-up: JIT + codegen caches, tiny data
      if (!overDeadline)
        try run(n, "/root/testdata/sf0.001")
        catch { case _: Throwable => () }
    }
    // opt-in measurement-SF warm-up (SPARK_GRAFT_WARM_SF=1): one
    // UNCOUNTED execution of each query at sfDir itself before the
    // measured round-robin. The sf1 decade runs at reps=2, where the
    // first execution's one-time costs at that scale (cold page cache,
    // shuffle-file allocation, AQE stats) inflated tabled slopes twice
    // (q23 r6–r9, x66 r10) and each cost an adjudication cycle — with
    // this rep the tabled numbers are steady-state by construction.
    // Off by default: the driver's per-round headline run is
    // wall-clock-budgeted (the round-5 rc-124 lesson) and stays
    // comparable to prior rounds' protocol.
    val warmAtSf = sys.env.get("SPARK_GRAFT_WARM_SF").contains("1")
    if (warmAtSf) names.foreach { n =>
      if (!overDeadline)
        try run(n, sfDir) catch { case _: Throwable => () }
    }
    val (results, headTruncated) =
      roundRobin(names, reps, repBudgetSec, () => overDeadline, measureOnce)

    // round-2+ operators, timed OUTSIDE the headline so "value"/"queries"
    // stay comparable to the recorded baseline across rounds — but under
    // the SAME round-robin/median/budget loop, with spread + errors in the
    // artifact (r4 lesson: a single-rep extra reading is indistinguishable
    // from a regression in a perf audit)
    // SPARK_GRAFT_SKIP_EXTRAS=1 → headline only (the scaling-curve runs
    // at sf1 use this). q62_correlation_full is NOT a default extra:
    // ~152s/rep at sf0.1 (S²-by-design, 1.1M exact-decimal pairs) blew
    // the round-5 driver wall-clock (rc 124, no artifact). It stays
    // measured in BENCH_LOCAL/SCALING evidence; opt in with
    // SPARK_GRAFT_EXTRA_Q62=1.
    // SPARK_GRAFT_DROP_EXTRAS=a,b,c → exclude named extras. Exists for
    // CONTROLLED drift races (BENCH_NOTES r13: replay a prior round's
    // query list on the current tree to isolate round-robin neighbor
    // pressure from code drift), not for routine runs — the driver
    // artifact must keep the full list.
    // (both knobs are read above, pre-validation — review r17)
    val extraNames = onlyFilter(effectiveExtras)
    extraNames.foreach { n =>
      if (!overDeadline)
        try run(n, "/root/testdata/sf0.001") catch { case _: Throwable => () }
    }
    if (warmAtSf) extraNames.foreach { n =>
      if (!overDeadline)
        try run(n, sfDir) catch { case _: Throwable => () }
    }
    val (extraResults, extraTruncated) =
      roundRobin(extraNames, reps, repBudgetSec, () => overDeadline,
        measureOnce)

    val (fullLine, compactLine) = artifactLines(results, extraResults,
      headTruncated ++ extraTruncated, reps, elapsedSec, sfDir)
    println(fullLine)
    println(compactLine)
    benchDone = true
    spark.stop()
  }
}
