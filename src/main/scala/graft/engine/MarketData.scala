package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's public programmatic API (SURVEY §3.2; reference
  * README.md:82-101), mirrored 1:1 as a facade over the engine parts:
  *
  * | reference (python)              | here                       |
  * |---------------------------------|----------------------------|
  * | `get_historical_data(...)`      | [[getHistoricalData]]      |
  * | `save_data(df, sym, tf)`        | [[saveData]]               |
  * | `check_data_exists(...)`        | [[checkDataExists]]        |
  * | `get_data(...)` (cache-or-fetch)| [[getData]]                |
  * | resampled load (`UI:374-434`)   | [[getResampledData]]       |
  * | `delete_data(sym, tf)`          | [[deleteData]]             |
  * | `get_stored_info()`             | [[getStoredInfo]]          |
  * | export CSV/parquet (`UI:565-594`)| [[Store.exportCsv]]/[[Store.exportParquet]] |
  *
  * State is two parquet tables under `basePath`: the fact table in the
  * canonical partitioned layout and the coverage metadata side table —
  * the Spark re-expression of `ohlcv_data`/`ohlcv_metadata`
  * (database_handler.py:110-134). `now` is injected for determinism
  * (never `current_timestamp()`).
  *
  * The cache-or-fetch decision (scan-source elision) is driver-side
  * control flow over the broadcast-joined metadata — deliberately NOT a
  * Catalyst rule (SURVEY §4): the choice happens before plan construction.
  */
class MarketData(spark: SparkSession, basePath: String,
    fetch: (String, String, Long, Long) => DataFrame) {

  private val factPath = s"$basePath/ohlcv"
  private val metaPath = s"$basePath/ohlcv_meta"

  /** Default fetcher = the DSv2 kline source. */
  def this(spark: SparkSession, basePath: String) = this(spark, basePath,
    (symbol, timeframe, fromMs, toMs) =>
      spark.read.format("graft.sources.KlineSource")
        .option("symbols", symbol).option("timeframe", timeframe)
        .option("startMs", fromMs.toString).option("endMs", toMs.toString)
        .load())

  /** Existence checks go through the Hadoop FileSystem of the path's
    * scheme — `basePath` may be any supported filesystem (hdfs://, s3a://,
    * file:, …), not just the local disk `java.io.File` would pin us to. */
  private def pathExists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Heal a crashed [[Store.compact]] swap BEFORE the existence check:
    * mid-swap there is no live dir, and treating that as "store absent"
    * would make the next save overwrite a fresh table containing only
    * the incoming batch — permanently orphaning all prior data in the
    * `__old` backup (and deleteData would overwrite with nothing). */
  private def factExists: Boolean = {
    Store.healInterruptedSwap(spark, factPath)
    pathExists(factPath)
  }

  /** Full fact table (empty frame with canonical schema when absent).
    * The schema is supplied explicitly: deleting the last stored series
    * leaves a valid-but-empty table directory, which schema INFERENCE
    * rejects (UNABLE_TO_INFER_SCHEMA) — and skipping inference also
    * avoids the footer read on every open. */
  def facts(): DataFrame =
    if (factExists) spark.read.schema(graft.sources.KlineSource.schema)
      .parquet(factPath)
      .select("ts", "symbol", "timeframe", "open", "high", "low", "close", "volume")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.sources.KlineSource.schema)

  /** S1: source ingest for one series over [fromMs, toMs). */
  def getHistoricalData(symbol: String, timeframe: String, fromMs: Long,
      toMs: Long): DataFrame = fetch(symbol, timeframe, fromMs, toMs)

  /** S7+S8: keyed upsert into the store, then metadata refresh —
    * the reference's save path (database_handler.py:193-241).
    *
    * Uses partition-scoped dynamic overwrite ([[Store.upsertSave]]): only
    * the incoming (symbol, timeframe) partitions rewrite. Besides being
    * the 100 TB cost model, this keeps DataFrames previously returned for
    * OTHER series valid mid-batch — a full-table overwrite would yank
    * their underlying files (FAILED_READ_FILE on the next action). */
  def saveData(df: DataFrame): Unit = {
    val incoming = df.select("ts", "symbol", "timeframe", "open", "high",
      "low", "close", "volume")
    if (factExists) Store.upsertSave(spark, factPath, incoming)
    else Store.save(incoming, factPath)
    // metadata refresh is O(batch) + O(meta), NOT a full fact-table
    // re-aggregate: upserts only replace same-key rows (never narrow a
    // series' ts span), so merging the batch's min/max into the existing
    // meta rows is exact — the same batch-scoped cost model as
    // upsertSave itself. The tiny merged frame is eagerly materialized
    // (localCheckpoint) because it reads the very file it overwrites.
    val batchMeta = Store.deriveMeta(incoming)
    val merged =
      if (!pathExists(metaPath)) batchMeta
      else spark.read.parquet(metaPath)
        .select(col("symbol"), col("timeframe"),
          col("start_ts").as("old_start"), col("end_ts").as("old_end"))
        .join(batchMeta.select(col("symbol"), col("timeframe"),
            col("start_ts").as("new_start"), col("end_ts").as("new_end")),
          Seq("symbol", "timeframe"), "full_outer")
        .select(col("symbol"), col("timeframe"),
          least(col("old_start"), col("new_start")).as("start_ts"),
          greatest(col("old_end"), col("new_end")).as("end_ts"))
    val mat = merged.localCheckpoint(true)
    try mat.write.mode("overwrite").parquet(metaPath)
    finally mat.unpersist()
  }

  /** J1/J2 coverage probe for one request (database_handler.py:257-307).
    * Returns (hit, freshHit). */
  def checkDataExists(symbol: String, timeframe: String, fromMs: Long,
      toMs: Long, nowMs: Long): (Boolean, Boolean) = {
    if (!pathExists(metaPath)) return (false, false)
    // explicit schema for the same reason as facts(): an emptied store's
    // metadata table has no files to infer from
    val metaSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("symbol",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("timeframe",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("start_ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("end_ts",
        org.apache.spark.sql.types.TimestampType)))
    val meta = spark.read.schema(metaSchema).parquet(metaPath)
      .filter(col("symbol") === symbol && col("timeframe") === timeframe)
      .select(col("symbol"), col("timeframe"),
        unix_millis(col("start_ts")).as("cov_start_ms"),
        unix_millis(col("end_ts")).as("cov_end_ms"))
    import spark.implicits._
    val req = Seq((symbol, timeframe, fromMs, toMs))
      .toDF("symbol", "timeframe", "req_start_ms", "req_end_ms")
    val r = Coverage.probe(req, meta, Seq("symbol", "timeframe"),
      Timeframes.durationMs(timeframe), nowMs).collect()(0)
    (r.getAs[Boolean]("covered") || r.getAs[Boolean]("fresh_hit"),
      r.getAs[Boolean]("fresh_hit"))
  }

  /** Cache-or-fetch (entry point §3.1 step 4, colab_interface.py:343-372):
    * coverage hit → pruned range scan; miss → source fetch + save + scan. */
  def getData(symbol: String, timeframe: String, fromMs: Long, toMs: Long,
      nowMs: Long): DataFrame = {
    // parameter validation mirroring the reference (colab_interface.py:
    // 222-225 end<start rejection; database_handler.py:204-205 non-empty
    // symbol; closed timeframe vocabulary api_connector.py:194)
    require(symbol.nonEmpty, "symbol must be non-empty")
    require(Timeframes.all.contains(timeframe),
      s"unknown timeframe '$timeframe' (expected one of ${Timeframes.all.mkString(",")})")
    require(toMs >= fromMs, s"end $toMs before start $fromMs")
    // getData's range is END-EXCLUSIVE throughout (it is what the fetch
    // delivers). Two conversions follow from that: the coverage probe's
    // closed-interval req_end is the last REQUESTED instant `toMs - 1`
    // (probing with the exclusive end made an identical repeat request
    // read as uncovered — cov_end + dur - 1 = toMs - 1 < toMs — so every
    // repeat re-fetched the whole range); and the scan's inclusive upper
    // bound is `toMs - 1` (an inclusive toMs returned an EXTRA candle at
    // exactly toMs whenever earlier wider coverage had stored one —
    // same request, cache-state-dependent row count).
    val (hit, _) = checkDataExists(symbol, timeframe, fromMs,
      math.max(fromMs, toMs - 1), nowMs)
    if (!hit) saveData(getHistoricalData(symbol, timeframe, fromMs, toMs))
    Store.scan(spark, factPath, symbol, timeframe,
      new java.sql.Timestamp(fromMs), new java.sql.Timestamp(toMs - 1))
  }

  /** Incremental cache fill — deliberately BEYOND the reference: its
    * cache-or-fetch treats coverage as all-or-nothing, so any miss
    * refetches the ENTIRE requested range (colab_interface.py:343-372 →
    * api_connector fetch of [start, end]). Here the missing buckets are
    * computed distributed ([[Coverage.gaps]] anti-join against the stored
    * series), coalesced into contiguous runs (gaps-and-islands via
    * boundary anti-joins — no global-sort window, no single task),
    * and ONLY those runs are fetched and upserted — a 10-year backfill
    * that is 99% cached fetches 1%. The run list is driver-collected by
    * necessity (each run becomes one source fetch, exactly like the
    * reference's page loop); a pathological comb of more than `maxRuns`
    * holes degrades gracefully to one spanning fetch instead of
    * thousands of tiny ones. */
  def getDataIncremental(symbol: String, timeframe: String, fromMs: Long,
      toMs: Long, nowMs: Long, maxRuns: Int = 64): DataFrame = {
    require(symbol.nonEmpty, "symbol must be non-empty")
    require(Timeframes.all.contains(timeframe),
      s"unknown timeframe '$timeframe'")
    require(toMs >= fromMs, s"end $toMs before start $fromMs")
    // calendar-anchored grids (Monday 1w opens, month-start 1M opens on
    // a real endpoint) never match this epoch-aligned fixed-width bucket
    // grid — the anti-join would report EVERY bucket missing on EVERY
    // call and the "incremental" fill would refetch the full range each
    // time. Those series are 52/12 candles a year; the all-or-nothing
    // reference path loses nothing there.
    if (timeframe == "1w" || timeframe == "1M")
      return getData(symbol, timeframe, fromMs, toMs, nowMs)
    val dur = Timeframes.durationMs(timeframe)
    val first = ((fromMs + dur - 1) / dur) * dur // align up, as the source does
    // clamp to `now`: buckets that have not opened yet can never be
    // returned by any source — without the clamp they are "missing" on
    // every call and re-fetched forever (permanently-empty spans)
    val effEnd = math.min(toMs, nowMs)
    val nBuckets = math.max((effEnd - first + dur - 1) / dur, 0L)
    if (nBuckets > 0) {
      val requested = spark.range(nBuckets)
        .select((lit(first) + col("id") * dur).as("bucket_ms"))
      val covered = facts()
        .filter(col("symbol") === symbol && col("timeframe") === timeframe &&
          unix_millis(col("ts")).between(first, effEnd - 1))
        .select(unix_millis(col("ts")).as("bucket_ms"))
      val missing = Coverage.gaps(requested, covered, "bucket_ms")
      // gaps-and-islands WITHOUT a global-sort window (the r4 review
      // flagged the old `Window.orderBy` single-task sort): a missing
      // bucket STARTS a run iff its predecessor bucket is not missing,
      // and ENDS one iff its successor is not — two hash anti-joins,
      // fully distributed, no total ordering anywhere on the cluster.
      // Boundary buckets sorted ascending pair 1:1 (k-th start with k-th
      // end), so only the run boundaries — not the buckets — reach the
      // driver, and those were always collected (each run = one fetch).
      def shifted(by: Long) =
        missing.select((col("bucket_ms") + lit(by)).as("bucket_ms"))
      // the collect is LIMIT-bounded BEFORE it runs: a pathological comb
      // (alternating holes over years of minutes) has O(nBuckets) run
      // boundaries, and collecting them all just to discover
      // `runs.length > maxRuns` would be a driver OOM. A saturated limit
      // means "more than maxRuns runs" — degrade to the one spanning
      // fetch without ever materializing the comb.
      val boundaryLimit = 2 * (maxRuns + 1)
      val boundaries = missing
        .join(shifted(dur), Seq("bucket_ms"), "left_anti")
        .select(col("bucket_ms"), lit(true).as("is_start"))
        .unionByName(missing
          .join(shifted(-dur), Seq("bucket_ms"), "left_anti")
          .select(col("bucket_ms"), lit(false).as("is_start")))
        .limit(boundaryLimit)
        .collect()
      val spans =
        if (boundaries.length >= boundaryLimit) {
          val mm = missing.agg(min(col("bucket_ms")), max(col("bucket_ms")))
            .collect()(0)
          Array((mm.getLong(0), mm.getLong(1) + dur))
        } else {
          val runStarts =
            boundaries.filter(_.getBoolean(1)).map(_.getLong(0)).sorted
          val runEnds =
            boundaries.filterNot(_.getBoolean(1)).map(_.getLong(0)).sorted
          val runs = runStarts.zip(runEnds)
            .map { case (a, b) => (a, b + dur) } // end exclusive
          if (runs.length > maxRuns) Array((runs.head._1, runs.last._2))
          else runs
        }
      if (spans.nonEmpty) {
        val fetched = spans.map { case (a, b) =>
          getHistoricalData(symbol, timeframe, a, b) }
          .reduce(_ unionByName _)
        saveData(fetched)
      }
    }
    // end-exclusive, like getData (and the bucket grid above)
    Store.scan(spark, factPath, symbol, timeframe,
      new java.sql.Timestamp(fromMs), new java.sql.Timestamp(toMs - 1))
  }

  /** Resampled load (§3.3, colab_interface.py:374-434): force the 1m base
    * series through the cache, derive the target timeframe — one shuffle,
    * not five per-column passes. */
  def getResampledData(symbol: String, timeframe: String, fromMs: Long,
      toMs: Long, nowMs: Long): DataFrame =
    Ohlcv.resampleCandles(
      getData(symbol, "1m", fromMs, toMs, nowMs), timeframe)

  /** S9: delete one series and refresh metadata
    * (database_handler.py:243-255). PARTITION-SCOPED: the series IS a
    * partition directory (`symbol=…/timeframe=…`), so the delete drops
    * exactly that directory — O(series), not an O(table) full rewrite,
    * and DataFrames previously returned for OTHER series keep reading
    * their untouched files (the full-overwrite form yanked every
    * partition's files: FAILED_READ_FILE on their next action — the
    * exact hazard [[saveData]]'s scaladoc documents avoiding).
    * Metadata drops the one series row (the meta table is
    * series-cardinality — tiny; eagerly materialized because it reads
    * the file it overwrites). */
  def deleteData(symbol: String, timeframe: String): Unit = {
    if (!factExists) return
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    // the same escaping Spark's own partitioned writer used for the dirs
    val dir = new org.apache.hadoop.fs.Path(factPath +
      s"/symbol=${ExternalCatalogUtils.escapePathName(symbol)}" +
      s"/timeframe=${ExternalCatalogUtils.escapePathName(timeframe)}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir) && !fs.delete(dir, true))
      throw new java.io.IOException(s"deleteData: cannot remove $dir")
    if (pathExists(metaPath)) {
      val remaining = spark.read.parquet(metaPath)
        .filter(!(col("symbol") === symbol &&
          col("timeframe") === timeframe))
        .localCheckpoint(true)
      try remaining.write.mode("overwrite").parquet(metaPath)
      finally remaining.unpersist()
    }
  }

  /** Bounded head/tail preview — the reference binds the loaded frame's
    * first/last rows into its notebook UI (colab_interface.py:624-647).
    * Both sorts compile to TakeOrderedAndProject (top-k, no full sort, no
    * full materialization), so the collect is bounded by `2n` rows — the
    * one sanctioned driver-side collection in this API, and explicitly
    * sized. Returns (first n, last n) in ascending time order. */
  def preview(symbol: String, timeframe: String, n: Int = 20)
      : (Array[org.apache.spark.sql.Row], Array[org.apache.spark.sql.Row]) = {
    val series = facts()
      .filter(col("symbol") === symbol && col("timeframe") === timeframe)
    (series.orderBy(col("ts").asc).limit(n).collect(),
      series.orderBy(col("ts").desc).limit(n).collect().reverse)
  }

  /** Plot-ready candles — the reference's candlestick path
    * (colab_interface.py:467-499), made scale-safe: the requested range is
    * resampled to the FINEST timeframe (≥ `timeframe`) whose bucket count
    * fits `maxPoints`, so a caller can collect the result for display no
    * matter how wide the range — a day plots at minutes, ten years at
    * months. The frame itself stays distributed; it is merely guaranteed
    * small. */
  def plotCandles(symbol: String, timeframe: String, fromMs: Long,
      toMs: Long, nowMs: Long, maxPoints: Int = 500): DataFrame = {
    require(maxPoints > 0, "maxPoints must be positive")
    val baseDur = Timeframes.durationMs(timeframe)
    // EXACT bucket count of the window grid over [fromMs, toMs): the
    // old floor-division `span / dur` undercounted misaligned ranges by
    // up to 2, quietly overshooting the promised cap
    def buckets(dur: Long): Long =
      if (toMs <= fromMs) 1L
      else (toMs - 1) / dur - fromMs / dur + 1
    val plotTf = Timeframes.all
      .filter(Timeframes.durationMs(_) >= baseDur)
      .sortBy(Timeframes.durationMs)
      .find(tf => buckets(Timeframes.durationMs(tf)) <= maxPoints)
      // the vocabulary's coarsest bucket: the cap is therefore
      // guaranteed for any range spanning ≤ maxPoints months; a wider
      // range plots monthly (documented floor — nothing coarser exists)
      .getOrElse("1M")
    getResampledData(symbol, plotTf, fromMs, toMs, nowMs)
      .orderBy("bucket")
  }

  /** S6: stored-series listing with counts and dates
    * (database_handler.py:348-377). */
  def getStoredInfo(): DataFrame = {
    val f = facts()
    Store.storedInfo(Store.deriveMeta(f),
      f.groupBy("symbol", "timeframe").agg(count(lit(1)).as("n")))
  }
}

object MarketData {
  /** Facade wired to a REAL REST endpoint (the reference's live mode,
    * api_connector.py:208-314) via [[graft.sources.HttpKlineTransport]] —
    * same DSv2 source, same pagination/cursor/backoff machinery, only the
    * transport differs. Never the default: the sandbox has zero egress,
    * and KlineSourceSpec drives this path against a local stub server.
    * `endpoint` is e.g. `"https://api.binance.com"`. */
  def overHttp(spark: SparkSession, basePath: String,
      endpoint: String): MarketData =
    new MarketData(spark, basePath,
      (symbol, timeframe, fromMs, toMs) =>
        spark.read.format("graft.sources.KlineSource")
          .option("symbols", symbol).option("timeframe", timeframe)
          .option("startMs", fromMs.toString).option("endMs", toMs.toString)
          .option("endpoint", endpoint)
          .load())
}
