package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 realization of the reference's paginated klines source
  * (S1, reference: binance_data_framework/api_connector.py:208-314).
  *
  * The reference pulls ≤1000 candles per request on a single thread,
  * advancing a cursor `last_ts + 1` (api_connector.py:268) with a fixed
  * inter-page delay (S2, api_connector.py:270-282). Re-expressed for
  * Spark's execution model:
  *
  *  - the requested (symbols × time-range) is split into one
  *    [[KlinePartition]] per (symbol, slice) — each an independent task, so
  *    a 1000-executor cluster ingests 1000 series-slices concurrently
  *    instead of the reference's one-page-at-a-time loop;
  *  - inside a partition the reader still iterates page-wise with the
  *    cursor rule (`fromMs` advances by page), which is where a real
  *    connector would hold its HTTP client, rate-limit budget and retry
  *    policy — one client per task, reused across pages (the S2 concern is
  *    a partition-reader concern, not a query-operator concern);
  *  - rows are produced directly as [[InternalRow]] in the canonical OHLCV
  *    schema — no driver-side materialization, no `collect` anywhere.
  *
  * Offline determinism: this harness has zero egress, so the "exchange" is
  * a seeded deterministic generator (same (symbol, bucket) → same candle,
  * regardless of pagination or partitioning — which the spec asserts).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.KlineSource")
  *     .option("symbols", "BTCUSDT,ETHUSDT")
  *     .option("startMs", "1704067200000").option("endMs", "...")
  *     .option("timeframe", "1m").load()
  * }}}
  */
class KlineSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KlineSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KlineTable(properties.asScala.toMap)
}

/** Transport signal for an exchange rate-limit rejection (the reference's
  * "Too much request weight" response, api_connector.py:274) — the ONE
  * failure class the page loop retries; everything else aborts. */
class RateLimitException(msg: String) extends RuntimeException(msg)

/** S2 rate-limit / retry policy (api_connector.py:270-282), re-expressed as
  * a per-partition-reader concern — one policy instance per task, wrapping
  * every page fetch of that task:
  *
  *  - **pacing**: `sleep(paceMs)` between successive pages (the reference's
  *    0.1 s inter-request delay keeps a single client under the weight
  *    budget; with N parallel tasks each task paces itself, so the
  *    aggregate rate is `N / paceMs` — size N accordingly);
  *  - **backoff**: a [[RateLimitException]] sleeps `backoffMs` (60 s in the
  *    reference) and RETRIES the same page, up to `maxRetries` times;
  *  - **abort**: any other failure propagates immediately and fails the
  *    task (api_connector.py:279-282) — Spark's task retry takes over.
  *
  * `sleep` is injectable so specs assert the exact backoff sequence with a
  * fake clock instead of really sleeping. */
class PagePolicy(paceMs: Long, backoffMs: Long, maxRetries: Int,
    sleep: Long => Unit = Thread.sleep) {
  private var firstPage = true

  def fetchPaced[A](fetch: () => A): A = {
    if (!firstPage && paceMs > 0) sleep(paceMs)
    firstPage = false
    var attempts = 0
    while (true) {
      try return fetch()
      catch {
        case e: RateLimitException =>
          attempts += 1
          if (attempts > maxRetries) throw e
          sleep(backoffMs)
        // anything else falls through uncaught: abort the task
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object KlineSource {
  /** Test hook: when set, partition readers route policy sleeps here
    * instead of `Thread.sleep` (local-mode specs record the sequence). */
  @volatile var sleepHook: Option[Long => Unit] = None

  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("timeframe", StringType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false)))

  /** Page size cap mirroring the reference's `max_limit`
    * (api_connector.py:242). */
  val pageSize = 1000

  /** Deterministic candle for (symbol, bucketStartMs): a seeded hash drives
    * a plausible OHLC around a per-symbol base price. */
  def candle(symbol: String, tsMs: Long): (Double, Double, Double, Double, Double) = {
    val seed = symbol.hashCode.toLong * 1000003L + tsMs
    val r = new scala.util.Random(seed)
    val base = 100.0 + math.abs(symbol.hashCode % 900)
    val o = base * (0.9 + 0.2 * r.nextDouble())
    val c = base * (0.9 + 0.2 * r.nextDouble())
    val h = math.max(o, c) * (1 + 0.01 * r.nextDouble())
    val l = math.min(o, c) * (1 - 0.01 * r.nextDouble())
    val v = 10 + 90 * r.nextDouble()
    (o, h, l, c, v)
  }
}

class KlineTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_klines"
  override def schema(): StructType = KlineSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KlineScanBuilder(props ++ options.asScala)
}

class KlineScanBuilder(opts: Map[String, String]) extends ScanBuilder with Scan
    with Batch {
  // trim + drop empties: "BTC, ETH" must not yield a " ETH" partition
  // (different offline seed than "ETH"; unencodable URI on a real
  // endpoint) and "BTC," must not yield an empty-symbol partition
  private val symbols = opts.getOrElse("symbols", "BTCUSDT")
    .split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  private val startMs = opts.getOrElse("startMs", "1704067200000").toLong
  private val endMs = opts.getOrElse("endMs", "1704153600000").toLong
  private val timeframe = opts.getOrElse("timeframe", "1m")
  private val durMs = graft.engine.Timeframes.durationMs(timeframe)
  /** ms per partition slice: one day's worth of buckets by default. */
  private val sliceMs =
    opts.get("sliceMs").map(_.toLong).getOrElse(math.max(durMs * 1440, durMs))
  /** Real-network endpoint (e.g. `https://api.binance.com`): switches the
    * page transport from the offline generator to [[HttpKlineTransport]].
    * Absent by default — the sandbox has zero egress. */
  private val endpoint = opts.get("endpoint")
  // S2 policy knobs. paceMs defaults to 0 for the offline generator and to
  // the reference's 0.1 s inter-request delay when a real endpoint is set
  // (api_connector.py:270) — N parallel tasks each pace themselves.
  private val paceMs = opts.get("paceMs").map(_.toLong)
    .getOrElse(if (endpoint.isDefined) 100L else 0L)
  private val backoffMs = opts.get("rateLimitBackoffMs").map(_.toLong)
    .getOrElse(60000L)
  private val maxRetries = opts.get("maxRetries").map(_.toInt).getOrElse(10)
  /** Simulated-exchange failure injection: page indexes (per partition)
    * that reject their FIRST attempt with a rate-limit error. */
  private val simRateLimitPages = opts.get("simRateLimitPages")
    .map(_.split(",").filter(_.nonEmpty).map(_.toInt).toSeq).getOrElse(Nil)

  override def build(): Scan = this
  override def readSchema(): StructType = KlineSource.schema
  override def toBatch: Batch = this

  /** ST1 (SURVEY §2.9): the reference's monotone ingest cursor
    * (api_connector.py:244-268) as a genuine streaming source offset.
    * Each micro-batch covers (lastOffsetMs, min(lastOffsetMs + batchMs,
    * endMs)] — an incremental fetch of exactly the missing tail. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KlineMicroBatchStream(symbols, timeframe, durMs, startMs, endMs,
      opts.get("batchMs").map(_.toLong).getOrElse(sliceMs), endpoint,
      paceMs, backoffMs, maxRetries, simRateLimitPages)

  override def planInputPartitions(): Array[InputPartition] = {
    val slices = (startMs until endMs by sliceMs).map(s =>
      (s, math.min(s + sliceMs, endMs)))
    (for (sym <- symbols; (a, b) <- slices)
      yield KlinePartition(sym, timeframe, durMs, a, b,
        paceMs, backoffMs, maxRetries, simRateLimitPages, endpoint)).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KlineReaderFactory
}

/** One (symbol, time-slice) of the request — the unit of parallel ingest.
  * Carries the S2 policy knobs so each task builds its own [[PagePolicy]];
  * `simRateLimitPages` injects first-attempt rate-limit rejections into the
  * offline exchange simulation (page indexes are per-partition). */
case class KlinePartition(symbol: String, timeframe: String, durMs: Long,
    fromMs: Long, toMs: Long, paceMs: Long = 0L, backoffMs: Long = 60000L,
    maxRetries: Int = 10, simRateLimitPages: Seq[Int] = Nil,
    endpoint: Option[String] = None)
    extends InputPartition

/** Cursor position in epoch-ms — the streaming offset. */
case class KlineOffset(ms: Long) extends Offset {
  override def json(): String = ms.toString
}

/** Micro-batch form of the source: each trigger's end offset is computed
  * from the PREVIOUS batch's committed start via
  * [[SupportsAdmissionControl.latestOffset(start, limit)]] — the stream
  * holds no mutable cursor at all, so a restart from a checkpoint resumes
  * exactly at the last committed offset (the streaming equivalent of the
  * reference's `last_ts + 1` resume rule, api_connector.py:268) and can
  * never regress or re-emit committed ranges. */
class KlineMicroBatchStream(symbols: Seq[String], timeframe: String,
    durMs: Long, startMs: Long, endMs: Long, batchMs: Long,
    endpoint: Option[String] = None,
    // the S2 policy is a per-TASK concern, so the stream must carry the
    // scan's knobs into every micro-batch partition — defaulted builds
    // here previously DISCARDED user-set pacing/backoff/retry on the
    // streaming path (N unpaced parallel tasks against a live endpoint)
    paceMs: Long = 0L, backoffMs: Long = 60000L, maxRetries: Int = 10,
    simRateLimitPages: Seq[Int] = Nil)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = KlineOffset(startMs)
  /** Dead code path once SupportsAdmissionControl is implemented — the
    * engine always calls the (start, limit) overload below. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "use latestOffset(start, limit) via SupportsAdmissionControl")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[KlineOffset].ms
    KlineOffset(math.min(from + math.max(batchMs, durMs), endMs))
  }
  /** True end of the (bounded) stream, for progress reporting. */
  override def reportLatestOffset(): Offset = KlineOffset(endMs)
  override def deserializeOffset(json: String): Offset =
    KlineOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (a, b) = (start.asInstanceOf[KlineOffset].ms,
      end.asInstanceOf[KlineOffset].ms)
    symbols.map(s => KlinePartition(s, timeframe, durMs, a, b,
        paceMs, backoffMs, maxRetries, simRateLimitPages,
        endpoint): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KlineReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class KlineReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new KlineReader(p.asInstanceOf[KlinePartition])
}

/** Page-wise reader: fetches `pageSize` candles at a time, advancing the
  * cursor past the last returned bucket (`last_ts + 1` semantics,
  * api_connector.py:268). Every page fetch runs under the partition's
  * [[PagePolicy]] — paced, rate-limit-retried, abort-on-other (S2). The
  * cursor only advances on a SUCCESSFUL fetch, so a retried page re-reads
  * the same range and results are retry-invariant. The bytes come from
  * the partition's [[KlineTransport]] — the offline generator by default,
  * [[HttpKlineTransport]] when an `endpoint` is configured — and every
  * cursor/pacing/backoff rule above is transport-agnostic. */
class KlineReader(p: KlinePartition) extends PartitionReader[InternalRow] {
  // the cursor carries NO grid knowledge: the exchange returns candles
  // with openTime >= startTime on ITS grid (epoch-aligned in the
  // simulator, Monday-anchored 1w / calendar-month 1M on a real
  // endpoint). A reader-side epoch-grid ceil here silently skipped any
  // real candle whose calendar-anchored open fell below the epoch
  // boundary — permanently missing rows for 1w/1M
  private var cursorMs: Long = p.fromMs
  private var page: Iterator[InternalRow] = Iterator.empty
  private val policy = new PagePolicy(p.paceMs, p.backoffMs, p.maxRetries,
    KlineSource.sleepHook.getOrElse((ms: Long) => Thread.sleep(ms)))
  private val transport: KlineTransport =
    p.endpoint.map(new HttpKlineTransport(_))
      .getOrElse(new SimulatedTransport(p.durMs))
  private var pageIdx = -1
  private val pendingSimFails =
    scala.collection.mutable.Set(p.simRateLimitPages: _*)

  private def fetchPage(): Iterator[InternalRow] = {
    if (cursorMs >= p.toMs) return Iterator.empty
    pageIdx += 1
    policy.fetchPaced { () =>
      // simulated exchange: the listed pages reject their first attempt
      if (pendingSimFails.remove(pageIdx))
        throw new RateLimitException(
          s"simulated: Too much request weight (page $pageIdx)")
      val klines = transport.fetchPage(p.symbol, p.timeframe, cursorMs,
        p.toMs, KlineSource.pageSize)
      if (klines.isEmpty) {
        cursorMs = p.toMs // exhausted range: no (more) data before toMs
        Iterator.empty
      } else {
        // the reference's rule VERBATIM (api_connector.py:268): +1 ms,
        // not +durMs — "one bucket" is not a fixed width on calendar
        // grids (last_ts + 30d overshoots a short month's open and the
        // next monthly candle would be skipped); +1 can never skip and
        // never re-fetch (next page's opens are >= last_ts + 1)
        cursorMs = klines.last.tsMs + 1
        klines.iterator.map { k =>
          InternalRow(k.tsMs * 1000L, // TimestampType carries epoch-µs
            UTF8String.fromString(p.symbol), UTF8String.fromString(p.timeframe),
            k.open, k.high, k.low, k.close, k.volume)
        }
      }
    }
  }

  override def next(): Boolean = {
    if (page.hasNext) true
    else { page = fetchPage(); page.hasNext }
  }
  override def get(): InternalRow = page.next()
  override def close(): Unit = ()
}
