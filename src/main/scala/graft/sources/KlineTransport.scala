package graft.sources

/** One fetched candle: bucket open time (epoch ms) + OHLCV. */
case class Kline(tsMs: Long, open: Double, high: Double, low: Double,
    close: Double, volume: Double)

/** Page transport behind [[KlineReader]] — the seam between the engine's
  * pagination/cursor/rate-limit machinery (which is transport-agnostic)
  * and where the bytes come from. One instance per task partition, like
  * the HTTP client it may hold (reference: api_connector.py:208-314 holds
  * one session for its whole page loop).
  *
  * Contract: return the up-to-`limit` candles with bucket open time in
  * `[fromMs, toMsExcl)` in ascending time order; empty means the range
  * has no (more) data. Throw [[RateLimitException]] for a rate-limit
  * rejection — the ONE failure class [[PagePolicy]] retries — and let
  * anything else propagate (abort the task). */
trait KlineTransport extends Serializable {
  def fetchPage(symbol: String, timeframe: String, fromMs: Long,
      toMsExcl: Long, limit: Int): Vector[Kline]
}

/** The zero-egress exchange: a seeded deterministic generator (same
  * (symbol, bucket) → same candle regardless of pagination/partitioning,
  * asserted by KlineSourceSpec). */
class SimulatedTransport(durMs: Long) extends KlineTransport {
  override def fetchPage(symbol: String, timeframe: String, fromMs: Long,
      toMsExcl: Long, limit: Int): Vector[Kline] = {
    // the GRID lives here, as on the real exchange: candles open on the
    // exchange's own boundaries and the response is "all candles with
    // openTime >= startTime" — the reader never assumes a grid (its
    // last_ts+1 cursor rule is grid-agnostic, which is what keeps
    // calendar-anchored timeframes like 1w/1M from being skipped over
    // against a real endpoint)
    val first = ((fromMs + durMs - 1) / durMs) * durMs
    (0 until limit).iterator
      .map(i => first + i * durMs)
      .takeWhile(_ < toMsExcl)
      .map { ts =>
        val (o, h, l, c, v) = KlineSource.candle(symbol, ts)
        Kline(ts, o, h, l, c, v)
      }
      .toVector
  }
}

/** Real-network transport speaking the public Binance REST klines shape —
  * `GET {endpoint}/api/v3/klines?symbol=…&interval=…&startTime=…&
  * endTime=…&limit=…` returning a JSON array of arrays
  * `[[openTimeMs, "open", "high", "low", "close", "volume", …], …]`
  * (the exact request/response contract the reference's page loop
  * consumes, api_connector.py:229-268, and the simulator reproduces).
  * Built on JDK `java.net.http` — no added dependency — and OFF by
  * default: the sandbox has zero egress, so this is constructed only when
  * the caller passes an explicit `endpoint` (KlineSourceSpec exercises it
  * against a local stub server).
  *
  * HTTP 429/418 (request-weight rejection / auto-ban warning) map to
  * [[RateLimitException]] so [[PagePolicy]] applies the reference's
  * backoff-and-retry; any other non-200 aborts the task. The client is
  * `@transient lazy` — each task builds its own on first use, reused
  * across that task's pages. */
class HttpKlineTransport(endpoint: String) extends KlineTransport {
  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  override def fetchPage(symbol: String, timeframe: String, fromMs: Long,
      toMsExcl: Long, limit: Int): Vector[Kline] = {
    val uri = java.net.URI.create(
      s"$endpoint/api/v3/klines?symbol=$symbol&interval=$timeframe" +
        s"&startTime=$fromMs&endTime=${toMsExcl - 1}&limit=$limit")
    val req = java.net.http.HttpRequest.newBuilder(uri)
      .timeout(java.time.Duration.ofSeconds(30)).GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 =>
      case 429 | 418 => throw new RateLimitException(
        s"HTTP ${resp.statusCode()}: Too much request weight")
      case other => throw new java.io.IOException(
        s"klines request failed: HTTP $other ${resp.body().take(200)}")
    }
    HttpKlineTransport.parseKlines(resp.body())
  }
}

object HttpKlineTransport {
  /** Parse the klines array-of-arrays payload. The shape is fixed (outer
    * array of rows; each row an array of JSON numbers/strings, numerics
    * carried as quoted decimal strings per the public API docs), so a
    * dependency-free single-pass parser suffices — fields beyond index 5
    * (closeTime, quote volumes, …) are skipped. */
  def parseKlines(body: String): Vector[Kline] = {
    val out = Vector.newBuilder[Kline]
    var i = 0
    val n = body.length
    def skipWs(): Unit = while (i < n && body(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      if (i >= n || body(i) != c)
        throw new java.io.IOException(
          s"klines parse: expected '$c' at offset $i")
      i += 1
    }
    /** One scalar cell: a bare JSON number or a quoted string; returns its
      * text with quotes stripped. */
    def cell(): String = {
      skipWs()
      if (i < n && body(i) == '"') {
        val start = i + 1
        i += 1
        while (i < n && body(i) != '"') i += 1
        val s = body.substring(start, i)
        i += 1 // closing quote
        s
      } else {
        val start = i
        while (i < n && body(i) != ',' && body(i) != ']') i += 1
        body.substring(start, i).trim
      }
    }
    skipWs()
    if (body.startsWith("{", i))
      throw new java.io.IOException(s"klines error payload: ${body.take(200)}")
    expect('[')
    skipWs()
    if (i < n && body(i) == ']') return out.result() // empty range
    var more = true
    while (more) {
      expect('[')
      val cells = Vector.newBuilder[String]
      var rowMore = true
      while (rowMore) {
        cells += cell()
        skipWs()
        if (i < n && body(i) == ',') i += 1 else rowMore = false
      }
      expect(']')
      val c = cells.result()
      if (c.length < 6)
        throw new java.io.IOException(s"klines parse: short row (${c.length})")
      out += Kline(c(0).toLong, c(1).toDouble, c(2).toDouble, c(3).toDouble,
        c(4).toDouble, c(5).toDouble)
      skipWs()
      if (i < n && body(i) == ',') i += 1 else more = false
    }
    expect(']')
    out.result()
  }
}
