package graft.engine

/** The reference's closed timeframe vocabulary and its two conversion maps,
  * re-expressed as total Scala maps.
  *
  *  - duration in milliseconds (reference:
  *    binance_data_framework/database_handler.py:162-191). The reference has
  *    a bug there: `'30m' -> 30*1000` (30 *seconds*, database_handler.py:175);
  *    we implement the correct 30-minute value and document the divergence.
  *  - pandas resample rule → Spark `window()` duration string (reference:
  *    binance_data_framework/colab_interface.py:436-465). `1w` maps to
  *    "7 days"; `1M` has no fixed width — the reference approximates it as
  *    30 days (database_handler.py:188-189), we expose calendar-true months
  *    via `date_trunc("month", ts)` instead (see [[Ohlcv.resample]]).
  */
object Timeframes {
  /** Closed vocabulary (reference: api_connector.py:194). */
  val all: Seq[String] = Seq(
    "1m", "3m", "5m", "15m", "30m", "1h", "2h", "4h", "6h", "8h", "12h",
    "1d", "3d", "1w", "1M")

  private val Minute = 60L * 1000
  private val Hour   = 60L * Minute
  private val Day    = 24L * Hour

  /** Timeframe → duration in ms. `1M` uses the reference's 30-day
    * approximation (database_handler.py:188-189) — consumed by the
    * freshness probe and by fixed-width grid steps for sub-month
    * timeframes; NEVER by bucketing or by the `1M` gap-fill grid, which
    * are calendar-true (`date_trunc("month")` / `INTERVAL 1 MONTH` — see
    * [[Ohlcv.bucket]], [[Ohlcv.gapFill]]). */
  val durationMs: Map[String, Long] = Map(
    "1m" -> Minute, "3m" -> 3 * Minute, "5m" -> 5 * Minute,
    "15m" -> 15 * Minute,
    "30m" -> 30 * Minute, // reference bug: 30*1000 (30s) at database_handler.py:175
    "1h" -> Hour, "2h" -> 2 * Hour, "4h" -> 4 * Hour, "6h" -> 6 * Hour,
    "8h" -> 8 * Hour, "12h" -> 12 * Hour,
    "1d" -> Day, "3d" -> 3 * Day, "1w" -> 7 * Day, "1M" -> 30 * Day)

  /** Timeframe → Spark `window()` duration string. `1M` is absent on
    * purpose: calendar months are not fixed-width; resample special-cases it
    * with `date_trunc("month", ...)`. */
  val windowDuration: Map[String, String] = Map(
    "1m" -> "1 minute", "3m" -> "3 minutes", "5m" -> "5 minutes",
    "15m" -> "15 minutes", "30m" -> "30 minutes",
    "1h" -> "1 hour", "2h" -> "2 hours", "4h" -> "4 hours",
    "6h" -> "6 hours", "8h" -> "8 hours", "12h" -> "12 hours",
    "1d" -> "1 day", "3d" -> "3 days", "1w" -> "7 days")

  require(windowDuration.keySet + "1M" == all.toSet)
  require(durationMs.keySet == all.toSet)
}
