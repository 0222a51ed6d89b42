package graft.engine

import org.apache.spark.sql.DataFrame

/** Entry point 1's batch-load semantics (SURVEY §3.1; reference:
  * colab_interface.py:200-256): load many symbols in one logical request,
  * with per-symbol success/error telemetry (colab_interface.py:226-244).
  *
  * Where the reference builds a `{symbol: DataFrame}` dict in a Python
  * loop, the engine returns ONE DataFrame carrying the symbol column
  * (U2's single-frame convention — per-symbol access is a pruned filter,
  * and downstream operators stay distributed). The per-symbol try/except
  * telemetry is genuinely driver-side control flow in the reference and
  * stays driver-side here (it's bookkeeping, not data).
  */
object BatchLoader {

  /** Per-symbol outcome (the reference's summary strings,
    * colab_interface.py:236-243, made structured). */
  final case class LoadSummary(symbol: String, ok: Boolean, rows: Long,
      error: Option[String])

  /** Load `symbols` over [fromMs, toMs): direct path, or resample path
    * when `timeframe != "1m"` and `resample` is set
    * (colab_interface.py:230-233 dispatch). Failed symbols are reported,
    * not fatal. */
  def loadMany(md: MarketData, symbols: Seq[String], timeframe: String,
      fromMs: Long, toMs: Long, nowMs: Long,
      resample: Boolean = false): (Option[DataFrame], Seq[LoadSummary]) = {
    val results = symbols.map { sym =>
      try {
        val df =
          if (resample && timeframe != "1m")
            md.getResampledData(sym, timeframe, fromMs, toMs, nowMs)
              .withColumnRenamed("bucket", "ts")
          else md.getData(sym, timeframe, fromMs, toMs, nowMs)
        Right(sym -> df)
      } catch {
        case e: Exception => Left(LoadSummary(sym, ok = false, 0, Some(e.getMessage)))
      }
    }
    val frames = results.collect { case Right((_, df)) => df }
    val combined = frames.reduceOption(_ unionByName _)
    val summaries = results.map {
      case Right((sym, df)) =>
        // the load above only BUILT the plan — the scan executes here at
        // count(). An action-time failure (files yanked by a concurrent
        // delete, runtime read error) must stay per-symbol telemetry,
        // like the reference's try/except, not abort the whole batch.
        try LoadSummary(sym, ok = true, df.count(), None)
        catch { case e: Exception =>
          LoadSummary(sym, ok = false, 0, Some(e.getMessage)) }
      case Left(s) => s
    }
    (combined, summaries)
  }
}
