package graft.tools

import org.apache.spark.sql.{DataFrame, Row}

/** Text candlestick renderer over [[graft.engine.MarketData.plotCandles]]'
  * plot-ready frame — the terminal stand-in for the reference's
  * matplotlib chart (colab_interface.py:467-499), closing the "nothing
  * renders it" gap without an imaging dependency.
  *
  * The input frame is already scale-safe (plotCandles auto-coarsens to
  * ≤ maxPoints buckets), so the single `collect()` here is bounded by
  * construction — the same sanctioned-collection contract as `preview`.
  * One column per candle: `|` spans high→low (the wick), `#` spans
  * open→close body on up-candles, `:` on down-candles — ASCII only, so
  * the chart survives any terminal/JVM default charset. Deterministic:
  * same frame → same string (CandlePlotSpec pins a fixture). */
object CandlePlot {

  /** Render `candles` (needs bucket/open/high/low/close, ascending
    * bucket) as `height` text rows. Returns "" for an empty frame. */
  def renderAscii(candles: DataFrame, height: Int = 16): String = {
    require(height >= 2, "height must be at least 2")
    val rows: Array[Row] = candles
      .select("bucket", "open", "high", "low", "close")
      .orderBy("bucket").collect()
    if (rows.isEmpty) return ""
    val o = rows.map(_.getAs[Double]("open"))
    val h = rows.map(_.getAs[Double]("high"))
    val l = rows.map(_.getAs[Double]("low"))
    val c = rows.map(_.getAs[Double]("close"))
    val (lo, hi) = (l.min, h.max)
    val span = math.max(hi - lo, Double.MinPositiveValue)
    // price → row index, 0 = top line
    def level(p: Double): Int =
      height - 1 - math.min(((p - lo) / span * (height - 1)).round.toInt,
        height - 1)
    val grid = Array.fill(height, rows.length)(' ')
    for (i <- rows.indices) {
      val (wickTop, wickBot) = (level(h(i)), level(l(i)))
      for (r <- wickTop to wickBot) grid(r)(i) = '|'
      val (bodyTop, bodyBot) =
        (level(math.max(o(i), c(i))), level(math.min(o(i), c(i))))
      val glyph = if (c(i) >= o(i)) '#' else ':'
      for (r <- bodyTop to bodyBot) grid(r)(i) = glyph
    }
    val labelWidth = 12
    grid.zipWithIndex.map { case (line, r) =>
      // label the top, midpoint and bottom lines with their price level
      val price = hi - r * span / (height - 1)
      val label =
        if (r == 0 || r == height - 1 || r == (height - 1) / 2)
          f"$price%10.2f +"
        else " " * (labelWidth - 1) + "|"
      label + line.mkString
    }.mkString("\n")
  }
}
