package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.CandlePlot

/** Pins the text candlestick renderer: deterministic output, wick/body
  * glyph semantics, bounded size, empty-frame behavior. */
class CandlePlotSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def frame(rows: (Long, Double, Double, Double, Double)*) =
    rows.toSeq.map { case (b, o, h, l, c) => (msTs(b), o, h, l, c) }
      .toDF("bucket", "open", "high", "low", "close")

  test("renders up/down bodies and wicks deterministically") {
    val df = frame(
      (0L, 10.0, 20.0, 5.0, 18.0),   // up candle: █ body 10..18, wick 5..20
      (60000L, 18.0, 19.0, 8.0, 9.0) // down candle: ░ body 9..18
    )
    val out = CandlePlot.renderAscii(df, height = 8)
    assert(out == CandlePlot.renderAscii(df, height = 8)) // deterministic
    val lines = out.split("\n")
    assert(lines.length == 8)
    assert(lines.forall(_.length == lines.head.length), "ragged grid")
    assert(out.count(_ == '#') > 0 && out.count(_ == ':') > 0,
      "missing up/down bodies")
    // a wick char in the CHART area (right of the 12-char label gutter)
    assert(lines.exists(_.drop(12).contains('|')), "missing wick")
    // price labels on top and bottom lines span the full range
    assert(lines.head.contains("20.00") && lines.last.contains("5.00"))
  }

  test("column count equals candle count; empty frame renders empty") {
    val df = frame((0L, 1.0, 2.0, 0.5, 1.5), (60000L, 1.5, 2.5, 1.0, 2.0),
      (120000L, 2.0, 3.0, 1.5, 2.5))
    val lines = CandlePlot.renderAscii(df, height = 4).split("\n")
    val label = lines.head.indexOf('+') + 1
    assert(lines.forall(_.length - label == 3), "one column per candle")
    assert(CandlePlot.renderAscii(frame(), height = 4) == "")
  }

  test("flat series does not divide by zero") {
    val out = CandlePlot.renderAscii(
      frame((0L, 5.0, 5.0, 5.0, 5.0)), height = 4)
    assert(out.nonEmpty && out.contains("#"))
  }
}
