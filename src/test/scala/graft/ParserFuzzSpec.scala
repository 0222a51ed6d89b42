package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal
import graft.sources.{HttpKlineTransport, Kline}

/** ScalaCheck fuzz coverage for the two round-5 byte-level parsers — the
  * code class where adversarial inputs find bugs. Contracts under test:
  *
  *  - [[Multimodal.parseWav]] NEVER throws: any byte string returns
  *    Some(features) or None (a poison blob in a 100 TB media corpus
  *    must not kill the stage), and every parser-built PCM WAV
  *    round-trips its header fields exactly;
  *  - [[HttpKlineTransport.parseKlines]] terminates on ANY string with
  *    either a result or a plain exception (IOException for shape
  *    violations, NumberFormatException for non-numeric cells — both
  *    abort the task per the transport contract; what must never happen
  *    is a hang, stack overflow, or silent wrong parse), and round-trips
  *    the exact public klines array-of-arrays shape under arbitrary
  *    whitespace and trailing extra fields. No Spark involved — these
  *    run as plain JVM properties. */
class ParserFuzzSpec extends AnyFunSuite {

  private def check(name: String, p: Prop, samples: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(samples), p)
    assert(res.passed, s"$name: $res")
  }

  // ---- WAV --------------------------------------------------------------

  private def buildWav(rate: Int, channels: Int, bits: Int,
      frames: Array[Array[Int]]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val bytesPerFrame = channels * (bits / 8)
    val dataLen = frames.length * bytesPerFrame
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * bytesPerFrame).putShort(bytesPerFrame.toShort)
      .putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    frames.foreach(f => f.foreach(s =>
      if (bits == 16) buf.putShort(s.toShort) else buf.put(s.toByte)))
    buf.array()
  }

  private val wavGen: Gen[(Int, Int, Int, Array[Array[Int]])] = for {
    rate <- Gen.choose(1, 192000)
    channels <- Gen.choose(1, 4)
    bits <- Gen.oneOf(8, 16)
    n <- Gen.choose(1, 120)
    frames <- Gen.listOfN(n, Gen.listOfN(channels,
      if (bits == 16) Gen.choose(-32768, 32767) else Gen.choose(0, 255)))
  } yield (rate, channels, bits, frames.map(_.toArray).toArray)

  test("parseWav: every generated PCM WAV round-trips its header exactly") {
    check("wav round-trip", Prop.forAll(wavGen) { case (rate, ch, bits, frames) =>
      val out = Multimodal.parseWav(buildWav(rate, ch, bits, frames), 1L, 0.01)
      out.exists(a => a.sample_rate == rate && a.n_channels == ch &&
        a.bits_per_sample == bits && a.n_frames == frames.length.toLong &&
        a.rms >= 0.0 && a.rms <= 1.0 + 1e-9 &&
        a.silence_ratio >= 0.0 && a.silence_ratio <= 1.0)
    })
  }

  test("parseWav: random bytes never throw") {
    check("wav random bytes", Prop.forAll(
        Gen.containerOf[Array, Byte](Gen.choose(-128, 127).map(_.toByte))) { bs =>
      Multimodal.parseWav(bs, 1L, 0.01) // Some or None, never a throw
      true
    })
  }

  test("parseWav: mutated and truncated valid files never throw") {
    val base = buildWav(8000, 2, 16, Array.fill(50)(Array(1000, -1000)))
    val mutationGen = for {
      pos <- Gen.choose(0, base.length - 1)
      b <- Gen.choose(-128, 127).map(_.toByte)
      cut <- Gen.choose(0, base.length)
    } yield (pos, b, cut)
    check("wav mutations", Prop.forAll(mutationGen) { case (pos, b, cut) =>
      val mutated = base.clone(); mutated(pos) = b
      Multimodal.parseWav(mutated, 1L, 0.01) // may be Some or None
      Multimodal.parseWav(mutated.take(cut), 1L, 0.01)
      true
    })
  }

  // ---- klines JSON --------------------------------------------------------

  private val klineGen: Gen[Kline] = for {
    ts <- Gen.choose(0L, 4102444800000L)
    o <- Gen.choose(1, 10000000).map(_ / 100.0)
    h <- Gen.choose(1, 10000000).map(_ / 100.0)
    l <- Gen.choose(1, 10000000).map(_ / 100.0)
    c <- Gen.choose(1, 10000000).map(_ / 100.0)
    v <- Gen.choose(0, 10000000).map(_ / 100.0)
  } yield Kline(ts, o, h, l, c, v)

  /** Render the public klines shape: open time as a bare number, prices
    * as quoted decimal strings, optional trailing extra fields, random
    * whitespace between every token. */
  private def render(ks: Seq[Kline], ws: Seq[String], extras: Int): String = {
    var w = 0
    def pad(): String = { w += 1; ws(w % ws.length) }
    ks.map { k =>
      val cells = Seq(k.tsMs.toString,
        "\"" + k.open + "\"", "\"" + k.high + "\"", "\"" + k.low + "\"",
        "\"" + k.close + "\"", "\"" + k.volume + "\"") ++
        (0 until extras).map(i => if (i % 2 == 0) (k.tsMs + i).toString
          else "\"extra\"")
      cells.mkString("[" + pad(), pad() + "," + pad(), pad() + "]")
    }.mkString("[" + pad(), pad() + "," + pad(), pad() + "]" + pad())
  }

  test("parseKlines: round-trips the public shape under whitespace + extra fields") {
    val gen = for {
      ks <- Gen.listOf(klineGen)
      wsChoice <- Gen.listOfN(5, Gen.oneOf("", " ", "\n", "  ", "\t"))
      extras <- Gen.choose(0, 7)
    } yield (ks, wsChoice, extras)
    check("klines round-trip", Prop.forAll(gen) { case (ks, wsc, extras) =>
      HttpKlineTransport.parseKlines(render(ks, wsc, extras)) == ks.toVector
    })
  }

  test("parseKlines: arbitrary strings terminate with a result or a plain exception") {
    val structural = Gen.listOf(Gen.oneOf(
      "[", "]", ",", "\"", "{", "}", "1", "x", " ", "\n", "1.5", "\"a\"",
      "[[", "]]", "null")).map(_.mkString)
    check("klines garbage", Prop.forAll(
        Gen.oneOf(structural, Gen.asciiStr)) { s =>
      try { HttpKlineTransport.parseKlines(s); true }
      catch {
        case _: java.io.IOException => true
        case _: NumberFormatException => true
      } // anything else (hang is covered by test timeout) fails the prop
    })
  }
}
