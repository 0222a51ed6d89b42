package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's deadline/budget/artifact behavior — the
  * paths that decide whether a contended driver run still produces a
  * parseable official artifact (rounds 3/5 failed exactly here). Drives
  * [[Bench.roundRobin]] and [[Bench.artifactLines]] directly with fake
  * measurements: no Spark, no clock.
  */
class BenchSpec extends AnyFunSuite {

  private def reading(sec: Double): String => Either[String, Double] =
    _ => Right(sec)

  test("median: odd count picks middle, even count averages middle two") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
  }

  test("global deadline: unmeasured queries are TRUNCATED, not errors") {
    // deadline trips after two measurements: q1 and q2 get one rep each,
    // q3 never runs — it must land in the truncated list with no -1 row
    var calls = 0
    val (measured, truncated) = Bench.roundRobin(
      Seq("q1", "q2", "q3"), reps = 3, repBudgetSec = 1000,
      overDeadline = () => calls >= 2,
      measureOnce = n => { calls += 1; Right(1.0) })
    assert(truncated == Seq("q3"))
    val byName = measured.toMap
    assert(byName("q1") == (1.0, 1.0, 1.0, None))
    assert(byName("q2") == (1.0, 1.0, 1.0, None))
    assert(!byName.contains("q3"))
    assert(measured.forall { case (_, (med, _, _, e)) =>
      med >= 0 && e.isEmpty }, "truncation must not masquerade as error")
  }

  test("failure past the deadline is the watchdog's cancellation: query " +
      "keeps its earlier median instead of poisoning to -1") {
    var calls = 0
    val (measured, truncated) = Bench.roundRobin(
      Seq("q1"), reps = 3, repBudgetSec = 1000,
      // false when rep 2 is admitted, true by the time its cancellation
      // surfaces — exactly the watchdog's kill window
      overDeadline = () => calls >= 2,
      measureOnce = _ => {
        calls += 1
        if (calls == 1) Right(2.0) else Left("job cancelled")
      })
    assert(truncated.isEmpty)
    assert(measured == Seq("q1" -> (2.0, 2.0, 2.0, None)))
  }

  test("failure BEFORE the deadline is a real crash: -1 with the error") {
    val (measured, truncated) = Bench.roundRobin(
      Seq("q1"), reps = 3, repBudgetSec = 1000,
      overDeadline = () => false,
      measureOnce = _ => Left("boom"))
    assert(truncated.isEmpty)
    assert(measured == Seq("q1" -> (-1d, -1d, -1d, Some("boom"))))
  }

  test("rep budget: a heavy query stops after its SECOND rep, never its " +
      "first — a lone contention spike can't be the only data point") {
    var reps = 0
    val (measured, _) = Bench.roundRobin(
      Seq("q1"), reps = 5, repBudgetSec = 10,
      overDeadline = () => false,
      // each rep is 2× the budget: rep 1 alone must NOT stop the query
      measureOnce = _ => { reps += 1; Right(20.0) })
    assert(reps == 2, "two-rep floor, then the cumulative budget stops it")
    assert(measured == Seq("q1" -> (20.0, 20.0, 20.0, None)))
  }

  test("artifact lines: compact line is tiny, self-describing, and " +
      "carries the same value as the full line") {
    val results = Seq(
      "q1" -> (1.5, 1.4, 1.6, None),
      "q2" -> (-1d, -1d, -1d, Some("crash \"msg\"\n")))
    val extras = Seq("x1" -> (0.5, 0.5, 0.5, None))
    val (full, compact) = Bench.artifactLines(results, extras,
      truncated = Seq("q3"), reps = 3, elapsedSec = 12.34,
      sfDir = "/root/testdata/sf0.1")
    // compact: fits any tail window whole; no per-query maps
    assert(compact.length < 200, s"compact line too big: ${compact.length}")
    assert(compact.contains("\"metric\":\"total\""))
    assert(compact.contains("\"value\":1.5")) // headline medians only
    assert(compact.contains("\"n_measured\":2")) // q1 + x1, not the crash
    assert(compact.contains("\"n_truncated\":1"))
    assert(!compact.contains("q1"), "compact line must omit query maps")
    // full: value/medians ordered AFTER the bulky maps (tail survival)
    assert(full.contains("\"n_measured\":2") &&
      full.contains("\"n_truncated\":1"))
    assert(full.indexOf("\"spread\"") < full.indexOf("\"queries\""),
      "bulky maps must precede the medians")
    assert(full.indexOf("\"queries\"") < full.indexOf("\"value\""),
      "value must sit at the tail end of the line")
    assert(full.contains("\"truncated\":[\"q3\"]"))
    // the crash is a -1 median plus a sanitized error string
    assert(full.contains("\"q2\":-1"))
    assert(full.contains("crash  msg") && !full.contains("crash \"msg\""))
    // both lines stay single-line JSON (driver greps line-wise)
    assert(!full.contains("\n") && !compact.contains("\n"))
  }

  test("artifact lines parse as JSON objects with matching values") {
    // minimal structural check without a JSON library: balanced braces
    // and identical "value" fields between the two lines
    val (full, compact) = Bench.artifactLines(
      Seq("q1" -> (2.25, 2.0, 2.5, None)), Seq.empty, Seq.empty,
      reps = 3, elapsedSec = 1.0, sfDir = "sf")
    def balanced(s: String): Boolean = {
      var depth = 0
      var ok = true
      s.foreach { c =>
        if (c == '{') depth += 1
        if (c == '}') depth -= 1
        if (depth < 0) ok = false
      }
      ok && depth == 0
    }
    assert(balanced(full) && balanced(compact))
    val value = "\"value\":([0-9.]+)".r
    assert(value.findFirstMatchIn(full).map(_.group(1)) ==
      value.findFirstMatchIn(compact).map(_.group(1)))
  }
}
