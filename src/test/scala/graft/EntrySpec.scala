package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() non-empty, every query runs at sf0.001,
  * registry maps are consistent. */
class EntrySpec extends AnyFunSuite with SparkTestBase {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql and benchQueries keys are valid query names") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(SparkEntry.benchQueries.toSet.subsetOf(qs))
    assert(SparkEntry.benchQueries.nonEmpty)
  }

  test("approx_count_distinct stays within 5% of exact (q35 accuracy bound)") {
    val rows = SparkEntry.queries("q35_approx_distinct")(spark,
      "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts"))
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"approx $approx vs exact $exact drifted > 5%")
    }
  }

  test("rows-only set is exactly the one legitimately non-oracle-able query") {
    // pins the oracle surface: an accidentally dropped oracleSql entry
    // (silently downgrading a query to a rows-only check) fails here.
    // q35's HLL sketch internals are the single inherent exception; the
    // trained-KMeans IVF (former x42) is spec-only since round 5 — its
    // deterministic twin x85 carries the oracle for that path
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q35_approx_distinct"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("every declared query executes and returns rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          if (fn(spark, "/root/testdata/sf0.001").count() >= 0) None
          else Some(name)
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
