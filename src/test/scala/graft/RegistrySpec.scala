package graft

import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the committed REGISTRY.txt to the live `SparkEntry.queries` keyset
  * so `tools/correctness_gate.py` (registry/correctness drift gate,
  * VERDICT r8 item 3) can trust the file: adding or removing a query
  * without regenerating REGISTRY.txt fails this spec, and a query that
  * silently drops out of a round's CORRECTNESS_r{N}.json fails the gate.
  */
class RegistrySpec extends AnyFunSuite {

  test("REGISTRY.txt matches SparkEntry.queries exactly") {
    val committed = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("REGISTRY.txt"))
      .asScala.map(_.trim).filter(_.nonEmpty).toSet
    val live = SparkEntry.queries.keySet
    val missing = live -- committed
    val stale = committed -- live
    assert(missing.isEmpty && stale.isEmpty,
      s"REGISTRY.txt drifted — regenerate it. missing=$missing stale=$stale")
  }

  test("every benchQueries entry is a registered query") {
    val live = SparkEntry.queries.keySet
    val orphan = SparkEntry.benchQueries.filterNot(live)
    assert(orphan.isEmpty, s"bench-only orphans: $orphan")
  }
}
