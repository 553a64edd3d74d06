package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that don't need a SparkSession: every
  * oracle row must have a matching query (a typo'd key would surface as
  * a MISSING row in the driver's correctness gate), and keys stay within
  * the parquet-dir-safe charset Verify writes them as. */
class EntryContractSpec extends AnyFunSuite {

  test("every oracleSql key has a queries implementation") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are filesystem/identifier safe") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"unsafe query names: $bad")
  }

  test("no duplicate-by-construction empty oracle strings") {
    val empty = SparkEntry.oracleSql.filter(_._2.trim.isEmpty).keySet
    assert(empty.isEmpty, s"empty oracle SQL: $empty")
  }
}
