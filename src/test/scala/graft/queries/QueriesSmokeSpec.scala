package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 and returns rows. Value-level
  * correctness is checked against DuckDB by the driver (and by
  * tools/oracle_check.py locally) — this suite guards execution. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  Registry.all.foreach { q =>
    test(s"${q.name} executes and returns rows") {
      val n = q.fn(spark, TestSpark.sf0001).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("seamGates names all resolve to registered gates (the curated " +
      "always-run tier cannot silently drift from the board)") {
    val names = Registry.all.map(_.name).toSet
    val missing = Registry.seamGates.filterNot(names)
    assert(missing.isEmpty, s"seamGates entries not on the board: $missing")
  }

  test("every catalog-touching family is marked serial (the Verify " +
      "pool isolation contract)") {
    val serial = Registry.all.filter(_.serial).map(_.name).toSet
    // ingest/export/audit + table maintenance + the known shared-state
    // gates; a NEW gate in these families that forgets serial=true can
    // flake the driver sweep (QueryDef scaladoc)
    val mustBeSerial = Registry.all.map(_.name).filter(n =>
      n.startsWith("i") || n.startsWith("e") || n.startsWith("c") ||
        n == "a1_audit_log_e2e" || n == "st4_stream_ingest" ||
        n == "st8_stream_upsert" || n == "sc2_bucketed_join" ||
        n == "sc10_page_pruned_read")
    val unmarked = mustBeSerial.filterNot(serial)
    assert(unmarked.isEmpty,
      s"catalog-touching gates missing serial=true: $unmarked")
  }
}
