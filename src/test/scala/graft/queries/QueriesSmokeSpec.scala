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

  test("the serial-gate set matches the explicit shared-state register " +
      "(the Verify pool isolation contract)") {
    // EXPLICIT register, not prefix matching (a non-catalog gate whose
    // name starts with i/e/c would otherwise be force-marked, and a
    // catalog-touching gate with any other prefix missed entirely):
    // every gate that touches SHARED engine state — managed tables in
    // graft.verify/graft.audit, the audit log, the global Hadoop conf —
    // is listed here AND marked serial=true in its QueryDef. Adding a
    // catalog-touching gate means updating BOTH, consciously; set
    // EQUALITY catches a forgotten mark and a stale register entry
    // alike (QueryDef scaladoc has the why).
    val register = Set(
      "a1_audit_log_e2e",
      "c1_compaction", "c2_schema_evolution", "c3_merge_upsert",
      "c4_incremental_agg", "c5_merge_pruned", "c6_table_diff",
      "c7_scd2", "c8_time_travel", "c9_incremental_minmax",
      "c10_scd2_versioned",
      "e1_export_xlsx_e2e", "e2_export_csv_e2e", "e3_export_parquet_e2e",
      "e4_export_jsonl_e2e", "e5_export_csv_gzip_e2e",
      "e6_export_xlsx_sheets_e2e", "e7_export_partitioned_e2e",
      "e8_export_csv_zstd_e2e", "e9_export_shards_e2e",
      "e10_export_avro_e2e", "e11_export_orc_e2e",
      "i1_ingest_csv_e2e", "i2_ingest_json_e2e", "i3_ingest_zip_e2e",
      "i4_ingest_xlsx_e2e", "i5_ingest_copy_e2e",
      "i6_ingest_json_columns_e2e", "i7_ingest_parquet_e2e",
      "i8_ingest_orc_e2e", "i9_ingest_latin1_e2e",
      "i10_ingest_provenance_e2e", "i11_ingest_fwf_e2e",
      "i12_ingest_xlsx_all_sheets_e2e", "i13_ingest_tgz_e2e",
      "i14_flatten_nested", "i15_ingest_quoted_newline_e2e",
      "i16_ingest_warc_e2e", "i17_ingest_avro_e2e",
      "i18_ingest_corrupt_json_e2e", "i19_ingest_hadoop_store_e2e",
      "sc2_bucketed_join", "sc10_page_pruned_read",
      "st4_stream_ingest", "st8_stream_upsert")
    val serial = Registry.all.filter(_.serial).map(_.name).toSet
    assert((register -- serial).isEmpty,
      s"register entries not marked serial: ${register -- serial}")
    assert((serial -- register).isEmpty,
      s"serial gates missing from the explicit register: " +
        s"${serial -- register}")
  }
}
