package graft.sink

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): TableRef = {
    val ref = TableRef("t", "est", name)
    spark.sql(s"DROP TABLE IF EXISTS ${ref.qualified}")
    spark.sql(s"DROP TABLE IF EXISTS ${ref.qualified}__compact_tmp")
    ref
  }

  test("compact: file count drops, rows and partitioning survive") {
    val ref = fresh("sink_compact")
    TableSink.append((1L to 5000L).toDF("id").repartition(16), ref)
    val before = spark.table(ref.qualified).inputFiles.length
    assert(before >= 8, s"fixture should be fragmented, got $before files")
    TableSink.compact(spark, ref)
    val t = spark.table(ref.qualified)
    assert(t.inputFiles.length < before)
    assert(t.count() === 5000L)
    assert(t.columns.contains(TableSink.DateCol), "partition column survives")
    assert(t.select(sum("id")).head.getLong(0) === 5000L * 5001L / 2)
    // still appendable and still partition-pruned after the swap
    TableSink.append(Seq(9999L).toDF("id"), ref)
    assert(spark.table(ref.qualified).count() === 5001L)
  }

  test("appendEvolved: new batch column ALTERs in; old rows read NULL; missing cols null-fill") {
    val ref = fresh("sink_evolve")
    TableSink.append(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), ref)
    // batch 2: brings `score`, lacks `name`
    TableSink.appendEvolved(Seq((3L, 0.5)).toDF("id", "score"), ref)
    val t = spark.table(ref.qualified)
      .select("id", "name", "score").orderBy("id").collect()
    assert(t.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(t.map(r => Option(r.getString(1))).toSeq ===
      Seq(Some("a"), Some("b"), None))
    assert(t.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq ===
      Seq(None, None, Some(0.5)))
  }

  test("appendEvolved: first write creates the table; same-schema append unchanged") {
    val ref = fresh("sink_evolve_fresh")
    TableSink.appendEvolved(Seq((1L, "x")).toDF("id", "v"), ref)
    TableSink.appendEvolved(Seq((2L, "y")).toDF("id", "v"), ref)
    assert(spark.table(ref.qualified).orderBy("id")
      .select("id", "v").collect().map(_.toSeq).toSeq ===
      Seq(Seq(1L, "x"), Seq(2L, "y")))
  }

  private def vroot(tag: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_vt_${tag}_${System.nanoTime()}"

  test("VersionedTable: snapshot isolation — old versions immutable, " +
      "latest follows the newest commit") {
    val root = vroot("iso")
    assert(VersionedTable.versions(spark, root).isEmpty)
    assert(VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), root) === 1)
    assert(VersionedTable.write(Seq((1L, "b"), (2L, "c")).toDF("k", "v"),
      root) === 2)
    assert(VersionedTable.versions(spark, root) === Seq(1, 2))
    assert(VersionedTable.read(spark, root, 1).collect().map(_.getString(1))
      .toSeq === Seq("a"))
    assert(VersionedTable.read(spark, root).count() === 2)
    intercept[IllegalArgumentException](VersionedTable.read(spark, root, 7))
  }

  test("VersionedTable: uncommitted directories (no _SUCCESS) are " +
      "invisible; retain expires the oldest") {
    val root = vroot("commit")
    VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), root)
    VersionedTable.write(Seq((2L, "b")).toDF("k", "v"), root)
    VersionedTable.write(Seq((3L, "c")).toDF("k", "v"), root)
    // Fake a crashed writer: a v4 directory without the marker.
    val crashed = new java.io.File(s"$root/v4")
    assert(crashed.mkdirs())
    assert(VersionedTable.versions(spark, root) === Seq(1, 2, 3))
    assert(VersionedTable.latestVersion(spark, root) === Some(3))
    // The crashed claim is skipped, never reused: the next write is v5.
    assert(VersionedTable.write(Seq((4L, "d")).toDF("k", "v"), root) === 5)
    assert(VersionedTable.retain(spark, root, 2) === Seq(1, 2))
    assert(VersionedTable.versions(spark, root) === Seq(3, 5))
    assert(VersionedTable.read(spark, root).collect()
      .map(_.getString(1)).toSeq === Seq("d"))
  }
}
