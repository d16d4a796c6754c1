package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {

  /** Relation cache per (session, path): `spark.read.parquet` re-lists
    * the path and re-reads footers for schema on every call, ~80ms per
    * table reference that every query would otherwise pay again. The
    * returned DataFrame is immutable plan state, safe to share; keyed on
    * the session so a stopped session's relations are never reused.
    *
    * Semantics and lifetime:
    *  - The cached relation SNAPSHOTS the file listing at first read: a
    *    path whose files change mid-session keeps serving the old
    *    listing. These are driver-generated, write-once test dirs, which
    *    is why that trade is safe here; call [[invalidate]] after any
    *    external change.
    *  - Entries of stopped sessions are swept on every access (the sweep
    *    walks a map of at most #tables × #live-sessions entries, i.e.
    *    tens), so neither the session nor its plans are pinned once
    *    stopped. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Drop every cached relation (e.g. after rewriting a test dir). */
  def invalidate(): Unit = cache.clear()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val it = cache.keySet.iterator
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })
  }

  /** `ts` normalization across testdata generations. Earlier generators
    * wrote TIMESTAMP(NANOS) — unrepresentable in Spark's microsecond
    * TimestampType, so it is read as a nanos long (nanosAsLong) and
    * floor-divided to micros, the same truncation DuckDB applies reading
    * TIMESTAMP_NS as TIMESTAMP. The 2026-08-13 regeneration writes
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark 4 infers
    * as TIMESTAMP_NTZ; cast it to TimestampType — value-identity under
    * the UTC session timezone every graft session pins, and the exact
    * micros DuckDB sees. Dispatch on the READ schema so both data
    * generations (and a future plain-LTZ one) work unchanged.
    */
  private def eventsWithTs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsWithTs(s, d)
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
