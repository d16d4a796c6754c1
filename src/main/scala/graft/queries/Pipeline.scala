package graft.queries

import graft.Tables
import graft.ext.{Packing, Profile, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate queries for the pipeline-bookkeeping operators: sequence packing
  * (distributed prefix sum — offsets are a pure function of the global
  * (id, tokens) order, so the single-node window-sum oracle replays them
  * exactly regardless of partitioning) and one-pass column profiling.
  */
object PipelineQueries {

  /** Concat-and-chunk packing of documents into 1024-token sequences. */
  def packing(s: SparkSession, d: String): DataFrame =
    Packing.packConcat(Tables.documents(s, d), "doc_id",
        TextAnalysis.tokenCount(col("text")), seqLen = 1024)
      .orderBy("doc_id")

  private val packingOracle =
    """WITH t AS (
      | SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[^\s]+')) AS BIGINT) AS n_tokens
      | FROM documents),
      |o AS (
      | SELECT doc_id, n_tokens,
      |  sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS end_off
      | FROM t WHERE n_tokens > 0)
      |SELECT doc_id, n_tokens,
      | CAST(end_off - n_tokens AS BIGINT) AS start_offset,
      | CAST(floor((end_off - n_tokens) / 1024.0) AS BIGINT) AS seq_first,
      | CAST(floor((end_off - 1) / 1024.0) AS BIGINT) AS seq_last
      |FROM o ORDER BY doc_id""".stripMargin

  /** One-pass exact profile of the customer table. */
  def profile(s: SparkSession, d: String): DataFrame =
    Profile.describe(Tables.customer(s, d)).orderBy("column")

  private val profileOracle = {
    def num(c: String) =
      s"""SELECT '$c' AS "column", count(*) AS n,
         | count(*) - count($c) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
         | CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM customer""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS "column", count(*) AS n,
         | count(*) - count($c) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         | min($c) AS min_str, max($c) AS max_str
         |FROM customer""".stripMargin
    Seq(num("c_custkey"), str("c_name"), num("c_nationkey"),
      num("c_acctbal"), str("c_mktsegment"))
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) t ORDER BY \"column\"")
  }

  // ------------------------------------------------- table maintenance

  /** Small-file compaction: a deliberately fragmented table (12-way
    * repartitioned append) compacts to fewer files with byte-identical
    * content — the require asserts the file count actually dropped, the
    * oracle hash-checks the rows. */
  def compaction(s: SparkSession, d: String): DataFrame = {
    import graft.sink.{TableRef, TableSink}
    val ref = TableRef("graft", "verify", "c1_orders")
    s.sql(s"DROP TABLE IF EXISTS ${ref.qualified}")
    s.sql(s"DROP TABLE IF EXISTS ${ref.qualified}__compact_tmp")
    TableSink.append(Tables.orders(s, d).repartition(12), ref)
    val before = s.table(ref.qualified).inputFiles.length
    TableSink.compact(s, ref)
    val after = s.table(ref.qualified).inputFiles.length
    require(after < before, s"compaction must shrink files: $before -> $after")
    s.table(ref.qualified).drop("process_dt", "process_date")
      .orderBy("o_orderkey")
  }

  private val compactionOracle =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      | o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Schema evolution: the second batch brings a column the table has
    * never seen; old rows must read it as NULL, new rows carry it. */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    import graft.sink.{TableRef, TableSink}
    val ref = TableRef("graft", "verify", "c2_orders")
    s.sql(s"DROP TABLE IF EXISTS ${ref.qualified}")
    val o = Tables.orders(s, d)
    TableSink.append(o.where(col("o_orderkey") % 2 === 0), ref)
    TableSink.appendEvolved(
      o.where(col("o_orderkey") % 2 === 1)
        .withColumn("batch_tag", lit("b2")), ref)
    s.table(ref.qualified).drop("process_dt", "process_date")
      .orderBy("o_orderkey")
  }

  private val schemaEvolutionOracle =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      | o_orderdate, o_orderpriority,
      | CASE WHEN o_orderkey % 2 = 1 THEN 'b2' END AS batch_tag
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("pk1_sequence_packing", packing, Some(packingOracle)),
    QueryDef("pr1_profile", profile, Some(profileOracle)),
    QueryDef("c1_compaction", compaction, Some(compactionOracle)),
    QueryDef("c2_schema_evolution", schemaEvolution, Some(schemaEvolutionOracle)))
}
