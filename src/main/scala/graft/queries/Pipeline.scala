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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("pk1_sequence_packing", packing, Some(packingOracle)),
    QueryDef("pr1_profile", profile, Some(profileOracle)))
}
