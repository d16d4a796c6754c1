package graft.queries

import graft.Tables
import graft.schema.TableMeta
import graft.validate.ValidateAndSplit
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked exercises of the validate-and-split operator
  * (SURVEY §2 O10-O20; reference box_ingest.py:85-122).
  *
  * A raw "file read" is simulated by stringifying `orders` and injecting
  * deterministic corruption (a NULL in a non-nullable int column for
  * o_orderkey % 97 == 0; a non-numeric float for % 89 == 0). The DuckDB
  * oracle replays the same injection + accept-grammar in ANSI SQL, so both
  * the valid split (typed values) and the invalid split (error strings)
  * are hash-checked.
  */
object Validation {

  private val meta = TableMeta.fromMetadata(
    Seq(
      "order_key"   -> "int",
      "cust_key"    -> "int",
      "total_price" -> "float",
      "order_ts"    -> "timestamp",
      "status"      -> "string"),
    nonNullableFields = Seq("order_key", "cust_key"))

  /** Stringified orders with injected corruption; column names carry the
    * stray whitespace + case the reference normalizes away
    * (box_ingest.py:89, :160).
    */
  private def rawOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey").cast("string").as(" Order_Key "),
      when(col("o_orderkey") % 97 === 0, lit(null))
        .otherwise(col("o_custkey")).cast("string").as("CUST_key"),
      when(col("o_orderkey") % 89 === 0, lit("not-a-number"))
        .otherwise(col("o_totalprice").cast("string")).as("total_price"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("Order_TS"),
      col("o_orderstatus").as("status"))

  def validSplit(s: SparkSession, d: String): DataFrame =
    ValidateAndSplit(rawOrders(s, d), meta).valid.orderBy("order_key")

  private val validOracle =
    """SELECT CAST(o_orderkey AS BIGINT) AS order_key,
      | CAST(o_custkey AS BIGINT) AS cust_key,
      | CAST(o_totalprice AS DOUBLE) AS total_price,
      | o_orderdate AS order_ts,
      | o_orderstatus AS status
      |FROM orders
      |WHERE o_orderkey % 97 <> 0 AND o_orderkey % 89 <> 0
      |ORDER BY order_key""".stripMargin

  def invalidSplit(s: SparkSession, d: String): DataFrame =
    ValidateAndSplit(rawOrders(s, d), meta).invalid
      .groupBy(col("error_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("error_type")

  private val invalidOracle =
    """SELECT error_type, count(*) AS n FROM (
      | SELECT CASE
      |  WHEN o_orderkey % 97 = 0 AND o_orderkey % 89 = 0
      |   THEN 'Null value in non-nullable column: cust_key; Type mismatch for column: total_price'
      |  WHEN o_orderkey % 97 = 0 THEN 'Null value in non-nullable column: cust_key'
      |  WHEN o_orderkey % 89 = 0 THEN 'Type mismatch for column: total_price'
      | END AS error_type FROM orders) t
      |WHERE error_type IS NOT NULL
      |GROUP BY error_type ORDER BY error_type""".stripMargin

  /** Corruption for the rule gate: negative price (casts fine, fails
    * the range rule) on %83 rows, bad status on %79 rows, plus the
    * %97/%89 corruptions above — overlapping rows accumulate multiple
    * error strings in field-then-rule order. */
  private def rawOrdersForRules(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey").cast("string").as("order_key"),
      when(col("o_orderkey") % 97 === 0, lit(null))
        .otherwise(col("o_custkey")).cast("string").as("cust_key"),
      when(col("o_orderkey") % 89 === 0, lit("not-a-number"))
        .when(col("o_orderkey") % 83 === 0, lit("-5.5"))
        .otherwise(col("o_totalprice").cast("string")).as("total_price"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_ts"),
      when(col("o_orderkey") % 79 === 0, lit("X"))
        .otherwise(col("o_orderstatus")).as("status"))

  /** User-defined row rules on TYPED values (ValidateAndSplit.RowRule):
    * a null-guarded range rule and an enum rule, accumulated into the
    * same error strings as the built-in checks. */
  def rulesSplit(s: SparkSession, d: String): DataFrame =
    ValidateAndSplit(rawOrdersForRules(s, d), meta, Seq(
        ValidateAndSplit.RowRule("nonnegative_price",
          p => p("total_price").isNull || p("total_price") >= 0),
        ValidateAndSplit.RowRule("status_enum",
          p => p("status").isin("O", "F", "P"))))
      .invalid
      .groupBy(col("error_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("error_type")

  private val rulesOracle =
    """SELECT error_type, count(*) AS n FROM (
      | SELECT array_to_string(list_filter([
      |   CASE WHEN o_orderkey % 97 = 0
      |     THEN 'Null value in non-nullable column: cust_key' END,
      |   CASE WHEN o_orderkey % 89 = 0
      |     THEN 'Type mismatch for column: total_price' END,
      |   CASE WHEN o_orderkey % 89 <> 0 AND o_orderkey % 83 = 0
      |     THEN 'Rule violated: nonnegative_price' END,
      |   CASE WHEN o_orderkey % 79 = 0
      |     THEN 'Rule violated: status_enum' END
      |  ], x -> x IS NOT NULL), '; ') AS error_type
      | FROM orders) t
      |WHERE error_type <> ''
      |GROUP BY error_type ORDER BY error_type""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("v1_validate_valid", validSplit, Some(validOracle)),
    QueryDef("v2_validate_invalid", invalidSplit, Some(invalidOracle)),
    QueryDef("v3_validate_rules", rulesSplit, Some(rulesOracle)))
}
