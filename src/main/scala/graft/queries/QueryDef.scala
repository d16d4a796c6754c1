package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL over
  * the same parquet tables. `bench=true` marks headline benchmark queries.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Registry {
  def all: Seq[QueryDef] =
    Relational.defs ++ Relational2.defs ++ Relational3.defs ++
      Relational4.defs ++ Validation.defs ++
      IngestExportQueries.defs ++ ExtensionQueries.defs ++
      StreamingQueries.defs ++ SketchQueries.defs ++ SamplingQueries.defs ++
      HygieneQueries.defs ++ PipelineQueries.defs ++ AnalyticsQueries.defs

  def byName: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
