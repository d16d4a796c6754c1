package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Nested-schema flattening for semi-structured ingest (API payloads,
  * event logs, scraped JSON): every struct leaf becomes a top-level
  * column named by its path joined with `sep`, so downstream
  * validation / SQL / parquet sinks see a flat relational schema.
  *
  * Scale shape: purely a projection — each leaf is a codegen'd field
  * extraction, no shuffle, no row multiplication. Arrays and maps stay
  * opaque single columns: exploding them multiplies rows, which is a
  * semantic decision the caller owns (chain `explode` first, then
  * flatten again — flattening is idempotent on already-flat frames).
  */
object Nested {

  /** Column paths of every leaf, depth-first in schema order. */
  private def leafPaths(schema: StructType,
      prefix: Vector[String]): Seq[Vector[String]] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType => leafPaths(s, prefix :+ f.name)
        case _             => Seq(prefix :+ f.name)
      }
    }

  /** Flattens all struct columns recursively. Fails fast (rather than
    * silently shadowing) if two leaf paths would join to the same name
    * — e.g. a top-level `a_b` next to a struct `a.b` — case-insensitive
    * to match Spark's default resolution. */
  def flattenStruct(df: DataFrame, sep: String = "_"): DataFrame = {
    val paths = leafPaths(df.schema, Vector.empty)
    val names = paths.map(_.mkString(sep))
    val dupes = names.groupBy(_.toLowerCase).filter(_._2.size > 1).keys
    require(dupes.isEmpty,
      s"flattenStruct: leaf paths collide after joining with '$sep': " +
        dupes.mkString(", "))
    val cols: Seq[Column] = paths.zip(names).map { case (p, n) =>
      p.tail.foldLeft(col(s"`${p.head}`"))(_.getField(_)).as(n)
    }
    df.select(cols: _*)
  }
}
