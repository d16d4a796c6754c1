package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed vector-column operators over `Array[Float]` embedding
  * columns (the `embeddings.embedding` shape): per-group mean pooling
  * (centroids) and L2 normalization. Complements the ANN family in
  * [[Similarity]] — a centroid table is the input to IVF coarse
  * quantizers, per-class prototypes for semantic dedup seeding, and the
  * class-mean summaries a curriculum/mixing pipeline reports.
  *
  * Centroid plan shape: `posexplode` the vector to (group, dim, value)
  * rows and hash-aggregate on (group, dim). The explode multiplies rows
  * by D, but partial aggregation (map-side combine) collapses each
  * partition to at most groups×D cells before the exchange, so the
  * shuffle carries O(groups × D × partitions) — independent of N. That
  * beats any `collect`-then-average scheme and needs no custom
  * TypedImperativeAggregate; the alternative (aggregate buffers of
  * Array[Double]) saves the explode CPU but gives up codegen'd hash
  * aggregation, and the explode is a narrow in-pipeline op anyway.
  *
  * Exactness: float values are widened to double (exact), scaled by 1e6,
  * rounded to integers, and summed in decimal(38,0) — order-independent,
  * so results are bit-identical across partitionings and engines (the
  * DuckDB oracle replays the same tree in HUGEINT). The mean is derived
  * by a final double division chain. Headroom: |v|≤1 embeddings scale to
  * ≤1e6 per cell, so 1e38 capacity ≈ 1e32 rows per (group, dim).
  */
object Vectors {

  /** Scaled-integer term for one vector cell: round(v · 1e6) as
    * decimal(38,0). Kept private-but-stable so gate oracles replay it.
    * Non-finite values raise: the plain double→long cast is non-ANSI
    * (NaN → 0, ±Inf → Long.Min/Max), which would corrupt sums silently
    * where a strict engine (the DuckDB oracle's HUGEINT cast) errors. */
  private def cell(v: Column): Column = {
    val d = v.cast(DoubleType)
    val finite = when(d.isNull || (!isnan(d) && abs(d) <= lit(Double.MaxValue)), d)
      .otherwise(raise_error(concat(
        lit("Vectors: non-finite embedding value "), d.cast(StringType))))
    round(finite * lit(1000000.0)).cast(LongType).cast(DecimalType(38, 0))
  }

  /** Output columns of [[groupCentroids]] plus its internal scratch
    * names — a groupCol colliding with any of these is rejected. */
  private val centroidReserved = Set("dim", "n", "mean", "__dim", "__v", "__n", "__s")

  /** Per-group mean vector in long form: one row per (group, dim) with
    * the member count and the exact-derived mean. `dim` is 0-based.
    * Output: groupCol, dim, n, mean — sorted by caller if needed.
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame = {
    require(!centroidReserved.contains(groupCol),
      s"groupCol '$groupCol' collides with a groupCentroids output/scratch column")
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("__dim", "__v")))
      .groupBy(col(groupCol), col("__dim").cast(LongType).as("__dim"))
      .agg(count(lit(1)).as("__n"), sum(cell(col("__v"))).as("__s"))
      .select(col(groupCol), col("__dim").as("dim"), col("__n").as("n"),
        (col("__s").cast(DoubleType) / lit(1000000.0) / col("__n").cast(DoubleType))
          .as("mean"))
  }

  /** L2-normalize a vector column in place: v / ||v||, null-safe on the
    * vector itself; an all-zero vector normalizes to zeros (no NaNs).
    * A narrow per-row projection, no explode and no shuffle. The norm is
    * folded ONCE per row — bound as a single-element-array lambda
    * variable (cf. Dedup.shingleCol) — because referencing the aggregate
    * expression directly inside the output transform would re-evaluate
    * the whole O(D) fold per element: O(D²) per row. Higher-order
    * functions evaluate interpreted (outside codegen); fine for a
    * projection this shape, but keep it off the per-candidate hot paths
    * (those use the codegen'd FloatCosine / HyperplaneSig expressions). */
  def l2Normalize(vec: Column): Column = {
    val normExpr = sqrt(aggregate(vec, lit(0.0d),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    element_at(transform(array(normExpr), norm =>
      transform(vec, x =>
        when(norm > 0.0d, (x.cast(DoubleType) / norm).cast(FloatType))
          .otherwise(x))), 1)
  }
}
