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
    * decimal(38,0). Kept private-but-stable so gate oracles replay it. */
  private def cell(v: Column): Column =
    round(v.cast(DoubleType) * lit(1000000.0))
      .cast(LongType).cast(DecimalType(38, 0))

  /** Per-group mean vector in long form: one row per (group, dim) with
    * the member count and the exact-derived mean. `dim` is 0-based.
    * Output: groupCol, dim, n, mean — sorted by caller if needed.
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col(groupCol), col("dim").cast(LongType).as("dim"))
      .agg(count(lit(1)).as("n"), sum(cell(col("v"))).as("s"))
      .select(col(groupCol), col("dim"), col("n"),
        (col("s").cast(DoubleType) / lit(1000000.0) / col("n").cast(DoubleType))
          .as("mean"))

  /** L2-normalize a vector column in place: v / ||v||, null-safe on the
    * vector itself; an all-zero vector normalizes to zeros (no NaNs).
    * A narrow per-row projection — `aggregate` folds the squared norm
    * inside codegen, no explode and no shuffle. */
  def l2Normalize(vec: Column): Column = {
    val norm = sqrt(aggregate(vec, lit(0.0d),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    transform(vec, x =>
      when(norm > 0.0d, (x.cast(DoubleType) / norm).cast(FloatType))
        .otherwise(x))
  }
}
