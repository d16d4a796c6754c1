package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application: MERGE (upsert + delete) semantics
  * over plain DataFrames — the `MERGE INTO` a warehouse user of the
  * reference's append-only sink (box_ingest.py saveAsTable append)
  * graduates to once sources start shipping corrections.
  *
  * Plan shape (scale audit): ONE full-outer equi-join on the key —
  * both sides hash-partition once; when the change batch is small
  * (the normal CDC case) Catalyst broadcasts it and the base table
  * never shuffles at all. Nothing is row-at-a-time and no driver
  * collection occurs. The production refinement at 100 TB is
  * partition-pruned rewrite (join change keys against partition
  * values, rewrite only affected partitions); the merge itself is
  * this same plan over the pruned subset.
  */
object Cdc {

  /** Apply `changes` to `base`: matched keys take the change row's
    * columns (full-row update), unmatched change rows insert, and
    * change rows with `deleteCol` true delete. Change keys must be
    * unique (dedupe upstream with [[Dedup.latestByKey]]); base keys are
    * assumed unique (it's a keyed table). A duplicate key on either side
    * silently fans out the full-outer join — pass
    * `assertUniqueKeys = true` (debug mode: one extra keyed aggregate
    * per side, via [[Quality.Unique]]) to fail fast instead.
    *
    * @param deleteCol optional boolean column on `changes` marking
    *                  deletions; absent => pure upsert
    * @param assertUniqueKeys eagerly verify both sides' keys are unique
    *                  before merging (costs one aggregate pass per side)
    */
  def mergeUpsert(
      base: DataFrame, changes: DataFrame, keys: Seq[String],
      deleteCol: Option[String] = None,
      assertUniqueKeys: Boolean = false): DataFrame = {
    val payload = base.columns.filterNot(keys.contains)
    require(payload.nonEmpty, "base must have non-key columns")
    if (assertUniqueKeys)
      Seq("base" -> base, "changes" -> changes).foreach { case (nm, df) =>
        val bad = Quality.check(df, Seq(Quality.Unique(keys)))
          .where(!col("pass")).collect()
        require(bad.isEmpty, s"mergeUpsert: $nm has ${bad.head.getLong(1)} " +
          s"duplicate-key row(s) on (${keys.mkString(", ")})")
      }
    val ch = deleteCol.fold(changes.withColumn("__del", lit(false)))(c =>
      changes.withColumn("__del", coalesce(col(c), lit(false))).drop(c))
    // Struct-wrap each side so a full outer join can distinguish "no
    // match" (struct null) from "matched row with null fields".
    val b = base.select(
      keys.map(col) :+ struct(payload.map(col): _*).as("__b"): _*)
    val c = ch.select(
      keys.map(col) :+ struct((ch.columns.filterNot(n =>
        keys.contains(n) || n == "__del").map(col) :+
        col("__del")): _*).as("__c"): _*)
    b.join(c, keys, "full_outer")
      .where(col("__c").isNull || !col("__c.__del"))
      .select(keys.map(col) ++ payload.map(f =>
        when(col("__c").isNotNull, col(s"__c.$f"))
          .otherwise(col(s"__b.$f")).as(f)): _*)
  }
}
