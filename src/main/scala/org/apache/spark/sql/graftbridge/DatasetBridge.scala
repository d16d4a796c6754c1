package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the `private[sql]` plan node behind a checkpointed
  * Dataset: a `localCheckpoint()` pins its blocks via an internal
  * RDD-level persist that `Dataset.unpersist` (CacheManager-scoped)
  * cannot release — explicit release needs the RDD handle. Lives under
  * `org.apache.spark.sql` for the access modifier, like
  * [[ColumnBridge]].
  */
object DatasetBridge {

  /** The RDD backing an (already materialized) checkpointed DataFrame,
    * if its plan is the LogicalRDD a checkpoint produces. */
  def backingRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
