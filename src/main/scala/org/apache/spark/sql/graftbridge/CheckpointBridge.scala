package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the storage behind a `localCheckpoint`ed Dataset.
  *
  * `Dataset.unpersist` only consults the CacheManager, and a local
  * checkpoint's blocks are NOT cache-manager-owned — they back a
  * `LogicalRDD` leaf and are persisted directly on the RDD. Iterative
  * algorithms that checkpoint per round (NearDup.duplicateComponents)
  * would otherwise accumulate every superseded generation's blocks until
  * GC + ContextCleaner happen to reap them. Like [[ColumnBridge]], this
  * lives inside the org.apache.spark.sql namespace because the pieces it
  * touches are package-private to Spark.
  */
object CheckpointBridge {
  def unpersistBacking(df: DataFrame): Unit = df match {
    case d: org.apache.spark.sql.classic.Dataset[_] =>
      d.queryExecution.analyzed match {
        case lr: LogicalRDD => lr.rdd.unpersist(blocking = false); ()
        case _ => d.unpersist(blocking = false); ()
      }
    case other => other.unpersist(blocking = false); ()
  }
}
