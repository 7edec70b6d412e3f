package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Storage control for localCheckpoint'd Datasets. `Dataset.unpersist()`
  * only clears cache-manager entries, but a local checkpoint persists at
  * the RDD level (MEMORY_AND_DISK) outside the cache manager — without
  * dropping the RDD itself the blocks linger until the ContextCleaner
  * GC's the reference, which on an iterative loop means one superseded
  * table copy per round. `private[sql]` access to [[LogicalRDD]] requires
  * living in the `org.apache.spark.sql` namespace (same pattern as
  * [[ColumnBridge]]).
  */
object DatasetBridge {
  /** Frees the checkpoint blocks behind `ds` (no-op for non-checkpoint
    * plans).
    */
  def unpersistCheckpoint(ds: Dataset[_], blocking: Boolean = false): Unit =
    ds.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking)
      case _ => ()
    }
}
