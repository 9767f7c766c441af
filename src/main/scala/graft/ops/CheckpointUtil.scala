package graft.ops

import org.apache.spark.sql.DataFrame

/** Storage hygiene for iterative localCheckpoint chains. */
private[graft] object CheckpointUtil {

  /** Release the storage behind a localCheckpoint'd frame. Dataset.unpersist
    * is a no-op here (checkpoint blocks live on the RDD, not in the cache
    * manager), so unpersist the LogicalRDD leaf's RDD directly. Safe only
    * once nothing will read the frame again — callers free a round's state
    * AFTER the next round's checkpoint has eagerly materialized. The FINAL
    * checkpoint of a loop must stay live while its result frame is consumed;
    * the ContextCleaner reclaims it when the RDD becomes unreachable. */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
