package graft.api

import org.apache.spark.sql.DataFrame

/** Storage-lifecycle helpers. `Dataset.localCheckpoint` persists its
  * RDD for the LIFE of the SparkContext (not the life of the plan that
  * made it), so any function that checkpoints a frame it fully
  * consumes before returning must release the blocks itself — the
  * round-7 CurationPipeline lesson (`Stages.close`), shared here so
  * every index build/fold applies the same discipline.
  */
object Lifecycle {

  /** Unpersist the locally-checkpointed RDD(s) backing `df`. Only
    * valid once every consumer of `df` has materialized: a
    * localCheckpoint truncates lineage, so after release the frame
    * can never be recomputed.
    */
  private[graft] def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
