package graft

import org.apache.spark.sql.SparkSession

/** Runs a streaming-test body under the RocksDB state store provider —
  * the out-of-heap store a 100TB streaming job needs (keyed state no
  * longer bounded by executor heap; incremental checkpoints). The conf
  * is captured per-query at start, so setting it around the body and
  * restoring after is exact.
  */
object StateStoreVariants {

  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val Key = "spark.sql.streaming.stateStore.providerClass"

  def withRocksDB[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(Key)
    spark.conf.set(Key, RocksDBProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Key, v)
      case None    => spark.conf.unset(Key)
    }
  }
}
