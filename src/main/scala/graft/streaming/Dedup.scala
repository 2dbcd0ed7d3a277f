package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup — the unbounded twin of the q15 capability
  * (api.DedupOps.exactDuplicates keeps min-id per content digest; a
  * stream can't wait for "min", so the streaming contract is
  * FIRST-ARRIVAL-WINS within the event-time horizon).
  */
object Dedup {

  /** Emit the first row per key; suppress later copies whose key was
    * already seen within the watermark horizon. State holds one entry
    * per in-horizon key and is purged as the watermark advances — at
    * 100TB/day the horizon bounds state size, and the RocksDB provider
    * keeps it off-heap (StreamingSpec runs this under both stores).
    * Keys older than the horizon can re-emit: streaming dedup trades
    * unbounded lookback for bounded state, and the batch digest pass
    * (q15) sweeps whatever the horizon misses.
    *
    * The typical key for content dedup is a digest column
    * (md5(text)), so state per key is ~16B + timestamp regardless of
    * document size.
    */
  def firstPerKey(events: DataFrame, tsCol: String, keyCols: Seq[String],
      delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
