package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication for continuously-ingested training corpora — the streaming
  * face of [[graft.ops.Dedup]].
  *
  * Spark-first notes: exact streaming dedup is the engine's
  * `dropDuplicatesWithinWatermark` — state is keyed on the 16-byte content hash (never
  * the document text) and evicted once the watermark passes, so state size is bounded
  * by the dedup horizon instead of growing forever (the unbounded-state failure mode of
  * plain `dropDuplicates` on an infinite stream). SimHash signatures are pure per-row
  * map work and stream unchanged; banding/joins for NEAR-dup detection belong in the
  * batch layer over landed data (stream-stream self-joins of a corpus against its own
  * history are not the 100 TB shape — land, then dedup incrementally per partition).
  */
object StreamingDedup {

  /** Drop exact-duplicate documents arriving within the watermark horizon. Keeps the
    * first arrival of each content hash; a duplicate arriving later than `delay` after
    * its original may pass (the documented semantics of watermarked dedup state).
    */
  def exactDedupStream(
      stream: DataFrame,
      eventTimeCol: String,
      delay: String,
      textCol: String = "text"): DataFrame =
    stream
      .withColumn("fingerprint", md5(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Per-row signatures (SimHash + rolling fingerprint) on a stream: stateless map
    * work, so the stream stays trigger-shaped — use downstream for incremental
    * near-dup candidate generation against landed signatures.
    */
  def withSignatures(stream: DataFrame, textCol: String = "text"): DataFrame =
    stream
      .withColumn("simhash", graft.functions.SimHash64.simhash64(col(textCol)))
      .withColumn("rolling_fingerprint",
        graft.functions.RollingHash.rolling_hash(col(textCol)))
}
