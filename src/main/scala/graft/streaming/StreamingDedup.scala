package graft.streaming

import org.apache.spark.sql.{Column, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.core.Message
import graft.functions.Hashes
import graft.router.Stages

/** Streaming form of the Deduplicator middleware (reference:
  * message/router/middleware/deduplicator.go:64-126): drop messages
  * whose content hash was already seen within a rolling event-time
  * window. The reference keeps an in-memory expiring map with a TTL
  * cleanup loop (:145-201); Spark's state store + watermark IS that
  * expiring map, distributed and fault-tolerant —
  * `dropDuplicatesWithinWatermark` evicts state exactly when the
  * watermark passes a key's event time, so state is bounded at any
  * scale. Default hasher is the native Adler32 expression, parity with
  * `NewMessageHasherAdler32` (deduplicator.go:219-234).
  */
object StreamingDedup {

  private val enc = Encoders.product[Message]

  /** Dataset stage for [[graft.router.Router.addHandler]]:
    * `withWatermark(delay) + dropDuplicatesWithinWatermark(hash)`. */
  def stage(watermarkDelay: String,
      hash: Column = Hashes.adler32(col("payload"))): Stages.Stage = ds =>
    ds.toDF()
      .withColumn("_graft_dedup_hash", hash)
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("_graft_dedup_hash")
      .drop("_graft_dedup_hash")
      .as[Message](enc)

  /** Batch form over any frame (the q06 analogue): keep the first row
    * per hash within each tumbling window. */
  def batch(ds: Dataset[Message], windowDur: String,
      hash: Column = Hashes.adler32(col("payload"))): Dataset[Message] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(window(col("ts"), windowDur), hash).orderBy(col("ts"), col("uuid"))
    ds.toDF()
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .as[Message](enc)
  }
}
