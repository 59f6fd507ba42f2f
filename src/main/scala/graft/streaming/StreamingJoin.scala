package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join: correlate two live streams on a key
  * within an event-time horizon — the streaming twin of the batch
  * attribution-window join (q80) and the reference's request/reply
  * correlation (watermill `requestreply`: a reply is matched to its
  * command by correlation id within a deadline; here both sides are
  * unbounded streams rather than a stream and a table).
  *
  * Spark-first: this IS Structured Streaming's built-in stream-stream
  * join — both sides are watermarked and the range predicate
  * (`r_ts BETWEEN l_ts AND l_ts + horizon`) lets the engine derive the
  * state-eviction bound per side, so join state is trimmed as the
  * watermark advances instead of growing with the stream. No custom
  * state management to maintain or get wrong.
  *
  * Scale shape: both streams hash-partition on the join key, so each
  * task joins co-partitioned state; state size per key is bounded by
  * horizon + watermark delay (NOT stream length). An unbounded join
  * (no time range) would be rejected by the engine in append mode —
  * the horizon is what makes the operator production-safe.
  */
object StreamingJoin {

  final case class Evt(key: String, ts: Timestamp, payload: String)

  private def sides(left: Dataset[Evt], right: Dataset[Evt],
      horizonSec: Int, watermarkDelay: String) = {
    val l = left.toDF().select(col("key").as("l_key"), col("ts").as("l_ts"),
        col("payload").as("l_payload"))
      .withWatermark("l_ts", watermarkDelay)
    val r = right.toDF().select(col("key").as("r_key"), col("ts").as("r_ts"),
        col("payload").as("r_payload"))
      .withWatermark("r_ts", watermarkDelay)
    val cond = col("l_key") === col("r_key") &&
      col("r_ts") >= col("l_ts") &&
      col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizonSec SECONDS")
    (l, r, cond)
  }

  /** Inner join: every (left, right) pair on the same key with the
    * right event inside [l_ts, l_ts + horizon]. Emits as soon as both
    * sides of a pair have arrived. */
  def within(left: Dataset[Evt], right: Dataset[Evt], horizonSec: Int,
      watermarkDelay: String): DataFrame = {
    val (l, r, cond) = sides(left, right, horizonSec, watermarkDelay)
    l.join(r, cond, "inner")
  }

  /** Left-outer: like [[within]], plus every unmatched left event with
    * null right columns — emitted only once the watermark proves no
    * match can still arrive (the reply-timeout shape: a command with a
    * null reply after the horizon IS the timeout signal). */
  def withinOrTimeout(left: Dataset[Evt], right: Dataset[Evt],
      horizonSec: Int, watermarkDelay: String): DataFrame = {
    val (l, r, cond) = sides(left, right, horizonSec, watermarkDelay)
    l.join(r, cond, "leftOuter")
  }
}
