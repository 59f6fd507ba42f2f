package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time sessionization: group each user's clickstream into
  * sessions separated by a silence gap, the session analogue of the
  * reference's per-key ordered consumption (q28's gaps-and-islands is
  * the batch twin of the same semantics).
  *
  * Spark-first: the built-in `session_window` aggregation IS the
  * operator — watermark-driven state, merge-on-overlap, append-mode
  * emission once the watermark passes a session's close — so there is
  * no custom `flatMapGroupsWithState` to maintain, and the state store
  * handles session-merge compaction natively. Semantics: an event
  * extends a session while `ts <= last_ts + gap` (closed boundary — an
  * event EXACTLY `gap` later still merges, matching the lag-based
  * `diff > gap` split of q28/q88); a session is emitted only after the
  * watermark clears `end`, so output is final (no retractions).
  *
  * Scale shape: state is hash-partitioned by user; per-key state is
  * the OPEN sessions only (closed ones emit and evict), so state size
  * tracks active users × gap, not history. The watermark bounds both
  * state retention and how late an event may arrive and still merge.
  */
object StreamingSessionize {

  final case class Click(user: String, ts: Timestamp)

  /** Finalized sessions per user: (user, start, end, n_events).
    * `gap` and `watermarkDelay` are duration strings ("30 minutes").
    * Append-mode sink required — rows appear once their session can no
    * longer grow. */
  def sessions(ds: Dataset[Click], gap: String,
      watermarkDelay: String): DataFrame =
    ds.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user"), col("w.start").as("start"),
        col("w.end").as("end"), col("n_events"))

  /** Batch form over any frame — same built-in, same semantics; the
    * spec pins it to the streaming output AND to the lag-based
    * gaps-and-islands formulation (q28/q88's oracle shape). */
  def sessionsBatch(df: DataFrame, user: String, ts: String,
      gap: String): DataFrame =
    df.groupBy(col(user), session_window(col(ts), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(user), col("w.start").as("start"),
        col("w.end").as("end"), col("n_events"))
}
