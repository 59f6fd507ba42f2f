package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Message

/** Per-key exactly-once counter across micro-batches, parity with the
  * reference's exactly-once-delivery-counter example
  * (reference: _examples/real-world-examples/exactly-once-delivery-counter)
  * and the §2.10 "stateful counter" row. State lives in Spark's state
  * store (checkpointed, partitioned by key) via `mapGroupsWithState` —
  * the custom-state API the delayed-delivery and nack-emulation ops
  * would extend (SURVEY §7.3).
  */
object StatefulCounter {

  final case class KeyCount(key: String, count: Long)

  /** Streaming transform: emits the running total per key after each
    * micro-batch touch. `keyOf` extracts the counting key (e.g. a
    * metadata field, the payload, a user id). */
  def counts(ds: Dataset[Message], keyOf: Message => String): Dataset[KeyCount] = {
    implicit val kcEnc = Encoders.product[KeyCount]
    implicit val strEnc = Encoders.STRING
    implicit val longEnc = Encoders.scalaLong
    ds.groupByKey(keyOf)
      .mapGroupsWithState[Long, KeyCount](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Message], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + rows.size
          state.update(next)
          KeyCount(key, next)
      }
  }

  /** [[counts]] with idle-state eviction: a key untouched for
    * `idleTtl` has its state dropped on a later trigger (processing-
    * time timeout) and restarts from zero if it reappears. At 100 TB
    * an unbounded key space under `NoTimeout` grows the state store
    * forever — use this variant whenever keys are not from a small
    * closed set. `flatMapGroupsWithState` rather than map: the timeout
    * invocation emits nothing instead of a tombstone row. */
  def countsWithTtl(ds: Dataset[Message], keyOf: Message => String,
      idleTtl: String): Dataset[KeyCount] = {
    implicit val kcEnc = Encoders.product[KeyCount]
    implicit val strEnc = Encoders.STRING
    implicit val longEnc = Encoders.scalaLong
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState[Long, KeyCount](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: String, rows: Iterator[Message], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val next = state.getOption.getOrElse(0L) + rows.size
            state.update(next)
            state.setTimeoutDuration(idleTtl)
            Iterator.single(KeyCount(key, next))
          }
      }
  }

  /** Batch form (the q09 analogue): plain groupBy count. */
  def countsBatch(ds: Dataset[Message], keyOf: Message => String): Dataset[KeyCount] = {
    implicit val kcEnc = Encoders.product[KeyCount]
    implicit val strEnc = Encoders.STRING
    import org.apache.spark.sql.functions._
    ds.groupByKey(keyOf).count().map { case (k, n) => KeyCount(k, n) }
  }
}
