package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame

import graft.core.Message

/** BulkRead / BulkReadWithDeduplication, parity with
  * `subscriber.BulkRead` (reference: message/subscriber/read.go:10-53):
  * drain up to `limit` messages from a topic's replay view, optionally
  * dropping repeated UUIDs. The channel+timeout mechanics of the
  * reference collapse to a bounded batch read here — the limit is the
  * contract, the timeout was Go-channel plumbing.
  */
object BulkRead {
  def apply(sub: Subscriber, topic: String, limit: Int,
      dedup: Boolean = false): Seq[Message] = {
    val df = sub.subscribeBatch(topic)
    val bounded = (if (dedup) df.dropDuplicates("uuid") else df).limit(limit)
    bounded.collect().toSeq.map(r => Message(
      r.getAs[String]("uuid"), r.getAs[Map[String, String]]("metadata"),
      r.getAs[Array[Byte]]("payload"), r.getAs[java.sql.Timestamp]("ts")))
  }
}

/** Retrying publisher, parity with the internal retrying publisher
  * (reference: internal/publisher/retry.go:17-37): bounded attempts
  * with doubling backoff. Wraps any transport. Construct via
  * [[RetryingPublisher.apply]]: retry is shape-transparent, so
  * wrapping a [[RoutedPublisher]] must PRESERVE the capability —
  * `new RetryingPublisher(fileTransport)` silently downgraded the
  * router sink from one routed pass per micro-batch to O(topics)
  * filtered passes (the scale shape publishRoutedEpoch exists for),
  * because the router's `case rp: RoutedPublisher` stopped matching.
  * (Contrast Decorators, which deliberately WITHHOLDS RoutedPublisher:
  * a perFrame hook may drop the routing column.) */
class RetryingPublisher(inner: Publisher, maxRetries: Int = 5,
    initialBackoffMs: Long = 10, sleep: Long => Unit = Thread.sleep)
  extends Publisher {

  private def withRetry[A](body: => A): A = {
    var attempt = 0
    var backoff = initialBackoffMs
    while (true) {
      try return body
      catch {
        case NonFatal(e) if attempt < maxRetries =>
          attempt += 1; sleep(backoff); backoff *= 2
      }
    }
    sys.error("unreachable")
  }

  override def publish(topic: String, msgs: Seq[Message]): Unit =
    withRetry(inner.publish(topic, msgs))
  override def publishBatch(topic: String, df: DataFrame): Unit =
    withRetry(inner.publishBatch(topic, df))
  // forward the epoch form: the trait default would drop writerId and
  // retry through publishBatch — a retry after a PARTIAL write would
  // then append the successful prefix twice. Retrying publishEpoch
  // keeps the retry idempotent, which is the entire point of both
  // this wrapper and the epoch API.
  override def publishEpoch(topic: String, df: DataFrame,
      writerId: String): Unit =
    withRetry(inner.publishEpoch(topic, df, writerId))
  protected def retry[A](body: => A): A = withRetry(body)
  override def close(): Unit = inner.close()
}

object RetryingPublisher {
  /** Capability-preserving constructor: a routed inner transport gets
    * a routed retrying wrapper (see the class scaladoc). */
  def apply(inner: Publisher, maxRetries: Int = 5,
      initialBackoffMs: Long = 10,
      sleep: Long => Unit = Thread.sleep): RetryingPublisher =
    inner match {
      case rp: Publisher with RoutedPublisher =>
        new RetryingPublisher(inner, maxRetries, initialBackoffMs, sleep)
          with RoutedPublisher {
          override def publishRoutedEpoch(df: DataFrame, topicCol: String,
              writerId: String): Unit =
            retry(rp.publishRoutedEpoch(df, topicCol, writerId))
        }
      case _ =>
        new RetryingPublisher(inner, maxRetries, initialBackoffMs, sleep)
    }
}
