package graft.router

/** Metadata-key conventions. The reference carries handler context in
  * the per-message `context.Context` (reference:
  * message/router_context.go:10-15) and control metadata in message
  * headers (poison keys: message/router/middleware/poison.go:14-19;
  * delay keys: components/delay/delay.go:56-59; requeuer counter:
  * components/requeuer/requeuer.go:20-26). Our analogue is a single
  * `metadata MAP<STRING,STRING>` column; `_graft_`-prefixed keys are
  * engine-internal (the ctx analogue) and are stripped by the router
  * sink before publish, everything else is transported.
  */
object Ctx {

  // --- ctx-injection keys (router_context.go parity; stripped on publish)
  val HandlerName = "_graft_handler_name"
  val SubscribeTopic = "_graft_subscribe_topic"
  val PublishTopic = "_graft_publish_topic"

  // --- per-row destination override, consumed by the router sink.
  // This is what makes Forwarder (envelope.go:12-33 destination_topic)
  // and PoisonQueue routing per-row-native.
  val TopicOverride = "_graft_topic"

  // --- consumer-ack handle (watermill's per-message Ack, mapped to
  // the micro-batch ack unit): a transport whose durable offsets must
  // advance on PROCESSING (not enqueue) stamps each delivered
  // message's source offset here; the router sink acks the batch max
  // back to the transport after a successful commit and the key is
  // stripped on publish like every _graft_ key. See
  // [[graft.sources.AckableSubscriber]].
  val AckOffset = "_graft_ack_offset"

  // --- delayed-release marker: a due delayed row is RE-PUBLISHED as a
  // NEW offset of its topic table so the ack-advances-offset protocol
  // covers the release (a crash between release and the consumer's
  // commit redelivers instead of losing). The copy is private to the
  // releasing consumer group — other groups release the original row on
  // their own schedule — so it is stamped here, skipped by every other
  // group's poller, hidden from the replay view, and stripped before
  // delivery like all internal keys.
  val DelayGroup = "_graft_delay_grp"

  // --- transported control metadata (kept on publish)
  /** parity with middleware/poison.go:14-19 */
  val ReasonPoisoned = "reason_poisoned"
  val TopicPoisoned = "topic_poisoned"
  val HandlerPoisoned = "handler_poisoned"
  /** parity with middleware/correlation.go:8 */
  val CorrelationId = "correlation_id"
  /** parity with components/delay/delay.go:56-59 */
  val DelayedUntil = "delayed_until"
  val DelayedFor = "delayed_for"
  /** parity with components/requeuer/requeuer.go:20-26 */
  val RequeuerRetries = "requeuer_retries"
  /** retry-count stamped by DelayOnError (delay_on_error.go:14-47) */
  val Retries = "retries"

  val InternalPrefix = "_graft_"

  /** Column form of the internal-key strip — THE one predicate every
    * sanitization site shares (router ingress, both sink publishes,
    * transport-side polls use [[sanitizeMeta]]): drop `_graft_` keys,
    * keeping only the explicit `keep` whitelist. Single-sourcing it
    * means a future internal key with special transport semantics
    * (the DelayGroup lesson) has ONE place to be considered. */
  def stripInternal(meta: org.apache.spark.sql.Column,
      keep: String*): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.map_filter
    map_filter(meta, (k, _) =>
      keep.foldLeft(!k.startsWith(InternalPrefix))((acc, w) => acc || k === w))
  }

  /** Scala-map twin of [[stripInternal]] for driver/transport-side
    * sanitization (the SQL poller). */
  def sanitizeMeta(meta: Map[String, String],
      keep: Set[String] = Set.empty): Map[String, String] =
    meta.filter { case (k, _) => !k.startsWith(InternalPrefix) || keep(k) }
}
