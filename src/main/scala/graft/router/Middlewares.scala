package graft.router

import scala.util.control.NonFatal

import graft.core.Message

/** The middleware operator family (reference:
  * message/router/middleware/). A middleware decorates the fundamental
  * per-message operator `Message => Seq[Message]` (the reference's
  * `HandlerFunc`, message/router.go:23-32) exactly as the reference's
  * `HandlerMiddleware` (router.go:42-59) does; the composed function is
  * then lifted into a single `Dataset.flatMap` by the [[Router]], so
  * the whole onion runs inside one codegen'd stage on executors — no
  * extra shuffles, no driver round-trips, closure-serialized once per
  * task.
  *
  * Wall-clock operators deviate as documented in SURVEY.md §7.4:
  * Throttle is a source-rate/trigger concern (see [[HandlerOptions]]),
  * CircuitBreaker is batch-granular on the driver (see
  * [[CircuitBreaker]]).
  */
object Middlewares {

  type Handler = Message => Seq[Message]
  type Middleware = Handler => Handler

  /** First-added = outermost, parity with router.go:651-659 (the onion
    * is built in reverse). */
  def chain(mws: Seq[Middleware])(h: Handler): Handler =
    mws.foldRight(h)((mw, acc) => mw(acc))

  /** Thrown by [[recoverer]] to carry a captured stack trace, parity
    * with middleware/recoverer.go:14-21 (RecoveredPanicError). */
  final case class RecoveredPanicError(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

  /** Converts fatal-ish throwables (the JVM analogue of Go panics) into
    * ordinary handler errors with the stack trace attached, so
    * downstream error middleware (poison queue, retry) see them instead
    * of the task dying. Parity with middleware/recoverer.go:23-37. */
  def recoverer: Middleware = h => m =>
    try h(m)
    catch {
      case NonFatal(e) => throw e // ordinary errors pass through untouched
      // cancellation is NOT a panic: wrapping an interrupt into a
      // NonFatal error would let poison/ignore middleware swallow a
      // task-kill and dead-letter an innocent in-flight message while
      // clearing the interrupt status (the CircuitBreaker carries the
      // same carve-out, Router.scala). Restore the flag and rethrow.
      case e: InterruptedException =>
        Thread.currentThread().interrupt(); throw e
      case e: scala.util.control.ControlThrowable => throw e
      case e: Throwable =>
        throw RecoveredPanicError(s"panic recovered: ${e.getMessage}", e)
    }

  /** Retries the handler up to `maxRetries` additional times, then
    * rethrows. Parity with middleware/retry.go:25-146. The reference
    * sleeps an exponential backoff between attempts; inside an executor
    * task we only honor backoff when `backoffMs > 0` (keep 0 in unit
    * tests — deterministic and non-blocking). */
  def retry(maxRetries: Int, backoffMs: Long = 0L, multiplier: Double = 2.0,
      shouldRetry: Throwable => Boolean = _ => true): Middleware = h => m => {
    var attempt = 0
    var delay = backoffMs
    var out: Seq[Message] = null
    while (out == null) {
      try out = h(m)
      catch {
        case NonFatal(e) if attempt < maxRetries && shouldRetry(e) =>
          attempt += 1
          if (delay > 0) { Thread.sleep(delay); delay = (delay * multiplier).toLong }
        case NonFatal(e) => throw e
      }
    }
    out
  }

  /** On handler error, routes the ORIGINAL message to the dead-letter
    * topic (via the per-row [[Ctx.TopicOverride]]) with the reference's
    * poison metadata, and acks — the batch never fails. Parity with
    * middleware/poison.go:30-102 (PoisonQueueWithFilter via
    * `shouldGoToPoison`). */
  def poisonQueue(topic: String,
      shouldGoToPoison: Throwable => Boolean = _ => true): Middleware = h => m =>
    try h(m)
    catch {
      case NonFatal(e) if shouldGoToPoison(e) =>
        Seq(m
          .withMeta(Ctx.ReasonPoisoned, Option(e.getMessage).getOrElse(e.toString))
          // the SUBSCRIBE topic (poison.go stamps the consumed-from
          // topic): Pq's requeue re-publishes to topic_poisoned so the
          // message goes back THROUGH the handler — stamping the
          // publish topic here would requeue the raw failed message
          // straight into the handler's output stream
          .withMeta(Ctx.TopicPoisoned, m.get(Ctx.SubscribeTopic))
          .withMeta(Ctx.HandlerPoisoned, m.get(Ctx.HandlerName))
          .withMeta(Ctx.TopicOverride, topic))
    }

  /** Swallows matching errors (message dropped + acked). Parity with
    * middleware/ignore_errors.go:9-38 (reference matches on error
    * string equality; we take a predicate and provide the string form
    * as a convenience overload). */
  def ignoreErrors(matches: Throwable => Boolean): Middleware = h => m =>
    try h(m) catch { case NonFatal(e) if matches(e) => Seq.empty }

  def ignoreErrors(messages: Seq[String]): Middleware =
    ignoreErrors(e => messages.contains(e.getMessage))

  /** Copies `correlation_id` from the consumed message to every
    * produced message, generating one if absent. Parity with
    * middleware/correlation.go:15-43. */
  def correlationId(generate: () => String = () => graft.core.Ids.newUuid()): Middleware =
    h => m => {
      val in =
        if (m.get(Ctx.CorrelationId).nonEmpty) m
        else m.withMeta(Ctx.CorrelationId, generate())
      val cid = in.get(Ctx.CorrelationId)
      h(in).map { out =>
        if (out.get(Ctx.CorrelationId).isEmpty) out.withMeta(Ctx.CorrelationId, cid)
        else out
      }
    }

  /** Runs the handler twice (idempotency testing). Parity with
    * middleware/duplicator.go:8-22. */
  def duplicator: Middleware = h => m => h(m) ++ h(m)

  /** Chaos middleware: fails with probability p. Deterministic when
    * seeded by message uuid (hash-based), so tests are reproducible and
    * retries of the same task make identical decisions (a
    * `scala.util.Random` here would violate Spark's task-retry
    * idempotence). Parity with middleware/randomfail.go:16-27. */
  def randomFail(p: Double): Middleware = h => m => {
    val u = (scala.util.hashing.MurmurHash3.stringHash(m.uuid) & 0x7fffffff) / 2147483647.0
    if (u < p) throw new RuntimeException("random fail") else h(m)
  }

  /** Chaos middleware: throws a non-NonFatal panic analogue with
    * probability p (exercises [[recoverer]]). Parity with
    * middleware/randomfail.go:29-39. */
  def randomPanic(p: Double): Middleware = h => m => {
    val u = (scala.util.hashing.MurmurHash3.stringHash(m.uuid + "!") & 0x7fffffff) / 2147483647.0
    if (u < p) throw new InternalError("random panic") else h(m)
  }

  /** Fails the message if the handler exceeds the wall-clock budget.
    * Cooperative (measured after the fact — an executor thread is never
    * interrupted mid-task, matching the reference's contract that the
    * handler must observe cancellation itself, timeout.go:12-24). */
  def timeout(budgetMs: Long): Middleware = h => m => {
    val t0 = System.nanoTime()
    val out = h(m)
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    if (elapsedMs > budgetMs)
      throw new java.util.concurrent.TimeoutException(
        s"handler exceeded ${budgetMs}ms (took ${elapsedMs}ms)")
    out
  }

  /** On handler error, stamps exponential-backoff delay metadata and
    * routes to `retryTopic` for delayed redelivery instead of failing.
    * Parity with middleware/delay_on_error.go:14-47: `retries` counter,
    * `delayed_until`/`delayed_for` keys (components/delay/delay.go:56-59).
    * Consumption honors the stamp via [[graft.delay.DelayedDelivery]]. */
  def delayOnError(retryTopic: String, initialIntervalMs: Long,
      multiplier: Double = 2.0, maxRetries: Int = Int.MaxValue,
      maxIntervalMs: Long = 3600000L): Middleware = h => m =>
    try h(m)
    catch {
      case NonFatal(e) =>
        // foreign writers can stamp anything — a throwing parse INSIDE
        // the recovery path would replace the original error and fail
        // the batch, the exact outcome this middleware exists to avoid
        val retries = m.get(Ctx.Retries).toIntOption.getOrElse(0)
        if (retries >= maxRetries) throw e
        // capped: uncapped 2^retries saturates past retries≈53 and
        // currentTimeMillis + Long.MaxValue wraps NEGATIVE — a
        // delayed_until in the past, i.e. hot-loop redelivery forever
        val delayMs = math.min(
          (initialIntervalMs * math.pow(multiplier, retries)).toLong,
          maxIntervalMs)
        val until = new java.sql.Timestamp(System.currentTimeMillis() + delayMs)
        Seq(m
          .withMeta(Ctx.Retries, (retries + 1).toString)
          .withMeta(Ctx.DelayedFor, s"${delayMs}ms")
          .withMeta(Ctx.DelayedUntil, until.toInstant.toString)
          .withMeta(Ctx.ReasonPoisoned, Option(e.getMessage).getOrElse(e.toString))
          .withMeta(Ctx.TopicOverride, retryTopic))
    }

  /** At-most-once marker, parity with middleware/instant_ack.go:9-14.
    * In the micro-batch model "ack before handling" means the offset
    * commit happens regardless of row-level outcomes — which is already
    * the engine default (row failures route to poison/retry instead of
    * failing the batch). Identity; exists so chains written against the
    * reference API compose unchanged. */
  def instantAck: Middleware = identity

  /** Identity handler, parity with message/router.go:37-40. */
  val passthrough: Handler = m => Seq(m)
}
