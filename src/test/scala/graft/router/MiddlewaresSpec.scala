package graft.router

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Message
import Middlewares._

/** Pure-function tests for the middleware onion — no Spark needed: a
  * middleware is `(Message => Seq[Message]) => (Message => Seq[Message])`
  * exactly like the reference's HandlerMiddleware (router.go:42-59),
  * and its unit semantics are testable before lifting into flatMap.
  * Behavioral parity targets cite the reference middleware tests under
  * message/router/middleware/ (retry_test.go, poison_test.go, ...).
  */
class MiddlewaresSpec extends AnyFunSuite {

  private def msg(u: String = "u1", meta: Map[String, String] = Map.empty) =
    Message(u, meta, "p".getBytes, new Timestamp(0))

  private val boom: Handler = _ => throw new RuntimeException("boom")

  test("chain applies first-added outermost (router.go:651-659)") {
    def tag(t: String): Middleware = h => m => h(m.withMeta("trace", m.get("trace") + t))
    val out = chain(Seq(tag("A"), tag("B")))(m => Seq(m))(msg())
    assert(out.head.get("trace") == "AB")
  }

  test("retry retries then succeeds (retry_test.go semantics)") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger
    val flaky: Handler = m =>
      if (attempts.incrementAndGet() < 3) throw new RuntimeException("flaky") else Seq(m)
    assert(retry(maxRetries = 3)(flaky)(msg()).nonEmpty)
    assert(attempts.get() == 3)
  }

  test("retry rethrows after maxRetries exhausted") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger
    val alwaysFail: Handler = _ => { attempts.incrementAndGet(); throw new RuntimeException("no") }
    intercept[RuntimeException](retry(maxRetries = 2)(alwaysFail)(msg()))
    assert(attempts.get() == 3) // initial + 2 retries
  }

  test("poisonQueue routes failed message to DLQ with reference metadata (poison.go:62-102)") {
    val m = msg().withMeta(Ctx.HandlerName, "h1")
      .withMeta(Ctx.SubscribeTopic, "in").withMeta(Ctx.PublishTopic, "out")
    val out = poisonQueue("dlq")(boom)(m)
    assert(out.length == 1)
    val p = out.head
    assert(p.get(Ctx.TopicOverride) == "dlq")
    assert(p.get(Ctx.ReasonPoisoned) == "boom")
    assert(p.get(Ctx.HandlerPoisoned) == "h1")
    // the CONSUMED-FROM topic, so Pq's requeue sends the message back
    // through the handler — "out" here was the bug that made requeue
    // inject raw failures into the handler's output stream
    assert(p.get(Ctx.TopicPoisoned) == "in")
    assert(p.uuid == m.uuid) // the ORIGINAL message is poisoned, not a copy
  }

  test("poisonQueue filter passes non-matching errors through (PoisonQueueWithFilter)") {
    intercept[RuntimeException](
      poisonQueue("dlq", _.getMessage != "boom")(boom)(msg()))
  }

  test("ignoreErrors swallows whitelisted, rethrows others (ignore_errors.go:9-38)") {
    assert(ignoreErrors(Seq("boom"))(boom)(msg()).isEmpty)
    intercept[RuntimeException](ignoreErrors(Seq("other"))(boom)(msg()))
  }

  test("recoverer converts panics to errors, passes NonFatal through (recoverer.go:23-37)") {
    val panics: Handler = _ => throw new InternalError("segv")
    val e = intercept[RecoveredPanicError](recoverer(panics)(msg()))
    assert(e.cause.isInstanceOf[InternalError])
    intercept[RuntimeException](recoverer(boom)(msg())) // not wrapped
  }

  test("correlationId propagates consumed id to produced messages (correlation.go:15-43)") {
    val h: Handler = m => Seq(Message("child1", Map.empty, m.payload, m.ts),
      Message("child2", Map("correlation_id" -> "already-set"), m.payload, m.ts))
    val out = correlationId(() => "gen")(h)(msg(meta = Map("correlation_id" -> "cid-7")))
    assert(out(0).get(Ctx.CorrelationId) == "cid-7")
    assert(out(1).get(Ctx.CorrelationId) == "already-set") // never overwrite
    // absent on input → generated
    val out2 = correlationId(() => "gen")(h)(msg())
    assert(out2(0).get(Ctx.CorrelationId) == "gen")
  }

  test("duplicator runs handler twice (duplicator.go:8-22)") {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val h: Handler = m => { n.incrementAndGet(); Seq(m) }
    assert(duplicator(h)(msg()).length == 2)
    assert(n.get() == 2)
  }

  test("randomFail is deterministic per uuid") {
    val h = randomFail(0.5)(passthrough)
    val results = (0 until 50).map { i =>
      try { h(msg(s"u$i")); true } catch { case _: RuntimeException => false }
    }
    // deterministic: same inputs, same outcomes
    val again = (0 until 50).map { i =>
      try { h(msg(s"u$i")); true } catch { case _: RuntimeException => false }
    }
    assert(results == again)
    assert(results.count(_ == false) > 5 && results.count(_ == true) > 5)
  }

  test("timeout fails slow handlers, passes fast ones (timeout.go:12-24)") {
    val slow: Handler = m => { Thread.sleep(30); Seq(m) }
    intercept[java.util.concurrent.TimeoutException](timeout(5)(slow)(msg()))
    assert(timeout(1000)(slow)(msg()).nonEmpty)
  }

  test("delayOnError stamps backoff metadata and retry topic (delay_on_error.go:14-47)") {
    val out = delayOnError("retry_t", initialIntervalMs = 100)(boom)(msg())
    assert(out.length == 1)
    val d = out.head
    assert(d.get(Ctx.TopicOverride) == "retry_t")
    assert(d.get(Ctx.Retries) == "1")
    assert(d.get(Ctx.DelayedFor) == "100ms")
    assert(d.get(Ctx.DelayedUntil).nonEmpty)
    // second failure doubles the interval
    val out2 = delayOnError("retry_t", 100)(boom)(d)
    assert(out2.head.get(Ctx.Retries) == "2")
    assert(out2.head.get(Ctx.DelayedFor) == "200ms")
  }

  test("delayOnError rethrows past maxRetries") {
    val m = msg(meta = Map(Ctx.Retries -> "3"))
    intercept[RuntimeException](delayOnError("t", 10, maxRetries = 3)(boom)(m))
  }

  test("circuit breaker: sub-threshold failures rethrow (nack) without opening") {
    val cb = new CircuitBreaker(maxFailures = 2, cooldownMs = 100, sleep = _ => ())
    intercept[RuntimeException](cb.protect(throw new RuntimeException("f1")))
    assert(!cb.isOpen) // batch failed (will be redelivered), circuit still closed
  }

  test("circuit breaker trips at maxFailures, then paced probes retry the SAME batch until success") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cb = new CircuitBreaker(maxFailures = 2, cooldownMs = 100, sleep = slept += _)
    var calls = 0
    intercept[RuntimeException](cb.protect { calls += 1; throw new RuntimeException("f1") })
    cb.protect { calls += 1; if (calls <= 2) throw new RuntimeException("f2") }
    // call 2 tripped the circuit, call 3 was the successful probe after
    // one cooldown — the batch completed, nothing was dropped
    assert(calls == 3)
    assert(slept.toSeq == Seq(100L))
    assert(!cb.isOpen)
  }

  test("circuit breaker gives up after maxOpenCycles failed probes") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cb = new CircuitBreaker(maxFailures = 1, cooldownMs = 50,
      maxOpenCycles = 3, sleep = slept += _)
    intercept[RuntimeException](cb.protect(throw new RuntimeException("always down")))
    assert(slept.toSeq == Seq(50L, 50L, 50L)) // 3 paced probes, then rethrow
    assert(cb.isOpen) // stays open for the external restart policy
  }
}
