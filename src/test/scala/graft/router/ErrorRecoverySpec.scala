package graft.router

import java.sql.Timestamp

import graft.SparkSpec
import graft.core.Message
import graft.delay.DelayedDelivery
import graft.sources.MemoryPubSub
import graft.topology.Requeuer

/** The production error-recovery loop, end to end: handler fails →
  * DelayOnError stamps backoff metadata and routes to the retry topic
  * → Requeuer moves it back to the origin (counting requeues, gated by
  * delayed-delivery readiness) → handler succeeds on redelivery. The
  * composition of middleware/delay_on_error.go + components/requeuer +
  * components/delay that the reference documents as its recommended
  * retry architecture.
  */
class ErrorRecoverySpec extends SparkSpec {

  private def msg(u: String, p: String) =
    Message(u, Map.empty, p.getBytes("UTF-8"), new Timestamp(1700000000000L))

  test("delayed-retry loop: fail, requeue with backoff metadata, succeed on redelivery") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)

    // fails on first delivery (no retries stamp), succeeds on redelivery
    val flaky: Middlewares.Handler = { m =>
      if (m.get(Ctx.Retries).isEmpty) throw new RuntimeException("transient failure")
      Seq(m.withMeta("attempts", m.get(Ctx.Retries)))
    }
    router.addHandler("worker", "work", ps, "done", ps, flaky,
      middlewares = Seq(Middlewares.delayOnError("work_retry", initialIntervalMs = 0)))
    Requeuer.register(router, ps, ps, "work_retry", _ => "work",
      stages = Seq(DelayedDelivery.stage()))

    ps.publish("work", Seq(msg("job1", "payload")))
    router.run()
    // the message crosses three handler hops (work → work_retry → work
    // → done), each its own micro-batch cascade
    (0 until 4).foreach(_ => router.processAllAvailable())
    router.close()

    val done = ps.subscribeBatch("done").collect()
    assert(done.length == 1)
    val meta = done.head.getAs[Map[String, String]]("metadata")
    assert(done.head.getAs[String]("uuid") == "job1")
    assert(meta(Ctx.Retries) == "1")           // one failed attempt recorded
    assert(meta(Ctx.RequeuerRetries) == "1")   // one requeue hop
    assert(meta("attempts") == "1")
    // the retry topic saw the failed message with backoff metadata
    val retried = ps.subscribeBatch("work_retry").collect()
    assert(retried.length == 1)
    val rm = retried.head.getAs[Map[String, String]]("metadata")
    assert(rm(Ctx.DelayedFor) == "0ms" && rm(Ctx.ReasonPoisoned) == "transient failure")
  }
}
