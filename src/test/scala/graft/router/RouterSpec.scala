package graft.router

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.core.Message
import graft.sources.MemoryPubSub
import graft.streaming.StreamingDedup

/** Router lifecycle over real StreamingQueries — the SURVEY §7.2
  * end-to-end slice: subscribe → dataset dedup stage → middleware onion
  * (poison queue) → flatMap handler → dual sink (out + DLQ). Parity
  * targets: message/router_test.go (functional router behavior).
  */
class RouterSpec extends SparkSpec {

  private def msg(u: String, p: String, tsMs: Long = 1700000000000L,
      meta: Map[String, String] = Map.empty) =
    Message(u, meta, p.getBytes("UTF-8"), new Timestamp(tsMs))

  test("end-to-end slice: subscribe → dedup → poison middleware → flatMap → dual sink") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)

    // handler: 1→N flatMap (HandlerFunc semantics); payload "bad" errors
    val h: Middlewares.Handler = { m =>
      val s = m.payloadString
      if (s.startsWith("bad")) throw new RuntimeException(s"cannot process $s")
      Seq(m.copy(uuid = m.uuid + "-a"), m.copy(uuid = m.uuid + "-b"))
    }

    router.addHandler("enrich", "events_in", ps, "events_out", ps, h,
      middlewares = Seq(Middlewares.poisonQueue("events_poison")),
      stages = Seq(StreamingDedup.stage("10 minutes")))

    // 3 distinct + 1 duplicate payload + 1 poison pill
    ps.publish("events_in", Seq(
      msg("m1", "alpha"), msg("m2", "beta"),
      msg("m3", "alpha", tsMs = 1700000000001L), // dup of m1 within window
      msg("m4", "gamma"), msg("m5", "bad-row")))

    router.run()
    router.processAllAvailable()
    router.close()

    val out = ps.subscribeBatch("events_out").collect()
    val poison = ps.subscribeBatch("events_poison").collect()

    // 3 unique good payloads × 2 children
    assert(out.length == 6)
    val outUuids = out.map(_.getAs[String]("uuid")).toSet
    assert(outUuids.forall(u => u.endsWith("-a") || u.endsWith("-b")))
    // dedup dropped m3 (same payload hash as m1, inside the window)
    assert(!outUuids.exists(_.startsWith("m3")))

    // poison row carries the reference metadata and the ORIGINAL uuid
    assert(poison.length == 1)
    val p = poison.head
    assert(p.getAs[String]("uuid") == "m5")
    val pm = p.getAs[Map[String, String]]("metadata")
    assert(pm(Ctx.ReasonPoisoned).contains("cannot process"))
    assert(pm(Ctx.HandlerPoisoned) == "enrich")
    // internal _graft_ ctx keys are stripped before publish
    assert(!pm.keys.exists(_.startsWith(Ctx.InternalPrefix)))
  }

  test("router-level middleware applies to all handlers, first-added outermost") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    router.addMiddleware(Middlewares.correlationId(() => "root-cid"))
    router.addHandler("h1", "in1", ps, "out1", ps,
      m => Seq(m.copy(uuid = m.uuid + "-x")))
    ps.publish("in1", Seq(msg("a", "p1")))
    router.run()
    router.processAllAvailable()
    router.close()
    val out = ps.subscribeBatch("out1").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Map[String, String]]("metadata")(Ctx.CorrelationId) == "root-cid")
  }

  test("consumer handler (NoPublishHandlerFunc) consumes without publishing") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    // static sink: closures are serialized per task even in local mode,
    // so a captured map would be a per-task copy — a static object isn't
    RouterSpecSink.seen.clear()
    router.addConsumerHandler("sink", "in2", ps, m => { RouterSpecSink.seen(m.uuid) = true; () })
    ps.publish("in2", Seq(msg("c1", "x"), msg("c2", "y")))
    router.run()
    router.processAllAvailable()
    router.close()
    assert(RouterSpecSink.seen.keySet == Set("c1", "c2"))
  }

  test("ctx columns are visible to the handler (router_context.go:10-15)") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    // handler copies ctx metadata into a transported key
    router.addHandler("ctxh", "in3", ps, "out3", ps,
      m => Seq(m.withMeta("seen_handler", m.get(Ctx.HandlerName))
        .withMeta("seen_sub", m.get(Ctx.SubscribeTopic))
        .withMeta("seen_pub", m.get(Ctx.PublishTopic))))
    ps.publish("in3", Seq(msg("k1", "x")))
    router.run()
    router.processAllAvailable()
    router.close()
    val m = ps.subscribeBatch("out3").collect().head.getAs[Map[String, String]]("metadata")
    assert(m("seen_handler") == "ctxh")
    assert(m("seen_sub") == "in3")
    assert(m("seen_pub") == "out3")
  }

  test("foreign _graft_ metadata is sanitized at ingress (no forwarding hijack)") {
    // transports are open surfaces: a foreign producer stamping
    // _graft_topic must NOT cause the engine to forward its message to
    // an attacker-chosen topic (the pass-through ack carrier would ride
    // it into the sink's per-row routing). Internal keys are stripped
    // before the handler runs; only the transport's ack stamp survives.
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    router.addHandler("pass", "ing_in", ps, "ing_out", ps,
      m => Seq(m
        .withMeta("seen_override", m.get(Ctx.TopicOverride))
        .withMeta("seen_ack", m.get(Ctx.AckOffset))))
    ps.publish("ing_in", Seq(
      msg("f1", "payload", meta = Map(
        Ctx.TopicOverride -> "attacker_topic",
        "_graft_handler_name" -> "forged",
        // a forged ack stamp on a NON-acking transport must die at
        // ingress too: were it kept, a transport later gaining ack
        // support would let it win the ack max and skip undelivered
        // rows (the whitelist is scoped to AckableSubscriber sources)
        Ctx.AckOffset -> "999999999",
        "user_key" -> "kept"))))
    router.run(); router.processAllAvailable(); router.close()
    assert(ps.subscribeBatch("attacker_topic").count() == 0,
      "foreign _graft_topic must not route the message")
    val out = ps.subscribeBatch("ing_out").collect()
    assert(out.length == 1)
    val meta = Option(out(0).getAs[Map[String, String]]("metadata")).getOrElse(Map.empty)
    assert(meta("seen_override") == "", "handler must see the key stripped")
    assert(meta("seen_ack") == "",
      "forged ack stamp must not survive ingress on a non-acking transport")
    assert(meta("user_key") == "kept", "user metadata must survive sanitization")
  }

  test("a foreign row with NULL metadata flows through, never NPEs the query") {
    // Message.schema marks metadata nullable and an open-surface
    // transport can deliver it (a foreign parquet file in a FilePubSub
    // topic dir): pre-fix, the ctx injection did null + (k -> v)
    // inside the flatMap — OUTSIDE the middleware onion, so recoverer
    // couldn't catch it and the query died into the same row forever.
    // The subscribe boundary now coalesces to an empty map centrally.
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    router.addHandler("nullm", "nm_in", ps, "nm_out", ps,
      m => Seq(m.withMeta("touched", "yes")))
    ps.publish("nm_in", Seq(Message("n1", null, "p".getBytes("UTF-8"),
      new Timestamp(1700000000000L))))
    router.run(); router.processAllAvailable(); router.close()
    val out = ps.subscribeBatch("nm_out").collect()
    assert(out.length == 1, "null-metadata row must be delivered")
    val meta = Option(out(0).getAs[Map[String, String]]("metadata"))
      .getOrElse(Map.empty)
    assert(meta("touched") == "yes")
  }

  test("consumer handlers do not forward foreign _graft_topic stamps") {
    // the consumer sink republishes rows carrying TopicOverride
    // (middleware-produced poison/delay routing) — a foreign stamp on
    // the consumed message itself must never reach it
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    router.addConsumerHandler("eat", "cing_in", ps, _ => ())
    ps.publish("cing_in", Seq(
      msg("f2", "payload", meta = Map(Ctx.TopicOverride -> "attacker_topic2"))))
    router.run(); router.processAllAvailable(); router.close()
    assert(ps.subscribeBatch("attacker_topic2").count() == 0,
      "consumer ack carrier forwarded a foreign routing stamp")
  }

  test("duplicate handler name is rejected (router.go:278)") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    router.addHandler("dup", "a", ps, "b", ps, Middlewares.passthrough)
    intercept[IllegalArgumentException](
      router.addHandler("dup", "c", ps, "d", ps, Middlewares.passthrough))
  }

  test("per-key order is preserved on an ordered transport (test_pubsub.go:405)") {
    // GuaranteedOrder capability = single-partition transport
    val ps = new MemoryPubSub(spark, numPartitions = Some(1))
    val router = new Router(spark)
    RouterSpecSink.arrival.clear()
    router.addConsumerHandler("order", "in4", ps,
      m => { RouterSpecSink.arrival.add(m.get("key") -> m.get("seq").toInt); () })
    val ms = (0 until 50).map(i =>
      msg(f"o$i%03d", s"key${i % 5}", tsMs = 1700000000000L + i,
        meta = Map("seq" -> i.toString, "key" -> s"key${i % 5}")))
    ps.publish("in4", ms.take(25))
    ps.publish("in4", ms.drop(25))
    router.run()
    router.processAllAvailable()
    router.close()
    val arrived = RouterSpecSink.arrival.toArray(Array.empty[(String, Int)]).toSeq
    assert(arrived.length == 50) // no loss
    // per-key arrival sequence must be ascending
    arrived.groupBy(_._1).foreach { case (_, rows) =>
      val seqs = rows.map(_._2)
      assert(seqs == seqs.sorted, s"out-of-order arrivals: $seqs")
    }
  }

  test("unordered transport still loses nothing under fan-in of two publishes") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    router.addHandler("noloss", "in5", ps, "out5", ps, Middlewares.passthrough)
    val ms = (0 until 40).map(i => msg(s"n$i", s"payload$i"))
    ps.publish("in5", ms.take(20))
    ps.publish("in5", ms.drop(20))
    router.run()
    router.processAllAvailable()
    router.close()
    val got = ps.subscribeBatch("out5").collect().map(_.getAs[String]("uuid")).toSet
    assert(got == ms.map(_.uuid).toSet) // AssertAllMessagesReceived semantics
  }

  test("close(): a NonFatal stop failure is logged and suppressed; every sibling still gets its stop attempt") {
    val ps = new MemoryPubSub(spark)
    val r = new Router(spark)
    val cap = new graft.core.CaptureLogger
    r.withLogger(cap)
    r.addHandler("cnf_a", "cnf_in1", ps, "cnf_out1", ps, Middlewares.passthrough)
    r.addHandler("cnf_b", "cnf_in2", ps, "cnf_out2", ps, Middlewares.passthrough)
    r.run()
    val attempted = scala.collection.mutable.ArrayBuffer.empty[String]
    // real StreamingQueries can't be made to fail stop() on demand —
    // the seam substitutes the stop call itself: first query throws
    // NonFatal, the rest stop for real
    r.closeStopSeam = { q =>
      attempted += q.name
      if (attempted.length == 1) throw new RuntimeException("synthetic stop failure")
      q.stop()
    }
    r.close() // must NOT throw
    assert(attempted.length == 2, s"both queries get a stop attempt: $attempted")
    // the failed query is STILL ACTIVE (the seam threw instead of
    // stopping) — it must stay registered, visible, and reachable by a
    // retry; clearing it would strand a live StreamingQuery outside
    // the registry
    val kept = attempted.head.stripPrefix("graft-")
    assert(r.running.keySet == Set(kept),
      s"still-active failed query must stay registered: ${r.running.keySet}")
    assert(r.running(kept).isActive)
    assert(cap.has("warn", "STILL ACTIVE"),
      s"the kept-registered warn must be logged, got ${cap.entries}")
    // a close() RETRY (seam restored) reaches it
    r.closeStopSeam = _.stop()
    r.close()
    assert(r.running.isEmpty, "retry close() stops and deregisters the leftover")
    assert(!spark.streams.active.exists(q =>
      Option(q.name).exists(_.startsWith("graft-cnf_"))), "nothing stranded")
    spark.streams.resetTerminated()
  }

  test("close(): a FATAL from one stop propagates — after the remaining queries still got their stop attempt") {
    val ps = new MemoryPubSub(spark)
    val r = new Router(spark)
    val cap = new graft.core.CaptureLogger
    r.withLogger(cap)
    r.addHandler("cf_a", "cf_in1", ps, "cf_out1", ps, Middlewares.passthrough)
    r.addHandler("cf_b", "cf_in2", ps, "cf_out2", ps, Middlewares.passthrough)
    r.run()
    val attempted = scala.collection.mutable.ArrayBuffer.empty[String]
    r.closeStopSeam = { q =>
      attempted += q.name
      if (attempted.length == 1) throw new OutOfMemoryError("synthetic fatal")
      q.stop()
    }
    val thrown = intercept[OutOfMemoryError](r.close())
    assert(thrown.getMessage == "synthetic fatal",
      "the fatal must propagate, not be swallowed as success")
    assert(attempted.length == 2,
      s"the sibling still got its stop attempt before the rethrow: $attempted")
    // the fatal-path query is still active too: kept registered (the
    // cleanly-stopped sibling is deregistered)
    val kept = attempted.head.stripPrefix("graft-")
    assert(r.running.keySet == Set(kept),
      s"only the still-active fatal query stays registered: ${r.running.keySet}")
    assert(cap.has("error", "FATAL stopping handler"),
      s"the fatal is logged before rethrow, got ${cap.entries}")
    r.closeStopSeam = _.stop()
    r.close()
    assert(r.running.isEmpty && !spark.streams.active.exists(q =>
      Option(q.name).exists(_.startsWith("graft-cf_"))), "retry reaches it")
    spark.streams.resetTerminated()
  }
}

/** Static executor-visible sinks — closure capture would serialize a
  * per-task copy; a top-level object is shared in local mode. */
object RouterSpecSink {
  val seen = scala.collection.concurrent.TrieMap.empty[String, Boolean]
  val arrival = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
}
