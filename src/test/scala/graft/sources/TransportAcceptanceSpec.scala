package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.core.Message
import graft.router.{Middlewares, Router}

/** The universal transport acceptance suite, parity with the
  * reference's `TestPubSub` battery (pubsub/tests/test_pubsub.go:34-91)
  * that every transport must pass: one set of semantics, run against
  * EVERY local transport — envelope fidelity, replay to late
  * subscribers, and end-to-end delivery through a router. Transports
  * plug in via a tiny harness (constructor + drain hook), exactly the
  * reference's PubSubConstructor pattern.
  */
class TransportAcceptanceSpec extends SparkSpec {

  private final case class Harness(
      name: String,
      make: String => PubSub, // scope key -> fresh transport
      drain: (PubSub, String, Router) => Unit,
      close: PubSub => Unit,
      // transports with an async hop between publish and the broker
      // (webhook thread, pipe reader) settle here before assertions
      settle: (PubSub, String) => Unit = (_, _) => ())

  /** Publisher+Subscriber halves composed into one PubSub — how the
    * split transports (HTTP webhook, io pipe) enter the battery. */
  private final class ComposedPubSub(pub: Publisher,
      sub: Subscriber with SubscribeInitializer, onClose: () => Unit)
    extends PubSub {
    override def publish(t: String, m: Seq[Message]): Unit = pub.publish(t, m)
    override def publishBatch(t: String, df: org.apache.spark.sql.DataFrame): Unit =
      pub.publishBatch(t, df)
    override def subscribe(t: String): org.apache.spark.sql.DataFrame = sub.subscribe(t)
    override def subscribeBatch(t: String): org.apache.spark.sql.DataFrame =
      sub.subscribeBatch(t)
    override def subscribeInitialize(t: String): Unit = sub.subscribeInitialize(t)
    override def close(): Unit = onClose()
  }

  /** Poll until the topic's visible row count stops growing — the
    * generic quiesce for transports whose delivery hop is a thread. */
  private def untilStable(ps: PubSub, topic: String): Unit = {
    var prev = -1L
    var cur = ps.subscribeBatch(topic).count()
    val deadline = System.currentTimeMillis() + 10000
    while (cur != prev && System.currentTimeMillis() < deadline) {
      Thread.sleep(100); prev = cur; cur = ps.subscribeBatch(topic).count()
    }
  }

  private val harnesses = Seq(
    Harness("memory",
      _ => new MemoryPubSub(spark),
      (_, _, r) => r.processAllAvailable(),
      _ => ()),
    Harness("file",
      _ => new FilePubSub(spark, Files.createTempDirectory("graft-acc-").toString),
      (_, _, r) => r.processAllAvailable(),
      _ => ()),
    Harness("sql",
      scope => new SqlPubSub(spark, s"jdbc:derby:memory:acc_$scope;create=true"),
      (ps, topic, r) => {
        ps.asInstanceOf[SqlPubSub].awaitCaughtUp(topic); r.processAllAvailable()
      },
      ps => ps.asInstanceOf[SqlPubSub].close()),
    Harness("http",
      _ => {
        val sub = new HttpSubscriber(spark)
        new ComposedPubSub(
          new HttpPublisher(s"http://127.0.0.1:${sub.boundPort}"), sub,
          () => sub.close())
      },
      (_, _, r) => r.processAllAvailable(),
      ps => ps.close()),
    Harness("io",
      _ => {
        val po = new java.io.PipedOutputStream()
        val pi = new java.io.PipedInputStream(po, 1 << 16)
        val sub = new StreamSubscriber(spark, pi)
        val pub = new StreamPublisher(po)
        new ComposedPubSub(pub, sub, () => sub.close())
      },
      (ps, topic, r) => { untilStable(ps, topic); r.processAllAvailable() },
      ps => ps.close(),
      settle = (ps, topic) => untilStable(ps, topic)))

  private def msg(u: String, p: String, meta: Map[String, String] = Map.empty) =
    Message(u, meta, p.getBytes("UTF-8"), new Timestamp(1700000000000L))

  harnesses.foreach { h =>
    test(s"[${h.name}] envelope fidelity: uuid, metadata, binary payload (test_pubsub.go:34-60)") {
      val ps = h.make(s"${h.name}_fid")
      try {
        ps.subscribeInitialize("acc_fid")
        ps.publish("acc_fid", Seq(
          msg("m1", "payload-1", Map("correlation_id" -> "c1", "empty" -> "")),
          msg("m2", "payload-2")))
        h.settle(ps, "acc_fid")
        val got = ps.subscribeBatch("acc_fid").collect()
          .map(r => r.getAs[String]("uuid") ->
            ((new String(r.getAs[Array[Byte]]("payload"), "UTF-8"),
              Option(r.getAs[Map[String, String]]("metadata")).getOrElse(Map.empty))))
          .toMap
        assert(got.keySet == Set("m1", "m2"))
        assert(got("m1")._1 == "payload-1")
        assert(got("m1")._2 == Map("correlation_id" -> "c1", "empty" -> ""))
        assert(got("m2")._1 == "payload-2")
      } finally h.close(ps)
    }

    test(s"[${h.name}] replay: a late batch reader sees earlier publishes (test_pubsub.go:1126)") {
      val ps = h.make(s"${h.name}_rep")
      try {
        ps.subscribeInitialize("acc_rep")
        ps.publish("acc_rep", Seq(msg("r1", "early")))
        ps.publish("acc_rep", Seq(msg("r2", "later")))
        h.settle(ps, "acc_rep")
        val uuids = ps.subscribeBatch("acc_rep").collect().map(_.getAs[String]("uuid"))
        assert(uuids.toSet == Set("r1", "r2"))
        assert(uuids.length == 2, "no duplication on replay")
      } finally h.close(ps)
    }

    test(s"[${h.name}] router delivery: subscribe -> handler -> publish, nothing lost") {
      val ps = h.make(s"${h.name}_rt")
      val out = new MemoryPubSub(spark)
      try {
        ps.subscribeInitialize("acc_in")
        val n = 25
        ps.publish("acc_in", (0 until n).map(i => msg(s"d$i", s"p$i")))
        val router = new Router(spark)
        router.addHandler(s"acc-${h.name}", "acc_in", ps, "acc_out", out,
          Middlewares.passthrough)
        router.run()
        h.drain(ps, "acc_in", router)
        router.close()
        val got = out.subscribeBatch("acc_out").collect().map(_.getAs[String]("uuid")).toSet
        assert(got == (0 until n).map(i => s"d$i").toSet,
          s"missing: ${(0 until n).map(i => s"d$i").toSet -- got}")
      } finally h.close(ps)
    }

    test(s"[${h.name}] topic independence: topics never leak into each other (test_pubsub.go:873)") {
      val ps = h.make(s"${h.name}_top")
      try {
        ps.subscribeInitialize("acc_top_a")
        ps.subscribeInitialize("acc_top_b")
        ps.publish("acc_top_a", Seq(msg("ta1", "for-a"), msg("ta2", "for-a")))
        ps.publish("acc_top_b", Seq(msg("tb1", "for-b")))
        h.settle(ps, "acc_top_a"); h.settle(ps, "acc_top_b")
        val a = ps.subscribeBatch("acc_top_a").collect().map(_.getAs[String]("uuid")).toSet
        val b = ps.subscribeBatch("acc_top_b").collect().map(_.getAs[String]("uuid")).toSet
        assert(a == Set("ta1", "ta2"), s"topic A contaminated: $a")
        assert(b == Set("tb1"), s"topic B contaminated: $b")
      } finally h.close(ps)
    }

    test(s"[${h.name}] concurrent publishers: no loss, no duplication under contention (test_pubsub.go:284)") {
      val ps = h.make(s"${h.name}_conc")
      try {
        ps.subscribeInitialize("acc_conc")
        val threads = 4; val perThread = 10
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        try {
          val futures = (0 until threads).map { t =>
            pool.submit(new Runnable {
              def run(): Unit =
                (0 until perThread).foreach(i =>
                  ps.publish("acc_conc", Seq(msg(s"c$t-$i", s"p$t-$i"))))
            })
          }
          futures.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
        } finally pool.shutdown()
        h.settle(ps, "acc_conc")
        val uuids = ps.subscribeBatch("acc_conc").collect().map(_.getAs[String]("uuid"))
        val want = (for (t <- 0 until threads; i <- 0 until perThread)
          yield s"c$t-$i").toSet
        assert(uuids.toSet == want, s"missing: ${want -- uuids.toSet}")
        assert(uuids.length == want.size, "no duplication under concurrent publish")
      } finally h.close(ps)
    }
  }
}
