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
      close: PubSub => Unit)

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
      ps => ps.asInstanceOf[SqlPubSub].close()))

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
  }
}
