package graft.requestreply

import java.sql.Timestamp

import graft.SparkSpec
import graft.core.Message
import graft.cqrs.{JsonCodec, JsonMarshaler}
import graft.router.Router
import graft.sources.MemoryPubSub

case class Ping(x: Int)
case class Pong(x: Int)

class RequestReplySpec extends SparkSpec {

  test("sendAndWait correlates reply by operation id (backend_pubsub.go:74-173)") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    val backend = new PubSubBackend(ps)
    backend.registerHandler[Ping](router) { p => Pong(p.x * 2) }
    router.run()
    val reply = backend.sendAndWait(Ping(21), timeoutMs = 30000,
      drive = () => router.processAllAvailable())
    router.close()
    assert(reply.isRight)
    assert(JsonCodec.read(reply.toOption.get.payload, classOf[Pong]) == Pong(42))
  }

  test("handler errors come back as error replies, not silence (handler.go:16-67)") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    val backend = new PubSubBackend(ps, commandTopic = "rrc2", replyTopic = "rrr2")
    backend.registerHandler[Ping](router) { p =>
      if (p.x < 0) throw new IllegalArgumentException("negative ping")
      Pong(p.x)
    }
    router.run()
    val reply = backend.sendAndWait(Ping(-1), timeoutMs = 30000,
      drive = () => router.processAllAvailable())
    router.close()
    assert(reply.isRight)
    assert(reply.toOption.get.get(RequestReply.ErrorKey) == "negative ping")
  }

  test("await times out when nothing replies (requestreply.go:59-66)") {
    val ps = new MemoryPubSub(spark)
    val backend = new PubSubBackend(ps, commandTopic = "rrc3", replyTopic = "rrr3")
    val r = backend.await("no-such-op", timeoutMs = 200, pollMs = 50)
    assert(r.isLeft)
    assert(r.swap.toOption.get.contains("timeout"))
  }

  test("streaming/batch correlate joins commands and replies on operation_id") {
    import spark.implicits._
    val mk = (u: String, op: String) =>
      Message(u, Map(RequestReply.OperationIdKey -> op), u.getBytes,
        new Timestamp(1700000000000L))
    val commands = Seq(mk("c1", "op1"), mk("c2", "op2"), mk("c3", "op-unanswered")).toDF()
    val replies = Seq(mk("r1", "op1"), mk("r2", "op2"), mk("r-stray", "op-unknown")).toDF()
    val joined = RequestReply.correlate(commands, replies).collect()
    assert(joined.length == 2)
    val pairs = joined.map(r => r.getAs[String]("command_uuid") -> r.getAs[String]("reply_uuid")).toSet
    assert(pairs == Set("c1" -> "r1", "c2" -> "r2"))
  }

  test("correlate treats replies outside the reply window as timeouts (state-eviction bound)") {
    import spark.implicits._
    def at(u: String, op: String, tsMs: Long) =
      Message(u, Map(RequestReply.OperationIdKey -> op), u.getBytes, new Timestamp(tsMs))
    val t0 = 1700000000000L
    val commands = Seq(at("c1", "op1", t0), at("c2", "op2", t0)).toDF()
    val replies = Seq(
      at("r1", "op1", t0 + 60000),            // within the 10-minute window
      at("r2-late", "op2", t0 + 3600000)).toDF() // an hour late: timeout
    val joined = RequestReply.correlate(commands, replies, "10 minutes").collect()
    assert(joined.map(_.getAs[String]("command_uuid")).toSeq == Seq("c1"))
  }
}
