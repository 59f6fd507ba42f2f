package graft.router

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.core.Message
import graft.sources.FilePubSub

/** Consumer-group semantics (TestConsumerGroups,
  * pubsub/tests/test_pubsub.go:817): every group receives ALL
  * messages of the topic, with independent progress. In this engine a
  * "group" is a streaming query with its own checkpoint — offsets are
  * tracked per checkpoint, so groups neither share nor steal
  * progress.
  */
class ConsumerGroupsSpec extends SparkSpec {

  private def msg(u: String) =
    Message(u, Map.empty, u.getBytes, new Timestamp(1700000000000L))

  test("each consumer group independently receives all messages") {
    val root = Files.createTempDirectory("graft-cg-").toString
    val ps = new FilePubSub(spark, root)
    ps.subscribeInitialize("cg_topic")
    ps.publish("cg_topic", (0 until 10).map(i => msg(s"g$i")))

    // two groups = two routers with separate checkpoints, same topic,
    // SAME handler name — the group id namespaces the queries
    val groupA = new Router(spark,
      Some(Files.createTempDirectory("cg-a-").toString), group = Some("a"))
    val groupB = new Router(spark,
      Some(Files.createTempDirectory("cg-b-").toString), group = Some("b"))
    groupA.addHandler("grp", "cg_topic", ps, "cg_out_a", ps, Middlewares.passthrough)
    groupB.addHandler("grp", "cg_topic", ps, "cg_out_b", ps, Middlewares.passthrough)

    // group A starts first and consumes everything available
    groupA.run(); groupA.processAllAvailable()
    // group B starts later — its own offsets begin at the topic start
    groupB.run(); groupB.processAllAvailable()
    // more messages arrive; both groups pick them up
    ps.publish("cg_topic", (10 until 15).map(i => msg(s"g$i")))
    groupA.processAllAvailable(); groupB.processAllAvailable()
    groupA.close(); groupB.close()

    val expect = (0 until 15).map(i => s"g$i").toSet
    val a = ps.subscribeBatch("cg_out_a").collect().map(_.getAs[String]("uuid")).toSet
    val b = ps.subscribeBatch("cg_out_b").collect().map(_.getAs[String]("uuid")).toSet
    assert(a == expect, s"group A missing ${expect -- a}")
    assert(b == expect, s"group B missing ${expect -- b}")
  }
}
