package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.core.Message

/** Transport acceptance semantics, ported from the reference's
  * universal suite (reference: pubsub/tests/test_pubsub.go:34-137).
  * Assertions are set-based by uuid (test_asserts.go:39-106) — order
  * free unless the test is explicitly about order.
  */
class PubSubSpec extends SparkSpec {

  private def msgs(n: Int, meta: Map[String, String] = Map.empty): Seq[Message] =
    (0 until n).map(i => Message(s"uuid-$i", meta + ("i" -> i.toString),
      s"payload-$i".getBytes("UTF-8"), new Timestamp(1700000000000L + i)))

  // TestPublishSubscribe (test_pubsub.go:236): payload + metadata fidelity
  test("memory transport roundtrips payload and metadata exactly") {
    val ps = new MemoryPubSub(spark)
    val sent = msgs(100, Map("k" -> "v"))
    ps.publish("t1", sent)
    val got = ps.subscribeBatch("t1").collect()
    assert(got.length == 100)
    val byUuid = got.map(r => r.getAs[String]("uuid") -> r).toMap
    sent.foreach { m =>
      val r = byUuid(m.uuid)
      assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == m.payloadString)
      assert(r.getAs[Map[String, String]]("metadata") == m.metadata)
    }
  }

  // TestTopic (test_pubsub.go:873): topic isolation
  test("topics are isolated") {
    val ps = new MemoryPubSub(spark)
    ps.publish("ta", msgs(3))
    ps.publish("tb", msgs(5))
    assert(ps.subscribeBatch("ta").count() == 3)
    assert(ps.subscribeBatch("tb").count() == 5)
    assert(ps.subscribeBatch("tc").count() == 0)
  }

  // TestNewSubscriberReceivesOldMessages (test_pubsub.go:1126): replay
  test("late subscriber replays full history (persistent semantics)") {
    val ps = new MemoryPubSub(spark)
    ps.publish("replay", msgs(10))
    ps.publish("replay", msgs(10).map(m => m.copy(uuid = m.uuid + "-second")))
    // a subscriber arriving only now still sees all 20
    assert(ps.subscribeBatch("replay").count() == 20)
  }

  test("file transport roundtrips and accumulates appends") {
    val dir = Files.createTempDirectory("graft-fileps-").toString
    val ps = new FilePubSub(spark, dir)
    val sent = msgs(50, Map("src" -> "file"))
    ps.publish("ft", sent.take(30))
    ps.publish("ft", sent.drop(30))
    val got = ps.subscribeBatch("ft").collect()
    assert(got.length == 50)
    assert(got.map(_.getAs[String]("uuid")).toSet == sent.map(_.uuid).toSet)
    val m0 = got.find(_.getAs[String]("uuid") == "uuid-0").get
    assert(m0.getAs[Map[String, String]]("metadata") == Map("src" -> "file", "i" -> "0"))
  }

  test("streaming subscribe sees messages published before and after start") {
    import org.apache.spark.sql.functions.col
    val ps = new MemoryPubSub(spark)
    ps.publish("live", msgs(5))
    val received = scala.collection.concurrent.TrieMap.empty[String, Boolean]
    val q = ps.subscribe("live").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("uuid")).collect().foreach(r => received(r.getString(0)) = true)
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("graft-ck-").toString)
      .start()
    q.processAllAvailable()
    ps.publish("live", msgs(5).map(m => m.copy(uuid = m.uuid + "-late")))
    q.processAllAvailable()
    q.stop()
    assert(received.size == 10)
  }
}
