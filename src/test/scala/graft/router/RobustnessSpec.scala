package graft.router

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Message
import graft.sources.{Decorators, FilePubSub, MemoryPubSub, RetryingPublisher}

/** Regression tests for the round-11 robustness review findings:
  * epoch forwarding through decorators, consumer-handler dead-letter
  * routing, failure-path epoch bookkeeping, and (group, handler) name
  * ambiguity.
  */
class RobustnessSpec extends SparkSpec {

  import spark.implicits._

  private def msg(u: String) =
    Message(u, Map.empty, u.getBytes("UTF-8"), new Timestamp(1700000000000L))

  test("decorated and retrying publishers forward publishEpoch (exactly-once preserved)") {
    val ps = new MemoryPubSub(spark)
    ps.subscribeInitialize("dec_epoch")
    val decorated = Decorators.publisher(ps, identity, df => df)
    val retrying = new RetryingPublisher(ps)
    // same writerId delivered twice through each wrapper: the second
    // must dedup via the inner transport's epoch path (the trait
    // default would route to publishBatch and append twice)
    val df = Seq(msg("e1")).toDF()
    decorated.publishEpoch("dec_epoch", df, "w1")
    decorated.publishEpoch("dec_epoch", df, "w1")
    retrying.publishEpoch("dec_epoch", Seq(msg("e2")).toDF(), "w2")
    retrying.publishEpoch("dec_epoch", Seq(msg("e2")).toDF(), "w2")
    val got = ps.subscribeBatch("dec_epoch").collect().map(_.getAs[String]("uuid"))
    assert(got.sorted.toSeq == Seq("e1", "e2"), s"duplicated: ${got.toSeq}")
  }

  test("a failed epoch publish can be retried, and the retry still dedups later replays") {
    val ps = new MemoryPubSub(spark)
    ps.subscribeInitialize("fail_epoch")
    val bad = Seq(msg("f1")).toDF()
      .withColumn("uuid", expr("raise_error('simulated transient failure')"))
    intercept[Exception] { ps.publishEpoch("fail_epoch", bad, "wf") }
    // the failure released the claim: the retry of the SAME epoch
    // delivers...
    ps.publishEpoch("fail_epoch", Seq(msg("f1")).toDF(), "wf")
    // ...and a later replay of the now-committed epoch dedups
    ps.publishEpoch("fail_epoch", Seq(msg("f1")).toDF(), "wf")
    val got = ps.subscribeBatch("fail_epoch").collect().map(_.getAs[String]("uuid"))
    assert(got.toSeq == Seq("f1"), s"lost or duplicated: ${got.toSeq}")
  }

  test("consumer handler routes poison messages to the dead-letter topic instead of dropping them") {
    val root = Files.createTempDirectory("graft-rb-").toString
    val ps = new FilePubSub(spark, root)
    ps.subscribeInitialize("rb_in")
    ps.subscribeInitialize("dlq")
    ps.publish("rb_in", Seq(msg("ok1"), msg("boom"), msg("ok2")))
    val r = new Router(spark,
      Some(Files.createTempDirectory("rb-ck-").toString))
    r.addConsumerHandler("rb", "rb_in", ps,
      consume = m => if (m.uuid == "boom") sys.error("handler failure"),
      middlewares = Seq(Middlewares.poisonQueue("dlq")))
    r.run(); r.processAllAvailable(); r.close()
    val dlq = ps.subscribeBatch("dlq").collect().map(_.getAs[String]("uuid"))
    assert(dlq.toSeq == Seq("boom"),
      s"poison message must reach the dead-letter topic, got ${dlq.toSeq}")
  }

  test("(group, handler) names containing '-' cannot alias checkpoints or epoch writers") {
    val root = Files.createTempDirectory("graft-alias-").toString
    val ckpt = Files.createTempDirectory("alias-ck-").toString
    val ps = new FilePubSub(spark, root)
    ps.subscribeInitialize("al_in")
    ps.publish("al_in", (0 until 6).map(i => msg(s"a$i")))
    // the classic ambiguity: ("a-b", "c") vs ("a", "b-c") — joined
    // with '-' both collapse to "a-b-c"
    val r1 = new Router(spark, Some(ckpt), group = Some("a-b"))
    val r2 = new Router(spark, Some(ckpt), group = Some("a"))
    r1.addHandler("c", "al_in", ps, "al_out_1", ps, Middlewares.passthrough)
    r2.addHandler("b-c", "al_in", ps, "al_out_2", ps, Middlewares.passthrough)
    r1.run(); r1.processAllAvailable()
    r2.run(); r2.processAllAvailable()
    r1.close(); r2.close()
    val want = (0 until 6).map(i => s"a$i").toSet
    val o1 = ps.subscribeBatch("al_out_1").collect().map(_.getAs[String]("uuid")).toSet
    val o2 = ps.subscribeBatch("al_out_2").collect().map(_.getAs[String]("uuid")).toSet
    assert(o1 == want, s"handler 1 lost ${want -- o1} to checkpoint aliasing")
    assert(o2 == want, s"handler 2 lost ${want -- o2} to checkpoint aliasing")
  }
}
