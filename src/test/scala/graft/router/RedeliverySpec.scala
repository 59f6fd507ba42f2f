package graft.router

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.core.Message
import graft.sources.FilePubSub

/** Nack → redelivery, no loss (TestResendOnError,
  * pubsub/tests/test_pubsub.go:484). The engine's nack unit is the
  * micro-batch: an uncommitted failed batch is redelivered when the
  * query restarts from the same checkpoint. The failure is injected in
  * the SINK (after the handler), the worst case for loss.
  */
class RedeliverySpec extends SparkSpec {

  test("failed batch is redelivered on restart: no loss (TestResendOnError semantics)") {
    val root = Files.createTempDirectory("graft-redeliver-").toString
    val ckpt = Files.createTempDirectory("graft-redeliver-ck-").toString
    val ps = new FilePubSub(spark, root)
    ps.subscribeInitialize("rd_in")
    ps.subscribeInitialize("rd_out")
    ps.publish("rd_in", Seq(
      Message("n1", Map.empty, "a".getBytes, new Timestamp(1700000000000L)),
      Message("n2", Map.empty, "b".getBytes, new Timestamp(1700000000001L))))

    // a publisher that crashes on its first delivery attempt (then works)
    RedeliverySink.failuresRemaining.set(1)
    val crashyPub = new graft.sources.Publisher {
      override def publish(topic: String, msgs: Seq[Message]): Unit =
        ps.publish(topic, msgs)
      override def publishBatch(topic: String, df: org.apache.spark.sql.DataFrame): Unit = {
        if (RedeliverySink.failuresRemaining.getAndDecrement() > 0)
          throw new RuntimeException("simulated sink outage (nack)")
        ps.publishBatch(topic, df)
      }
    }

    val r1 = new Router(spark, checkpointRoot = Some(ckpt))
    r1.addHandler("redeliver", "rd_in", ps, "rd_out", crashyPub, Middlewares.passthrough)
    r1.run()
    intercept[Exception] { // the query dies with the failed batch UNCOMMITTED
      r1.running("redeliver").processAllAvailable()
    }
    r1.close()
    assert(ps.subscribeBatch("rd_out").count() == 0) // nothing leaked

    // restart from the same checkpoint: the batch is redelivered
    val r2 = new Router(spark, checkpointRoot = Some(ckpt))
    r2.addHandler("redeliver", "rd_in", ps, "rd_out", crashyPub, Middlewares.passthrough)
    r2.run(); r2.processAllAvailable(); r2.close()

    val out = ps.subscribeBatch("rd_out").collect().map(_.getAs[String]("uuid"))
    assert(out.toSet == Set("n1", "n2"), s"lost or duplicated: ${out.toSeq}")
    assert(out.length == 2)
  }
}

object RedeliverySink {
  val failuresRemaining = new java.util.concurrent.atomic.AtomicInteger(0)
}
