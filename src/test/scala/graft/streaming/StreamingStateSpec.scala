package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Message
import graft.requestreply.RequestReply
import graft.sources.MemoryPubSub

/** Streaming-state semantics: stateful counter across micro-batches,
  * stream-stream request/reply correlation, and watermark-driven dedup
  * state expiry — the stateful trio the batch oracle can't check.
  */
class StreamingStateSpec extends SparkSpec {

  private def msg(u: String, p: String, tsMs: Long,
      meta: Map[String, String] = Map.empty) =
    Message(u, meta, p.getBytes("UTF-8"), new Timestamp(tsMs))

  test("stateful counter accumulates per key ACROSS micro-batches (exactly-once counter example)") {
    import spark.implicits._
    val ps = new MemoryPubSub(spark)
    val src = ps.subscribe("counter_in").as[Message]
    val counted = StatefulCounter.counts(src, _.get("k"))
    val q = counted.writeStream
      .format("memory").queryName("counter_out").outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("graft-sc-").toString)
      .start()
    try {
      ps.publish("counter_in", Seq(
        msg("a1", "x", 1700000000000L, Map("k" -> "a")),
        msg("a2", "x", 1700000000001L, Map("k" -> "a")),
        msg("b1", "x", 1700000000002L, Map("k" -> "b"))))
      q.processAllAvailable()
      ps.publish("counter_in", Seq(
        msg("a3", "x", 1700000001000L, Map("k" -> "a"))))
      q.processAllAvailable()
      val rows = spark.table("counter_out").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[Long]("count")))
      // batch 1 emitted a→2, b→1; batch 2 emitted a→3 (state carried over)
      assert(rows.contains(("a", 2L)) && rows.contains(("b", 1L)))
      assert(rows.contains(("a", 3L)), s"expected carried-over count, got ${rows.toSeq}")
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS counter_out"); () }
  }

  test("counter state survives stop + restart from the same checkpoint (crash recovery)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    // memory sink refuses checkpoint recovery; foreachBatch supports it
    // (and runs on the driver, so the shared buffer is safe)
    val stream = MemoryStream[Message](spark)
    val ckpt = Files.createTempDirectory("graft-restart-").toString
    RestartRecoverySink.rows.clear()
    def startQuery() =
      StatefulCounter.counts(stream.toDS(), _.get("k"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StatefulCounter.KeyCount],
            _: Long) =>
          RestartRecoverySink.add(batch.collect().map(kc => (kc.key, kc.count)))
        }
        .start()
    val q1 = startQuery()
    try {
      stream.addData(Seq(
        msg("a1", "x", 1700000000000L, Map("k" -> "a")),
        msg("a2", "x", 1700000000001L, Map("k" -> "a"))))
      q1.processAllAvailable()
      assert(RestartRecoverySink.rows.contains(("a", 2L)),
        s"pre-restart state: ${RestartRecoverySink.rows.toSeq}")
    } finally q1.stop()
    // second query, SAME checkpoint: the state store must restore a→2,
    // so one more 'a' counts to 3 — not restart at 1 (lost state) and
    // not 4 (double-replayed input)
    val q2 = startQuery()
    try {
      stream.addData(Seq(msg("a3", "x", 1700000002000L, Map("k" -> "a"))))
      q2.processAllAvailable()
      assert(RestartRecoverySink.rows.contains(("a", 3L)),
        s"state must resume from checkpoint across restart, got ${RestartRecoverySink.rows.toSeq}")
      assert(!RestartRecoverySink.rows.contains(("a", 4L)),
        s"committed input must not replay into the counter, got ${RestartRecoverySink.rows.toSeq}")
    } finally { q2.stop(); () }
  }

  test("TTL counter evicts idle key state and restarts from zero (state-store bound)") {
    import spark.implicits._
    val ps = new MemoryPubSub(spark)
    val src = ps.subscribe("ttl_counter_in").as[Message]
    val counted = StatefulCounter.countsWithTtl(src, _.get("k"), "100 milliseconds")
    // NOTE no processAllAvailable anywhere here: with a pending
    // ProcessingTimeTimeout the engine keeps constructing timeout
    // batches, so noNewData is never set and processAllAvailable never
    // returns. Poll the sink table instead; a paced trigger keeps the
    // timeout batches from spinning.
    val q = counted.writeStream
      .format("memory").queryName("ttl_counter_out").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .option("checkpointLocation", Files.createTempDirectory("graft-ttl-").toString)
      .start()
    def rows() = spark.table("ttl_counter_out").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("count")))
    def awaitRow(want: (String, Long)): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline && !rows().contains(want))
        Thread.sleep(100)
      assert(rows().contains(want), s"timed out waiting for $want, got ${rows().toSeq}")
    }
    try {
      ps.publish("ttl_counter_in", Seq(
        msg("t1", "x", 1700000000000L, Map("k" -> "a")),
        msg("t2", "x", 1700000000001L, Map("k" -> "a"))))
      awaitRow("a" -> 2L) // accumulated within a batch, timeout armed
      Thread.sleep(1500)  // let the 100ms idle TTL lapse (wall clock)
      ps.publish("ttl_counter_in", Seq(
        msg("t4", "x", 1700000002000L, Map("k" -> "a"))))
      awaitRow("a" -> 1L) // state was evicted; count restarted
      assert(!rows().contains(("a", 3L)), "evicted state must not carry over")
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS ttl_counter_out"); () }
  }

  test("stateful counter runs on the RocksDB state store (production provider)") {
    import spark.implicits._
    graft.GraftSession.useRocksDbStateStore(spark)
    try {
      val ps = new MemoryPubSub(spark)
      val src = ps.subscribe("rocks_in").as[Message]
      val q = StatefulCounter.counts(src, _.get("k")).writeStream
        .format("memory").queryName("rocks_out").outputMode("update")
        .option("checkpointLocation", Files.createTempDirectory("graft-rdb-").toString)
        .start()
      try {
        ps.publish("rocks_in", Seq(
          msg("r1", "x", 1700000000000L, Map("k" -> "a")),
          msg("r2", "x", 1700000000001L, Map("k" -> "a"))))
        q.processAllAvailable()
        ps.publish("rocks_in", Seq(msg("r3", "x", 1700000001000L, Map("k" -> "a"))))
        q.processAllAvailable()
        val rows = spark.table("rocks_out").collect()
          .map(r => (r.getAs[String]("key"), r.getAs[Long]("count")))
        assert(rows.contains(("a", 2L)) && rows.contains(("a", 3L)),
          s"state must persist across batches in RocksDB, got ${rows.toSeq}")
      } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS rocks_out"); () }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream-stream correlate joins commands with replies on operation_id") {
    val ps = new MemoryPubSub(spark)
    val joined = RequestReply.correlate(
      ps.subscribe("ss_commands"), ps.subscribe("ss_replies"), "10 minutes")
    val got = scala.collection.concurrent.TrieMap.empty[(String, String), Boolean]
    val q = joined.writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-ssj-").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select(col("command_uuid"), col("reply_uuid")).collect()
          .foreach(r => got((r.getString(0), r.getString(1))) = true)
        ()
      }.start()
    try {
      val t0 = 1700000000000L
      ps.publish("ss_commands", Seq(
        msg("c1", "cmd", t0, Map("operation_id" -> "op1")),
        msg("c2", "cmd", t0 + 1000, Map("operation_id" -> "op2"))))
      q.processAllAvailable()
      // replies arrive in a LATER micro-batch — join state must hold
      ps.publish("ss_replies", Seq(
        msg("r1", "rep", t0 + 2000, Map("operation_id" -> "op1"))))
      q.processAllAvailable()
      ps.publish("ss_replies", Seq(
        msg("r2", "rep", t0 + 3000, Map("operation_id" -> "op2")),
        msg("rX", "rep", t0 + 3000, Map("operation_id" -> "op-nobody"))))
      q.processAllAvailable()
      assert(got.keySet == Set("c1" -> "r1", "c2" -> "r2"))
    } finally q.stop()
  }

  test("dedup drops within the watermark window and re-accepts after state expiry") {
    import spark.implicits._
    val ps = new MemoryPubSub(spark)
    val src = ps.subscribe("dd_in").as[Message]
    val deduped = StreamingDedup.stage("10 seconds")(src)
    val q = deduped.toDF().writeStream
      .format("memory").queryName("dd_out")
      .option("checkpointLocation", Files.createTempDirectory("graft-dd-").toString)
      .start()
    try {
      val t0 = 1700000000000L
      // batch 1: original + duplicate inside the window → dup dropped
      ps.publish("dd_in", Seq(
        msg("d1", "same-payload", t0),
        msg("d2", "same-payload", t0 + 1000),
        msg("d3", "other", t0 + 1000)))
      q.processAllAvailable()
      // batch 2: advance event time (and thus the watermark) far past
      // the 10s window so d1's hash state is evicted
      ps.publish("dd_in", Seq(msg("adv", "advance", t0 + 600000)))
      q.processAllAvailable()
      // batch 3: same payload again, well outside the window → kept
      ps.publish("dd_in", Seq(msg("d4", "same-payload", t0 + 700000)))
      q.processAllAvailable()
      val uuids = spark.table("dd_out").collect().map(_.getAs[String]("uuid")).toSet
      assert(uuids.contains("d1") && !uuids.contains("d2"), "in-window duplicate must drop")
      assert(uuids.contains("d3") && uuids.contains("adv"))
      assert(uuids.contains("d4"), "post-expiry repeat must be re-accepted")
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS dd_out"); () }
  }
}

/** Driver-side buffer for the restart-recovery test — foreachBatch
  * executes on the driver, so a shared concurrent map is safe. */
object RestartRecoverySink {
  val rows = scala.collection.concurrent.TrieMap.empty[(String, Long), Boolean]
  def add(kcs: Iterable[(String, Long)]): Unit = kcs.foreach(rows.put(_, true))
}
