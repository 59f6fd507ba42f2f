package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.core.Message

/** In-memory transport throughput — the BASELINE.md headline
  * comparison (reference: README.md:155 GoChannel 315,776 pub /
  * 138,743 sub msg/s, 16-byte messages, 16 CPU): `MemoryStream` →
  * identity handler → memory sink, driven batch-by-batch so the
  * subscriber number includes real micro-batch scheduling overhead
  * (≥10 micro-batches), not one giant drain.
  */
object StreamingBench {

  final case class Result(
      messages: Long, batches: Int,
      publishMsgsPerSec: Double, subscribeMsgsPerSec: Double)

  /** Durable (file/parquet) transport throughput — the analogue of the
    * reference's SQL-transport rows (README.md:159-160, 2.8k–9.5k
    * msg/s): publish = parquet appends, subscribe = streaming file
    * source drained through the same counting consumer. */
  def runFile(spark: SparkSession, nBatches: Int = 10, perBatch: Int = 20000): Result = {
    import org.apache.spark.sql.functions.{col, count, length, sum}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-fb-").toString
    val ps = new graft.sources.FilePubSub(spark, root)
    ps.subscribeInitialize("bench")
    val payload = Array.fill[Byte](16)(7)
    val ts = new Timestamp(1700000000000L)
    val n = nBatches.toLong * perBatch

    val p0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      ps.publishBatch("bench", (0 until perBatch)
        .map(i => Message(s"$b-$i", Map.empty, payload, ts)).toDF()
        .coalesce(1)) // one file per publish, like one INSERT batch
    }
    val pubSec = (System.nanoTime() - p0) / 1e9

    val received = new java.util.concurrent.atomic.LongAdder
    val q = ps.subscribe("bench").writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-fbck-").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = b.agg(count(col("uuid")), sum(length(col("payload")))).collect()(0)
        received.add(r.getLong(0)); ()
      }
      .start()
    try {
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val subSec = (System.nanoTime() - t0) / 1e9
      require(received.sum == n, s"file sink saw ${received.sum} of $n")
      Result(n, nBatches, n / pubSec, n / subSec)
    } finally q.stop()
  }

  /** SQL (JDBC) transport throughput on embedded Derby — the direct
    * analogue of the reference's SQL rows (README.md:159-160: MySQL
    * 6,371 pub / 2,794 sub, PostgreSQL 2,831 / 9,460 msg/s): publish =
    * executor-side batch INSERTs through Spark's JDBC sink, subscribe =
    * the CDC poller tailing the table into the broker stream, drained
    * through the same counting consumer. Embedded Derby has no network
    * hop, so treat the comparison as same-class, not same-server. */
  def runSql(spark: SparkSession, nBatches: Int = 5, perBatch: Int = 4000): Result = {
    import org.apache.spark.sql.functions.{col, count, length, sum}
    import spark.implicits._
    val ps = new graft.sources.SqlPubSub(spark,
      "jdbc:derby:memory:graftbench;create=true", pollIntervalMs = 10,
      pollPageSize = 50000)
    try {
      ps.subscribeInitialize("bench")
      val payload = Array.fill[Byte](16)(7)
      val ts = new Timestamp(1700000000000L)
      val n = nBatches.toLong * perBatch

      val p0 = System.nanoTime()
      (0 until nBatches).foreach { b =>
        ps.publishBatch("bench", (0 until perBatch)
          .map(i => Message(s"$b-$i", Map.empty, payload, ts)).toDF()
          .repartition(4)) // executor-parallel INSERT batches
      }
      val pubSec = (System.nanoTime() - p0) / 1e9

      val received = new java.util.concurrent.atomic.LongAdder
      val t0 = System.nanoTime()
      val q = ps.subscribe("bench").writeStream
        .option("checkpointLocation", Files.createTempDirectory("graft-sqlb-").toString)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val r = b.agg(count(col("uuid")), sum(length(col("payload")))).collect()(0)
          received.add(r.getLong(0)); ()
        }
        .start()
      try {
        val deadline = System.currentTimeMillis() + 120000
        ps.awaitCaughtUp("bench", timeoutMs = 60000)
        q.processAllAvailable()
        while (received.sum < n && System.currentTimeMillis() < deadline) {
          Thread.sleep(20); q.processAllAvailable()
        }
        val subSec = (System.nanoTime() - t0) / 1e9
        require(received.sum == n, s"sql sink saw ${received.sum} of $n")
        Result(n, nBatches, n / pubSec, n / subSec)
      } finally q.stop()
    } finally ps.close()
  }

  def run(spark: SparkSession, nBatches: Int = 20, perBatch: Int = 100000): Result = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val stream = MemoryStream[Message](spark)
    val payload = Array.fill[Byte](16)(7) // 16-byte messages, like the reference bench
    val ts = new Timestamp(1700000000000L)
    val batches = (0 until nBatches).map { b =>
      (0 until perBatch).map(i => Message(s"$b-$i", Map.empty, payload, ts))
    }

    // counting consumer, the analogue of BenchSubscriber's receive-and-
    // ack loop (pubsub/tests/bench_pubsub.go:16-41): every message is
    // consumed (full pipeline materialization), nothing is collected
    // row-by-row onto the driver.
    val received = new java.util.concurrent.atomic.LongAdder
    val q = stream.toDS().writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-sb-").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Message], _: Long) =>
        // count + payload-byte sum: forces actual delivery of message
        // bytes through the pipeline (a bare count() could prune the
        // payload column and overstate throughput)
        import org.apache.spark.sql.functions.{col, count, length, sum}
        val r = b.agg(count(col("uuid")), sum(length(col("payload")))).collect()(0)
        received.add(r.getLong(0)); ()
      }
      .start()
    try {
      var pubNanos = 0L
      val t0 = System.nanoTime()
      batches.foreach { b =>
        val p0 = System.nanoTime()
        stream.addData(b)
        pubNanos += System.nanoTime() - p0
        q.processAllAvailable() // one micro-batch per publish
      }
      val totalSec = (System.nanoTime() - t0) / 1e9
      val n = nBatches.toLong * perBatch
      require(received.sum == n, s"sink saw ${received.sum} of $n messages")
      Result(n, nBatches,
        publishMsgsPerSec = n / (pubNanos / 1e9),
        subscribeMsgsPerSec = n / totalSec)
    } finally q.stop()
  }
}
