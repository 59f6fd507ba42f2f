package graft.metrics

import java.sql.Timestamp

import graft.SparkSpec
import graft.core.Message
import graft.router.{Middlewares, Router}
import graft.sources.MemoryPubSub

class MetricsSpec extends SparkSpec {

  test("listener accumulates per-handler input/output counters (builder.go:26-57)") {
    val metrics = new GraftMetrics().attach(spark)
    try {
      val ps = new MemoryPubSub(spark)
      val router = new Router(spark)
      router.addHandler("metered", "metrics_in", ps, "metrics_out", ps,
        Middlewares.passthrough)
      ps.publish("metrics_in", (0 until 25).map(i =>
        Message(s"mm$i", Map.empty, "x".getBytes, new Timestamp(1700000000000L))))
      router.run(); router.processAllAvailable(); router.close()
      // listener events are async — wait for delivery
      val deadline = System.currentTimeMillis() + 10000
      def stats = metrics.snapshot.get("graft-metered")
      while (System.currentTimeMillis() < deadline &&
        !stats.exists(_.inputRows >= 25)) Thread.sleep(100)
      val s = stats.get
      assert(s.inputRows == 25)
      assert(s.batches >= 1)
      assert(s.totalDurationMs > 0)

      // the /metrics endpoint serves the same counters in Prometheus
      // text format (http.go:14-41)
      val ep = MetricsHttp.serve(metrics)
      try {
        val url = java.net.URI.create(s"http://localhost:${ep.port}/metrics").toURL
        val body = {
          val in = url.openStream()
          try new String(in.readAllBytes(), "UTF-8") finally in.close()
        }
        assert(body.contains(
          "graft_subscriber_messages_received_total{handler_name=\"graft-metered\"} 25"))
        assert(body.contains("# TYPE graft_handler_execution_time_seconds summary"))
        assert(body.contains(
          "graft_handler_execution_time_seconds_count{handler_name=\"graft-metered\"}"))
        assert(body.contains(
          "graft_publisher_messages_published_total{handler_name=\"graft-metered\"} 25"))
      } finally ep.close()

      // a terminated query's RATE gauge zeroes (counters persist): a
      // dead handler's last rows/sec scraped forever reads as healthy
      // throughput on a query that died hours ago
      val zeroDeadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < zeroDeadline &&
        !stats.exists(_.lastProcessedRowsPerSec == 0.0)) Thread.sleep(100)
      val term = stats.get
      assert(term.lastProcessedRowsPerSec == 0.0,
        "dead query's rate gauge must zero on termination")
      assert(term.inputRows == 25, "counters must persist past termination")
    } finally metrics.detach(spark)
  }

  test("restart race: the OLD run's late termination must not zero the LIVE run's gauge") {
    // a query restarting under the same name can register its new id
    // before the old run's QueryTerminatedEvent drains off the async
    // listener bus — zeroing unconditionally clobbered the live gauge
    // until its next progress tick (driven directly: the events have
    // no public constructors)
    val m = new GraftMetrics
    val oldId = java.util.UUID.randomUUID()
    val newId = java.util.UUID.randomUUID()
    m.registerStarted(oldId, "graft-h")
    m.stats.updateWith("graft-h")(
      _.map(_.copy(lastProcessedRowsPerSec = 123.0)))
    m.registerStarted(newId, "graft-h") // restart before old termination
    m.registerTerminated(oldId)         // late event for the OLD id
    assert(m.snapshot("graft-h").lastProcessedRowsPerSec == 123.0,
      "old id's termination must not clobber the live run's rate gauge")
    m.registerTerminated(newId)         // the real termination still zeroes
    assert(m.snapshot("graft-h").lastProcessedRowsPerSec == 0.0)
  }

  test("a DROPPED termination event costs one missed zero, not all future ones") {
    // Spark's async listener bus sheds events under backpressure: if
    // run A's termination for a name is dropped, its stale id must not
    // block zeroing for every later run of that name (zeroing is keyed
    // on the terminating id being the name's LATEST registrant)
    val m = new GraftMetrics
    val a = java.util.UUID.randomUUID()
    val b = java.util.UUID.randomUUID()
    m.registerStarted(a, "graft-d")
    // A's termination event is dropped — never delivered
    m.registerStarted(b, "graft-d")
    m.stats.updateWith("graft-d")(
      _.map(_.copy(lastProcessedRowsPerSec = 55.0)))
    m.registerTerminated(b)
    assert(m.snapshot("graft-d").lastProcessedRowsPerSec == 0.0,
      "a stale id from a dropped event must not block future zeroing")
  }
}
