package graft.metrics

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer

/** Prometheus scrape endpoint over [[GraftMetrics.snapshot]], parity
  * with the reference's `/metrics` server (reference:
  * components/metrics/http.go:14-41). Metric names follow
  * components/metrics (builder.go:71,96, handler.go:81) with the
  * micro-batch grain mapped onto them:
  *  - `handler_execution_time_seconds` summary — batch trigger
  *    durations (sum/count; count = processed batches),
  *  - `subscriber_messages_received_total` — source rows consumed,
  *  - `publisher_messages_published_total` — sink rows published,
  *  - `processed_rows_per_second` gauge — last progress rate.
  * Label `handler_name` carries the streaming query name (router
  * handlers are `graft-[group-]<handler>`).
  */
object MetricsHttp {

  /** Render a snapshot in the Prometheus text exposition format.
    * Deterministic: handlers sorted by name. */
  def prometheusText(snapshot: Map[String, QueryStats],
      namespace: String = "graft"): String = {
    val sb = new StringBuilder
    def esc(v: String) =
      v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    def metric(name: String, typ: String, help: String)
        (rows: (String, QueryStats) => Seq[(String, String)]): Unit = {
      val full = s"${namespace}_$name"
      sb.append(s"# HELP $full $help\n# TYPE $full $typ\n")
      snapshot.toSeq.sortBy(_._1).foreach { case (handler, s) =>
        rows(handler, s).foreach { case (suffix, value) =>
          sb.append(s"$full$suffix{handler_name="
            + "\"" + esc(handler) + "\"} " + value + "\n")
        }
      }
    }
    metric("handler_execution_time_seconds", "summary",
      "Micro-batch trigger execution time (handler.go:81 analogue)") {
      (_, s) => Seq(
        "_sum" -> (s.totalDurationMs / 1000.0).toString,
        "_count" -> s.batches.toString)
    }
    metric("subscriber_messages_received_total", "counter",
      "Rows consumed from the subscribed source (builder.go:96 analogue)") {
      (_, s) => Seq("" -> s.inputRows.toString)
    }
    metric("publisher_messages_published_total", "counter",
      "Rows published by the sink (builder.go:71 count analogue)") {
      (_, s) => Seq("" -> s.outputRows.toString)
    }
    metric("processed_rows_per_second", "gauge",
      "Rate reported by the last query progress event") {
      (_, s) => Seq("" -> s.lastProcessedRowsPerSec.toString)
    }
    sb.toString
  }

  /** Start an HTTP server exposing `/metrics`; `port = 0` binds an
    * ephemeral port (read it back from [[Endpoint.port]]).
    * Binds LOOPBACK by default: the endpoint is unauthenticated and
    * enumerates handler/topic names and throughput — a wildcard bind
    * would expose that on every interface of a multi-homed driver
    * (plus a DoS lever: the single dispatch thread stalls on one slow
    * external client). Pass `bindAddress` explicitly to scrape from
    * another host. */
  def serve(metrics: GraftMetrics, port: Int = 0,
      namespace: String = "graft",
      bindAddress: String = "127.0.0.1"): Endpoint = {
    // the JDK latches sun.net.httpserver.* properties at HttpServer
    // class init: if THIS server is the JVM's first (a common init
    // order — metrics up before the first subscriber), the ingest
    // edge's dribbler bound and no-drain-on-reject defaults must
    // already be in place or they are silently inert for the whole JVM
    graft.core.JdkHttpServerDefaults.ensure()
    val server = HttpServer.create(new InetSocketAddress(bindAddress, port), 0)
    server.createContext("/metrics", exchange => {
      // close the exchange on EVERY path: an exception before the
      // response starts would otherwise leak the connection, and with
      // setExecutor(null) stalled connections pile onto the single
      // dispatch thread until the scraper times out
      try {
        val body =
          prometheusText(metrics.snapshot, namespace).getBytes(StandardCharsets.UTF_8)
        exchange.getResponseHeaders.add("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        exchange.sendResponseHeaders(200, body.length.toLong)
        val os = exchange.getResponseBody
        try os.write(body) finally os.close()
      } finally exchange.close()
    })
    server.setExecutor(null) // serve on the dispatch thread; scrape-rate traffic
    server.start()
    new Endpoint(server)
  }

  /** Handle on a running scrape server (the reference returns a cancel
    * func; `close()` is ours). */
  final class Endpoint private[MetricsHttp] (server: HttpServer) extends AutoCloseable {
    def port: Int = server.getAddress.getPort
    override def close(): Unit = server.stop(0)
  }
}
