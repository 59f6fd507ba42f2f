package graft.metrics

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Per-query counters, the analogue of the reference's Prometheus
  * metric set (reference: components/metrics/builder.go:26-57,
  * handler.go:36-65 exec-time histogram, publisher.go:19-68 publish
  * counters, subscriber.go:16-57 received counter). In the micro-batch
  * model the natural grain is the query progress event:
  * `numInputRows` = received counter, sink `numOutputRows` = publish
  * counter, `durationMs` feeds the exec-time histogram.
  */
final case class QueryStats(
    batches: Long = 0,
    inputRows: Long = 0,
    outputRows: Long = 0,
    totalDurationMs: Long = 0,
    maxBatchDurationMs: Long = 0,
    lastProcessedRowsPerSec: Double = 0.0) {

  def avgBatchDurationMs: Double =
    if (batches == 0) 0.0 else totalDurationMs.toDouble / batches
}

/** StreamingQueryListener bridge — attach once per session; stats
  * accumulate per query name (router handlers are named
  * `graft-<handler>`). [[MetricsHttp.serve]] exposes [[snapshot]] as a
  * Prometheus `/metrics` scrape endpoint (metrics/http.go:14-41). */
final class GraftMetrics extends StreamingQueryListener {

  // private[metrics]: the started/terminated protocol is driven
  // directly by MetricsSpec's restart-race row (the listener events
  // have no public constructors)
  private[metrics] val stats = TrieMap.empty[String, QueryStats]
  // id -> name: termination events carry only the id, but stats are
  // keyed by name (the stable handler identity across restarts)
  private val names = TrieMap.empty[java.util.UUID, String]

  private[metrics] def registerStarted(id: java.util.UUID, name: String): Unit = {
    names(id) = name
    stats.putIfAbsent(name, QueryStats()); ()
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    registerStarted(event.id, Option(event.name).getOrElse(event.id.toString))

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val dur = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)
    // foreachBatch sinks report numOutputRows = -1; the router attaches
    // an observe("graft_sink") metric that carries the real count.
    val observed = Option(p.observedMetrics.get("graft_sink"))
      .map(_.getAs[Long]("rows")).getOrElse(0L)
    val out = math.max(
      Option(p.sink).map(_.numOutputRows).filter(_ >= 0).getOrElse(0L), observed)
    stats.updateWith(name) { prev =>
      val s = prev.getOrElse(QueryStats())
      Some(s.copy(
        batches = s.batches + 1,
        inputRows = s.inputRows + p.numInputRows,
        outputRows = s.outputRows + out,
        totalDurationMs = s.totalDurationMs + dur,
        maxBatchDurationMs = math.max(s.maxBatchDurationMs, dur),
        lastProcessedRowsPerSec = p.processedRowsPerSecond))
    }
  }

  /** Zero the RATE gauge on termination: counters are cumulative facts
    * that rightly persist, but a dead query's last rows-per-second
    * scraped forever reads as healthy throughput on a query that died
    * hours ago — dashboards and rate alerts must see 0.
    *
    * Restart race: when a query restarts under the same NAME, the new
    * run's onQueryStarted can register (new id → same name) before the
    * OLD run's termination event drains off the listener bus — zeroing
    * unconditionally would clobber the live run's gauge until its next
    * progress tick. Zero only when no other live id still maps to the
    * name. */
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    registerTerminated(event.id)

  private[metrics] def registerTerminated(id: java.util.UUID): Unit =
    names.remove(id).foreach { name =>
      if (!names.values.exists(_ == name)) {
        stats.updateWith(name)(_.map(_.copy(lastProcessedRowsPerSec = 0.0)))
        ()
      }
    }

  def snapshot: Map[String, QueryStats] = stats.toMap

  def attach(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }

  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}
