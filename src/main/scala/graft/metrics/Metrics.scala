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
  * Prometheus `/metrics` scrape endpoint (metrics/http.go:14-41).
  *
  * ONE SESSION PER INSTANCE: the started-purge and latest-registrant
  * protocol below lean on Spark's per-session query-name uniqueness
  * (a start under an already-active name is refused). The listener
  * events carry no session handle, so an instance registered on TWO
  * sessions running same-named queries would let one session's start
  * silently purge the other's live id — its termination could then no
  * longer zero the rate gauge. Attach a separate GraftMetrics per
  * session (stats keys collide across sessions anyway). */
final class GraftMetrics extends StreamingQueryListener {

  // private[metrics]: the started/terminated protocol is driven
  // directly by MetricsSpec's restart-race row (the listener events
  // have no public constructors)
  private[metrics] val stats = TrieMap.empty[String, QueryStats]
  // id -> name: termination events carry only the id, but stats are
  // keyed by name (the stable handler identity across restarts)
  private val names = TrieMap.empty[java.util.UUID, String]

  // name -> most recent id registered for it: zeroing is keyed on the
  // terminating id being the LATEST registrant, not on names being
  // empty of the name — Spark's async listener bus can DROP events
  // under backpressure, and a dropped termination would otherwise
  // leave a stale id in `names` that blocks every future zeroing of
  // that name forever (one lost event must cost one missed zero, not
  // all of them)
  private val latest = TrieMap.empty[String, java.util.UUID]

  private[metrics] def registerStarted(id: java.util.UUID, name: String): Unit = {
    // purge predecessors under the same name: either terminated (their
    // id already left `names`) or stale from a dropped event — Spark
    // refuses to START a query whose name is already active in the
    // session, so by the time a new id registers, older same-name ids
    // are dead. Keeps `names` from accumulating one entry per dropped
    // event for the life of the process.
    names.filterInPlace((_, n) => n != name)
    names(id) = name
    latest(name) = id
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
    * progress tick. Zero only when the terminating id is the name's
    * latest registrant (stale-id-proof: see `latest`). */
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    registerTerminated(event.id)

  private[metrics] def registerTerminated(id: java.util.UUID): Unit =
    names.remove(id).foreach { name =>
      // zero only when the terminating run is the name's LATEST
      // registrant: a restarted run's id has already taken `latest`,
      // so the old run's late event can't clobber the live gauge —
      // and a stale id (dropped event) can never block future zeroing
      // because it is, by construction, not the latest
      if (latest.get(name).contains(id)) {
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
