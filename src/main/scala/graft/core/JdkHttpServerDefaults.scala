package graft.core

/** Process-wide hardening defaults for the JDK built-in `HttpServer`
  * (`sun.net.httpserver.maxReqTime` / `drainAmount`), shared by every
  * graft site that creates one — the ingest edge
  * ([[graft.sources.HttpSubscriber]]) and the metrics scrape endpoint
  * (`graft.metrics.MetricsHttp`).
  *
  * Why shared: the JDK's `ServerConfig` reads these system properties
  * ONCE, when the HttpServer machinery class-initializes. If any
  * HttpServer in the JVM is created before the defaults are set, they
  * are silently inert — a dribbler can then hold an ingest permit
  * forever (no wall-clock timer), and with all permits held the edge
  * 503s with no escape. A metrics endpoint started before the first
  * subscriber was exactly that init order, so BOTH creation paths call
  * [[ensure]] first; a server created by code outside graft remains
  * the operator's responsibility (set the properties on the JVM
  * command line there — nothing set after that first server can work).
  *
  * [[ensure]] also forces the latch immediately (initializing the
  * config class) so the applied values are pinned at a moment graft
  * controls, and it WARNS when a later call observes property values
  * that differ from the latched ones — the change is inert for this
  * JVM, and silent inertness is the failure mode this object exists
  * to close.
  */
object JdkHttpServerDefaults {
  private val MaxReqTime = "sun.net.httpserver.maxReqTime"
  private val DrainAmount = "sun.net.httpserver.drainAmount"

  /** Swappable for specs (CaptureLogger); production uses slf4j. */
  @volatile private[core] var logger: LoggerAdapter =
    new Slf4jLogger("graft.http")

  private[core] var latched: Option[(String, String)] = None

  /** Idempotent; call BEFORE every `HttpServer.create`. Defaults
    * `maxReqTime` to 120 s (the dribbler wall-clock bound) and
    * `drainAmount` to 0 (close rejected exchanges instead of draining
    * up to 64 KB of a hostile unread body) — best-effort, only when
    * the operator hasn't set the property themselves. */
  def ensure(): Unit = synchronized {
    if (System.getProperty(MaxReqTime) == null) {
      System.setProperty(MaxReqTime, "120"); ()
    }
    if (System.getProperty(DrainAmount) == null) {
      System.setProperty(DrainAmount, "0"); ()
    }
    val now = (System.getProperty(MaxReqTime), System.getProperty(DrainAmount))
    latched match {
      case None =>
        // force the latch NOW: ServerConfig reads the properties in its
        // static initializer, so initializing it here pins the applied
        // values deterministically instead of at whichever create()
        // happens to run first. Best-effort — the class is
        // JDK-internal and may move; creation works without the force.
        try {
          Class.forName("sun.net.httpserver.ServerConfig", true,
            classOf[com.sun.net.httpserver.HttpServer].getClassLoader); ()
        } catch { case _: ClassNotFoundException | _: LinkageError => () }
        latched = Some(now)
      case Some(prev) if prev != now =>
        logger.warn(
          s"$MaxReqTime/$DrainAmount changed after the JDK HttpServer " +
            "latched them — the new values are INERT for this JVM; set " +
            "them before the first HttpServer (e.g. on the command line)",
          Map("latched" -> prev, "current" -> now))
      case _ => ()
    }
  }
}
