package graft.core

import scala.collection.concurrent.TrieMap

/** LoggerAdapter family, parity with the reference's pluggable logging
  * (reference: log.go:41-67 LoggerAdapter; :178 NopLogger; slog.go).
  * The engine logs through slf4j (Spark's backend) by default; the
  * captured adapter mirrors `CaptureLoggerAdapter` (log.go captured
  * logger) for asserting on log output in tests.
  */
trait LoggerAdapter {
  def error(msg: String, err: Throwable, fields: Map[String, Any] = Map.empty): Unit
  /** One level beyond the reference's four (log.go:41-67 stops at
    * Error/Info/Debug/Trace): operational hazards that are not yet
    * failures — e.g. the SQL poller stepping over an id hole — need a
    * level operators alert on without the Throwable `error` demands. */
  def warn(msg: String, fields: Map[String, Any] = Map.empty): Unit
  def info(msg: String, fields: Map[String, Any] = Map.empty): Unit
  def debug(msg: String, fields: Map[String, Any] = Map.empty): Unit
  def trace(msg: String, fields: Map[String, Any] = Map.empty): Unit
  /** parity with LoggerAdapter.With — a logger with bound fields */
  def withFields(fields: Map[String, Any]): LoggerAdapter =
    new FieldBoundLogger(this, fields)
}

private final class FieldBoundLogger(inner: LoggerAdapter,
    bound: Map[String, Any]) extends LoggerAdapter {
  override def error(m: String, e: Throwable, f: Map[String, Any]): Unit =
    inner.error(m, e, bound ++ f)
  override def warn(m: String, f: Map[String, Any]): Unit = inner.warn(m, bound ++ f)
  override def info(m: String, f: Map[String, Any]): Unit = inner.info(m, bound ++ f)
  override def debug(m: String, f: Map[String, Any]): Unit = inner.debug(m, bound ++ f)
  override def trace(m: String, f: Map[String, Any]): Unit = inner.trace(m, bound ++ f)
}

/** slf4j-backed production logger (Spark's logging backend). */
final class Slf4jLogger(name: String = "graft") extends LoggerAdapter {
  private val log = org.slf4j.LoggerFactory.getLogger(name)
  private def fmt(m: String, f: Map[String, Any]) =
    if (f.isEmpty) m else s"$m ${f.map { case (k, v) => s"$k=$v" }.mkString(" ")}"
  override def error(m: String, e: Throwable, f: Map[String, Any]): Unit =
    log.error(fmt(m, f), e)
  override def warn(m: String, f: Map[String, Any]): Unit = log.warn(fmt(m, f))
  override def info(m: String, f: Map[String, Any]): Unit = log.info(fmt(m, f))
  override def debug(m: String, f: Map[String, Any]): Unit = log.debug(fmt(m, f))
  override def trace(m: String, f: Map[String, Any]): Unit = log.trace(fmt(m, f))
}

/** NopLogger (log.go:178). */
object NopLogger extends LoggerAdapter {
  override def error(m: String, e: Throwable, f: Map[String, Any]): Unit = ()
  override def warn(m: String, f: Map[String, Any]): Unit = ()
  override def info(m: String, f: Map[String, Any]): Unit = ()
  override def debug(m: String, f: Map[String, Any]): Unit = ()
  override def trace(m: String, f: Map[String, Any]): Unit = ()
}

/** One captured log entry (top-level: a nested case class in a
  * non-static outer emits unchecked-pattern-match warnings). */
final case class LogEntry(level: String, msg: String,
    err: Option[Throwable], fields: Map[String, Any])

/** CaptureLoggerAdapter analogue — records entries for test asserts. */
final class CaptureLogger extends LoggerAdapter {
  type Entry = LogEntry
  private def Entry(level: String, msg: String, err: Option[Throwable],
      fields: Map[String, Any]) = LogEntry(level, msg, err, fields)
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Entry]()
  def entries: Seq[Entry] = { import scala.jdk.CollectionConverters._; buf.asScala.toSeq }
  def has(level: String, contains: String): Boolean =
    entries.exists(e => e.level == level && e.msg.contains(contains))
  override def error(m: String, e: Throwable, f: Map[String, Any]): Unit =
    { buf.add(Entry("error", m, Some(e), f)); () }
  override def warn(m: String, f: Map[String, Any]): Unit =
    { buf.add(Entry("warn", m, None, f)); () }
  override def info(m: String, f: Map[String, Any]): Unit =
    { buf.add(Entry("info", m, None, f)); () }
  override def debug(m: String, f: Map[String, Any]): Unit =
    { buf.add(Entry("debug", m, None, f)); () }
  override def trace(m: String, f: Map[String, Any]): Unit =
    { buf.add(Entry("trace", m, None, f)); () }
}
