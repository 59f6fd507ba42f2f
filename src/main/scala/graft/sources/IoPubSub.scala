package graft.sources

import java.io.{InputStream, InputStreamReader, OutputStream}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Ids, Message}

/** io.Reader/Writer transport, the watermill-io analogue (declared in
  * the reference's transport matrix, README.md:104-117: a Publisher
  * that marshals messages into an `io.Writer` and a Subscriber that
  * polls an `io.Reader`). The natural uses are the same: CLI pipes,
  * log tailing, socket bridging, test harnesses.
  *
  * Framing: one NDJSON line per message —
  * `{"uuid":…,"metadata":{…},"payload":"<base64>","ts":<epochMs>}` —
  * chosen over raw payload lines so metadata and binary payloads
  * survive the pipe (the reference's MarshalMessageFunc equivalent).
  *
  * Driver-side by design, like the reference's: a single byte stream
  * has exactly one writer/reader end — this is the interop/edge
  * transport, not the 100 TB path (that's File/Kafka).
  */
object IoFraming {
  private final case class Frame(uuid: String, metadata: Map[String, String],
      payload: String, ts: Long)

  def marshal(m: Message): String =
    // null-tolerant on every nullable Message field (the schema marks
    // ts/metadata/payload nullable and foreign parquet rows exercise
    // that): a raw m.ts.getTime NPE'd mid-publish AFTER earlier lines
    // were flushed — partial emission plus a poisoned retry. Null ts
    // defaults to epoch 0, the SQL transport's rule (rowMessage).
    new String(graft.cqrs.JsonCodec.write(Frame(m.uuid,
      Option(m.metadata).getOrElse(Map.empty),
      Base64.getEncoder.encodeToString(
        Option(m.payload).getOrElse(Array.emptyByteArray)),
      Option(m.ts).map(_.getTime).getOrElse(0L))),
      StandardCharsets.UTF_8)

  def unmarshal(line: String): Message = {
    val f = graft.cqrs.JsonCodec.read(
      line.getBytes(StandardCharsets.UTF_8), classOf[Frame])
    Message(Option(f.uuid).getOrElse(Ids.newUuid()),
      Option(f.metadata).getOrElse(Map.empty),
      Base64.getDecoder.decode(Option(f.payload).getOrElse("")),
      new Timestamp(f.ts))
  }
}

/** Publisher half: every message becomes one framed line on `out`.
  * The topic travels IN-BAND as metadata `_io_topic` (a byte stream
  * has no topics), mirroring the reference's single-stream model. */
final class StreamPublisher(out: OutputStream) extends Publisher {
  private val TopicKey = "_io_topic"

  override def publish(topic: String, msgs: Seq[Message]): Unit = synchronized {
    msgs.foreach { m =>
      val line = IoFraming.marshal(m.withMeta(TopicKey, topic)) + "\n"
      out.write(line.getBytes(StandardCharsets.UTF_8))
    }
    out.flush()
  }

  override def publishBatch(topic: String, df: DataFrame): Unit =
    publish(topic, df.selectExpr(Message.columns: _*)
      .collect().map(r => Message(
        r.getAs[String]("uuid"),
        Option(r.getAs[Map[String, String]]("metadata")).getOrElse(Map.empty),
        Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray),
        r.getAs[Timestamp]("ts"))).toSeq) // single-writer stream: driver collect by design

  override def close(): Unit = out.close()
}

/** Subscriber half: a reader thread drains `in` line by line into the
  * in-process broker, routing each frame to its in-band topic;
  * `subscribe`/`subscribeBatch` expose the per-topic streams.
  *
  * @param maxLineChars decode-bomb bound (the media decoders' rule,
  *   applied to the stream edge): `BufferedReader.readLine` buffers an
  *   UNBOUNDED line, so one multi-GB line on an open pipe would OOM
  *   the DRIVER before any frame parsing could reject it — worse than
  *   the executor-death class, it kills the whole session. Lines over
  *   the cap are skipped (logged once per line) and the drain
  *   continues with the next newline. The default comfortably holds
  *   any real frame (base64 of a payload far beyond every transport's
  *   batch sizing) while bounding the buffer. */
final class StreamSubscriber(spark: SparkSession, in: InputStream,
    maxLineChars: Int = 64 << 20)
  extends Subscriber with SubscribeInitializer with AutoCloseable {

  private val TopicKey = "_io_topic"
  private val broker = new MemoryPubSub(spark)
  @volatile private var draining = true

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def handleLine(raw: String): Unit = {
    val line = if (raw.nonEmpty && raw.last == '\r') raw.init else raw
    if (line.nonEmpty) {
      // per-LINE error isolation: Jackson's parse error IS an
      // IOException, so a single corrupt frame caught by the outer
      // closed-pipe handler would silently end the whole drain
      // (every later message lost, no signal) — and a bad base64
      // payload throws IllegalArgumentException, which previously
      // killed the thread uncaught. Log and keep reading.
      try {
        val m = IoFraming.unmarshal(line)
        val topic = m.get(TopicKey)
        broker.publish(if (topic.isEmpty) "io" else topic,
          Seq(m.copy(metadata = m.metadata - TopicKey)))
      } catch {
        case scala.util.control.NonFatal(e) =>
          log.warn(s"io subscriber: dropping malformed frame " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage})")
      }
    }
  }

  private val reader = new Thread(() => {
    val r = new InputStreamReader(in, StandardCharsets.UTF_8)
    val buf = new Array[Char](8192)
    val sb = new java.lang.StringBuilder
    var skipping = false
    try {
      var n = r.read(buf)
      while (draining && n != -1) {
        var i = 0
        while (i < n) {
          val ch = buf(i)
          if (ch == '\n') {
            if (skipping) skipping = false // the bomb line ends: resume
            else { handleLine(sb.toString); () }
            sb.setLength(0)
          } else if (!skipping) {
            sb.append(ch)
            if (sb.length > maxLineChars) {
              log.warn(s"io subscriber: dropping oversized line " +
                s"(> $maxLineChars chars) — skipping to the next newline")
              skipping = true
              sb.setLength(0)
            }
          }
          i += 1
        }
        n = r.read(buf)
      }
      // final unterminated line delivers, matching readLine's contract
      if (draining && !skipping && sb.length > 0) handleLine(sb.toString)
    } catch { case _: java.io.IOException => () } // closed pipe ends the drain
  }, "graft-io-subscriber")
  reader.setDaemon(true)
  reader.start()

  /** Block until the reader thread has drained the stream to EOF. */
  def awaitDrained(timeoutMs: Long = 10000): Unit = reader.join(timeoutMs)

  override def subscribe(topic: String): DataFrame = broker.subscribe(topic)
  override def subscribeBatch(topic: String): DataFrame = broker.subscribeBatch(topic)
  override def subscribeInitialize(topic: String): Unit =
    broker.subscribeInitialize(topic)
  override def close(): Unit = { draining = false; in.close() }
}
