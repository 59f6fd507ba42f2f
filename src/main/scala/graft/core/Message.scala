package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's transfer unit — the envelope every dataflow operator
  * speaks. Mirrors the reference's `message.Message`
  * (reference: message/message.go:25-52): `uuid` (uuid.go:12), string
  * `metadata` headers (message/metadata.go:4), opaque `payload` bytes
  * (message/message.go:16,41). We add `ts`, an event-time column the
  * reference lacks, because watermark-based state eviction (dedup,
  * correlation joins, delayed delivery) needs event time at 100 TB.
  *
  * Ack/nack channels (message/message.go:44-46) have no column here:
  * delivery state is carried by Structured Streaming's offset log, and
  * per-row failure routing is metadata-driven — poison/retry middleware
  * stamp `reason_poisoned` / delay keys and a per-row topic override
  * (see [[graft.router.Ctx]] and [[graft.router.Middlewares]]).
  */
case class Message(
    uuid: String,
    metadata: Map[String, String],
    payload: Array[Byte],
    ts: Timestamp) {

  /** metadata read, parity with message/metadata.go:7-10. */
  def get(key: String): String = metadata.getOrElse(key, "")

  /** copy-with-header, parity with message/metadata.go:13-18 (Set). */
  def withMeta(key: String, value: String): Message =
    copy(metadata = metadata + (key -> value))

  def payloadString: String = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
}

object Message {

  /** Envelope schema used when the frame is dynamic (`DataFrame`). */
  val schema: StructType = StructType(Seq(
    StructField("uuid", StringType, nullable = false),
    StructField("metadata", MapType(StringType, StringType), nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  val columns: Seq[String] = Seq("uuid", "metadata", "payload", "ts")

  def of(payload: String, metadata: Map[String, String] = Map.empty): Message =
    Message(Ids.newUuid(), metadata,
      payload.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      new Timestamp(System.currentTimeMillis()))

  /** Wrap an arbitrary relational frame into the envelope:
    * payload = JSON of all columns, ts taken from `tsCol` when given.
    * This is how the `events` test table becomes a message stream
    * (FIXTURES.md §B). Pure column expressions — stays in codegen.
    */
  def envelope(df: DataFrame, tsCol: Option[String] = None,
      meta: Map[String, Column] = Map.empty): DataFrame = {
    val m =
      if (meta.isEmpty) map().cast(MapType(StringType, StringType))
      else map(meta.flatMap { case (k, v) => Seq(lit(k), v.cast(StringType)) }.toSeq: _*)
    df.select(
      expr("uuid()").as("uuid"),
      m.as("metadata"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).cast(BinaryType).as("payload"),
      tsCol.map(col).getOrElse(current_timestamp()).as("ts"))
  }

  /** Project the envelope back to typed columns by parsing the JSON
    * payload with the given schema (the CQRS unmarshal path, §2.6). */
  def unwrap(df: DataFrame, payloadSchema: StructType): DataFrame =
    df.withColumn("_parsed", from_json(col("payload").cast(StringType), payloadSchema))
      .select((Message.columns.map(col) :+ col("_parsed.*")): _*)
}
