package graft.requestreply

import scala.reflect.ClassTag
import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Message
import graft.cqrs.{JsonMarshaler, Marshaler}
import graft.router.{Middlewares, Router}
import graft.sources.PubSub

/** Request/reply over pub/sub, parity with `components/requestreply`
  * (reference: requestreply.go:14-66 Backend/Reply,
  * backend_pubsub.go:15-18,74-173 PubSubBackend,
  * handler.go:16-67 NewCommandHandlerWithResult). Correlation is the
  * `operation_id` metadata key (backend_pubsub_marshaler.go).
  *
  * Two consumption forms:
  *  - interactive [[PubSubBackend.sendAndWait]] — publish the command,
  *    poll the reply topic for the operation id until timeout (the
  *    reference's ListenForNotifications future);
  *  - streaming [[correlate]] — stream-stream equi-join of commands and
  *    replies on operation_id with watermarks bounding state, the form
  *    that scales to unbounded topics.
  */
object RequestReply {
  val OperationIdKey = "operation_id"
  val ErrorKey = "reply_error"

  /** Error-reply payload — a case class, NOT a Map, because every
    * marshaler must be able to encode it (ProtoMarshaler rejects
    * non-case-class values; a Map here made the error path itself
    * throw, so the requester blocked the full timeout exactly when the
    * handler failed). */
  final case class ErrorReply(error: String)

  /** Command handler that publishes a reply notification carrying the
    * command's operation id; handler errors are marshaled into the
    * notification (handler.go:16-67 + backend_pubsub_marshaler.go:
    * error-in-metadata), so the requester always gets an answer. */
  def commandHandlerWithResult[C: ClassTag](marshaler: Marshaler)(
      handle: C => Any): Middlewares.Handler = {
    // fail FAST if this marshaler cannot encode the error reply: a
    // ProtoMarshaler without a registered ErrorReply schema would
    // otherwise throw inside the catch block below — the handler's
    // micro-batch retries forever and the requester blocks the full
    // timeout, exactly when a handler failure most needs an answer
    marshaler.marshal(ErrorReply("probe"))
    m =>
    val opId = m.get(OperationIdKey)
    val reply =
      try marshaler.marshal(handle(marshaler.unmarshal[C](m)))
      catch {
        case NonFatal(e) =>
          val reason = Option(e.getMessage).getOrElse(e.toString)
          marshaler.marshal(ErrorReply(reason)).withMeta(ErrorKey, reason)
      }
    Seq(reply.withMeta(OperationIdKey, opId))
  }

  /** Streaming correlation join: commands ⋈ replies on operation_id.
    * Watermarks alone do NOT bound inner stream-stream join state —
    * Spark only evicts when the join condition constrains the two
    * sides' event-time columns, so the reply window is part of the
    * join: `reply_ts ∈ [command_ts, command_ts + replyWindow]`. A reply
    * later than the window is a timeout (requestreply.go:59-66) and
    * intentionally never matches. Works on batch frames too (the q11
    * analogue — same predicate). */
  def correlate(commands: DataFrame, replies: DataFrame,
      replyWindow: String = "10 minutes"): DataFrame = {
    def keyed(df: DataFrame, side: String) = {
      val k = df.withColumn(s"${side}_op_id",
          element_at(col("metadata"), lit(OperationIdKey)))
        .filter(col(s"${side}_op_id").isNotNull)
      (if (k.isStreaming) k.withWatermark("ts", replyWindow) else k)
        .select(col(s"${side}_op_id"),
          col("uuid").as(s"${side}_uuid"),
          col("payload").as(s"${side}_payload"),
          col("ts").as(s"${side}_ts"))
    }
    keyed(commands, "command")
      .join(keyed(replies, "reply"),
        col("command_op_id") === col("reply_op_id") &&
          col("reply_ts") >= col("command_ts") &&
          col("reply_ts") <= col("command_ts") + expr(s"INTERVAL $replyWindow"))
      .withColumnRenamed("command_op_id", "op_id").drop("reply_op_id")
  }
}

/** Interactive backend, parity with `PubSubBackend`
  * (backend_pubsub.go:74-173). The reference subscribes to the reply
  * topic BEFORE publishing (race-free); our transport replays history
  * to late readers (persistent semantics), which closes the same race
  * without subscription ordering. */
final class PubSubBackend(
    pubsub: PubSub,
    commandTopic: String = "rr_commands",
    replyTopic: String = "rr_replies",
    marshaler: Marshaler = new JsonMarshaler()) {

  import RequestReply._

  // Eager topic init: the first await() poll can run BEFORE the handler
  // has published anything — on a path-backed transport an uninitialized
  // reply topic makes subscribeBatch throw PATH_NOT_FOUND out of await
  // instead of polling until the documented Left-on-timeout.
  pubsub.subscribeInitialize(commandTopic)
  pubsub.subscribeInitialize(replyTopic)

  /** Register the processing side on a router: one handler consuming
    * the command topic and publishing correlated replies. */
  def registerHandler[C: ClassTag](router: Router)(handle: C => Any): Router =
    router.addHandler(s"rr-handler-$commandTopic", commandTopic, pubsub,
      replyTopic, pubsub, commandHandlerWithResult[C](marshaler)(handle))

  /** Publish a command stamped with a fresh operation id; returns it. */
  def send(cmd: Any): String = {
    val opId = graft.core.Ids.newUuid()
    pubsub.publish(commandTopic,
      Seq(marshaler.marshal(cmd).withMeta(OperationIdKey, opId)))
    opId
  }

  /** Await the reply for an operation id by polling the replayable
    * reply topic (requestreply.go:59-66 ReplyTimeoutError semantics:
    * Left on timeout). `drive` runs between polls — pass
    * `router.processAllAvailable` to push micro-batches in tests. */
  def await(opId: String, timeoutMs: Long, pollMs: Long = 50,
      drive: () => Unit = () => ()): Either[String, Message] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      drive()
      val hit = pubsub.subscribeBatch(replyTopic)
        .filter(element_at(col("metadata"), lit(OperationIdKey)) === opId)
        .collect()
      if (hit.nonEmpty) {
        val r = hit.head
        return Right(Message(r.getAs[String]("uuid"),
          r.getAs[Map[String, String]]("metadata"),
          r.getAs[Array[Byte]]("payload"), r.getAs[java.sql.Timestamp]("ts")))
      }
      Thread.sleep(pollMs)
    }
    Left(s"reply timeout after ${timeoutMs}ms for operation $opId")
  }

  def sendAndWait(cmd: Any, timeoutMs: Long,
      drive: () => Unit = () => ()): Either[String, Message] =
    await(send(cmd), timeoutMs, drive = drive)
}
