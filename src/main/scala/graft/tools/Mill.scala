package graft.tools

import graft.GraftSession
import graft.core.Message
import graft.sources.{BulkRead, FilePubSub}

/** CLI producer/consumer over file-backed topics, parity with the
  * `mill` tool (reference: tools/mill/README.md:1-13) — the
  * spark-submit-able driver app form.
  *
  *   runMain graft.tools.Mill produce <root> <topic> <payload> [k=v ...]
  *   runMain graft.tools.Mill consume <root> <topic> [limit]
  *   runMain graft.tools.Mill compact <root> <topic> [targetFiles] [retentionMs]
  *
  * `compact` is the maintenance entry ([[FilePubSub.compact]]):
  * consolidates the topic's per-epoch small files and, with a
  * retentionMs horizon, drops expired rows — run it quiescent (no
  * live publishers/subscribers on the topic), the operator contract
  * documented on the method. */
object Mill {
  private val Usage = "usage: Mill produce <root> <topic> <payload> [k=v ...] " +
    "| Mill consume <root> <topic> [limit] " +
    "| Mill compact <root> <topic> [targetFiles] [retentionMs]"

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(Usage)
      sys.exit(2)
    }
    val spark = GraftSession.local()
    try {
      val ps = new FilePubSub(spark, args(1))
      args(0) match {
        case "produce" if args.length < 4 =>
          System.err.println("usage: Mill produce <root> <topic> <payload> [k=v ...]")
          sys.exit(2)
        case "produce" =>
          val meta = args.drop(4).flatMap { kv =>
            kv.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
          }.toMap
          ps.publish(args(2), Seq(Message.of(args(3), meta)))
          println(s"published 1 message to ${args(2)}")
        case "consume" =>
          val limit = if (args.length > 3) args(3).toInt else 10
          BulkRead(ps, args(2), limit).foreach { m =>
            println(s"${m.uuid}\t${m.metadata}\t${m.payloadString}")
          }
        case "compact" =>
          val targetFiles = if (args.length > 3) args(3).toInt else 1
          val retentionMs = if (args.length > 4) args(4).toLong else 0L
          ps.compact(args(2), targetFiles, retentionMs)
          println(s"compacted ${args(2)} to <= $targetFiles files" +
            (if (retentionMs > 0) s", retention ${retentionMs}ms" else ""))
        case other =>
          System.err.println(s"unknown command: $other"); sys.exit(2)
      }
    } finally spark.stop()
  }
}
