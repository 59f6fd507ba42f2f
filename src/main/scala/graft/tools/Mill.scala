package graft.tools

import graft.GraftSession
import graft.core.Message
import graft.sources.{BulkRead, FilePubSub, PubSub, SqlPubSub}

/** CLI producer/consumer over file- or SQL-backed topics, parity with
  * the `mill` tool (reference: tools/mill/README.md:1-13) — the
  * spark-submit-able driver app form. `<root>` selects the transport:
  * a `jdbc:` URL opens [[SqlPubSub]], anything else is a
  * [[FilePubSub]] directory root.
  *
  *   runMain graft.tools.Mill produce <root> <topic> <payload> [k=v ...]
  *   runMain graft.tools.Mill consume <root> <topic> [limit]
  *   runMain graft.tools.Mill compact <fileRoot> <topic> [targetFiles] [retentionMs]
  *   runMain graft.tools.Mill prune <jdbcUrl> <topic> [olderThanMs] [batchSize]
  *   runMain graft.tools.Mill drop-group <jdbcUrl> <group> <topic>
  *
  * Maintenance entries (each a thin wrapper over the spec-tested
  * method, operator contract documented there):
  *  - `compact` (file): consolidates per-epoch small files, optional
  *    retention horizon ([[FilePubSub.compact]]) — run quiescent.
  *  - `prune` (SQL): deletes a topic's records every registered group
  *    has acked, keeping parked/delayed, NULL-ts, and in-horizon rows
  *    ([[SqlPubSub.pruneConsumed]]) — the explicit form of the
  *    `consumedRetentionMs` automatic sweep, safe under live traffic.
  *  - `drop-group` (SQL): deregisters an abandoned consumer group so
  *    it stops pinning retention at its last ack
  *    ([[SqlPubSub.dropGroup]]). */
object Mill {
  private val Usage = "usage: Mill produce <root> <topic> <payload> [k=v ...] " +
    "| Mill consume <root> <topic> [limit] " +
    "| Mill compact <fileRoot> <topic> [targetFiles] [retentionMs] " +
    "| Mill prune <jdbcUrl> <topic> [olderThanMs] [batchSize] " +
    "| Mill drop-group <jdbcUrl> <group> <topic>"

  def main(args: Array[String]): Unit = {
    // fast-fail BEFORE any session spin-up: a bare `Mill` invocation
    // should print usage, not boot Spark (run() re-checks for specs)
    if (args.length < 3) { System.err.println(Usage); sys.exit(2) }
    val spark = GraftSession.local()
    // usage errors RETURN a code instead of sys.exit'ing inside the
    // try: System.exit does not unwind finally blocks, so an exit
    // there abandoned a live JDBC connection and the SparkSession to
    // JVM teardown. run() completes, cleanup runs, THEN we exit.
    val code = try run(args, spark) finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** CLI body, factored from main so specs can drive it end-to-end:
    * never exits and never stops the session it is handed; returns
    * the process exit code (0 ok, 2 usage error). Opens the transport
    * lazily — a usage error exits before any connection is made — and
    * always closes what it opened. */
  private[graft] def run(args: Array[String],
      spark: org.apache.spark.sql.SparkSession): Int = {
    if (args.length < 3) { System.err.println(Usage); return 2 }
    val root = args(1)
    val isSql = root.startsWith("jdbc:")
    var opened: Option[PubSub] = None
    def ps: PubSub = opened.getOrElse {
      val p: PubSub =
        if (isSql) new SqlPubSub(spark, root) else new FilePubSub(spark, root)
      opened = Some(p); p
    }
    try {
      args(0) match {
        case "produce" if args.length < 4 =>
          System.err.println("usage: Mill produce <root> <topic> <payload> [k=v ...]")
          return 2
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
        case "compact" if isSql =>
          System.err.println(
            "compact is the FILE transport's maintenance entry; for SQL use prune")
          return 2
        case "compact" =>
          val targetFiles = if (args.length > 3) args(3).toInt else 1
          val retentionMs = if (args.length > 4) args(4).toLong else 0L
          ps.asInstanceOf[FilePubSub].compact(args(2), targetFiles, retentionMs)
          println(s"compacted ${args(2)} to <= $targetFiles files" +
            (if (retentionMs > 0) s", retention ${retentionMs}ms" else ""))
        case "prune" if !isSql =>
          System.err.println(
            "prune is the SQL transport's maintenance entry; for file use compact")
          return 2
        case "prune" =>
          val olderThanMs = if (args.length > 3) args(3).toLong else 0L
          val n =
            if (args.length > 4)
              ps.asInstanceOf[SqlPubSub]
                .pruneConsumed(args(2), olderThanMs, args(4).toLong)
            else ps.asInstanceOf[SqlPubSub].pruneConsumed(args(2), olderThanMs)
          println(s"pruned $n fully-acked records of ${args(2)}" +
            (if (olderThanMs > 0) s" older than ${olderThanMs}ms" else ""))
        case "drop-group" if !isSql =>
          System.err.println("drop-group is a SQL transport maintenance entry")
          return 2
        case "drop-group" if args.length < 4 =>
          System.err.println("usage: Mill drop-group <jdbcUrl> <group> <topic>")
          return 2
        case "drop-group" =>
          ps.asInstanceOf[SqlPubSub].dropGroup(args(2), args(3))
          println(s"dropped group ${args(2)} from ${args(3)}")
        case other =>
          System.err.println(s"unknown command: $other"); return 2
      }
      0
    } finally opened.foreach {
      case c: AutoCloseable => c.close()
      case _ => ()
    }
  }
}
