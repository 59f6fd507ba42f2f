package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.router.Ctx
import graft.sources.FilePubSub

/** Poison-queue browser/requeuer, parity with the `pq` tool
  * (reference: tools/pq/README.md:1-27 — browse, requeue, ack DLQ
  * messages). The TUI becomes a CLI over the DLQ topic:
  *
  *   runMain graft.tools.Pq list <root> <dlqTopic> [limit]
  *   runMain graft.tools.Pq requeue <root> <dlqTopic>   # → topic_poisoned
  */
object Pq {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: Pq list <root> <dlqTopic> [limit] | Pq requeue <root> <dlqTopic>")
      sys.exit(2)
    }
    val spark = GraftSession.local()
    // the Mill rule: usage errors RETURN a code instead of sys.exit'ing
    // inside the try (System.exit does not unwind finally blocks — the
    // SparkSession would be abandoned to JVM teardown)
    var exitCode = 0
    try {
      val ps = new FilePubSub(spark, args(1))
      val dlq = args(2)
      args(0) match {
        case "list" =>
          val limit = if (args.length > 3) args(3).toInt else 20
          ps.subscribeBatch(dlq)
            .select(col("uuid"),
              element_at(col("metadata"), lit(Ctx.ReasonPoisoned)).as("reason"),
              element_at(col("metadata"), lit(Ctx.TopicPoisoned)).as("origin"),
              element_at(col("metadata"), lit(Ctx.HandlerPoisoned)).as("handler"),
              col("ts"))
            .orderBy(col("ts"))
            .limit(limit)
            .collect()
            .foreach(r => println(r.mkString("\t")))
        case "requeue" =>
          // move every poisoned message back to its origin topic with
          // the requeue counter bumped (requeuer.go:123-153 semantics).
          // Idempotent over the append-only DLQ: a message is only
          // re-published if the origin doesn't already hold a copy at
          // the bumped retry count (anti-join on uuid + retries), so
          // re-running pq requeues only NEW poisons.
          val rows = ps.subscribeBatch(dlq)
          val origins = rows
            .select(element_at(col("metadata"), lit(Ctx.TopicPoisoned)).as("o"))
            .filter(col("o").isNotNull).distinct().collect().map(_.getString(0))
          origins.foreach { origin =>
            val bumped = rows
              .filter(element_at(col("metadata"), lit(Ctx.TopicPoisoned)) === origin)
              .withColumn("metadata", map_concat(
                map_filter(col("metadata"), (k, _) => k =!= Ctx.RequeuerRetries),
                map(lit(Ctx.RequeuerRetries),
                  (coalesce(element_at(col("metadata"), lit(Ctx.RequeuerRetries))
                    .cast("int"), lit(0)) + 1).cast("string"))))
              .withColumn("_retries", element_at(col("metadata"), lit(Ctx.RequeuerRetries)))
            val already = ps.subscribeBatch(origin)
              .select(col("uuid"),
                coalesce(element_at(col("metadata"), lit(Ctx.RequeuerRetries)),
                  lit("0")).as("_retries"))
            val fresh = bumped.join(already, Seq("uuid", "_retries"), "left_anti")
              .select(graft.core.Message.columns.map(col): _*)
              .persist()
            val n = fresh.count()
            ps.publishBatch(origin, fresh)
            fresh.unpersist()
            println(s"requeued $n message(s) to $origin")
          }
        case other =>
          System.err.println(s"unknown command: $other"); exitCode = 2
      }
    } finally spark.stop()
    if (exitCode != 0) sys.exit(exitCode)
  }
}
