package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Message
import graft.sources.MemoryPubSub

/** Streaming dimension enrichment against the CDC-maintained snapshot:
  * the composition that makes [[StreamingCdc]] useful — a fact stream
  * joins each micro-batch against the LATEST dimension state
  * (stream-static per-batch re-read, the slowly-changing-dimension
  * serving pattern). Facts see exactly the state as of the last applied
  * changelog batch: updates land between batches, deletes stop
  * enriching, re-inserts resume.
  */
class StreamingEnrichmentSpec extends SparkSpec {

  import spark.implicits._

  test("facts enrich with the dimension state as of the last CDC apply") {
    val dir = java.nio.file.Files.createTempDirectory("graft-enrich-").toString
    val cdc = new StreamingCdc(spark, dir + "/dim", Seq("k"), Seq("seq"), "op")
    def dim(rows: (Long, Long, String, String)*): Unit =
      cdc.applyBatch(rows.toDF("k", "seq", "op", "segment"))

    val src = new MemoryPubSub(spark)
    val out = scala.collection.concurrent.TrieMap.empty[Long, Option[String]]
    val q = src.subscribe("facts").writeStream
      .option("checkpointLocation", dir + "/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val facts = b.select(col("uuid").cast("long").as("event_id"),
          col("metadata")("user").cast("long").as("k"))
        val enriched = cdc.snapshot match {
          case Some(snap) =>
            facts.join(snap.select(col("k"), col("segment")), Seq("k"), "left")
          case None => facts.withColumn("segment", lit(null).cast("string"))
        }
        enriched.select("event_id", "segment").collect().foreach(r =>
          out(r.getLong(0)) = Option(r.getString(1)))
        ()
      }.start()
    def pub(rows: (Long, Long)*): Unit = {
      src.publish("facts", rows.map { case (id, user) =>
        Message(id.toString, Map("user" -> user.toString),
          Array.emptyByteArray, new Timestamp(1700000000000L + id))
      }.toSeq)
      q.processAllAvailable()
    }

    try {
      // batch 1: dimension knows users 1, 2
      dim((1L, 10L, "U", "gold"), (2L, 11L, "U", "silver"))
      pub((100L, 1L), (101L, 2L), (102L, 3L)) // user 3 unknown
      assert(out(100L).contains("gold") && out(101L).contains("silver"))
      assert(out(102L).isEmpty)

      // between batches: user 1 upgraded, user 2 deleted, user 3 appears
      dim((1L, 20L, "U", "platinum"), (2L, 21L, "D", ""),
        (3L, 22L, "U", "bronze"))
      pub((103L, 1L), (104L, 2L), (105L, 3L))
      assert(out(103L).contains("platinum"),
        "facts must see the post-update dimension")
      assert(out(104L).isEmpty, "deleted dimension rows stop enriching")
      assert(out(105L).contains("bronze"))

      // a STALE dimension update must not regress served state
      dim((1L, 15L, "U", "stale-gold"))
      pub((106L, 1L))
      assert(out(106L).contains("platinum"),
        "out-of-order changelog must not regress the serving state")
    } finally q.stop()
  }
}
