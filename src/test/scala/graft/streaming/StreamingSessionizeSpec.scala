package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import StreamingSessionize.Click

/** Session assembly across micro-batches: within-gap events merge even
  * when they arrive in different batches, gap-separated events split,
  * sessions only finalize once the watermark passes, and the streaming
  * output equals BOTH batch formulations (built-in session_window and
  * the lag-based gaps-and-islands of q28/q88) on identical input.
  */
class StreamingSessionizeSpec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  /** Run the streaming sessionizer over `batches`, then flush with a
    * far-future sentinel click that pushes the watermark past every
    * real session. Returns finalized (user, startSec, endSec, n). */
  private def run(batches: Seq[Seq[Click]], gapSec: Int = 30,
      delaySec: Int = 10): Set[(String, Long, Long, Long)] = {
    val stream = MemoryStream[Click](spark)
    val name = s"sess_out_${System.nanoTime()}"
    val q = StreamingSessionize.sessions(
        stream.toDS(), s"$gapSec seconds", s"$delaySec seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-sess-").toString)
      .start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      stream.addData(Seq(Click("_sentinel", ts(1000000L))))
      q.processAllAvailable()
      // one more batch: watermark computed at batch END gates the NEXT
      // batch's state eviction, so the sentinel needs a successor
      stream.addData(Seq(Click("_sentinel", ts(1000001L))))
      q.processAllAvailable()
      spark.table(name)
        .filter(col("user") =!= "_sentinel")
        .select(col("user"), col("start").cast("long"),
          col("end").cast("long"), col("n_events"))
        .as[(String, Long, Long, Long)].collect().toSet
    } finally { q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name"); () }
  }

  test("within-gap events merge into one session across micro-batches") {
    val out = run(Seq(
      Seq(Click("a", ts(100)), Click("a", ts(110))),
      Seq(Click("a", ts(125)))))
    assert(out == Set(("a", 100L, 155L, 3L)),
      s"one session spanning both batches (end = last ts + gap): $out")
  }

  test("gap-separated events split; exactly-gap events still merge (closed boundary)") {
    val out = run(Seq(Seq(
      Click("b", ts(100)),
      Click("b", ts(130)), // exactly gap after: boundary is closed => merges
      Click("b", ts(300)))))
    assert(out == Set(("b", 100L, 160L, 2L), ("b", 300L, 330L, 1L)),
      s"got $out")
  }

  test("sessions finalize only after the watermark clears them") {
    val stream = MemoryStream[Click](spark)
    val name = s"sess_wm_${System.nanoTime()}"
    val q = StreamingSessionize.sessions(stream.toDS(), "30 seconds", "10 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-sess-").toString)
      .start()
    try {
      stream.addData(Seq(Click("c", ts(100))))
      q.processAllAvailable()
      assert(spark.table(name).isEmpty,
        "no watermark progress yet — session must still be open")
    } finally { q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name"); () }
  }

  test("streaming == batch session_window == lag-based gaps-and-islands") {
    // deterministic multi-user clickstream with mixed gaps; per-user
    // cumulative steps keep ts monotone, global sort keeps the stream
    // watermark-ordered (out-of-order tolerance is delaySec, not ∞)
    val clicks = (for (u <- Seq("u1", "u2", "u3")) yield {
      val steps = (0 until 40).map(i => (((i * 7 + u.hashCode) % 23 + 23) % 23 + 5).toLong)
      steps.scanLeft(1000L)(_ + _).take(40).map(sec => Click(u, ts(sec)))
    }).flatten.sortBy(_.ts.getTime)
    val streamed = run(clicks.grouped(17).map(_.toSeq).toSeq)

    val df = clicks.toDF("user", "ts")
    val viaBatch = StreamingSessionize.sessionsBatch(df, "user", "ts", "30 seconds")
      .select(col("user"), col("start").cast("long"), col("end").cast("long"),
        col("n_events"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed == viaBatch, s"streaming $streamed != batch $viaBatch")

    // independent formulation: gaps-and-islands over lag()
    val w = Window.partitionBy(col("user")).orderBy(col("ts"))
    val islands = df
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("new_sess",
        when(col("sec") - lag(col("sec"), 1).over(w) > 30 ||
          lag(col("sec"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user"), col("sess_id"))
      .agg(min(col("sec")).as("start"), (max(col("sec")) + 30).as("end"),
        count(lit(1)).as("n_events"))
      .select(col("user"), col("start"), col("end"), col("n_events"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed == islands, s"streaming $streamed != islands $islands")
  }
}
