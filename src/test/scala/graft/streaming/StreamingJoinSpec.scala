package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import StreamingJoin.Evt

/** Stream-stream correlation: pairs inside the horizon match across
  * micro-batches, outside-horizon and cross-key events don't, the
  * left-outer form emits null-padded timeouts only after the watermark
  * proves no match can arrive, and join state stays bounded (evicted
  * rows don't linger) per the progress metrics.
  */
class StreamingJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def run(join: (org.apache.spark.sql.Dataset[Evt],
        org.apache.spark.sql.Dataset[Evt]) => DataFrame,
      leftBatches: Seq[Seq[Evt]], rightBatches: Seq[Seq[Evt]],
      flushSec: Long = 100000L): (Set[(String, String, String)], Long) = {
    val ls = MemoryStream[Evt](spark)
    val rs = MemoryStream[Evt](spark)
    val name = s"sj_out_${System.nanoTime()}"
    val q = join(ls.toDS(), rs.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-sj-").toString)
      .start()
    try {
      leftBatches.zipAll(rightBatches, Seq.empty[Evt], Seq.empty[Evt]).foreach {
        case (lb, rb) =>
          if (lb.nonEmpty) ls.addData(lb)
          if (rb.nonEmpty) rs.addData(rb)
          q.processAllAvailable()
      }
      // two sentinel rounds: watermark computed at batch end gates the
      // NEXT batch's eviction/outer-emission
      (0 to 1).foreach { i =>
        ls.addData(Seq(Evt("_s", ts(flushSec + i), "x")))
        rs.addData(Seq(Evt("_s", ts(flushSec + i), "x")))
        q.processAllAvailable()
      }
      val rows = spark.table(name)
        .filter(col("l_key") =!= "_s")
        .select(col("l_key"), col("l_payload"),
          coalesce(col("r_payload"), lit("TIMEOUT")))
        .as[(String, String, String)].collect().toSet
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      (rows, stateRows)
    } finally { q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name"); () }
  }

  test("inner join matches within horizon across micro-batches, not outside") {
    val (out, _) = run(StreamingJoin.within(_, _, 60, "10 seconds"),
      leftBatches = Seq(Seq(Evt("a", ts(100), "cmd-a"), Evt("b", ts(100), "cmd-b"))),
      rightBatches = Seq(
        Seq(Evt("a", ts(130), "reply-a1")),          // in horizon, same batch round
        Seq(Evt("a", ts(160), "reply-a2"),           // in horizon (boundary: +60)
          Evt("a", ts(161), "late-a"),               // 1s past horizon
          Evt("c", ts(130), "other-key"))))          // no left 'c'
    assert(out == Set(
      ("a", "cmd-a", "reply-a1"),
      ("a", "cmd-a", "reply-a2")), s"got $out")
  }

  test("right event BEFORE the left event never matches (directional window)") {
    val (out, _) = run(StreamingJoin.within(_, _, 60, "10 seconds"),
      leftBatches = Seq(Seq(Evt("a", ts(200), "cmd"))),
      rightBatches = Seq(Seq(Evt("a", ts(199), "early"), Evt("a", ts(200), "exact"))))
    assert(out == Set(("a", "cmd", "exact")), s"got $out")
  }

  test("left-outer emits TIMEOUT rows only after the watermark passes the horizon") {
    val ls = MemoryStream[Evt](spark)
    val rs = MemoryStream[Evt](spark)
    val name = s"sj_to_${System.nanoTime()}"
    val q = StreamingJoin.withinOrTimeout(ls.toDS(), rs.toDS(), 60, "10 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-sj-").toString)
      .start()
    try {
      ls.addData(Seq(Evt("m", ts(100), "matched"), Evt("u", ts(100), "unmatched")))
      rs.addData(Seq(Evt("m", ts(120), "reply-m")))
      q.processAllAvailable()
      val early = spark.table(name).count()
      assert(early == 1L, s"only the matched pair before watermark: $early")
      // advance both watermarks past 100 + horizon + delay
      (0 to 1).foreach { i =>
        ls.addData(Seq(Evt("_s", ts(300 + i), "x")))
        rs.addData(Seq(Evt("_s", ts(300 + i), "x")))
        q.processAllAvailable()
      }
      val out = spark.table(name).filter(col("l_key") =!= "_s")
        .select(col("l_key"), coalesce(col("r_payload"), lit("TIMEOUT")))
        .as[(String, String)].collect().toSet
      assert(out == Set(("m", "reply-m"), ("u", "TIMEOUT")), s"got $out")
    } finally { q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name"); () }
  }

  test("join state is evicted as the watermark advances (bounded, not stream-length)") {
    val batches = (0 until 5).map { i =>
      Seq(Evt("k", ts(1000L + 600L * i), s"l$i"))
    }
    val rbatches = (0 until 5).map { i =>
      Seq(Evt("k", ts(1010L + 600L * i), s"r$i"))
    }
    val (out, stateRows) = run(StreamingJoin.within(_, _, 60, "10 seconds"),
      batches, rbatches, flushSec = 100000L)
    assert(out == (0 until 5).map(i => ("k", s"l$i", s"r$i")).toSet, s"got $out")
    // 10 real + sentinel rows arrived; with 600s between pairs and a
    // 70s eviction bound, old state must be gone — allow only the tail
    assert(stateRows >= 0 && stateRows <= 6,
      s"state should hold only the un-evicted tail, got $stateRows rows")
  }
}
