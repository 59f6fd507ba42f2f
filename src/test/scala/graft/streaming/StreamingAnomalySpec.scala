package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import StreamingAnomaly.{AnomalyFlag, Obs}

/** Streaming rolling-anomaly semantics: the ring state crosses
  * micro-batches, warm-up suppresses early verdicts, eviction keeps
  * the judgment to the RECENT window, and on identically ordered
  * input the streaming operator reproduces the q76 batch window
  * computation exactly (same integer cross-multiply, so bit-for-bit).
  */
class StreamingAnomalySpec extends SparkSpec {

  import spark.implicits._

  private def runFlags(batches: Seq[Seq[Obs]], window: Int = 20,
      minObs: Int = 10, factor: Long = 3L): Seq[AnomalyFlag] = {
    val stream = MemoryStream[Obs](spark)
    val q = StreamingAnomaly.flags(stream.toDS(), window, minObs, factor)
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-an-").toString)
      .start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      spark.table("anomaly_out").as[AnomalyFlag].collect().toSeq
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS anomaly_out"); () }
  }

  test("spike is flagged against state accumulated in earlier batches") {
    val warm = (1 to 12).map(i => Obs("a", i.toLong, 1000L))
    val noise = (1 to 3).map(i => Obs("b", i.toLong, 1000L))
    val flags = runFlags(Seq(warm ++ noise, Seq(Obs("a", 13L, 5000L), Obs("b", 4L, 5000L))))
    // a: 5000 * 12 > 3 * 12000 with 12 warm obs carried across the
    // batch boundary; b: only 3 obs of history — below minObs, silent
    assert(flags == Seq(AnomalyFlag("a", 13L, 5000L, 12, 12000L)),
      s"got $flags")
  }

  test("steady stream never flags (warm-up then in-band values)") {
    val obs = (1 to 40).map(i => Obs("a", i.toLong, 1000L + (i % 7)))
    assert(runFlags(Seq(obs)).isEmpty)
  }

  test("ring eviction judges against the recent window only") {
    // 5 high then 5 low fills the window=5 ring with lows; 30 is a
    // spike vs the lows (30*5 > 2*50) but NOT vs the highs (30*5 <
    // 2*500) — a flag proves the highs were evicted
    val obs = (1 to 5).map(i => Obs("c", i.toLong, 100L)) ++
      (6 to 10).map(i => Obs("c", i.toLong, 10L)) ++
      Seq(Obs("c", 11L, 30L))
    val flags = runFlags(Seq(obs), window = 5, minObs = 3, factor = 2L)
    assert(flags.exists(f => f.id == 11L && f.cnt == 5 && f.rollSum == 50L),
      s"expected id 11 flagged against the evicted-to-low ring, got $flags")
  }

  test("streaming flags equal the q76-style batch window computation") {
    // deterministic pseudo-noise with occasional spikes, two keys
    val obs = for {
      k <- Seq("x", "y"); i <- 1 to 60
    } yield Obs(k, i.toLong, (((i * 37 + k.hashCode) % 97 + 97) % 97 + 10).toLong *
      (if (i % 17 == 0) 9 else 1))
    val streamed = runFlags(obs.grouped(25).map(_.toSeq).toSeq)
      .map(f => (f.key, f.id, f.vMilli, f.cnt, f.rollSum)).toSet
    val w = Window.partitionBy(col("key")).orderBy(col("id")).rowsBetween(-20, -1)
    val batch = obs.toDF("key", "id", "vMilli")
      .withColumn("rollSum", sum(col("vMilli")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") >= 10 && col("vMilli") * col("cnt") > lit(3) * col("rollSum"))
      .collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("id"),
        r.getAs[Long]("vMilli"), r.getAs[Long]("cnt").toInt,
        r.getAs[Long]("rollSum"))).toSet
    assert(batch.nonEmpty, "test vector produced no spikes — not probative")
    assert(streamed == batch, s"streaming $streamed != batch $batch")
  }
}
