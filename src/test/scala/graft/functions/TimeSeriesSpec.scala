package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TimeSeries resampling: hand-computed TWAP (step interpolation, last
  * sample weightless), degenerate single-sample groups, and OHLC bar
  * geometry with tie-broken open/close.
  */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("TWAP: value holds until the next sample; last sample carries no weight") {
    // g: 10 for 5s, 20 for 15s, (30 last, weightless)
    // twap = (10*5 + 20*15) / 20 = 17.5
    val rows = Seq(
      ("g", 10L, ts(100), 1L), ("g", 20L, ts(105), 2L), ("g", 30L, ts(120), 3L))
      .toDF("k", "c", "t", "id")
    val out = TimeSeries.twap(rows, col("k"), col("c"), col("t"), col("id"))
      .as[(String, Option[Long], Option[Long], Option[Double])].collect().head
    assert(out == (("g", Some(10L * 5000000L + 20L * 15000000L),
      Some(20000000L), Some(17.5))))
  }

  test("TWAP: a null tick is dropped, not averaged in as zero") {
    // pre-fix: the null sample's 10s gap counted in twap_den while its
    // product was skipped in twap_num — 10 for 10s, null for 10s,
    // (10 last) read 5.0 instead of 10.0
    val rows = Seq(
      ("g", Some(10L), ts(100), 1L), ("g", Option.empty[Long], ts(110), 2L),
      ("g", Some(10L), ts(120), 3L))
      .toDF("k", "c", "t", "id")
    val out = TimeSeries.twap(rows, col("k"), col("c"), col("t"), col("id"))
      .as[(String, Option[Long], Option[Long], Option[Double])].collect().head
    assert(out._4 == Some(10.0),
      s"one null tick must not bias the TWAP toward zero, got ${out._4}")
  }

  test("TWAP: a per-row product overflow poisons twap_num to NULL; the double-space twap survives") {
    // value Long.MaxValue held for 100s: v*gap_us overflows 2^63 ->
    // try_multiply NULL. Pre-fix, SUM skipped that row and twap_num
    // reported only the second row's product - a wrong NON-NULL
    // "exact diagnostic". The statistic itself (double space) stays
    // finite and correct to double precision.
    val rows = Seq(
      ("g", Long.MaxValue, ts(100), 1L), ("g", 4L, ts(200), 2L),
      ("g", 7L, ts(210), 3L))
      .toDF("k", "c", "t", "id")
    val out = TimeSeries.twap(rows, col("k"), col("c"), col("t"), col("id"))
      .as[(String, Option[Long], Option[Long], Option[Double])].collect().head
    assert(out._2.isEmpty,
      s"overflowed per-row product must poison twap_num, got ${out._2}")
    assert(out._3 == Some(110000000L)) // exact integer denominator intact
    val expect = (Long.MaxValue.toDouble * 100000000L + 4.0 * 10000000L) /
      110000000L
    assert(out._4.exists(v => math.abs(v / expect - 1) < 1e-12),
      s"double-space twap must survive the poison, got ${out._4}")
  }

  test("TWAP: a single-sample group has null average (zero total weight)") {
    val rows = Seq(("solo", 42L, ts(100), 1L)).toDF("k", "c", "t", "id")
    val out = TimeSeries.twap(rows, col("k"), col("c"), col("t"), col("id"))
      .as[(String, Option[Long], Option[Long], Option[Double])].collect().head
    assert(out._4.isEmpty && out._3.isEmpty)
  }

  test("TWAP: simultaneous samples tie-break deterministically (zero gap)") {
    // two samples at t=100 (ids 1,2): first gets gap 0, second gap 10s
    val rows = Seq(
      ("g", 10L, ts(100), 1L), ("g", 99L, ts(100), 2L), ("g", 5L, ts(110), 3L))
      .toDF("k", "c", "t", "id")
    val out = TimeSeries.twap(rows, col("k"), col("c"), col("t"), col("id"))
      .as[(String, Option[Long], Option[Long], Option[Double])].collect().head
    assert(out._2 == Some(99L * 10000000L) && out._4 == Some(99.0))
  }

  test("CUSUM window identity equals the recursive Page definition") {
    // x - k deltas: +3, -5, +4, +2, -1, +6 with k=10
    val xs = Seq(13L, 5L, 14L, 12L, 9L, 16L)
    // recursive truth: S_t = max(0, S_{t-1} + delta)
    val truth = xs.scanLeft(0L)((s, x) => math.max(0L, s + (x - 10L))).tail
    val rows = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x, 10L) }
      .toDF("k", "b", "x", "t")
    val got = TimeSeries.cusum(rows, col("k"), col("b"), col("x"), col("t"))
      .orderBy("bucket").select("cusum").as[Long].collect().toList
    assert(got == truth.toList, s"window form must equal the recursion: $got vs $truth")
    assert(truth == List(3L, 0L, 4L, 6L, 5L, 11L)) // sanity on the fixture
  }

  test("CUSUM: sustained negative drift pins the score at zero") {
    val rows = (1 to 10).map(i => ("g", i.toLong, 1L, 5L)).toDF("k", "b", "x", "t")
    val got = TimeSeries.cusum(rows, col("k"), col("b"), col("x"), col("t"))
      .select("cusum").as[Long].collect().toSet
    assert(got == Set(0L))
  }

  test("OHLC: open/close by time with id tie-break; high/low by value") {
    val rows = Seq(
      ("g", "d1", 50L, ts(100), 2L), ("g", "d1", 10L, ts(100), 1L), // open: id 1
      ("g", "d1", 99L, ts(150), 3L),                                // high
      ("g", "d1", 3L, ts(160), 4L),                                 // low
      ("g", "d1", 70L, ts(200), 5L),                                // close
      ("g", "d2", 7L, ts(300), 6L))
      .toDF("k", "b", "c", "t", "id")
    val out = TimeSeries.ohlc(rows, col("k"), col("b"), col("c"), col("t"),
        col("id"))
      .orderBy("bucket")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      ("g", "d1", 10L, 70L, 99L, 3L, 5L),
      ("g", "d2", 7L, 7L, 7L, 7L, 1L)))
  }
}
