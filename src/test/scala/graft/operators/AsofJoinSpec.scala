package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of join (q47): most-recent-prior semantics, tie handling, inner
  * vs left behavior, and the right-side (key, time) pre-dedup — pinned
  * on fixtures where every expected match is known. */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // (id, key, ts, value)
  private def df(rows: (Long, Long, Long, Double)*) =
    rows.map { case (i, k, t, v) => (i, k, ts(t), v) }
      .toDF("id", "key", "ts", "value")

  test("each left row picks the latest right row at or before its time") {
    val left = df((1L, 10L, 100L, 0.0), (2L, 10L, 250L, 0.0), (3L, 10L, 50L, 0.0))
    val right = df((90L, 10L, 80L, 1.1), (91L, 10L, 200L, 2.2))
    val out = AsofJoin.asofJoin(left, right, "key", "ts", Seq("value"))
      .select("id", "asof_value").as[(Long, Double)].collect().toMap
    // t=100 -> right@80; t=250 -> right@200; t=50 -> no prior (inner drops)
    assert(out === Map(1L -> 1.1, 2L -> 2.2))
  }

  test("a right row at exactly the left time matches (<= semantics)") {
    val left = df((1L, 5L, 100L, 0.0))
    val right = df((90L, 5L, 100L, 7.7), (91L, 5L, 40L, 1.0))
    val out = AsofJoin.asofJoin(left, right, "key", "ts", Seq("value"))
      .select("asof_value").as[Double].collect()
    assert(out.toSeq === Seq(7.7))
  }

  test("keys never cross: matches are per-key even with interleaved times") {
    val left = df((1L, 1L, 100L, 0.0), (2L, 2L, 100L, 0.0))
    val right = df((90L, 1L, 90L, 1.0), (91L, 2L, 95L, 2.0))
    val out = AsofJoin.asofJoin(left, right, "key", "ts", Seq("value"))
      .select("id", "asof_value").as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 1.0, 2L -> 2.0))
  }

  test("inner=false keeps unmatched left rows with null payload") {
    val left = df((1L, 3L, 10L, 0.0), (2L, 3L, 99L, 0.0))
    val right = df((90L, 3L, 50L, 4.4))
    val out = AsofJoin.asofJoin(left, right, "key", "ts", Seq("value"), inner = false)
      .select("id", "asof_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out === Map(1L -> None, 2L -> Some(4.4)))
  }

  test("latestPerKeyTime resolves duplicate (key, time) rows by max tiebreak") {
    val right = df((90L, 8L, 100L, 1.0), (95L, 8L, 100L, 9.0), (92L, 8L, 100L, 5.0))
    val deduped = AsofJoin.latestPerKeyTime(right, "key", "ts", "id", Seq("value"))
    val rows = deduped.select("key", "value").as[(Long, Double)].collect()
    assert(rows.toSeq === Seq(8L -> 9.0)) // id=95 wins
    // and the join then sees exactly that winner
    val left = df((1L, 8L, 200L, 0.0))
    val out = AsofJoin.asofJoin(left, deduped, "key", "ts", Seq("value"))
      .select("asof_value").as[Double].collect()
    assert(out.toSeq === Seq(9.0))
  }

  test("plan shape: exactly one exchange feeds the window (no range-join blowup)") {
    val left = df((1L, 1L, 100L, 0.0))
    val right = df((90L, 1L, 90L, 1.0))
    val joined = AsofJoin.asofJoin(left, right, "key", "ts", Seq("value"))
    val physical = joined.queryExecution.executedPlan.toString
    // the carry pattern must not contain a join operator at all
    assert(!physical.contains("SortMergeJoin") && !physical.contains("BroadcastHashJoin"),
      s"as-of join compiled to a join:\n$physical")
    assert(physical.contains("Window"), s"expected a window carry:\n$physical")
  }

  // ---- forward direction -------------------------------------------

  test("forward: each left row picks the EARLIEST right row at or after its time") {
    val left = df((1L, 10L, 100L, 0.0), (2L, 10L, 250L, 0.0), (3L, 10L, 500L, 0.0))
    val right = df((90L, 10L, 150L, 1.1), (91L, 10L, 300L, 2.2))
    val out = AsofJoin.asofJoinForward(left, right, "key", "ts", Seq("value"))
      .select("id", "asof_value").as[(Long, Double)].collect().toMap
    // t=100 -> right@150; t=250 -> right@300; t=500 -> none (inner drops)
    assert(out === Map(1L -> 1.1, 2L -> 2.2))
  }

  test("forward: equal time matches (>= semantics); inner=false keeps misses") {
    val left = df((1L, 5L, 100L, 0.0), (2L, 5L, 900L, 0.0))
    val right = df((90L, 5L, 100L, 7.7))
    val out = AsofJoin.asofJoinForward(left, right, "key", "ts", Seq("value"),
        inner = false)
      .select("id", "asof_value").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(1L -> Some(7.7), 2L -> None))
  }

  test("forward tolerance: matches past the gap bound become null") {
    val left = df((1L, 7L, 100L, 0.0), (2L, 7L, 400L, 0.0))
    val right = df((90L, 7L, 160L, 1.0), (91L, 7L, 2000L, 2.0))
    val out = AsofJoin.asofJoinForward(left, right, "key", "ts", Seq("value"),
        inner = false,
        tolerance = Some((lt, rt) => rt <= lt + expr("INTERVAL 2 MINUTES")))
      .select("id", "asof_value").as[(Long, Option[Double])].collect().toMap
    // gap 60s <= 120s matches; gap 1600s does not
    assert(out === Map(1L -> Some(1.0), 2L -> None))
  }
}
