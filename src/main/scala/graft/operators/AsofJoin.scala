package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series enrichment Spark
  * has no native operator for: every left row picks up the payload of
  * the latest right row with the same key and `rightTime <= leftTime`.
  *
  * Implementation is the union-carry pattern, NOT a range join: tag
  * both sides, union them, shuffle ONCE on the key, sort each
  * partition by `(time, side)` (right rows first on ties, giving the
  * ASOF `<=` semantics), and carry the last non-null right payload
  * forward with an unbounded-preceding `last(..., ignoreNulls)`
  * window. Left rows then project their carried payload.
  *
  * Scale shape: one hash-partition exchange + one in-partition sort,
  * linear in |left| + |right| — a naive `l.ts >= r.ts` range join is
  * O(|left| x |right|) pair generation on hot keys and is exactly the
  * shape that dies at 100 TB. Skewed keys spread with AQE; the carry
  * state per row is one struct, so the window never buffers a frame
  * (running `last` over unbounded-preceding is a streaming frame in
  * Spark's window exec).
  *
  * Determinism: callers must make the right side unique per
  * `(key, time)` (aggregate duplicates first) — otherwise "the latest
  * right row" is ambiguous for ANY as-of join engine, DuckDB's `ASOF
  * JOIN` included.
  */
object AsofJoin {

  /** @param left        probe side; all its columns survive
    * @param right       build side; must be unique per (key, time)
    * @param key         equality key column present on both sides
    * @param time        event-time column present on both sides
    * @param payloadCols right columns to attach (emitted as `asof_<c>`)
    * @param inner       true drops left rows with no prior right row
    *                    (ASOF JOIN); false keeps them with nulls
    *                    (LEFT ASOF JOIN)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      payloadCols: Seq[String], inner: Boolean = true): DataFrame = {
    reserveNames(left)
    val r = right.select(col(key), col(time),
      struct(payloadCols.map(col): _*).as("_asof_pay"))
    val l = left
      .withColumn("_asof_pay", lit(null).cast(r.schema("_asof_pay").dataType))
      .withColumn("_side", lit(1))
    val unioned = l.unionByName(
      r.withColumn("_side", lit(0)), allowMissingColumns = true)
    val carry = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_asof", last(col("_asof_pay"), ignoreNulls = true).over(carry))
      .filter(col("_side") === 1)
    val base = if (inner) carried.filter(col("_asof").isNotNull) else carried
    base.select(left.columns.map(col) ++
      payloadCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }

  /** FORWARD as-of join: every left row picks up the payload of the
    * EARLIEST right row with the same key and `rightTime >= leftTime`
    * (pandas `merge_asof(direction="forward")`, DuckDB `ASOF JOIN …
    * ON l.t <= r.t`) — "what happened next": the next view after a
    * click, the next quote after an order.
    *
    * Same union-carry shape as [[asofJoin]], scanned in DESCENDING
    * time order so the carried right row is the minimum-time match
    * seen so far; right rows sort before left on ties, keeping the
    * `>=` inclusive. One exchange, one in-partition sort, linear —
    * never a range join.
    *
    * `tolerance` bounds the match gap: `(leftTime, rightTime) =>
    * condition`; a carried match failing it becomes null (and is
    * dropped when `inner`). E.g.
    * `(lt, rt) => rt <= lt + expr("INTERVAL 30 MINUTES")`.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      time: String, payloadCols: Seq[String], inner: Boolean = true,
      tolerance: Option[(Column, Column) => Column] = None): DataFrame = {
    reserveNames(left)
    // _rt rides inside the payload struct: a right payload column of
    // that name would shadow the carried right-time the tolerance
    // check reads
    require(!payloadCols.contains("_rt"),
      "payload column name _rt is reserved by AsofJoin.asofJoinForward")
    val r = right.select(col(key), col(time),
      struct(col(time).as("_rt") +: payloadCols.map(col): _*).as("_asof_pay"))
    val l = left
      .withColumn("_asof_pay", lit(null).cast(r.schema("_asof_pay").dataType))
      .withColumn("_side", lit(1))
    val unioned = l.unionByName(
      r.withColumn("_side", lit(0)), allowMissingColumns = true)
    val carry = Window.partitionBy(col(key))
      .orderBy(col(time).desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = unioned
      .withColumn("_asof", last(col("_asof_pay"), ignoreNulls = true).over(carry))
      .filter(col("_side") === 1)
    val carried = tolerance match {
      case None => carried0
      case Some(tol) => carried0.withColumn("_asof",
        when(col("_asof").isNotNull && tol(col(time), col("_asof._rt")),
          col("_asof")))
    }
    val base = if (inner) carried.filter(col("_asof").isNotNull) else carried
    base.select(left.columns.map(col) ++
      payloadCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }

  // internal names fail fast (the Merge/TableDiff discipline): a left
  // frame already carrying one would have its data silently replaced
  // by withColumn and echoed back corrupted in the output (a real
  // `_side` column, e.g., would come back as the constant 1)
  private def reserveNames(left: DataFrame): Unit =
    Seq("_asof_pay", "_side", "_asof").foreach(n =>
      require(!left.columns.contains(n),
        s"column name $n is reserved by AsofJoin"))

  /** Pre-aggregation for a right side with duplicate (key, time) rows:
    * keep each group's row with the maximum tiebreak value (one
    * shuffle, map-side partial `max_by`), making [[asofJoin]]'s input
    * unique per (key, time) and the join deterministic. */
  def latestPerKeyTime(right: DataFrame, key: String, time: String,
      tiebreak: String, payloadCols: Seq[String]): DataFrame =
    right.groupBy(col(key), col(time))
      .agg(max_by(struct(payloadCols.map(col): _*), col(tiebreak)).as("_p"))
      .select(col(key) +: col(time) +: payloadCols.map(c => col(s"_p.$c").as(c)): _*)
}
