package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Complex-event-processing pattern matching, first-match form: per
  * key, `A → B within T, with no C strictly between` — the
  * MATCH_RECOGNIZE / CEP staple (funnel q68 counts ordered steps; this
  * binds the actual matched pair and enforces the negative guard).
  *
  * Composed entirely from [[AsofJoin.asofJoinForward]]: the earliest B
  * at/after each A (tolerance = the window), the earliest C at/after
  * each A, then a row-local verdict — B must exist inside the window
  * and the first C (if any) must not fall strictly before B. Two
  * union-carry passes on the key: linear, no pair-space join, no
  * per-key state machine (first-match semantics need only the two
  * earliest successors — a general regex CEP would need
  * `flatMapGroupsWithState`; this covers the overwhelmingly common
  * funnel-with-guard shape declaratively).
  *
  * Simultaneous timestamps (pinned by EventPatternSpec): B at A's
  * instant matches (`>=`); C at A's instant guards (it is "between" —
  * inclusive start); C at B's instant does NOT block (exclusive end).
  * B events sharing (key, ts) resolve to the max `idCol` (the
  * [[AsofJoin.latestPerKeyTime]] determinism rule).
  *
  * Output: every A row `(keyCol, a_id, a_ts)` plus `b_id`/`b_ts`
  * (null when unmatched) and `matched` (false when no B in window OR
  * the guard fired).
  */
object EventPattern {

  def firstMatch(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      aType: String,
      bType: String,
      guardType: String,
      within: Column): DataFrame = {
    val a = events.filter(col(typeCol) === aType)
      .select(col(keyCol), col(idCol).as("a_id"), col(tsCol).as("a_ts"))
      .withColumn(tsCol, col("a_ts"))
    val b = events.filter(col(typeCol) === bType)
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(col(idCol)).as("b_id"))
      .withColumn("b_ts", col(tsCol))
    val c = events.filter(col(typeCol) === guardType)
      .select(col(keyCol), col(tsCol)).distinct()
      .withColumn("c_ts", col(tsCol))

    val withB = AsofJoin.asofJoinForward(a, b, keyCol, tsCol,
      payloadCols = Seq("b_id", "b_ts"), inner = false,
      tolerance = Some((lt, rt) => rt <= lt + within))
    val withC = AsofJoin.asofJoinForward(withB, c, keyCol, tsCol,
      payloadCols = Seq("c_ts"), inner = false)

    withC.select(col(keyCol), col("a_id"), col("a_ts"),
      col("asof_b_id").as("b_id"), col("asof_b_ts").as("b_ts"),
      (col("asof_b_id").isNotNull &&
        (col("asof_c_ts").isNull || col("asof_c_ts") >= col("asof_b_ts")))
        .as("matched"))
  }
}
