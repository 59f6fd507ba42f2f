package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history: collapse a per-key event
  * stream into validity intervals `[valid_from, valid_to)` — one row
  * per VALUE RUN, not per event (consecutive events carrying the same
  * value merge into one interval; `valid_to` is null on each key's
  * current row). The standard shape for dimension history in a
  * warehouse and for "state as of t" joins (compose with
  * [[AsofJoin]] to time-travel).
  *
  * Shape: ONE hash shuffle on the key carries all three passes (lag to
  * detect changes, filter, lead for interval ends) — the two windows
  * share the partitioning, so Catalyst plans a single Exchange with
  * two Sort+Window operators over it. No self-join, no global sort;
  * per-key history length is the only memory bound, the same bound any
  * SCD2 formulation has.
  */
object Scd2 {

  /** `(key, value, valid_from, valid_to)` intervals from an event log.
    * `tieBreak` orders same-timestamp events deterministically (retry/
    * replay safety — an ambiguous order would flap run boundaries). */
  def history(df: DataFrame, key: Column, ts: Column, value: Column,
      tieBreak: Column): DataFrame = {
    val byTime = Window.partitionBy(col("k")).orderBy(col("t"), col("tb"))
    // the tie-break must survive into the SECOND window too: two value
    // changes at the same timestamp otherwise sort ambiguously under
    // lead(), flapping which run appears superseded across retries —
    // the exact nondeterminism the tieBreak parameter exists to kill
    val byStart = Window.partitionBy(col("k")).orderBy(col("valid_from"), col("tb"))
    df.select(key.as("k"), ts.as("t"), value.as("v"), tieBreak.as("tb"))
      // run starts: first event of the key, or value differs from the
      // previous event (null-safe — a null value is a run like any
      // other; row_number disambiguates a null-valued FIRST row, which
      // lag alone cannot tell apart from a repeated null)
      .withColumn("rn", row_number().over(byTime))
      .withColumn("chg",
        col("rn") === 1 || !(col("v") <=> lag(col("v"), 1).over(byTime)))
      .filter(col("chg"))
      .select(col("k"), col("v"), col("t").as("valid_from"), col("tb"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .drop("tb")
  }
}
