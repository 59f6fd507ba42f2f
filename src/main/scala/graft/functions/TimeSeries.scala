package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Irregular-sample time-series resampling: the two staples every
  * metrics/markets pipeline reduces raw events to.
  *
  * Exactness discipline (the q138/q139 gates): values in integer
  * micro-units, durations in integer MICROSECONDS, so every aggregate
  * is exact 64-bit arithmetic; TWAP's single final divide takes two
  * exact integers — bit-identical across engines, like the Spearman
  * and median rules.
  */
object TimeSeries {

  /** Time-weighted average: each sample holds its value until the next
    * sample (step interpolation), so its weight is the gap to the
    * successor; the LAST sample of a group carries no weight (no
    * successor — the standard left-closed convention). Output per
    * group: `(g, twap_num, twap_den, twap)` with num/den the exact
    * integer sum of value×gap and gap (microseconds).
    *
    * Overflow: the `twap` statistic's own sum runs in double space
    * (exact below 2^53, never overflows), so the average stays
    * correct for multi-year × 10^9-unit series; the exact-integer
    * `twap_num` diagnostic rides try_* forms — exact while every
    * per-row product AND the Σ are int64-representable, NULL beyond,
    * never an abort. A PER-ROW product overflow poisons the whole
    * fold to NULL (see [[TryAgg]]) — SUM would otherwise skip the
    * overflowed row's NULL and report a wrong non-NULL partial sum;
    * the last sample's legitimately-NULL gap does NOT poison.
    *
    * ONE shuffle on `g` carries the lead window and the fold. */
  def twap(df: DataFrame, group: Column, value: Column, ts: Column,
      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(col("_g")).orderBy(col("_t"), col("_tb"))
    // null-valued samples are DROPPED before the gap computation: an
    // unfiltered null tick contributed its interval to twap_den while
    // sum skipped its product in twap_num — the average was silently
    // biased toward zero (one null in a feed halves the TWAP). With
    // the drop, the preceding sample's value holds across the gap.
    // (Engine note: the q138 oracle twin assumes non-null values, as
    // the testdata guarantees — on a nully feed this library function
    // is the defined semantics.)
    df.select(group.as("_g"), value.as("_v"),
        unix_micros(ts).as("_t"), tieBreak.as("_tb"))
      .filter(col("_v").isNotNull)
      .withColumn("_gap", lead(col("_t"), 1).over(w) - col("_t"))
      .groupBy(col("_g"))
      .agg(
        // poison flag: _v is non-null (filtered) and _gap's NULL on
        // the group's last row is legitimate — only a non-null-input
        // row whose product is NULL overflowed
        TryAgg.unlessOverflow(
          col("_gap").isNotNull &&
            try_multiply(col("_v"), col("_gap")).isNull,
          try_sum(try_multiply(col("_v"), col("_gap")))).as("twap_num"),
        sum(col("_gap")).as("twap_den"),
        // the statistic's weighted sum in double space (exact below
        // 2^53): the Long Σ v·gap_µs overflows 2^63 once a group
        // holds ~1e8 rows of 1e3-unit values at 1e6-µs gaps — and the
        // try_* twap_num diagnostic goes NULL there instead of
        // aborting or silently wrapping
        sum(col("_v").cast("double") * col("_gap")).as("_twapd"))
      .select(col("_g").as("g"), col("twap_num"), col("twap_den"),
        when(coalesce(col("twap_den"), lit(0L)) === 0,
          lit(null).cast("double"))
          .otherwise(col("_twapd") /
            col("twap_den").cast("double")).as("twap"))
  }

  /** One-sided CUSUM changepoint score over bucketed series — the
    * classic drift detector (Page '54): S_t = max(0, S_{t−1} + (x_t −
    * target)), alarm when S crosses a threshold. The recursion is
    * non-associative, but it has a WINDOW-ONLY closed form:
    *   S_t = P_t − min(0, min_{j≤t} P_j),  P = running Σ(x − target)
    * so two cumulative windows over ONE shuffle compute it — no fold,
    * no collect, exact 64-bit integers when x and target are integral
    * (the q140 gate). Monitors ingest volumes, error rates, quality
    * score counts — the pipeline-health twin of q76's value-level
    * anomaly screen.
    *
    * Input: one row per (group, bucket) with the bucket measure `x`
    * and the per-row `target` (pre-join a per-group baseline).
    * Output: (g, bucket, x, cusum). */
  def cusum(df: DataFrame, group: Column, bucket: Column, x: Column,
      target: Column): DataFrame = {
    val w = Window.partitionBy(col("_g")).orderBy(col("_b"))
    df.select(group.as("_g"), bucket.as("_b"), x.as("_x"),
        target.as("_k"))
      .withColumn("_pref", sum(col("_x") - col("_k")).over(w))
      .withColumn("cusum",
        col("_pref") - least(lit(0L), min(col("_pref")).over(w)))
      .select(col("_g").as("g"), col("_b").as("bucket"),
        col("_x").as("x"), col("cusum"))
  }

  /** OHLC bars: per (group, bucket) the opening value (first by time,
    * tie-broken), closing value (last), high, low, and sample count —
    * candlestick resampling. `min_by`/`max_by` on a `(time, tieBreak)`
    * struct: ordinary aggregates, so map-side partial aggregation
    * applies and NO window sort materializes (the row_number
    * formulation sorts every bucket; this one merges candidates). */
  def ohlc(df: DataFrame, group: Column, bucket: Column, value: Column,
      ts: Column, tieBreak: Column): DataFrame = {
    val ord = struct(col("_t"), col("_tb"))
    df.select(group.as("g"), bucket.as("bucket"), value.as("_v"),
        ts.as("_t"), tieBreak.as("_tb"))
      .groupBy(col("g"), col("bucket"))
      .agg(
        min_by(col("_v"), ord).as("open"),
        max_by(col("_v"), ord).as("close"),
        max(col("_v")).as("high"),
        min(col("_v")).as("low"),
        count(lit(1)).as("n"))
  }
}
