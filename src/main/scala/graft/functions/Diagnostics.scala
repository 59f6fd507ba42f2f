package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight shuffle diagnostics: the audits a pipeline runs BEFORE
  * committing to a partitioning/join strategy at 100 TB. Cheap by
  * construction — every profile is an aggregation over the key
  * columns only (column-pruned scan, one shuffle), never a
  * materialization of the data being profiled.
  */
object Diagnostics {

  /** Group-size histogram for a prospective shuffle/join key, bucketed
    * by decimal magnitude (1-9, 10-99, ...): how skewed is this key,
    * and how hot is the hottest group? Read it before choosing between
    * a plain shuffle, `broadcast`, [[graft.operators.SkewJoin]]
    * salting, or AQE skew splitting. Two shuffles total: the per-key
    * count and the (tiny, |magnitudes|-row) histogram roll-up. */
  def keyLoadProfile(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("k"))
      .agg(count(lit(1)).as("n"))
      .groupBy(length(col("n").cast("string")).as("magnitude"))
      .agg(count(lit(1)).as("n_keys"), max(col("n")).as("max_group"),
        sum(col("n")).as("n_rows"))
      .orderBy(col("magnitude"))

  /** Robust per-group outlier screen: median / MAD (median absolute
    * deviation), the mean/stddev profile that survives heavy tails —
    * a value-column audit for metric streams and label columns where
    * one bad feed would drag a z-score's own baseline with it. Both
    * centers are EXACT rank-picks (q70's middle-element rule, never
    * interpolation — engine-portable to the bit); a row is an outlier
    * when `dev > k * mad`.
    *
    * Scale shape: ONE hash shuffle on `group` carries all four window
    * passes (rank by value, group count, rank by deviation, the two
    * center broadcasts are `max(when(rk = pick))` analytic columns over
    * the SAME partitioning — no self-join, no re-reference of the
    * scan), then a per-group fold. Sorts are per-partition. */
  def robustOutliers(df: DataFrame, group: Column, value: Column,
      tieBreak: Column, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wG = Window.partitionBy(col("g"))
    val wVal = wG.orderBy(col("v"), col("tb"))
    val wDev = wG.orderBy(col("dev"), col("tb"))
    // null values are SKIPPED, the SQL-aggregate rule: ascending sort
    // is NULLS FIRST, so an unfiltered null row would consume rank 1,
    // inflate n_g, and shift (or null out) the rank-picked median/MAD
    df.select(group.as("g"), tieBreak.as("tb"), value.as("v"))
      .filter(col("v").isNotNull)
      .withColumn("rk", row_number().over(wVal))
      .withColumn("n_g", count(lit(1)).over(wG))
      .withColumn("med", max(when(expr("rk = (n_g + 1) div 2"), col("v"))).over(wG))
      .withColumn("dev", abs(col("v") - col("med")))
      .withColumn("rk2", row_number().over(wDev))
      .withColumn("mad", max(when(expr("rk2 = (n_g + 1) div 2"), col("dev"))).over(wG))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev") > lit(k.toDouble) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        max(col("med")).as("med"), max(col("mad")).as("mad"))
  }

  /** Per-group Gini coefficient — the concentration/inequality profile
    * of a distribution ("is this source's token mass a few giant docs
    * or an even spread?"): 0 = perfectly even, →1 = one row holds
    * everything. Data-balance diagnostics for corpus mixing: a source
    * whose contribution is Gini-concentrated is one boilerplate giant,
    * not a diverse corpus.
    *
    * Determinism discipline: with tie-broken ranks i = 1..n (asc by
    * value) the classic estimator G = (2Σi·x − (n+1)Σx) / (n·Σx)
    * folds to sums computed in double space — exact below 2^53, so
    * bit-identical cross-engine at every oracle scale (q141), and
    * never overflowing at corpus scale (the Long form aborts under
    * ANSI past 2^63, around ~1e9 rows × 1e4-unit values). Requires
    * non-negative values (negative mass makes Gini undefined);
    * n·Σx = 0 yields null.
    *
    * One shuffle on `group` carries the rank window and the fold. */
  def gini(df: DataFrame, group: Column, value: Column,
      tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_g")).orderBy(col("_v"), col("_tb"))
    // null values skipped (the SQL-aggregate rule): a null row would
    // consume rank 1 and inflate n while contributing nothing to the
    // sums — [null, 1, 1] read gini 0.333 instead of 0
    df.select(group.as("_g"), value.as("_v"), tieBreak.as("_tb"))
      .filter(col("_v").isNotNull)
      .withColumn("_i", row_number().over(w).cast("long"))
      .groupBy(col("_g"))
      // the rank-weighted sum and the num/den run in DOUBLE space
      // (exact below 2^53, never overflows): the Long Σ i·v is an
      // n²·v̄ quantity that overflows 2^63 around ~1e9 rows ×
      // 1e4-unit values — far below corpus scale — an ANSI abort by
      // default, silent gini corruption under ansi=false
      .agg(count(lit(1)).as("n"), sum(col("_v")).as("_s"),
        sum(col("_i").cast("double") * col("_v")).as("_w"))
      .select(col("_g").as("g"), col("n"), {
        val num = lit(2.0) * col("_w") -
          (col("n") + 1).cast("double") * col("_s")
        val den = col("n").cast("double") * col("_s")
        when(den === 0.0, lit(null).cast("double"))
          .otherwise(num / den).as("gini")
      })
  }

  /** Null repair by per-group exact median — the imputation step of a
    * feature/metric pipeline (mean imputation drags with outliers; the
    * rank-pick median is robust AND engine-exact, q70's middle-element
    * rule). Appends the columns `imputed` (original where present,
    * group median where null) and `was_null` — fixed names, pinned by
    * ImputeSpec and guarded against collisions below; impute one
    * value column per call.
    *
    * ONE hash shuffle on `group` carries everything: non-null rows
    * rank ahead of nulls in the same window sort, the median is the
    * `(cnt+1) div 2`-ranked non-null, and both the pick and the
    * group-broadcast are analytic columns over the SAME partitioning —
    * no join-back, no second scan. A group with no non-null values
    * keeps its nulls (imputing from nothing is a caller policy).
    */
  def imputeGroupMedian(df: DataFrame, group: Column, value: Column,
      tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Unlike the select-first helpers below (twap/gini/spearman project
    // into a fresh schema, so their internal names can't collide), this
    // one appends working columns to the ORIGINAL frame and re-selects
    // the caller's columns at the end — an input column named like an
    // internal would be silently overwritten and returned corrupted.
    // Guard all of them, mirroring Merge/TableDiff's reserved names.
    val reserved = Seq("imputed", "was_null", "_g", "_v", "_tb", "_rn",
      "_cnt", "_med")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"column names ${clash.mkString(", ")} are reserved by imputeGroupMedian")
    val cols = df.columns.toSeq
    val wG = Window.partitionBy(col("_g"))
    val ranked = df
      .withColumn("_g", group).withColumn("_v", value)
      .withColumn("_tb", tieBreak)
      .withColumn("_rn", row_number().over(
        wG.orderBy(col("_v").isNull, col("_v"), col("_tb"))))
      .withColumn("_cnt", count(col("_v")).over(wG))
    val vName = "_v"
    ranked
      // `div` (integer), NOT `/` (double — an even group's 2.5 would
      // match no rank and silently null the median)
      .withColumn("_med", max(when(
        col("_rn") === expr("(_cnt + 1) div 2") && col(vName).isNotNull,
        col(vName))).over(wG))
      .withColumn("imputed", coalesce(col(vName), col("_med")))
      .withColumn("was_null", col(vName).isNull)
      .select(cols.map(col) :+ col("imputed") :+ col("was_null"): _*)
  }

  /** Per-group Spearman rank correlation — the monotone-association
    * profile that survives outliers and nonlinearity (is `value`
    * drifting with time? does doc length track quality?). Ranks are
    * made INTEGER by a deterministic tie-break (ties get distinct ranks
    * in `tieBreak` order — feeds must provide a unique one), so both
    * rank columns are permutations of 1..n and the classical form
    * applies with EXACT integer aggregates:
    *   ρ = 1 − 6·Σ(rx−ry)² / (n·(n²−1))
    * The fold and the denominator run in DOUBLE space: exact below
    * 2^53 — bit-identical across engines at every oracle scale (the
    * q131 gate), the same discipline as gini — and never overflowing
    * at corpus scale. The Long forms (Σd² ≤ n³/3 and n·(n²−1)) abort
    * under ANSI already at n ≈ 2–3 M rows per group, far below a
    * per-source group at crawl scale; past 2^53 the double form
    * rounds at ~1e-16 relative, noise for a correlation.
    *
    * Scale shape: ONE hash shuffle on `group` carries both rank
    * windows (per-partition sorts), then a per-group fold to two
    * integers. Output: (g, n, rho); n < 2 yields null rho. */
  def spearman(df: DataFrame, group: Column, x: Column, y: Column,
      tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wG = Window.partitionBy(col("g"))
    val d = col("rx") - col("ry")
    // pairwise-complete rule (every statistics package's default): a
    // row with a null x or y is skipped — unfiltered, NULLS FIRST
    // ordering would hand it rank 1 and corrupt every rho in the group
    df.select(group.as("g"), x.as("x"), y.as("y"), tieBreak.as("tb"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .withColumn("rx",
        row_number().over(wG.orderBy(col("x"), col("tb"))).cast("long"))
      .withColumn("ry",
        row_number().over(wG.orderBy(col("y"), col("tb"))).cast("long"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(d.cast("double") * d).as("sd2"))
      .select(col("g"), col("n"), {
        val nd = col("n").cast("double")
        val den = nd * (nd * nd - lit(1.0))
        when(den === 0.0, lit(null).cast("double"))
          .otherwise(lit(1.0) - lit(6.0) * col("sd2") / den)
          .as("rho")
      })
  }
}
