package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental language-mix maintenance for the drift screen's χ²
  * dimension — q158's source×lang contingency table kept as STORED
  * mergeable state instead of re-folding the whole corpus per epoch
  * (the q183/q184 continuous-ingestion discipline applied to the
  * drift screen, whose χ² input was previously last-batch-only).
  *
  * The state is the exact sufficient statistic for the test: per-cell
  * counts (source, lang, o). Counts are trivially mergeable (sum), so
  * an epoch folds ONLY its own slice — one shuffle over the slice —
  * and merges with state in a second, control-plane-sized shuffle
  * (≤ sources × langs rows, the sketch-shelf store/merge lifecycle
  * shape). [[chisq]] then serves the full q158 output (dense grid,
  * marginals, per-cell χ² terms) from state alone: zero history
  * rescan, cost independent of corpus age.
  *
  * Scale: state is #sources × #langs rows — control-plane, broadcast-
  * able everywhere it is joined; the slice fold partial-aggregates
  * map-side before its one shuffle; the dense grid inside [[chisq]]
  * is distinct-sources × distinct-langs (same control-plane bound).
  * Arithmetic bounds are q158's and documented there (double-space
  * terms exact below 2^53; Long `diff` diagnostic rides try_* forms).
  */
object LangMix {

  /** Zero-cell starting state in the canonical schema. */
  def emptyState(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("source", StringType),
        StructField("lang", StringType),
        StructField("o", LongType))))
  }

  /** One incremental step: fold `slice`'s (source, lang) counts and
    * merge into `state`. NULL lang normalizes to "(null)" at the fold
    * (q158's rule: Spark equi-joins drop NULL keys while the oracle
    * grid keeps them — normalize BEFORE the key is ever joined on).
    * Returns the next state; running from [[emptyState]] over one
    * slice is exactly q158's cells fold on that slice. */
  def observeIncrement(state: DataFrame, slice: DataFrame,
      sourceCol: String = "source", langCol: String = "lang"): DataFrame = {
    val st = state.select(col("source").cast("string").as("source"),
      col("lang").cast("string").as("lang"), col("o").cast("long").as("o"))
    val inc = slice
      .groupBy(col(sourceCol).cast("string").as("source"),
        coalesce(col(langCol).cast("string"), lit("(null)")).as("lang"))
      .agg(count(lit(1)).as("o"))
    // union + re-fold, not a full-outer join: the merge input is two
    // control-plane-sized cell sets, and the fold is the same exact
    // mergeable-count shape every sketch in the shelf uses
    st.unionByName(inc)
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("o")).as("o"))
  }

  /** The χ² drift screen served from cell state — q158's computation
    * verbatim (q158 calls this on its one-shot fold; the incremental
    * path calls it on merged state): dense source×lang grid (a cell a
    * source has ZERO docs of still contributes — its absence is the
    * evidence), marginals, per-cell terms. Output ordered (source,
    * lang) with q158's exact column set. */
  def chisq(cells0: DataFrame): DataFrame = {
    val cells = cells0
      .localCheckpoint(true) // 4 consumers: grid ×2, marginals, cells
    val rowT = cells.groupBy(col("source")).agg(sum(col("o")).as("n_s"))
    val colT = cells.groupBy(col("lang")).agg(sum(col("o")).as("c_c"))
    val nT = cells.agg(sum(col("o")).as("n_g"))
    cells.select(col("source")).distinct()
      .crossJoin(broadcast(cells.select(col("lang")).distinct()))
      .join(cells, Seq("source", "lang"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .join(broadcast(rowT), Seq("source"))
      .join(broadcast(colT), Seq("lang"))
      .crossJoin(broadcast(nT))
      .withColumn("n_r", col("n_g") - col("n_s"))
      .withColumn("diff", try_subtract(
        try_multiply(col("o"), col("n_r")),
        try_multiply(col("c_c") - col("o"), col("n_s"))))
      // the chi-square term runs in double space (exact below 2^53):
      // the Long denominator n_s·n_r·c_c is an N³ product that
      // overflows 2^63 already around ~2e6 docs per source/lang
      // margin — far below crawl scale — an ANSI abort by default,
      // silent term corruption under ansi=false. The Long `diff`
      // diagnostic rides try_* forms: exact while int64-representable,
      // NULL beyond — never an abort
      .withColumn("diffd",
        col("o").cast("double") * col("n_r") -
          (col("c_c") - col("o")).cast("double") * col("n_s"))
      .withColumn("term",
        when(col("n_s") === 0 || col("n_r") === 0, lit(0.0))
          .otherwise((col("diffd") * col("diffd")) /
            (col("n_s").cast("double") * col("n_r") * col("c_c"))))
      .select(col("source"), col("lang"), col("o"), col("n_s"),
        col("c_c"), col("diff"), col("term"))
      .orderBy(col("source"), col("lang"))
  }
}
