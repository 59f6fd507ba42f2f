package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{DistinctSketch, QuantileSketch, TextFunctions}

/** Incremental corpus profile — the streaming twin of
  * [[graft.functions.CorpusProfile]], and the streaming USE of the
  * sketch-state lifecycle: each micro-batch folds to one state row per
  * slice (doc/token counters, an HLL vocabulary state, a KLL
  * token-length ladder state), which merges into the stored state
  * table by the sketches' own merge aggregators. The card over
  * everything-seen-so-far is answerable at any moment WITHOUT
  * rescanning history — a year of crawl batches is 365 merges of
  * kilobyte states.
  *
  * Drive from `foreachBatch`. Correctness properties (pinned by
  * StreamingProfileSpec):
  *  - after any batch sequence, [[profile]] equals the BATCH profile
  *    of the concatenated input (counters are sums; both sketch
  *    families are merge-closed, so state round-trips lose nothing);
  *  - state advances by the same atomic generation swap as
  *    [[StreamingCdc]] (crash-safe, adopt-last-complete);
  *  - state size is |slices| rows × fixed sketch bytes — never
  *    row-scaled.
  *
  * NOT idempotent under batch replay (counters double-count; HLL
  * would not, but the card must stay consistent) — drive it from a
  * checkpointed stream where foreachBatch replays carry the same
  * batchId, and skip already-applied ids via [[appliedBatchId]].
  */
final class StreamingProfile(
    spark: SparkSession,
    stateDir: String,
    vocabP: Int = 12,
    vocabSparseMax: Int = 16384,
    lenK: Int = 4096) {

  private def fs = new org.apache.hadoop.fs.Path(stateDir)
    .getFileSystem(spark.sessionState.newHadoopConf())
  private def path(s: String) = new org.apache.hadoop.fs.Path(s)

  private def recover(): Unit = {
    val live = path(stateDir)
    if (!fs.exists(live)) {
      if (fs.exists(path(stateDir + ".next/_SUCCESS")))
        GenerationSwap.renameOrThrow(fs, path(stateDir + ".next"), live)
      else if (fs.exists(path(stateDir + ".old")))
        GenerationSwap.renameOrThrow(fs, path(stateDir + ".old"), live)
    }
  }

  private def hasState: Boolean = {
    recover()
    fs.exists(path(stateDir)) &&
      fs.listStatus(path(stateDir)).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Stored per-slice states (slice, n_docs, n_tokens, batch_id,
    * vocab_st, len_st). */
  def state: Option[DataFrame] =
    if (hasState) Some(spark.read.parquet(stateDir)) else None

  /** Highest batch id folded in so far (−1 before any). */
  def appliedBatchId: Long =
    state.map(_.agg(max(col("batch_id"))).head.getLong(0)).getOrElse(-1L)

  private def batchStates(batch: DataFrame, batchId: Long): DataFrame = {
    val perDoc = batch
      .withColumn("_toks", TextFunctions.tokens(col("text")))
      .select(col("slice"), col("_toks"),
        size(col("_toks")).cast("long").as("_ntok"))
    val doc = perDoc.groupBy(col("slice")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("_ntok")).as("n_tokens"),
      QuantileSketch.sketchState(col("_ntok").cast("double"), lenK)
        .as("len_st"))
    val voc = perDoc.select(col("slice"), explode(col("_toks")).as("_t"))
      .groupBy(col("slice"))
      .agg(DistinctSketch.sketchState(xxhash64(col("_t")), vocabP,
        vocabSparseMax).as("vocab_st"))
    // left join: a slice whose batch docs all tokenize to zero tokens
    // still appears in doc but not in voc
    doc.join(voc, Seq("slice"), "left")
      .withColumn("vocab_st", coalesce(col("vocab_st"),
        typedlit(Array(0L, 0L))))
      .withColumn("batch_id", lit(batchId))
  }

  /** Fold one micro-batch of (slice, text) rows. Skips batch ids at or
    * below [[appliedBatchId]] (foreachBatch replay safety). */
  def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= appliedBatchId || batch.isEmpty) return
    val incoming = batchStates(batch, batchId)
    val merged = state match {
      case None => incoming
      case Some(st) => st.unionByName(incoming)
        .groupBy(col("slice"))
        .agg(
          sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          QuantileSketch.mergeState(col("len_st"), lenK).as("len_st"),
          DistinctSketch.mergeState(col("vocab_st"), vocabP,
            vocabSparseMax).as("vocab_st"),
          max(col("batch_id")).as("batch_id"))
    }
    // checked swap (GenerationSwap): a false rename/delete fails the
    // batch for retry instead of silently dropping its counts
    val next = stateDir + ".next"
    GenerationSwap.deleteIfExists(fs, path(next))
    merged.write.mode("overwrite").parquet(next)
    GenerationSwap.promote(fs, stateDir)
  }

  /** The dataset card over everything folded so far: (slice, n_docs,
    * n_tokens, vocab, med_tokens). */
  def profile: Option[DataFrame] = state.map(_
    .groupBy(col("slice"))
    .agg(
      sum(col("n_docs")).cast("long").as("n_docs"),
      sum(col("n_tokens")).cast("long").as("n_tokens"),
      DistinctSketch.mergeEstimate(col("vocab_st"), vocabP,
        vocabSparseMax).as("vocab"),
      QuantileSketch.mergeQuantiles(col("len_st"), lenK, Seq(0.5))
        .as("_q"))
    .select(col("slice"), col("n_docs"), col("n_tokens"), col("vocab"),
      element_at(col("_q"), 1).cast("long").as("med_tokens")))

  /** Distribution-drift screen for an INCOMING batch against the
    * stored history — the streaming use of q153's KS idea, served
    * from sketch states so no history rescan happens: per slice
    * present on both sides, the token-length quantile ladder of the
    * batch vs the merged historical state, with the max relative gap
    * as the alert score. A scraper change or spam burst shifts the
    * incoming length distribution before it shifts means — run this
    * BEFORE folding the batch in ([[applyBatch]]), gate ingestion on
    * the score.
    *
    * The ladder alone is LENGTH-blind to content: a template swap or
    * language flip that preserves token counts sails through it. The
    * second dimension closes that hole from the HLL states the
    * profile already keeps: `vocab_novelty` = (|hist ∪ batch| −
    * |hist|) / |batch| by inclusion–exclusion over the merged
    * vocabulary sketches (the q125 overlap machinery) — ≈0 when the
    * batch's vocabulary is already known, →1 as it diverges, at zero
    * extra state.
    *
    * Output: (slice, q, hist_v, batch_v, rel_gap, vocab_novelty) —
    * one row per requested quantile (vocab_novelty is per-slice,
    * repeated); alert on max(rel_gap) and on vocab_novelty. In the
    * exact regime (lenK >= group sizes, HLL sparse regime) ladders
    * are exact order statistics and the novelty is exact-set
    * arithmetic, so StreamingProfileSpec pins planted shifts
    * deterministically. Cost: the batch folds once (one eager
    * materialization, three consumers); history is |state rows|
    * kilobyte states — no corpus data moves. */
  def drift(batch: DataFrame,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9)): Option[DataFrame] =
    state.map { st =>
      val bs = batchStates(batch, -1L).localCheckpoint(true)
      val ladder = StreamingProfile.ladderGap(
        st.select(col("slice"), col("len_st")),
        bs.select(col("slice"), col("len_st")), lenK, qs)
      val histVoc = st.groupBy(col("slice"))
        .agg(DistinctSketch.mergeEstimate(col("vocab_st"), vocabP,
          vocabSparseMax).as("_hv"))
      val batchVoc = bs.groupBy(col("slice"))
        .agg(DistinctSketch.mergeEstimate(col("vocab_st"), vocabP,
          vocabSparseMax).as("_bv"))
      val unionVoc = st.select(col("slice"), col("vocab_st"))
        .unionByName(bs.select(col("slice"), col("vocab_st")))
        .groupBy(col("slice"))
        .agg(DistinctSketch.mergeEstimate(col("vocab_st"), vocabP,
          vocabSparseMax).as("_uv"))
      val novelty = histVoc.join(batchVoc, Seq("slice"))
        .join(unionVoc, Seq("slice"))
        .select(col("slice"),
          when(col("_bv") === 0, lit(0.0))
            // clamp: estimator noise can put |union| a hair outside
            // [|hist|, |hist|+|batch|]; novelty is a ratio in [0,1]
            .otherwise(least(lit(1.0), greatest(lit(0.0),
              (col("_uv") - col("_hv")).cast("double") / col("_bv"))))
            .as("vocab_novelty"))
      ladder.join(novelty, Seq("slice"))
    }
}

object StreamingProfile {

  /** The drift screen's ladder comparison, factored so the q157
    * oracle gate runs the SAME code as [[StreamingProfile.drift]]:
    * given two per-slice relations of (slice, len_st) sketch states,
    * merge each side's ladder and emit (slice, q, hist_v, batch_v,
    * rel_gap) — one row per requested quantile, rel_gap =
    * |h−b| / max(|h|,|b|) (0 when both sides are 0). */
  def ladderGap(hist: DataFrame, cur: DataFrame, lenK: Int,
      qs: Seq[Double]): DataFrame = {
    val h = hist.groupBy(col("slice"))
      .agg(QuantileSketch.mergeQuantiles(col("len_st"), lenK, qs)
        .as("hist_q"))
    val c = cur.groupBy(col("slice"))
      .agg(QuantileSketch.mergeQuantiles(col("len_st"), lenK, qs)
        .as("batch_q"))
    val qsCol = array(qs.map(lit): _*)
    h.join(c, Seq("slice"))
      .select(col("slice"), posexplode(
        zip_with(col("hist_q"), col("batch_q"),
          (hv, bv) => struct(hv.as("h"), bv.as("b")))))
      .select(col("slice"),
        element_at(qsCol, col("pos") + 1).as("q"),
        col("col.h").as("hist_v"), col("col.b").as("batch_v"),
        when(greatest(abs(col("col.h")), abs(col("col.b"))) === 0,
          lit(0.0))
          .otherwise(abs(col("col.h") - col("col.b")) /
            greatest(abs(col("col.h")), abs(col("col.b"))))
          .as("rel_gap"))
  }
}
