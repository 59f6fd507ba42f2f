package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-slice corpus profile — the "dataset card" table every training
  * run starts from: document and token volumes, vocabulary size,
  * exact median document length, short-document and language counts,
  * per slice (source / dump / shard).
  *
  * Composition of the engine's own primitives, TWO passes over the
  * corpus — a doc-level rollup (counts + exact rank-pick median over
  * a window keyed by the slice) and a token-level vocabulary fold
  * ([[DistinctSketch]] over codegen'd xxhash64 — register arrays
  * shuffle, tokens don't); within each pass the token array
  * materializes once per doc and feeds every consumer. The two
  * slice-keyed frames join at control-plane size. (A single-pass form
  * would need one custom aggregator carrying per-doc maps AND HLL
  * registers — heavier state for no shuffle saved; for a
  * no-rescan regime use [[graft.streaming.StreamingProfile]], which
  * pays its passes once per micro-batch and answers from states.)
  *
  * Exactness: every output is an integer; vocab is exact in the
  * sketch's sparse regime (gate scale) and a 1.6%-bounded estimate
  * past it — the honest number a 100 TB card carries.
  */
object CorpusProfile {

  def profile(
      docs: DataFrame,
      slice: Column,
      text: Column,
      langMarkers: Seq[(String, Seq[String])],
      shortDocTokens: Int = 20,
      vocabP: Int = 12,
      vocabSparseMax: Int = 16384): DataFrame = {
    val perDoc = docs
      .select(slice.as("slice"), text.as("_text"))
      .withColumn("_toks", TextFunctions.tokens(col("_text")))
      .select(col("slice"), col("_toks"),
        size(col("_toks")).cast("long").as("_ntok"),
        TextFunctions.langIdFromTokens(
          array_distinct(col("_toks")), langMarkers).as("_lang"))

    val w = Window.partitionBy(col("slice"))
    val ranked = perDoc
      .withColumn("_rk", row_number().over(w.orderBy(col("_ntok"))))
      .withColumn("_n", count(lit(1)).over(w))
    val docStats = ranked.groupBy(col("slice")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("_ntok")).as("n_tokens"),
      // q70's middle-element rule; `div` (integer), NOT `/` (double)
      max(when(col("_rk") === expr("(_n + 1) div 2"), col("_ntok")))
        .as("med_tokens"),
      sum(when(col("_ntok") < shortDocTokens, 1L).otherwise(0L))
        .as("n_short"),
      sum(when(col("_lang") === "en", 1L).otherwise(0L)).as("n_en"))

    val vocab = perDoc
      .select(col("slice"), explode(col("_toks")).as("_t"))
      .groupBy(col("slice"))
      .agg(DistinctSketch.sketch(xxhash64(col("_t")), vocabP, vocabSparseMax)
        .as("vocab"))

    // LEFT join: a slice whose documents ALL tokenize to zero tokens
    // (binary garbage, a corrupted feed) produces doc rows but no
    // vocab row — the inner join dropped exactly the slice a dataset
    // card most needs to surface. Same guard as
    // StreamingProfile.batchStates; the empty-sparse sketch state
    // estimates 0 distinct.
    docStats.join(vocab, Seq("slice"), "left")
      .withColumn("vocab", coalesce(col("vocab"), lit(0L)))
  }
}
