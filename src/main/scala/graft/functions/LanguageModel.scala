package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet/KenLM
  * quality signal, self-hosted: train bigram statistics ON the corpus
  * being curated and score each slice's cross-entropy under them. A
  * slice whose text is "surprising" to the corpus-wide model (high
  * cross-entropy) is noise/boilerplate/encoding damage; a slice far
  * BELOW the mean is template spam. No external model file needed, so
  * the operator runs anywhere the corpus does.
  *
  * Model = two aggregate tables (bigram counts, left-context counts)
  * plus the vocabulary size. At 100 TB these are corpus-vocab-sized —
  * millions of rows — so they are NEVER broadcast or collected: scoring
  * joins them back on their natural keys (hash shuffle on `bigram`,
  * then on `w1`). Token-frequency skew ("the", "of" dominate both join
  * keys) is the classic AQE-skew-split case — both joins are
  * aggregated-build-side equi-joins, exactly the shape AQE handles.
  *
  * Probabilities are add-one smoothed: p(b|a) = (c2(ab)+1)/(c1(a)+V).
  * All counts are exact integers; the single float op (ln) happens
  * last, which keeps the DuckDB oracle decision-identical.
  */
object LanguageModel {

  /** Per-occurrence bigram table (group, w1, bigram) — one tokenize,
    * one zip with the array tail, one explode. Equal-length slices:
    * concat_ws skips the null zip_with pads with, which would otherwise
    * smuggle a unigram row in for the last token (q69's rule). */
  private def bigrams(tk: DataFrame): DataFrame =
    tk.select(col("g"), col("tk"),
        explode(zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("bigram")))).as("p"))
      .select(col("g"), col("p.w1").as("w1"), col("p.bigram").as("bigram"))

  /** Per-group cross-entropy under the corpus-wide bigram model:
    * `(g, n_bigrams, xent)` where
    * `xent = -mean(ln((c2+1)/(c1+V)))` over the group's bigram
    * occurrences. Natural-language slices land in a tight band; spam,
    * boilerplate, and encoding damage stand off it on either side.
    *
    * Scale shape: the TOKEN table pins once (localCheckpoint) and
    * feeds all four consumers — the two bigram count aggregations, the
    * scoring join, and the vocabulary scan (which previously paid a
    * second full tokenize of the corpus); each bigram consumer re-runs
    * only the linear explode over the pinned arrays. For a multi-job
    * pipeline (train once, score many), write [[bigrams]] to parquet
    * instead — same math, durable model. The count joins are 1:1
    * (aggregated right sides), so row multiplicity is exact. */
  def bigramCrossEntropy(docs: DataFrame, group: Column): DataFrame = {
    // ONE tokenize pass, widened: the pinned relation is the token
    // ARRAYS (smaller than the per-occurrence bigram rows the previous
    // shape pinned), the regex runs once instead of twice (the
    // vocabulary scan used to re-tokenize the corpus), and on a
    // single-row-group small-SF scan the pass runs parallel instead of
    // single-task (DedupFunctions.widen — identity at production file
    // counts). The three bigram consumers re-run only the cheap
    // explode over the pinned arrays.
    val tk = DedupFunctions
      .widen(docs.select(group.as("g"), col("text")))
      .select(col("g"), TextFunctions.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .localCheckpoint()
    val bg = bigrams(tk)
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
    val c2 = bg.groupBy(col("bigram")).agg(count(lit(1)).as("n2"))
    // vocabulary over ALL token positions of the modeled docs (one row;
    // joins in as a literal-like broadcast — a scalar, not a model)
    val v = tk
      .select(explode(col("tk")).as("tok"))
      .agg(countDistinct(col("tok")).as("vocab"))
    bg.join(c2, "bigram").join(c1, "w1").crossJoin(broadcast(v))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (-sum(log((col("n2") + lit(1.0)) / (col("n1") + col("vocab"))))
          / count(lit(1))).as("xent"))
  }
}
