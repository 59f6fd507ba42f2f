package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cavnar–Trenkle n-gram language identification ("N-Gram-Based Text
  * Categorization", SDAIR '94) — the classifier real pipelines use
  * where q24's marker-word heuristic is too coarse: per language a
  * ranked char-trigram PROFILE is trained from labeled seed text, and
  * a document classifies to the profile minimizing the OUT-OF-PLACE
  * distance (Σ rank displacement; missing trigram = max penalty).
  *
  * Deterministic by construction: ranks tie-break on the trigram
  * string, distances are exact integer sums, argmin tie-breaks on the
  * language — hash-gated end to end (q145), no probabilistic model
  * file.
  *
  * Scale shape: training is one explode + count + per-language top-K
  * window (profile tables are K×|langs| rows — control-plane); a
  * profile broadcast-joins the per-doc top-M grams, and the
  * (doc × lang) distance grid is M×|langs| rows per doc — linear in
  * the corpus, never all-pairs.
  */
object LangProfile {

  /** Char trigrams of canonicalized text (lowercase, non-alnum runs →
    * single space, trimmed): positions 1..len−2, the C-T unit. The
    * normalized string must be a materialized attribute — the lambda
    * re-evaluates captured trees per element. */
  def charTrigrams(norm: Column): Column =
    when(length(norm) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(norm) - 2),
        i => norm.substr(i, lit(3))))

  /** The canonical form feeding [[charTrigrams]]. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), lit("[^a-z0-9]+"), lit(" ")))

  /** Train: per language the top-`k` trigrams by frequency (count
    * desc, trigram asc) with their rank 1..k. */
  def trainProfiles(seed: DataFrame, langCol: Column, textCol: Column,
      k: Int): DataFrame = {
    // widen before the normalize+trigram explode: a single-row-group
    // small-SF scan otherwise runs the whole per-char pipeline in one
    // task (DedupFunctions.widen — identity at production file counts)
    val grams = DedupFunctions
      .widen(seed.select(langCol.as("lang"), textCol.as("_t")))
      .select(col("lang"), normalize(col("_t")).as("_n"))
      .select(col("lang"), explode(charTrigrams(col("_n"))).as("gram"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("gram"))
    grams.groupBy(col("lang"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("lang"), col("gram"), col("rank").cast("long").as("rank"))
  }

  /** Classify: per doc the top-`m` trigrams rank against every
    * language profile; out-of-place distance = Σ |doc rank − profile
    * rank|, `k` where the profile lacks the gram; argmin with
    * language-ascending tie-break. Docs with no trigrams get no row.
    * Output: (idCol, pred, dist). */
  def classify(docs: DataFrame, idCol: String, textCol: Column,
      profiles: DataFrame, k: Int, m: Int): DataFrame = {
    // same width discipline as trainProfiles
    val grams = DedupFunctions
      .widen(docs.select(col(idCol), textCol.as("_t")))
      .select(col(idCol), normalize(col("_t")).as("_n"))
      .select(col(idCol), explode(charTrigrams(col("_n"))).as("gram"))
    val wDoc = Window.partitionBy(col(idCol))
      .orderBy(col("cnt").desc, col("gram"))
    val docTop = grams.groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("drank", row_number().over(wDoc))
      .filter(col("drank") <= m)
      .select(col(idCol), col("gram"), col("drank").cast("long").as("drank"))
    val langs = profiles.select(col("lang")).distinct()
    docTop.crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("lang", "gram"), "left")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(coalesce(abs(col("drank") - col("rank")), lit(k.toLong)))
        .as("dist"))
      .groupBy(col(idCol))
      .agg(min_by(struct(col("lang"), col("dist")),
        struct(col("dist"), col("lang"))).as("_b"))
      .select(col(idCol), col("_b.lang").as("pred"), col("_b.dist").as("dist"))
  }
}
