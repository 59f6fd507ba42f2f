package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cavnar–Trenkle lang id: trigram extraction, profile ranking rules,
  * the out-of-place distance (penalty for missing grams), argmin
  * tie-break, and actual separation on genuinely distinct "languages".
  */
class LangProfileSpec extends SparkSpec {

  import spark.implicits._

  test("char trigrams: normalization, positions, short-text guard") {
    val got = Seq("AB-cd!", "ab", "").toDF("t")
      .select(LangProfile.charTrigrams(LangProfile.normalize(col("t"))).as("g"))
      .as[Seq[String]].collect().toList
    assert(got == List(Seq("ab ", "b c", " cd"), Seq(), Seq()))
  }

  test("profiles rank by count desc then gram asc, capped at k") {
    val seed = Seq(("x", "aaab"), ("x", "aaac")).toDF("lang", "text")
    // trigrams: aaa x2, aab, aac -> ranks: aaa=1, aab=2, aac=3
    val prof = LangProfile.trainProfiles(seed, col("lang"), col("text"), k = 2)
      .orderBy("rank").as[(String, String, Long)].collect().toList
    assert(prof == List(("x", "aaa", 1L), ("x", "aab", 2L)))
  }

  test("distinct trigram distributions classify correctly") {
    // two synthetic 'languages' with disjoint alphabets
    val seedA = (1 to 20).map(i => ("alpha", s"aba bab ab${i % 3}"))
    val seedB = (1 to 20).map(i => ("beta", s"xyx yxy xy${i % 3}"))
    val profiles = LangProfile.trainProfiles(
      (seedA ++ seedB).toDF("lang", "text"), col("lang"), col("text"), 50)
    val docs = Seq((1L, "abab ababa"), (2L, "xyxy xyxyx")).toDF("doc_id", "text")
    val got = LangProfile.classify(docs, "doc_id", col("text"), profiles,
        k = 50, m = 10)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "alpha", 2L -> "beta"))
  }

  test("missing grams pay the k penalty; ties break language-ascending") {
    // doc shares nothing with either profile -> equal max distances ->
    // prediction must be the alphabetically first language
    val profiles = LangProfile.trainProfiles(
      Seq(("bb", "mmmm"), ("aa", "zzzz")).toDF("lang", "text"),
      col("lang"), col("text"), 10)
    val got = LangProfile.classify(
        Seq((7L, "qqqq")).toDF("doc_id", "text"), "doc_id", col("text"),
        profiles, k = 10, m = 5)
      .select("pred").as[String].collect().toList
    assert(got == List("aa"))
  }

  test("a doc with no trigrams yields no prediction row") {
    val profiles = LangProfile.trainProfiles(
      Seq(("x", "abcd")).toDF("lang", "text"), col("lang"), col("text"), 10)
    val got = LangProfile.classify(
      Seq((1L, "ab"), (2L, "abcde")).toDF("doc_id", "text"),
      "doc_id", col("text"), profiles, 10, 5)
    assert(got.select("doc_id").as[Long].collect().toList == List(2L))
  }

  test("trained profiles serve per-batch classification identically to batch mode") {
    // the streaming serving pattern: profiles are a control-plane table
    // trained ONCE (cache it), then every micro-batch classifies
    // against the same broadcast — per-batch results must equal the
    // batch classification of the concatenation (classification is
    // per-doc, so batching cannot change any verdict)
    val seed = ((1 to 15).map(i => ("alpha", s"aba bab ba$i")) ++
      (1 to 15).map(i => ("beta", s"xyx yxy yx$i"))).toDF("lang", "text")
    val profiles = LangProfile.trainProfiles(seed, col("lang"), col("text"), 50)
      .cache()
    val b1 = Seq((1L, "ababab"), (2L, "xyxyxy")).toDF("doc_id", "text")
    val b2 = Seq((3L, "bababa"), (4L, "yxyxyx")).toDF("doc_id", "text")
    def preds(df: org.apache.spark.sql.DataFrame) =
      LangProfile.classify(df, "doc_id", col("text"), profiles, 50, 10)
        .select("doc_id", "pred").as[(Long, String)].collect().toMap
    val perBatch = preds(b1) ++ preds(b2)
    val batchMode = preds(b1.unionByName(b2))
    profiles.unpersist()
    assert(perBatch == batchMode)
    assert(perBatch == Map(1L -> "alpha", 2L -> "beta",
      3L -> "alpha", 4L -> "beta"))
  }
}
