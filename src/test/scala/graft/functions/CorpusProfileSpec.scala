package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CorpusProfile: hand-computed card on a tiny corpus, median rule on
  * even/odd groups, and the single-scan/one-join plan shape.
  */
class CorpusProfileSpec extends SparkSpec {

  import spark.implicits._

  private val markers = Seq("en" -> Seq("the"), "xx" -> Seq("zork"))

  test("hand-computed profile on a two-slice corpus") {
    val rows = Seq(
      ("s1", "the quick brown fox"),              // 4 toks, en
      ("s1", "one two three"),                    // 3 toks, und
      ("s1", "a b c d e f g"),                    // 7 toks, und
      ("s2", "zork zork returns"),                // 3 toks, xx
      ("s2", "the " + (1 to 25).map(i => s"w$i").mkString(" "))) // 26 toks, en
    val got = CorpusProfile.profile(rows.toDF("src", "text"),
        col("src"), col("text"), markers, shortDocTokens = 4)
      .orderBy("slice")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    // s1: 3 docs, 14 tokens, median(3,4,7)=4, short(<4)=1, en=1, vocab=14
    // s2: 2 docs, 29 tokens, median rule (n+1)/2=1 -> 3, short=1, en=1
    //     vocab: zork,returns + the,w1..w25 = 28
    assert(got == List(
      ("s1", 3L, 14L, 4L, 1L, 1L, 14L),
      ("s2", 2L, 29L, 3L, 1L, 1L, 28L)))
  }

  test("the two aggregation passes join to one card row per slice") {
    val df = Seq(("s", "alpha beta")).toDF("src", "text")
    val out = CorpusProfile.profile(df, col("src"), col("text"), markers)
    assert(out.count() == 1)
    val row = out.head
    assert(row.getLong(1) == 1L && row.getLong(2) == 2L && row.getLong(6) == 2L)
  }

  test("empty slice text: zero tokens, median comes from rank 0 rule") {
    val rows = Seq(("s", ""), ("s", "a b c"))
    val got = CorpusProfile.profile(rows.toDF("src", "text"),
        col("src"), col("text"), markers)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    // ntoks: 0 and 3 -> median rule picks rank (2+1)/2=1 -> 0
    assert(got == (("s", 2L, 3L, 0L, 2L, 0L, 3L)))
  }
}
