package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Real BPE tokenizer: hand-computed merge applications, the classic
  * training loop on the textbook corpus, merges-file round-trip, and
  * the native count expression over a DataFrame (codegen path).
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("encodeWord applies merges lowest-rank-first (hand-computed)") {
    // rank 0: a+b  rank 1: ab+c
    val m = new BpeModel(Array(("a", "b"), ("ab", "c")))
    // abcabd: chars a b c a b d → ab c ab d (rank 0 everywhere) → abc ab d
    assert(m.encodeWord("abcabd").toSeq == Seq("abc", "ab", "d"))
    // rank order matters: with the SAME pairs ranked the other way the
    // ab+c merge can never fire before a+b creates "ab"
    val rev = new BpeModel(Array(("ab", "c"), ("a", "b")))
    assert(rev.encodeWord("abcabd").toSeq == Seq("abc", "ab", "d"))
    // unknown chars stay single symbols
    assert(m.encodeWord("xy").toSeq == Seq("x", "y"))
    assert(m.encodeWord("").isEmpty)
  }

  test("end-of-word marker distinguishes final from inner occurrences") {
    val m = new BpeModel(Array(("s", "t</w>")), endOfWord = true)
    // "st" at word END merges; "st" mid-word must not
    assert(m.encodeWord("best").toSeq == Seq("b", "e", "st</w>"))
    assert(m.encodeWord("stem").toSeq == Seq("s", "t", "e", "m</w>"))
  }

  test("train learns the textbook merges on low/lower/lowest") {
    // vocabulary: low ×3, lower ×1, lowest ×1 (Sennrich-style, no </w>)
    // pair counts round 1: (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1
    // first-seen tie-break → (l,o); then (lo,w)=5; then (low,e)=2
    val corpus = Seq("low low low lower lowest")
    val m = BpeModel.train(corpus, numMerges = 3)
    assert(m.merges.toSeq == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    assert(m.encodeWord("low").toSeq == Seq("low"))
    // the (low,e) merge fires inside "lowest" too: low e s t → lowe s t
    assert(m.encodeWord("lowest").toSeq == Seq("lowe", "s", "t"))
    assert(m.countTokens("low lowest") == 4)
  }

  test("merges file round-trips (subword-nmt format, header skipped)") {
    val f = java.nio.file.Files.createTempFile("graft-bpe-", ".txt")
    java.nio.file.Files.write(f,
      "#version: 0.2\nl o\nlo w\n".getBytes("UTF-8"))
    val m = BpeModel.load(f.toString)
    assert(m.merges.toSeq == Seq(("l", "o"), ("lo", "w")))
    assert(m.encodeWord("slow").toSeq == Seq("s", "low"))
  }

  test("native count expression matches driver-side encode over a frame") {
    val m = BpeModel.train(Seq("low low low lower lowest"), numMerges = 3)
    val texts = Seq("low lower", "the lowest low", "", "unrelated words")
    val got = texts.toDF("text")
      .select(Bpe.tokenCount(col("text"), m).as("n"))
      .collect().map(_.getAs[Long]("n"))
    val want = texts.map(m.countTokens)
    assert(got.toSeq == want, s"expression ${got.toSeq} vs driver $want")
    // null in, null out
    val n = Seq[Option[String]](None).toDF("text")
      .select(Bpe.tokenCount(col("text"), m)).collect()
    assert(n.head.isNullAt(0))
  }
}
