package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Passage-level dedup (q46): first-occurrence-wins semantics and
  * original-order reassembly, pinned on hand-built corpora where the
  * expected survivors are known exactly. */
class PassageDedupSpec extends SparkSpec {

  import spark.implicits._

  // 4-token passages keep the fixtures readable
  private val P = 4

  private def run(rows: (Long, String)*) =
    DedupFunctions
      .passageDedup(rows.toDF("doc_id", "text"), "doc_id", "text", passageTokens = P)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("duplicate passage survives only at its first (doc, pos) occurrence") {
    val p1 = "a b c d"
    val p2 = "e f g h"
    val p3 = "i j k l"
    val out = run(
      1L -> s"$p1 $p2", // both first occurrences
      2L -> s"$p3 $p1", // p3 first, p1 already seen in doc 1
      3L -> s"$p1 $p2") // everything seen before
    assert(out === Seq(
      (1L, 2L, 2L, md5hex(s"$p1 $p2")),
      (2L, 2L, 1L, md5hex(p3)),
      (3L, 2L, 0L, md5hex(""))))
  }

  test("within one document a repeated passage keeps only the earliest position") {
    val p = "x y z w"
    val q = "q r s t"
    val out = run(7L -> s"$p $q $p")
    assert(out === Seq((7L, 3L, 2L, md5hex(s"$p $q"))))
  }

  test("reassembly preserves original order, not hash or lexicographic order") {
    val first = "z z z z" // lexicographically LAST, positionally first
    val second = "a a a a"
    val out = run(5L -> s"$first $second")
    assert(out.head._4 === md5hex(s"$first $second"))
  }

  test("tail passage shorter than the window is deduped like any other") {
    val full = "m n o p"
    val tail = "u v" // 2-token tail
    val out = run(
      1L -> s"$full $tail",
      2L -> tail) // doc 2 is exactly the tail passage -> already seen
    assert(out === Seq(
      (1L, 2L, 2L, md5hex(s"$full $tail")),
      (2L, 1L, 0L, md5hex(""))))
  }

  test("tokenization normalizes case/punctuation before windowing") {
    val out = run(
      1L -> "A b! C, d",
      2L -> "a B c D") // same token stream after normalization
    assert(out === Seq(
      (1L, 1L, 1L, md5hex("a b c d")),
      (2L, 1L, 0L, md5hex(""))))
  }
}
