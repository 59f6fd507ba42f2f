package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[DedupFunctions.duplicateSpans]]: exact span boundaries on planted
  * corpora — shared prefixes, mid-document overlaps, run-length
  * gating, and the "every copy reports the span" symmetry. The q126
  * gate pins cross-engine hashes; these pin the geometry.
  */
class DuplicateSpansSpec extends SparkSpec {

  import spark.implicits._

  private def spans(rows: Seq[(Long, String)], k: Int = 3, minRun: Int = 2) =
    DedupFunctions.duplicateSpans(
      rows.toDF("doc_id", "text"), "doc_id", "text", k = k,
      minDocs = 2, minRun = minRun)
      .orderBy("doc_id", "start_pos")
      .as[(Long, Long, Long, Long)].collect().toList

  // unique filler words so no accidental cross-doc grams
  private def f(tag: String, n: Int): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("a shared 6-word block in different contexts is found exactly") {
    val block = "alpha bravo charlie delta echo foxtrot"
    val d1 = s"${f("x", 4)} $block ${f("y", 3)}"   // block at words 5..10
    val d2 = s"${f("z", 2)} $block"                 // block at words 3..8
    // k=3: block has 4 grams -> run of 4 >= minRun=2
    assert(spans(Seq((1L, d1), (2L, d2))) ==
      List((1L, 5L, 10L, 4L), (2L, 3L, 8L, 4L)))
  }

  test("runs shorter than minRun are dropped; boundaries stay exact") {
    // exactly k+minRun-2 shared words -> minRun-1 grams -> dropped
    val short = "one two three four"                 // 4 words, k=3 -> 2 grams
    val d1 = s"${f("a", 3)} $short"
    val d2 = s"${f("b", 5)} $short"
    assert(spans(Seq((1L, d1), (2L, d2)), k = 3, minRun = 3) == Nil)
    assert(spans(Seq((1L, d1), (2L, d2)), k = 3, minRun = 2) ==
      List((1L, 4L, 7L, 2L), (2L, 6L, 9L, 2L)))
  }

  test("two disjoint shared blocks in one doc yield two islands") {
    val b1 = "red green blue cyan"
    val b2 = "mono duo tri tetra"
    val d1 = s"$b1 ${f("m", 6)} $b2"                 // b1 at 1..4, b2 at 11..14
    val d2 = s"${f("n", 1)} $b1 ${f("o", 9)} $b2"    // b1 at 2..5, b2 at 15..18
    assert(spans(Seq((1L, d1), (2L, d2))) ==
      List((1L, 1L, 4L, 2L), (1L, 11L, 14L, 2L),
        (2L, 2L, 5L, 2L), (2L, 15L, 18L, 2L)))
  }

  test("three-way duplication reports the span in every copy") {
    val block = "kappa lambda mu nu xi"
    val docs = (1 to 3).map(i => (i.toLong, s"${f(s"u$i", i)} $block"))
    val got = spans(docs)
    assert(got.size == 3)
    assert(got.map(_._1) == List(1L, 2L, 3L))
    got.zip(docs).foreach { case ((_, s0, e0, n), (i, _)) =>
      assert(s0 == i + 1 && e0 == i + 5 && n == 3, s"doc $i: ($s0,$e0,$n)")
    }
  }

  test("documents shorter than k words are ignored, not errored") {
    val got = spans(Seq((1L, "just two"), (2L, "just two"),
      (3L, "a full three word doc a full three word doc")), k = 3)
    // doc 3's internal repetition is NOT cross-doc -> no span at minDocs=2
    assert(got == Nil)
  }

  test("no duplicated grams -> empty result") {
    assert(spans(Seq((1L, f("p", 20)), (2L, f("q", 20)))) == Nil)
  }

  // ---- scrub (the removal action) ----------------------------------

  private def scrub(rows: Seq[(Long, String)], k: Int = 3, minRun: Int = 2) =
    DedupFunctions.scrubDuplicateSpans(
      rows.toDF("doc_id", "text"), "doc_id", "text", k = k,
      minDocs = 2, minRun = minRun)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toList

  test("earliest doc keeps its copy; later copies are cut, context preserved") {
    val block = "alpha bravo charlie delta echo foxtrot"
    val d1 = s"${f("x", 4)} $block ${f("y", 3)}"
    val d2 = s"${f("z", 2)} $block ${f("q", 2)}"
    val got = scrub(Seq((1L, d1), (2L, d2)))
    assert(got == List(
      (1L, 13L, 0L, d1), // keeper: untouched
      (2L, 10L, 6L, s"${f("z", 2)} ${f("q", 2)}")))
  }

  test("a fully-covered document scrubs to the empty string, not dropped") {
    val block = "uno dos tres cuatro cinco seis"
    val d1 = s"${f("m", 3)} $block"
    val got = scrub(Seq((1L, d1), (2L, block)))
    assert(got == List((1L, 9L, 0L, d1), (2L, 6L, 6L, "")))
  }

  test("multiple disjoint spans in one doc are all removed") {
    val b1 = "red green blue cyan"
    val b2 = "mono duo tri tetra"
    val d1 = s"$b1 $b2"                       // earliest: keeps both
    val d2 = s"${f("n", 2)} $b1 ${f("o", 3)} $b2 tail0"
    val got = scrub(Seq((1L, d1), (2L, d2)))
    assert(got == List(
      (1L, 8L, 0L, d1),
      (2L, 14L, 8L, s"${f("n", 2)} ${f("o", 3)} tail0")))
  }

  test("three copies: exactly one survives (min doc id)") {
    val block = "kappa lambda mu nu xi omicron"
    val docs = Seq((5L, s"${f("a", 2)} $block"), (3L, s"${f("b", 3)} $block"),
      (9L, block))
    val got = scrub(docs)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(3L)._3 == 0L, "doc 3 is the earliest -> keeper")
    assert(byId(5L)._3 == 6L && byId(5L)._4 == f("a", 2))
    assert(byId(9L)._3 == 6L && byId(9L)._4 == "")
  }
}
