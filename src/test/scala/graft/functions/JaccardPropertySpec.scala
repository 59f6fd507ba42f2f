package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based exactness check for the prefix-filtered Jaccard
  * join: against randomly generated corpora, the distributed plan must
  * return EXACTLY the pairs whose true shingle-set Jaccard clears the
  * threshold — prefix filtering is a pruning optimization, never a
  * recall trade. The in-memory reference implementation is computed
  * independently below. Raw ScalaCheck generators with fixed seeds
  * (the scalatest bridge artifact isn't in the offline cache).
  */
class JaccardPropertySpec extends SparkSpec {

  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  private val docGen: Gen[String] = for {
    len <- Gen.choose(3, 12)
    ws <- Gen.listOfN(len, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.choose(4, 12)
    base <- Gen.listOfN(n, docGen)
    // plant a couple of near-duplicates so the ≥-threshold set is
    // non-trivially non-empty
    dups <- Gen.listOfN(2, Gen.choose(0, n - 1))
  } yield base ++ dups.map(base)

  private def shingleSet(text: String, n: Int): Set[String] = {
    val w = text.split(" ")
    if (w.length < n) Set.empty
    else w.sliding(n).map(_.mkString(" ")).toSet
  }

  private def trueJaccardPairs(docs: Seq[String], n: Int,
      threshold: Double): Set[(Long, Long)] = {
    val sets = docs.zipWithIndex.map { case (t, i) => (i.toLong, shingleSet(t, n)) }
      .filter(_._2.nonEmpty)
    (for {
      (i, si) <- sets; (j, sj) <- sets if i < j
      inter = (si & sj).size
      union = si.size + sj.size - inter
      if union > 0 && inter.toDouble / union >= threshold
    } yield (i, j)).toSet
  }

  test("jaccardSimilarityJoin returns exactly the true ≥-threshold pairs (property)") {
    val params = Gen.Parameters.default
    val thresholds = Seq(0.5, 0.7, 0.9)
    (0 until 15).foreach { trial =>
      val docs = corpusGen.pureApply(params, Seed(42L + trial))
      val threshold = thresholds(trial % thresholds.length)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = DedupFunctions.jaccardSimilarityJoin(df, "doc_id", "text", 3, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = trueJaccardPairs(docs, 3, threshold)
      assert(got == expected,
        s"trial $trial t=$threshold: extra ${got -- expected}, missing ${expected -- got}")
    }
  }

  private def trueContainmentPairs(docs: Seq[String], n: Int,
      threshold: Double): Set[(Long, Long)] = {
    val sets = docs.zipWithIndex.map { case (t, i) => (i.toLong, shingleSet(t, n)) }
      .filter(_._2.nonEmpty)
    (for {
      (i, si) <- sets; (j, sj) <- sets if i != j
      inter = (si & sj).size
      // same rational comparison as the operator: no double rounding
      if inter.toLong * 1000000L >= si.size.toLong * math.round(threshold * 1e6)
    } yield (i, j)).toSet
  }

  test("containmentJoin returns exactly the true directed ≥-threshold pairs (property)") {
    val params = Gen.Parameters.default
    val thresholds = Seq(0.5, 0.7, 0.9)
    (0 until 15).foreach { trial =>
      val docs = corpusGen.pureApply(params, Seed(1042L + trial))
      val threshold = thresholds(trial % thresholds.length)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = DedupFunctions.containmentJoin(df, "doc_id", "text", 3, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = trueContainmentPairs(docs, 3, threshold)
      assert(got == expected,
        s"trial $trial t=$threshold: extra ${got -- expected}, missing ${expected -- got}")
    }
  }

  test("containment catches sub-document duplication that jaccard misses") {
    // doc 0's shingles are a strict subset of doc 1's: containment(0→1)
    // = 1.0 but jaccard is diluted below threshold by doc 1's size
    val small = "alpha beta gamma delta eps"
    val big = small + " zeta eta theta iota kappa alpha gamma beta delta kappa eps zeta iota"
    val df = Seq((0L, small), (1L, big)).toDF("doc_id", "text")
    val cont = DedupFunctions.containmentJoin(df, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont == Set((0L, 1L)), s"expected only 0→1 directed, got $cont")
    val jac = DedupFunctions.jaccardSimilarityJoin(df, "doc_id", "text", 3, 0.9)
      .collect()
    assert(jac.isEmpty, "jaccard at 0.9 should not pair a doc with its 4x-larger container")
  }

  test("reported jaccard values match the true set similarity") {
    val docs = Seq(
      "alpha beta gamma delta eps zeta",
      "alpha beta gamma delta eps eta",   // high overlap
      "theta iota kappa alpha beta gamma")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = DedupFunctions.jaccardSimilarityJoin(df, "doc_id", "text", 3, 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val s0 = shingleSet(docs(0), 3); val s1 = shingleSet(docs(1), 3)
    val expect01 = (s0 & s1).size.toDouble / (s0 ++ s1).size
    assert(rows.contains((0L, 1L)))
    assert(math.abs(rows((0L, 1L)) - BigDecimal(expect01)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }
}
