package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling/splitting: stable under re-partitioning and
  * re-runs, independent across salts, leakage-safe (same key => same
  * split), and the native top-token expression matches the composed
  * HOF form element-for-element.
  */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("hashSample is deterministic and partitioning-invariant") {
    val a = SamplingFunctions.hashSample(docs, col("doc_id"), 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = SamplingFunctions.hashSample(docs.repartition(17), col("doc_id"), 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same corpus must yield the same sample under any partitioning")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.15, s"~30% expected, got ${a.size / n}")
  }

  test("nested samples with different salts are unbiased draws") {
    val outer = SamplingFunctions.hashSample(docs, col("doc_id"), 50, salt = "s1")
    val inner = SamplingFunctions.hashSample(outer, col("doc_id"), 50, salt = "s2")
    val nOuter = outer.count().toDouble
    val nInner = inner.count().toDouble
    // if the salts correlated, the inner draw would keep ~all or ~none
    assert(nInner / nOuter > 0.3 && nInner / nOuter < 0.7,
      s"inner draw should be ~50% of outer, got ${nInner / nOuter}")
  }

  test("splitColumn covers 100%, is exclusive, and equal keys co-assign") {
    val s = docs.select(col("doc_id"),
      SamplingFunctions.splitColumn(col("doc_id"), 80, 10).as("split"))
    val byDoc = s.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc.size == docs.count(), "every row gets exactly one split")
    assert(byDoc.values.toSet.subsetOf(Set("train", "val", "test")))
    // duplicated keys land in the same split (dedup-then-split safety)
    val dup = docs.select(col("doc_id")).union(docs.select(col("doc_id")))
      .select(col("doc_id"), SamplingFunctions.splitColumn(col("doc_id"), 80, 10).as("split"))
      .distinct().groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dup == 0, "same key must always get the same split")
    val frac = byDoc.values.count(_ == "train") / byDoc.size.toDouble
    assert(math.abs(frac - 0.8) < 0.12, s"~80% train expected, got $frac")
  }

  test("quotaPerGroup caps every group at n with deterministic ranking") {
    val q = SamplingFunctions.quotaPerGroup(docs, col("source"),
      col("n_chars").desc, col("doc_id").asc, n = 5)
    val perGroup = q.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.values.forall(_ <= 5), s"quota exceeded: $perGroup")
    // rank 1 of each group is that group's max n_chars (min doc_id on tie)
    val top = q.filter(col("rk") === 1)
      .select("source", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = docs.groupBy("source").agg(max("n_chars").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top == expected)
  }

  test("stratifiedSample: per-stratum rates, subset-of-corpus, deterministic") {
    val pct = Map("en" -> 20, "zh" -> 50)
    val s1 = SamplingFunctions.stratifiedSample(
      docs, col("doc_id"), col("lang"), pct, defaultPct = 100)
    val s2 = SamplingFunctions.stratifiedSample(
      docs.repartition(13), col("doc_id"), col("lang"), pct, defaultPct = 100)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = s2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "stratified sample must be partitioning-invariant")

    val kept = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-en/zh strata fall back to defaultPct=100 -> kept in full
    total.keys.filterNot(pct.contains).foreach { l =>
      assert(kept.getOrElse(l, 0L) == total(l), s"default stratum $l must keep all")
    }
    // sampled strata land near their configured rate (sf0.001 is tiny,
    // so the tolerance is wide; membership exactness is pinned by the
    // q52 oracle's id_sum at sf0.01)
    pct.foreach { case (l, p) =>
      val frac = kept.getOrElse(l, 0L).toDouble / total(l)
      assert(math.abs(frac - p / 100.0) < 0.25, s"$l: expected ~$p%, got $frac")
    }
  }

  test("reservoirPerGroup: exactly k per group, deterministic, order-independent") {
    // the sample keeps the input schema — the internal rank column must
    // not leak into the result
    assert(SamplingFunctions.reservoirPerGroup(docs, col("source"), col("doc_id"), 3)
      .columns.toSeq == docs.columns.toSeq)
    val r1 = SamplingFunctions.reservoirPerGroup(docs, col("source"), col("doc_id"), 3)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val r2 = SamplingFunctions.reservoirPerGroup(
        docs.orderBy(col("n_chars")), col("source"), col("doc_id"), 3)
      .select("source", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(r1 == r2, "draw must not depend on input order")
    val perGroup = r1.groupBy(_._1).view.mapValues(_.size).toMap
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      assert(perGroup.getOrElse(src, 0) == math.min(3L, n),
        s"$src: expected ${math.min(3L, n)} drawn, got ${perGroup.getOrElse(src, 0)}")
    }
  }

  test("mixtureSample thins over-share strata toward the target and keeps the rest") {
    // en dominates this corpus; equal 20% shares => en thinned, others whole
    val target = Map("en" -> 2000, "de" -> 2000, "es" -> 2000, "fr" -> 2000, "zh" -> 2000)
    val out = SamplingFunctions.mixtureSample(docs, col("doc_id"), col("lang"), target)
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = total.values.sum.toDouble
    total.foreach { case (l, n) =>
      if (n / corpus <= 0.2)
        assert(kept.getOrElse(l, 0L) == n, s"under-share stratum $l must keep all")
      else
        assert(kept.getOrElse(l, 0L) < n, s"over-share stratum $l must be thinned")
    }
    // output schema untouched (helper columns dropped)
    assert(out.columns.toSet == docs.columns.toSet)
    // deterministic across physical order
    val k2 = SamplingFunctions.mixtureSample(
        docs.repartition(7), col("doc_id"), col("lang"), target)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == k2)
  }

  test("native topTokenCount equals the composed HOF form") {
    val both = docs
      .select(TextFunctions.tokens(col("text")).as("tk"))
      .select(TextFunctions.topTokenCount(col("tk")).as("fast"),
        TextFunctions.topTokenCountComposed(col("tk")).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
    // edge cases: empty array, single token, all-same tokens
    val edges = Seq(Seq.empty[String], Seq("a"), Seq("x", "x", "x"), Seq("a", "b", "a"))
      .toDF("tk")
      .select(TextFunctions.topTokenCount(col("tk")).as("n")).as[Long].collect()
    assert(edges.toSeq == Seq(0L, 1L, 3L, 2L))
  }

  test("leakage-safe split: near-dup cluster members co-assign via the representative") {
    // the q134 gate proves the exact-fingerprint form; this anchors the
    // NEAR-dup composition — cluster reps from dupClusters, split on
    // the rep, so a train/test boundary can never cut through a cluster
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("d1", "d2")
    val clusters = DedupFunctions.dupClusters(pairs) // (doc_id, cluster_id)
    val singletons = Seq(100L, 101L).toDF("doc_id")
      .withColumn("cluster_id", col("doc_id"))
    val all = clusters.unionByName(singletons)
    val split = all.select(col("doc_id"), col("cluster_id"),
      SamplingFunctions.splitColumn(col("cluster_id"), 60, 20).as("split"))
    val violations = split.groupBy(col("cluster_id"))
      .agg(count_distinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(violations == 0, "every cluster must land in exactly one split")
    // and the split is total + deterministic
    val twice = split.orderBy("doc_id").collect().toSeq
    assert(twice == split.orderBy("doc_id").collect().toSeq)
    assert(split.filter(!col("split").isin("train", "val", "test")).count() == 0)
  }
}
