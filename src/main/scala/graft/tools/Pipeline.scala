package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{DedupFunctions, Hashes, SamplingFunctions, TextFunctions}

/** End-to-end training-data curation pipeline — the library composed
  * the way a corpus team would run it nightly, in ONE lazy plan per
  * stage (no driver round-trips between stages):
  *
  *   1. exact dedup          — keep the min-id doc per content hash
  *   2. quality gate         — length / stopword / punctuation floors
  *   3. near-dup clustering  — MinHash-LSH candidates → min-label
  *                             clusters → keep the canonical doc
  *   4. decontamination      — drop docs sharing any 5-gram with the
  *                             (broadcast) benchmark set, if given
  *   5. per-source quota     — cap each source at a budget, if given
  *   6. split stamping       — deterministic train/val/test by doc id
  *   7. corpus stats         — per-language doc/token counts
  *
  * `runMain graft.tools.Pipeline [sfDir] [outDir]` writes the kept
  * corpus and its stats as parquet and prints one JSON summary line.
  */
object Pipeline {

  final case class Result(kept: DataFrame, stats: DataFrame)

  def curate(spark: SparkSession, docs: DataFrame,
      minTokens: Int = 5, qualityFloor: Double = 0.3,
      benchmark: Option[DataFrame] = None,
      quotaPerSource: Option[Int] = None,
      splitPcts: Option[(Int, Int)] = Some((80, 10)),
      scrubPii: Boolean = false,
      crFloor: Option[Double] = None,
      mixtureBp: Option[Map[String, Int]] = None): Result = {
    val stop = Seq("the", "a", "of", "and", "to")

    // 0. PII scrub BEFORE dedup/fingerprinting, so two docs differing
    //    only in redacted spans hash identically downstream
    val scrubbed =
      if (!scrubPii) docs
      else docs.withColumn("text", TextFunctions.redactPii(col("text")))

    // 1. exact dedup: survivors of the hash-group (one shuffle)
    val exactKeepers = DedupFunctions
      .exactDedup(scrubbed, "text", "doc_id")
      .select(col("keeper_id").as("doc_id"))
    val unique = scrubbed.join(exactKeepers, Seq("doc_id"))

    // 2. quality gate: pure column predicates, evaluated in the scan
    //    stage; the optional compressibility floor drops boilerplate
    //    (deflate ratio below crFloor = repetitive spam)
    val quality = unique
      .withColumn("n_tok", TextFunctions.tokenCount(col("text")))
      .withColumn("q", TextFunctions.qualityScore(col("text"), stop))
      .filter(col("n_tok") >= minTokens && col("q") >= qualityFloor)
      .transform(d => crFloor.fold(d)(f =>
        d.filter(TextFunctions.compressionRatio(col("text")) >= f)))

    // 3. near-dup clusters over the survivors; drop all but each
    //    cluster's canonical (min-id) member
    val clusters = DedupFunctions.dupClusters(DedupFunctions.minhashCandidates(
      quality, "doc_id", "text", shingleN = 3, k = 12, r = 2, portable = false))
    val losers = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    val deduped = quality.join(losers, Seq("doc_id"), "left_anti")

    // 4. decontamination: anti-join on shared 5-gram hashes; the
    //    benchmark side is distinct-ed and broadcast, so the corpus
    //    never shuffles for this stage
    val clean = benchmark.fold(deduped) { bench =>
      val benchHashes = bench
        .select(explode(TextFunctions.shingles(col("text"), 5)).as("sh"))
        .select(Hashes.md5Long(col("sh")).as("h")).distinct()
      val contaminated = deduped
        .select(col("doc_id"), TextFunctions.words(col("text")).as("w"))
        .select(col("doc_id"),
          explode(TextFunctions.shinglesFromWords(col("w"), 5)).as("sh"))
        .select(col("doc_id"), Hashes.md5Long(col("sh")).as("h"))
        .join(broadcast(benchHashes), Seq("h"))
        .select(col("doc_id")).distinct()
      deduped.join(contaminated, Seq("doc_id"), "left_anti")
    }

    // 5. per-source quota: best-quality docs first, deterministic ties
    val capped = quotaPerSource.fold(clean)(n =>
      SamplingFunctions.quotaPerGroup(clean, col("source"),
        col("q").desc, col("doc_id").asc, n).drop("rk"))

    // 5b. mixture rebalance toward target language shares (basis
    //     points) — deterministic hash membership, AFTER dedup/decon
    //     so the draw reflects the corpus that actually ships
    val mixed = mixtureBp.fold(capped)(target =>
      SamplingFunctions.mixtureSample(capped, col("doc_id"), col("lang"), target))

    // 6. deterministic split stamped on the row (no second pass; equal
    //    doc ids always co-assign — post-dedup leakage safety)
    val kept = splitPcts.fold(mixed) { case (tr, va) =>
      mixed.withColumn("split",
        SamplingFunctions.splitColumn(col("doc_id"), tr, va))
    }

    // 7. per-language corpus statistics over the kept set
    val stats = kept.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        round(avg(col("q")), 4).as("avg_quality"))

    Result(kept.drop("q"), stats)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/graft_pipeline"
    val spark = GraftSession.local()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val r = curate(spark, docs)
    r.kept.write.mode("overwrite").parquet(s"$out/kept")
    r.stats.write.mode("overwrite").parquet(s"$out/stats")
    val total = docs.count()
    val kept = spark.read.parquet(s"$out/kept").count()
    println(s"""{"docs_in":$total,"docs_kept":$kept,"out":"$out"}""")
    spark.stop()
  }
}
