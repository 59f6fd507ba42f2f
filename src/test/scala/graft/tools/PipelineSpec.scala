package graft.tools

import graft.SparkSpec

/** End-to-end curation pipeline smoke over real sf0.001 data: stages
  * compose, exact dups and near-dup cluster losers are gone, stats
  * cover exactly the kept set.
  */
class PipelineSpec extends SparkSpec {

  test("curate keeps a deduped, quality-filtered corpus with matching stats") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r = Pipeline.curate(spark, docs)
    val kept = r.kept.cache()
    val n = kept.count()
    assert(n > 0 && n <= docs.count())
    // no exact duplicates survive
    import org.apache.spark.sql.functions._
    val dupTexts = kept.groupBy(col("text")).count().filter(col("count") > 1).count()
    assert(dupTexts == 0, s"$dupTexts duplicated texts survived")
    // stats add up to the kept set
    val statsDocs = r.stats.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(statsDocs == n, s"stats cover $statsDocs docs, kept $n")
    // every kept row carries a split, and re-running assigns identically
    assert(kept.filter(!col("split").isin("train", "val", "test")).count() == 0)
    kept.unpersist()
    ()
  }

  test("decontamination and quota stages drop the right documents") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // benchmark = a slice of the corpus itself: those docs (and their
    // exact/near dups sharing 5-grams) must not survive curation
    val bench = docs.filter(col("doc_id") < 10).select(col("text"))
    val r = Pipeline.curate(spark, docs, benchmark = Some(bench),
      quotaPerSource = Some(5))
    val kept = r.kept.cache()
    assert(kept.filter(col("doc_id") < 10).count() == 0,
      "benchmark members must be decontaminated away")
    val over = kept.groupBy(col("source")).count().filter(col("count") > 5).count()
    assert(over == 0, "no source may exceed its quota")
    assert(kept.count() > 0)
    kept.unpersist()
    ()
  }

  test("PII scrub, compressibility floor, and mixture stages compose") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // graft three synthetic rows onto the real corpus: one with PII,
    // one boilerplate (compresses hard), one ordinary
    val extra = Seq(
      (9001L, "contact bob@example.com for the table scan row batch value key", "en", "srcX", 60L),
      (9002L, Array.fill(120)("spam spam").mkString(" "), "en", "srcX", 1000L),
      (9003L, "an ordinary row about table scan batch value key group", "en", "srcX", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val docs = real.unionByName(extra)
    val r = Pipeline.curate(spark, docs, scrubPii = true, crFloor = Some(0.3),
      mixtureBp = Some(Map("en" -> 2000, "de" -> 2000, "es" -> 2000,
        "fr" -> 2000, "zh" -> 2000)))
    val kept = r.kept.cache()
    // PII never survives into the kept corpus
    assert(kept.filter(col("text").contains("@")).count() == 0,
      "emails must be redacted before anything ships")
    val k9001 = kept.filter(col("doc_id") === 9001L).select("text").collect()
    k9001.headOption.foreach(rw => assert(rw.getString(0).contains("<EMAIL>")))
    // boilerplate dropped by the compressibility floor
    assert(kept.filter(col("doc_id") === 9002L).count() == 0,
      "repetitive spam must fail the deflate floor")
    // mixture: dominant language thinned below its unmixed count
    val unmixed = Pipeline.curate(spark, docs, scrubPii = true, crFloor = Some(0.3))
    val enMixed = kept.filter(col("lang") === "en").count()
    val enUnmixed = unmixed.kept.filter(col("lang") === "en").count()
    assert(enMixed < enUnmixed, s"en must thin under mixing: $enMixed vs $enUnmixed")
    kept.unpersist()
    ()
  }
}
