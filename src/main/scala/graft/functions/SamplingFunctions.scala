package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / balancing for training-data
  * pipelines. Everything here is a pure column expression over a
  * content-derived hash — no `rand()`, so the same corpus always
  * yields the same sample regardless of partitioning, retries, task
  * re-runs, or cluster size. That determinism is the 100 TB
  * requirement: `rand()`-based sampling changes under AQE re-plans and
  * speculative execution, and makes train/test leakage unauditable.
  *
  * Two hash families, mirroring [[Hashes]]: the portable md5 form
  * (bit-identical in DuckDB, used by the correctness oracle) and the
  * fast xxhash64 form for production pipelines.
  */
object SamplingFunctions {

  /** Uniform hash in [0, buckets) from a key column, portable across
    * engines. Salt separates independent sampling decisions on the
    * same key (sampling vs splitting must not correlate). */
  def hashBucket(key: Column, buckets: Int, salt: String): Column =
    pmod(Hashes.md5Long(concat(lit(s"$salt:"), key.cast("string"))), lit(buckets.toLong))

  /** Fast variant (xxhash64) — not oracle-portable. */
  def hashBucketFast(key: Column, buckets: Int, salt: String): Column =
    pmod(xxhash64(lit(salt), key.cast("string")), lit(buckets.toLong))

  /** Keep a deterministic `percent`% of rows by key hash. Scale shape:
    * a scan-level filter (no shuffle, no state); the sample is stable
    * under re-partitioning and re-runs, and composable — sampling at
    * 10% then 20% of that uses different salts, so the second draw is
    * unbiased within the first. */
  def hashSample(df: DataFrame, key: Column, percent: Int,
      salt: String = "sample"): DataFrame = {
    require(percent >= 0 && percent <= 100, s"percent out of range: $percent")
    df.filter(hashBucket(key, 100, salt) < percent)
  }

  /** Deterministic train/val/test assignment by key hash: fractions
    * are out of 100 (e.g. 80/10 -> 80% train, 10% val, 10% test). The
    * split column rides WITH the row (one projection, no shuffle), so
    * a later `groupBy(split)` or partitioned write fans the corpus out
    * without a second pass. Keys equal => same split, which is exactly
    * the leakage guarantee dedup-then-split pipelines need. */
  def splitColumn(key: Column, trainPct: Int, valPct: Int,
      salt: String = "split"): Column = {
    require(trainPct + valPct <= 100, "train+val must leave room for test")
    val b = hashBucket(key, 100, salt)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Per-group quota: keep the top `n` rows of each `group` ordered by
    * `order` (ties broken by `tieBreak` so the result is
    * deterministic). The domain-mixing primitive: cap every source/
    * language at a budget instead of letting one crawl dominate.
    *
    * Scale shape: ONE hash-partition shuffle on `group` and a ranked
    * window — output is bounded at |groups| × n rows, and Spark's
    * WindowGroupLimit pushes the rank<=n cut into the sort (no full
    * per-group materialization). Skewed groups (one giant source) cost
    * one hot partition's sort, not a cross-join. */
  def quotaPerGroup(df: DataFrame, group: Column, order: Column,
      tieBreak: Column, n: Int): DataFrame =
    df.withColumn("rk",
        row_number().over(Window.partitionBy(group).orderBy(order, tieBreak)))
      .filter(col("rk") <= n)

  /** Stratified deterministic sampling: a different keep-percentage
    * per stratum value (e.g. downsample English to 20% while keeping
    * all low-resource languages). Unlike `DataFrame.sampleBy` this is
    * hash-derived, not `rand()`-based, so it is stable under AQE
    * re-plans, task retries, and speculative execution — the property
    * that makes a 100 TB re-run reproduce the same corpus.
    *
    * Scale shape: still a pure scan-level filter — the per-stratum
    * percentage resolves to a when-chain on the stratum column (no
    * join, no shuffle, no driver state), so it rides the parquet scan
    * like [[hashSample]]. Strata absent from `pctByStratum` fall back
    * to `defaultPct`. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      pctByStratum: Map[String, Int], defaultPct: Int,
      salt: String = "strat"): DataFrame = {
    (pctByStratum.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"percent out of range: $p"))
    val pct = pctByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPct)) { case (acc, (v, p)) =>
        when(stratum === lit(v), lit(p)).otherwise(acc)
      }
    df.filter(hashBucket(key, 100, salt) < pct)
  }
}
