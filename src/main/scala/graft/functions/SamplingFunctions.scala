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

  /** The ONE salted portable hash every sampler here draws from:
    * md5Long over "<salt>:<key>". A single definition, not a per-site
    * recipe — a change to the salt format or hash family that missed
    * one copy would silently shift which rows ONE sampler selects
    * relative to the others (and to the DuckDB oracle twins, which
    * spell this exact concatenation). */
  private def saltedHash(key: Column, salt: String): Column =
    Hashes.md5Long(concat(lit(s"$salt:"), key.cast("string")))

  /** Uniform hash in [0, buckets) from a key column, portable across
    * engines. Salt separates independent sampling decisions on the
    * same key (sampling vs splitting must not correlate). */
  def hashBucket(key: Column, buckets: Int, salt: String): Column =
    pmod(saltedHash(key, salt), lit(buckets.toLong))

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
      tieBreak: Column, n: Int): DataFrame = {
    // `rk` (the within-group rank) is an OUTPUT column of this API —
    // callers consume it (q39's gate) — so an input column of that
    // name would be silently overwritten and returned corrupted:
    // reject it loudly, the Merge/TableDiff reserved-name discipline
    require(!df.columns.contains("rk"),
      "column name 'rk' is reserved by quotaPerGroup (it is the emitted rank)")
    df.withColumn("rk",
        row_number().over(Window.partitionBy(group).orderBy(order, tieBreak)))
      .filter(col("rk") <= n)
  }

  /** Deterministic "reservoir": a uniform random-LOOKING k docs per
    * group, derived from the portable hash instead of `rand()` — the
    * reproducible version of per-group reservoir sampling (eyeball
    * samples, eval slices, debugging corpora). Hash order is uniform
    * over keys and independent of the data's physical order, so the k
    * survivors are an unbiased draw; same corpus => same sample on
    * every re-run, any cluster size.
    *
    * Scale shape: identical to [[quotaPerGroup]] — one shuffle on
    * `group`, WindowGroupLimit bounds hot groups, output ≤ |groups|·k. */
  def reservoirPerGroup(df: DataFrame, group: Column, key: Column,
      n: Int, salt: String = "resv"): DataFrame =
    // key.isNotNull: a null key hashes null and NULLS FIRST ordering
    // would hand such rows every group's reservoir slots
    quotaPerGroup(df.filter(key.isNotNull), group,
      saltedHash(key, salt).asc, key.asc, n)
      .drop("rk") // internal rank — "k docs per group" keeps the input schema

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

  /** Weighted rank for deterministic weighted sampling WITHOUT
    * replacement (Efraimidis–Spirakis "A-ES"): row i gets
    * `-ln(u_i) / w_i` with `u_i ∈ (0,1]` derived from the portable
    * hash — an Exponential(w_i) draw, so keeping the k SMALLEST ranks
    * samples with inclusion odds scaling in weight, and the whole draw
    * is a pure projection: no `rand()`, bit-reproducible across
    * engines, retries, and cluster sizes (the same guarantee as
    * [[hashSample]], extended to non-uniform weights). */
  def weightedRank(key: Column, weight: Column,
      salt: String = "wsample"): Column =
    -log((saltedHash(key, salt) + lit(1L))
      .cast("double") / lit((1L << 60).toDouble)) / weight.cast("double")

  /** The k rows with the smallest [[weightedRank]] — a deterministic
    * weighted sample without replacement. Rows with weight <= 0 are
    * excluded (they have no sampling mass).
    *
    * Scale shape: ranks ride the scan; the k-smallest cut compiles to
    * TakeOrdered — per-partition top-k then a k·partitions driver
    * merge, NO global sort and no corpus shuffle. That distributed
    * shape is exactly the exponential-rank family's mergeability
    * property (global top-k == top-k of unioned per-split top-k's),
    * pinned by WeightedSampleSpec. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      salt: String = "wsample"): DataFrame = {
    // a null key fails fast instead of winning: saltedHash(null) is
    // null, ascending rank order is NULLS FIRST, so null-key rows
    // would claim the top k slots and displace every valid row (while
    // hashSample silently DROPS the same rows — two samplers, two
    // silent null policies). The reserved working name fails fast too.
    require(!df.columns.contains("graft_wrank"),
      "column name graft_wrank is reserved by weightedSample")
    df.filter(weight > lit(0) && key.isNotNull)
      .withColumn("graft_wrank", weightedRank(key, weight, salt))
      .orderBy(col("graft_wrank"), key)
      .limit(k)
      .drop("graft_wrank")
  }

  /** Per-group weighted sample: k docs per group, weight-biased —
    * [[reservoirPerGroup]] with non-uniform odds (e.g. favor long or
    * high-quality docs in every source's eyeball slice). Same scale
    * shape as [[quotaPerGroup]]: one shuffle on `group`,
    * WindowGroupLimit bounds hot groups. */
  def weightedPerGroup(df: DataFrame, group: Column, key: Column,
      weight: Column, n: Int, salt: String = "wresv"): DataFrame =
    // key.isNotNull: same NULLS FIRST displacement as [[weightedSample]]
    quotaPerGroup(df.filter(weight > lit(0) && key.isNotNull), group,
      weightedRank(key, weight, salt).asc, key.asc, n)
      .drop("rk")

  /** Mixture (data-mixing) sampling: downsample each stratum toward a
    * TARGET SHARE of the corpus (basis points out of 10000), the
    * static-mixing primitive behind domain-reweighted training sets.
    * A stratum's keep-rate is `min(1, share·total/n_stratum)` — groups
    * above their target share are thinned to it, groups at/below keep
    * everything (shares then renormalize over what exists). Strata
    * absent from `targetBp` are dropped. All arithmetic is integer
    * (basis points, `div`), all membership is portable-hash-derived —
    * the whole draw reproduces bit-for-bit across engines and re-runs.
    * Rows with a NULL stratum are dropped — explicitly, below, not as
    * a silent inner-join artifact (a null key never equi-joins, so
    * they vanished indistinguishably from a 0-bp target); tag unknowns
    * with a sentinel stratum value first to keep them samplable.
    *
    * Scale shape: one column-pruned pass over `stratum` for the
    * per-group counts (a |strata|-row aggregate), broadcast of those
    * rates back, then a scan-level hash filter. The corpus itself
    * never shuffles. */
  def mixtureSample(df: DataFrame, key: Column, stratum: Column,
      targetBp: Map[String, Int], salt: String = "mix"): DataFrame = {
    targetBp.values.foreach(bp =>
      require(bp >= 0 && bp <= 10000, s"share out of range: $bp bp"))
    // per-stratum counts: a |strata|-row aggregate over the pruned
    // stratum column; the global-total window runs over those few rows
    val counts = df.groupBy(stratum.cast("string").as("graft_stratum"))
      .agg(count(lit(1)).as("graft_n_g"))
    val bpCol = targetBp.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (v, bp)) =>
        when(col("graft_stratum") === lit(v), lit(bp.toLong)).otherwise(acc)
      }
    val rates = counts
      .withColumn("graft_total", sum(col("graft_n_g")).over(Window.partitionBy(lit(1))))
      .withColumn("graft_target_bp", bpCol)
      .withColumn("graft_rate_bp",
        least(lit(10000L), expr("(graft_target_bp * graft_total) div graft_n_g")))
      .select(col("graft_stratum"), col("graft_rate_bp"))
    df.withColumn("graft_stratum", stratum.cast("string"))
      // the explicit form of the null-stratum drop (see scaladoc)
      .filter(col("graft_stratum").isNotNull)
      .join(broadcast(rates), Seq("graft_stratum"))
      .filter(pmod(saltedHash(key, salt),
        lit(10000L)) < col("graft_rate_bp"))
      .drop("graft_stratum", "graft_rate_bp")
  }
}
