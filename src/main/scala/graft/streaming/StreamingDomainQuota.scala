package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental registrable-domain quota — q182's web-crawl domain-cap
  * rule (no domain exceeds 1.5× its fair share: admit a domain's
  * rank-rn doc iff 2·rn·D ≤ 3·N, exact integers only) maintained
  * against STORED per-domain admission state instead of re-ranking the
  * whole corpus per epoch. The form a continuously-ingesting crawl
  * actually runs: each slice ranks ONLY its own rows (deterministic
  * cross-engine md5 order, the q169 discipline), offsets each domain's
  * ranks by the admitted count already consumed from state, and
  * re-evaluates the cap under the UPDATED totals (N and D grow with
  * the corpus — the fair share moves, but admission stays MONOTONE:
  * history is never un-admitted, new docs fill whatever headroom the
  * new cap leaves).
  *
  * Scale: the rank window partitions by domain (high cardinality =
  * even distribution); the state join keys on the same column, so it
  * reuses the window's hash partitioning; (N, D) is ONE broadcast
  * scalar row, never a second pass over ranked rows; state is
  * per-domain (control-plane-scaled — one row per registrable domain,
  * never row-scaled).
  */
object DomainQuota {

  /** Zero-domain starting state in the canonical schema. */
  def emptyState(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("domain", StringType),
        StructField("n_docs", LongType),
        StructField("n_admitted", LongType),
        StructField("admitted_id_sum", LongType))))
  }

  /** One incremental step: fold `newDocs` into per-domain admission
    * `state` under the updated cap. Returns the NEXT state — one row
    * per domain ever seen: (domain, n_docs, n_admitted,
    * admitted_id_sum), all exact Long sums (admitted_id_sum pins exact
    * MEMBERSHIP cross-engine, the q181 keeper-sum rule). Running it
    * from [[emptyState]] over one slice is EXACTLY q182 on that slice
    * — the incremental and batch forms share the gate arithmetic.
    *
    * Both inputs are read MORE THAN ONCE by the plan (`state` three
    * times: totals, a0 join, final outer join; `newDocs` three times:
    * count, domain union, ranking) — pin anything expensive before
    * calling (q183 SitePins its slice-0 state; the streaming operator
    * pins its micro-batch projection; stored-parquet state re-reads
    * are pruned columnar scans and stay cheap). */
  def admitIncrement(state: DataFrame, newDocs: DataFrame,
      domainCol: String = "domain", idCol: String = "doc_id"): DataFrame = {
    val st = state.select(col("domain").cast("string").as("domain"),
      col("n_docs").cast("long").as("n_docs"),
      col("n_admitted").cast("long").as("n_admitted"),
      col("admitted_id_sum").cast("long").as("admitted_id_sum"))
    val nd = newDocs.select(col(idCol).cast("long").as("doc_id"),
      col(domainCol).cast("string").as("domain"))
    val inc = rankedAdmissions(st, nd)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("i_docs"),
        sum(when(col("adm"), 1L).otherwise(0L)).as("i_admitted"),
        sum(when(col("adm"), col("doc_id")).otherwise(0L)).as("i_sum"))
    st.join(inc, Seq("domain"), "full_outer")
      .select(col("domain"),
        (coalesce(col("n_docs"), lit(0L)) +
          coalesce(col("i_docs"), lit(0L))).as("n_docs"),
        (coalesce(col("n_admitted"), lit(0L)) +
          coalesce(col("i_admitted"), lit(0L))).as("n_admitted"),
        (coalesce(col("admitted_id_sum"), lit(0L)) +
          coalesce(col("i_sum"), lit(0L))).as("admitted_id_sum"))
  }

  /** The shared gate: new rows ranked per domain (md5 order), offset by
    * the state's consumed slots, flagged `adm` under the updated-total
    * cap. Input frames must already carry the canonical column names.
    * Used by both the pure fold above and the streaming operator (which
    * needs the per-ROW admission verdict, not just the per-domain sums). */
  private[streaming] def rankedAdmissions(st: DataFrame,
      nd: DataFrame): DataFrame = {
    // (N, D) under the NEW totals: one scalar row, broadcast — the
    // distinct-domain count is the only pass that reads both sides
    val consts = st.agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_old"))
      .crossJoin(broadcast(nd.agg(count(lit(1)).as("n_new"))))
      .crossJoin(broadcast(st.select(col("domain"))
        .union(nd.select(col("domain")))
        .agg(countDistinct(col("domain")).as("n_domains"))))
      // the gate 2·rank·D ≤ 3·N evaluated in its overflow-proof
      // equivalent form rank ≤ (3·N) div (2·D): identical booleans for
      // every in-range integer (rank ≤ x ⟺ rank ≤ floor(x) for integer
      // rank), but the PRODUCT form overflows Long at crawl scale
      // (rank ~1e11 on a mega-domain × D ~1e8 registrable domains ≈
      // 2e19 > 2^63): an ANSI ARITHMETIC_OVERFLOW abort by default —
      // the whole admission query dies exactly when the corpus gets
      // big — and a wrapped-negative silent ADMIT-the-tail under
      // ansi=false. 3·N can't wrap below 3e18 docs; 2·D below 2^62
      // domains. (The DuckDB oracle keeps the literal product: it
      // errors loudly on overflow rather than wrapping, and the oracle
      // only runs at small SF.) The divisor floors at 1: with empty
      // state AND an empty batch n_domains = 0, and under ANSI mode
      // the raw div is a DIVIDE_BY_ZERO abort that would kill the
      // stream on an empty micro-batch — the floor keeps it a no-op
      // (no rows exist for adm_cap to gate when D = 0)
      .select(expr("(n_old + n_new) * 3 div (greatest(n_domains, 1) * 2)")
        .as("adm_cap"))
    val w = Window.partitionBy(col("domain"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    nd.withColumn("rn", row_number().over(w))
      .join(st.select(col("domain"), col("n_admitted").as("a0")),
        Seq("domain"), "left")
      .na.fill(0L, Seq("a0"))
      .crossJoin(broadcast(consts))
      .withColumn("adm", col("a0") + col("rn") <= col("adm_cap"))
  }
}

/** [[DomainQuota]] driven from `foreachBatch`: durable per-domain
  * state under `stateDir`, [[StreamingQuota]]'s append-only delta
  * discipline — one (domain, n_docs, n_admitted, admitted_id_sum) row
  * per domain per batch in a `batch_id=N` partition; the live state is
  * the per-domain SUM of deltas (every state column is an exact Long
  * sum, so folding commutes), and [[compact]] folds them when the file
  * count grows. Replay safety as in StreamingQuota: a replayed batch
  * id budgets against everything EXCEPT its own first attempt's deltas
  * and dynamic-overwrites only its own partition, so it admits exactly
  * the rows of the first attempt.
  *
  * @param materialize pin strategy for the admitted output — must
  *   resolve EAGER (the StreamingQuota contract): the returned rows
  *   must be the exact set whose delta was just written; a lazy pin
  *   could recompute against a grown state. */
/** @param compactEvery fold the delta partitions automatically every N
  *   batches (0 = off) — StreamingQuota's mid-stream-safe discipline:
  *   everything EXCEPT the triggering batch's own partition folds into
  *   the -2 sentinel (only the current, uncommitted id can replay
  *   under foreachBatch; earlier ids' attribution is dead weight).
  *   Without it the state dir grows one partition dir per micro-batch
  *   forever. Requires monotonically increasing batch ids. */
final class StreamingDomainQuota(spark: SparkSession, stateDir: String,
    domainCol: String = "domain", idCol: String = "doc_id",
    materialize: graft.operators.Materialize =
      graft.operators.Materialize.SessionDefault("StreamingDomainQuota.admitted"),
    compactEvery: Int = 0) {

  // durable-state machinery shared with StreamingMixtureQuota — the
  // rule-specific part of this class is ONLY the admission gate
  private val store = new AdmissionDeltaStore(spark, stateDir, "domain")

  /** Live per-domain state (the fold of all deltas); None before the
    * first admission. */
  def state(): Option[DataFrame] = store.state()

  /** Admit `batch`'s rows under the updated domain cap, append the
    * per-domain delta, return the admitted rows (original schema).
    * Pass the foreachBatch `batchId` for replay safety (the -1 default
    * keeps plain append for bounded-loop callers). */
  def admit(batch: DataFrame, batchId: Long = -1L): DataFrame = {
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      store.compactExcluding(batchId)
    val m = materialize.resolveEagerFor(batch)
    require(m.isEager, s"StreamingDomainQuota needs an EAGER Materialize " +
      s"strategy (LocalCheckpoint or ReliableCheckpoint), got $m — a " +
      "lazy pin could recompute the admitted set against a grown state")
    val st = store.stateExcluding(batchId)
      .getOrElse(DomainQuota.emptyState(spark))
    // pin the canonical projection ONCE: rankedAdmissions reads its
    // new-slice input three times (totals, domain union, ranking) and
    // the verdict frame feeds both the admitted join-back and the
    // state delta — unpinned, the caller's micro-batch plan would
    // re-evaluate up to four times per admit (the multi-reference
    // class the exchange-budget gate exists to catch)
    val nd = m(batch.select(col(idCol).cast("long").as("doc_id"),
      col(domainCol).cast("string").as("domain")))
    val verdicts = m(DomainQuota.rankedAdmissions(st, nd))
    // join back on the id to keep the caller's original schema (the
    // verdict frame carries only the canonical projection)
    val admittedIds = verdicts.filter(col("adm")).select(col("doc_id"))
    val admitted = m(batch.join(
      broadcastIfSafe(admittedIds.withColumnRenamed("doc_id", "__adm_id")),
      col(idCol).cast("long") === col("__adm_id")).drop("__adm_id"))
    store.writeDelta(verdicts.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("adm"), 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("adm"), col("doc_id")).otherwise(0L))
          .as("admitted_id_sum")), batchId)
    admitted
  }

  // the admitted-id set is batch-sized (≤ one micro-batch), so the
  // broadcast is safe by construction — marked explicitly so AQE
  // never sorts a micro-batch for a 3-row join
  private def broadcastIfSafe(df: DataFrame): DataFrame = broadcast(df)

  /** Fold the delta partitions into one `batch_id=-2` sentinel
    * partition (StreamingQuota.compact's convention and crash-safe
    * GenerationSwap choreography — a crash can never silently reset
    * domain budgets). */
  def compact(): Unit = store.compact()
}
