package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental target-share MIXTURE — q57's data-mixing goal (each
  * stratum contributes at most its target share of the corpus)
  * maintained against STORED per-stratum admission state: the q183
  * discipline applied to mixing, completing the continuous-ingestion
  * curation trio (domain quota / near-dedup / mixture).
  *
  * The static primitive (q57, [[graft.functions.SamplingFunctions
  * .mixtureSample]]) is a hash-rate draw: keep a doc iff
  * `hash(id) mod 10^4 < rate_bp` with `rate_bp = target_bp·N/n_g`.
  * That rate is NOT monotone under a growing corpus — a stratum's
  * rate FALLS as it dominates, so re-evaluating the draw per epoch
  * would un-admit history (exactly what continuous ingestion must
  * never do). The incremental form keeps the same target shares as a
  * rank CAP instead: admit a stratum's rank-rn doc (md5 order, the
  * q169 cross-engine discipline; ranks offset by the state's consumed
  * slots) iff
  *
  *   a0 + rn ≤ (target_bp(g) · N) div 10^4
  *
  * under the UPDATED corpus total N. Exact integers only; admission
  * monotone (caps only grow with N); strata absent from the target
  * map get cap 0 — tracked in state, never admitted (q57's
  * drop-unlisted rule). NULL strata are dropped, q57's explicit rule.
  *
  * Overflow: the cap is evaluated in the decomposed form
  * `bp·(N div 10^4) + (bp·(N mod 10^4)) div 10^4` — exact for every
  * Long N (bp·(N div 10^4) ≤ N since bp ≤ 10^4), where the literal
  * product bp·N wraps past 2^63 at ~9e14 docs. (The DuckDB oracle
  * keeps the literal cross-multiplied gate: it errors loudly on
  * overflow and only runs at small SF.)
  *
  * Scale notes shared with [[DomainQuota]]: the rank window
  * partitions by stratum; the state join reuses its hash
  * partitioning; N is ONE broadcast scalar row; state is per-stratum
  * (control-plane-sized). The target map is a literal when-chain
  * (codegen constant), never a joined table.
  */
object MixtureQuota {

  /** Zero-stratum starting state in the canonical schema. */
  def emptyState(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("stratum", StringType),
        StructField("n_docs", LongType),
        StructField("n_admitted", LongType),
        StructField("admitted_id_sum", LongType))))
  }

  /** One incremental step: fold `newDocs` into per-stratum admission
    * `state` under the updated target-share caps. Returns the NEXT
    * state — one row per stratum ever seen: (stratum, n_docs,
    * n_admitted, admitted_id_sum), all exact Long sums
    * (admitted_id_sum pins exact MEMBERSHIP, the q181 keeper-sum
    * rule). Running it from [[emptyState]] over one slice is the
    * batch rank-cap mixture on that slice.
    *
    * Multi-reference inputs: same pinning contract as
    * [[DomainQuota.admitIncrement]] — pin anything expensive before
    * calling. */
  def admitIncrement(state: DataFrame, newDocs: DataFrame,
      targetBp: Map[String, Int], stratumCol: String = "stratum",
      idCol: String = "doc_id"): DataFrame = {
    val st = state.select(col("stratum").cast("string").as("stratum"),
      col("n_docs").cast("long").as("n_docs"),
      col("n_admitted").cast("long").as("n_admitted"),
      col("admitted_id_sum").cast("long").as("admitted_id_sum"))
    val nd = newDocs.select(col(idCol).cast("long").as("doc_id"),
        col(stratumCol).cast("string").as("stratum"))
      .filter(col("stratum").isNotNull)
    val inc = rankedAdmissions(st, nd, targetBp)
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("i_docs"),
        sum(when(col("adm"), 1L).otherwise(0L)).as("i_admitted"),
        sum(when(col("adm"), col("doc_id")).otherwise(0L)).as("i_sum"))
    st.join(inc, Seq("stratum"), "full_outer")
      .select(col("stratum"),
        (coalesce(col("n_docs"), lit(0L)) +
          coalesce(col("i_docs"), lit(0L))).as("n_docs"),
        (coalesce(col("n_admitted"), lit(0L)) +
          coalesce(col("i_admitted"), lit(0L))).as("n_admitted"),
        (coalesce(col("admitted_id_sum"), lit(0L)) +
          coalesce(col("i_sum"), lit(0L))).as("admitted_id_sum"))
  }

  /** The shared gate: new rows ranked per stratum (md5 order), offset
    * by the state's consumed slots, flagged `adm` under the
    * updated-total target-share cap. Inputs must already carry the
    * canonical column names (NULL strata dropped). Used by the pure
    * fold above and by [[StreamingMixtureQuota]] (which needs the
    * per-ROW verdict). */
  private[streaming] def rankedAdmissions(st: DataFrame, nd: DataFrame,
      targetBp: Map[String, Int]): DataFrame = {
    targetBp.values.foreach(bp =>
      require(bp >= 0 && bp <= 10000, s"share out of range: $bp bp"))
    // N under the NEW total: one scalar row, broadcast
    val consts = st.agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_old"))
      .crossJoin(broadcast(nd.agg(count(lit(1)).as("n_new"))))
      .select((col("n_old") + col("n_new")).as("n_total"))
    // the stratum → target_bp literal when-chain (the mixtureSample
    // shape): a codegen'd constant lookup, no join
    val bpCol: Column = targetBp.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (v, bp)) =>
        when(col("stratum") === lit(v), lit(bp.toLong)).otherwise(acc)
      }
    val w = Window.partitionBy(col("stratum"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    nd.withColumn("rn", row_number().over(w))
      .join(st.select(col("stratum"), col("n_admitted").as("a0")),
        Seq("stratum"), "left")
      .na.fill(0L, Seq("a0"))
      .crossJoin(broadcast(consts))
      .withColumn("target_bp", bpCol)
      // overflow-proof decomposed cap — see the object scaladoc
      .withColumn("adm_cap",
        expr("target_bp * (n_total div 10000) + " +
          "(target_bp * (n_total % 10000)) div 10000"))
      .withColumn("adm", col("a0") + col("rn") <= col("adm_cap"))
  }
}

/** [[MixtureQuota]] driven from `foreachBatch`: durable per-stratum
  * state under `stateDir` via the shared [[AdmissionDeltaStore]]
  * (StreamingQuota's append-only delta discipline, replay-safe
  * batch-id exclusion, crash-safe compaction) — the structural twin
  * of [[StreamingDomainQuota]] with the mixture gate.
  *
  * @param materialize pin strategy for the admitted output — must
  *   resolve EAGER (the StreamingQuota contract): the returned rows
  *   must be the exact set whose delta was just written.
  * @param compactEvery fold the delta partitions automatically every N
  *   batches (0 = off), sparing the triggering batch's own partition
  *   (only the current, uncommitted id can replay under foreachBatch). */
final class StreamingMixtureQuota(spark: SparkSession, stateDir: String,
    targetBp: Map[String, Int],
    stratumCol: String = "stratum", idCol: String = "doc_id",
    materialize: graft.operators.Materialize =
      graft.operators.Materialize.SessionDefault("StreamingMixtureQuota.admitted"),
    compactEvery: Int = 0) {

  private val store = new AdmissionDeltaStore(spark, stateDir, "stratum")

  /** Live per-stratum state (the fold of all deltas); None before the
    * first admission. */
  def state(): Option[DataFrame] = store.state()

  /** Admit `batch`'s rows under the updated target-share caps, append
    * the per-stratum delta, return the admitted rows (original
    * schema). Pass the foreachBatch `batchId` for replay safety (the
    * -1 default keeps plain append for bounded-loop callers). */
  def admit(batch: DataFrame, batchId: Long = -1L): DataFrame = {
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      store.compactExcluding(batchId)
    val m = materialize.resolveEagerFor(batch)
    require(m.isEager, s"StreamingMixtureQuota needs an EAGER Materialize " +
      s"strategy (LocalCheckpoint or ReliableCheckpoint), got $m — a " +
      "lazy pin could recompute the admitted set against a grown state")
    val st = store.stateExcluding(batchId)
      .getOrElse(MixtureQuota.emptyState(spark))
    // pin the canonical projection ONCE (the multi-reference rule —
    // see StreamingDomainQuota.admit)
    val nd = m(batch.select(col(idCol).cast("long").as("doc_id"),
        col(stratumCol).cast("string").as("stratum"))
      .filter(col("stratum").isNotNull))
    val verdicts = m(MixtureQuota.rankedAdmissions(st, nd, targetBp))
    val admittedIds = verdicts.filter(col("adm")).select(col("doc_id"))
    // batch-sized set — broadcast explicitly so AQE never sorts a
    // micro-batch for a few-row join
    val admitted = m(batch.join(
      broadcast(admittedIds.withColumnRenamed("doc_id", "__adm_id")),
      col(idCol).cast("long") === col("__adm_id")).drop("__adm_id"))
    store.writeDelta(verdicts.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("adm"), 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("adm"), col("doc_id")).otherwise(0L))
          .as("admitted_id_sum")), batchId)
    admitted
  }

  /** Fold the delta partitions into one `batch_id=-2` sentinel
    * partition (crash-safe GenerationSwap choreography). */
  def compact(): Unit = store.compact()
}
