package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared durable-state machinery behind the incremental-admission
  * operators ([[StreamingDomainQuota]], [[StreamingMixtureQuota]]):
  * per-key admission state under `stateDir` in [[StreamingQuota]]'s
  * append-only delta discipline — one `(key, n_docs, n_admitted,
  * admitted_id_sum)` row per key per batch in a `batch_id=N`
  * partition; the live state is the per-key SUM of deltas (every
  * column is an exact Long sum, so folding commutes), with the
  * replay-safe batch-id exclusion and the crash-safe
  * [[GenerationSwap]] compaction choreography.
  *
  * What stays OUT of the store is the admission rule itself (domain
  * fair-share cap vs target-share mixture cap): the operators differ
  * only there, so the rule is the one thing each keeps.
  *
  * Scale: state is per-key (control-plane-sized — one row per domain
  * or stratum, never row-scaled); every fold is a map-side-combined
  * sum over the pruned four-column parquet. */
private[streaming] final class AdmissionDeltaStore(spark: SparkSession,
    stateDir: String, keyName: String) {

  private def fs = new org.apache.hadoop.fs.Path(stateDir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  @volatile private var recovered = false
  private def recoverCompact(): Unit = {
    if (recovered) return
    GenerationSwap.recoverReplace(fs, stateDir)
    recovered = true
  }

  def hasState: Boolean = {
    recoverCompact()
    val p = new org.apache.hadoop.fs.Path(stateDir)
    fs.exists(p) && fs.listStatus(p).exists(
      _.getPath.getName.startsWith("batch_id="))
  }

  /** Live per-key state (the fold of all deltas); None before the
    * first admission. `batchId >= 0` excludes that id's own partition
    * — the replay-safety rule: a replayed batch budgets against
    * everything EXCEPT its own first attempt. */
  def stateExcluding(batchId: Long): Option[DataFrame] =
    if (!hasState) None
    else {
      val all = spark.read.parquet(stateDir)
      val visible =
        if (batchId >= 0) all.filter(col("batch_id") =!= batchId) else all
      Some(visible.groupBy(col(keyName))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_admitted")).as("n_admitted"),
          sum(col("admitted_id_sum")).as("admitted_id_sum")))
    }

  def state(): Option[DataFrame] = stateExcluding(-1L)

  /** Append (or, for a replayed non-negative id, dynamic-overwrite)
    * one batch's per-key delta partition. */
  def writeDelta(delta: DataFrame, batchId: Long): Unit = {
    val dw = delta.withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
    if (batchId >= 0)
      dw.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(stateDir)
    else dw.mode("append").parquet(stateDir)
  }

  /** The mid-stream-safe fold (StreamingQuota's discipline): every
    * delta EXCEPT `batchId`'s own partition collapses into the -2
    * sentinel; the live id's partition carries over untouched so a
    * replay of it still excludes and overwrites its first attempt.
    * Idempotent under replay re-triggering. */
  def compactExcluding(batchId: Long): Unit = if (hasState) {
    val all = spark.read.parquet(stateDir)
    def cols(df: DataFrame) = df.select(col(keyName), col("n_docs"),
      col("n_admitted"), col("admitted_id_sum"), col("batch_id"))
    val folded = all.filter(col("batch_id") =!= batchId)
      .groupBy(col(keyName))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_admitted")).as("n_admitted"),
        sum(col("admitted_id_sum")).as("admitted_id_sum"))
      .withColumn("batch_id", lit(-2L))
    val keep = all.filter(col("batch_id") === batchId)
    val tmp = stateDir + ".compact"
    cols(folded).unionByName(cols(keep))
      .repartition(1).write.partitionBy("batch_id")
      .mode("overwrite").parquet(tmp)
    GenerationSwap.replaceLive(fs, stateDir, tmp)
  }

  /** Fold everything into one `batch_id=-2` sentinel partition
    * (crash-safe: [[GenerationSwap]] — a crash can never silently
    * reset budgets). */
  def compact(): Unit = state().foreach { s =>
    val tmp = stateDir + ".compact"
    s.withColumn("batch_id", lit(-2L))
      .repartition(1).write.partitionBy("batch_id")
      .mode("overwrite").parquet(tmp)
    GenerationSwap.replaceLive(fs, stateDir, tmp)
  }
}
