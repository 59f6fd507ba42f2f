package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming per-key quota — the domain-mixing budget
  * ([[graft.functions.SamplingFunctions.quotaPerGroup]]) as a
  * streaming operator: admit rows for a key only while the key's
  * CUMULATIVE admitted count (across all micro-batches so far) is
  * under `budget`. The streaming face of per-source capping: once a
  * crawl source has contributed its budget, later batches from it are
  * dropped at ingest.
  *
  * Drive from `foreachBatch` (or any loop of bounded frames). State is
  * an APPEND-ONLY parquet delta table under `stateDir` — one
  * `(key, n_admitted)` row per key per batch. Appending sidesteps the
  * read-your-own-overwrite hazard entirely (the state read and the
  * state write of one batch never touch the same files); the live
  * "used" view is `sum(n)` per key, and [[compact]] folds the deltas
  * into one row per key when the file count grows. State size is
  * control-plane-bounded: |keys seen| × |batches since compact|, never
  * row-scaled.
  *
  * Admission within a batch is deterministic: rows rank by
  * (`orderCol`, `tieCol`) per key and fill the remaining budget in
  * that order — re-running the same batch sequence admits the same
  * rows (the retry/replay property every deterministic sampler in
  * [[graft.functions.SamplingFunctions]] guarantees).
  *
  * At cluster scale: the state side of the join is tiny and
  * broadcast; the batch side shuffles once on the key for the ranking
  * window. The admitted output is localCheckpointed before the state
  * append so the side effect and the returned frame agree even if the
  * caller re-evaluates lazily.
  */
final class StreamingQuota(spark: SparkSession, stateDir: String,
    keyCol: String, orderCol: String, tieCol: String, budget: Int) {
  require(budget > 0, "budget must be positive")

  private def fs = new org.apache.hadoop.fs.Path(stateDir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def hasState: Boolean = {
    recoverCompact()
    val p = new org.apache.hadoop.fs.Path(stateDir)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Crash recovery for [[compact]]: if a crash landed between "old
    * state renamed aside" and "compacted dir renamed into place", the
    * live dir is missing but the fully-materialized `.compact` sibling
    * (or the untouched `.old`) holds the budgets — adopt it rather than
    * silently resetting every key's budget to zero. */
  private def recoverCompact(): Unit = {
    val live = new org.apache.hadoop.fs.Path(stateDir)
    val tmp = new org.apache.hadoop.fs.Path(stateDir + ".compact")
    val old = new org.apache.hadoop.fs.Path(stateDir + ".old")
    if (!fs.exists(live)) {
      if (fs.exists(tmp)) fs.rename(tmp, live)
      else if (fs.exists(old)) fs.rename(old, live)
    }
    // leftovers from a completed (or recovered) compact are dead state
    if (fs.exists(live)) { fs.delete(tmp, true); fs.delete(old, true) }
  }

  /** Cumulative admitted count per key (the fold of all deltas);
    * None before the first admission. */
  def used(): Option[DataFrame] =
    if (!hasState) None
    else Some(spark.read.parquet(stateDir)
      .groupBy(col(keyCol)).agg(sum(col("n")).as("graft_used")))

  /** Admit up to the remaining budget per key from `batch`; append the
    * per-key admitted counts to the state and return the admitted
    * rows (original schema). */
  def admit(batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
    val ranked = batch.withColumn("graft_rk", row_number().over(w))
    val withUsed = used().fold(ranked.withColumn("graft_used", lit(0L)))(u =>
      ranked.join(broadcast(u), Seq(keyCol), "left"))
    val admitted = withUsed
      .filter(coalesce(col("graft_used"), lit(0L)) + col("graft_rk") <= budget)
      .drop("graft_rk", "graft_used")
      .localCheckpoint(true)
    admitted.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .write.mode("append").parquet(stateDir)
    admitted
  }

  /** Fold the delta files into one row per key (storage reclaim; same
    * contract as StreamingNearDup.compact / FilePubSub.compact). The
    * folded view writes to a sibling dir FIRST — the fold is fully
    * materialized before the old state is dropped. */
  def compact(): Unit = used().foreach { u =>
    val tmp = stateDir + ".compact"
    u.select(col(keyCol), col("graft_used").as("n"))
      .repartition(1).write.mode("overwrite").parquet(tmp)
    // crash-safe swap: the live state is renamed ASIDE (not deleted)
    // before the compacted dir takes its place, so every crash point
    // leaves either the live dir or a recoverable sibling that
    // [[recoverCompact]] adopts on the next read — a crash can never
    // silently reset budgets and over-admit exhausted keys on restart
    val live = new org.apache.hadoop.fs.Path(stateDir)
    val old = new org.apache.hadoop.fs.Path(stateDir + ".old")
    fs.rename(live, old)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), live)
    fs.delete(old, true)
  }
}
