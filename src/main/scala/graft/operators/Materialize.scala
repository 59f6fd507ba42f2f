package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization strategy for operators whose correctness requires
  * every downstream branch to read ONE physical materialization of an
  * intermediate pass ([[GlobalIndex]], [[GlobalPrefix]]: range
  * boundaries are sampled with an RDD-id-derived seed, so two separate
  * materializations of the "same" ranged pass can legally hold
  * DIFFERENT partitionings — joining control-plane offsets computed on
  * one against data rows of the other silently mispairs).
  *
  * The strategies trade speed against failure-domain:
  *
  *  - [[Materialize.LocalCheckpoint]] — fastest (executor-local blocks,
  *    no lineage): the bench/single-machine default. TRUNCATES LINEAGE
  *    and pins blocks to specific executors, so on a real cluster one
  *    lost executor (routine at 1000-executor scale, guaranteed under
  *    dynamic allocation downscaling) makes the job unrecoverable.
  *    Do not use with `spark.dynamicAllocation.enabled` unless
  *    `spark.dynamicAllocation.cachedExecutorIdleTimeout` is infinite.
  *  - [[Materialize.persistDisk]] — `persist(DISK_ONLY_2)`: blocks are
  *    written to disk with a replica on a second executor, and lineage
  *    is KEPT, so a lost executor recomputes or reads the replica
  *    instead of killing the job. All consumers share the one cached
  *    plan (Spark's cache manager canonicalizes them onto a single
  *    InMemoryRelation), so boundary consistency holds identically.
  *    The cluster-scale default choice. The returned handle is
  *    RELEASABLE — call `release()` when downstream consumption is
  *    done (unpersisting the operator's output is a silent no-op; see
  *    [[Materialize.PersistDisk]]).
  *  - [[Materialize.ReliableCheckpoint]] — `checkpoint()` to the
  *    configured `spark.sparkContext.setCheckpointDir` (HDFS/object
  *    store): survives ANY number of executor losses; the most durable
  *    and the slowest (a full write + read of the pass through the
  *    reliable store). Requires the checkpoint dir to be set — fails
  *    loudly otherwise.
  *
  * Callers pass the strategy per call; the default everywhere is
  * LocalCheckpoint because this repo's tests and benches run
  * single-JVM, where its executor-loss caveat cannot bite.
  */
sealed trait Materialize {
  /** One shared materialization of `df` that every downstream branch
    * reads — see the strategy docs for the durability trade. */
  def apply(df: DataFrame): DataFrame
}

object Materialize {

  case object LocalCheckpoint extends Materialize {
    // EAGER by choice: construction-time materialization IS the
    // boundary-consistency statement these operators make (every
    // consumer reads one pinned partitioning, whatever actions follow).
    // The lazy form shares within one action too
    // (MaterializationDisciplineSpec) and was measured here — no
    // faster on the q65/q124 family — so eager keeps the stronger
    // guarantee at no cost.
    def apply(df: DataFrame): DataFrame = df.localCheckpoint()
  }

  /** Each call returns a fresh releasable instance — the caller that
    * picked the persist strategy OWNS the cache entry's lifetime. */
  def persistDisk(): PersistDisk = new PersistDisk

  /** Releasable persist handle. Calling `unpersist()` on the
    * OPERATOR'S OUTPUT would be a silent no-op — the cache manager
    * matches the exact cached plan (the operator's internal pass), not
    * the returned join plan — so without this handle every
    * PersistDisk call in a long-lived session would leak one
    * disk-cached relation until clearCache(). Call [[release]] once
    * downstream consumption is done. */
  final class PersistDisk private[Materialize] () extends Materialize {
    @volatile private var pinned: List[DataFrame] = Nil
    // persist is lazy, but all references canonicalize onto the ONE
    // InMemoryRelation, whose child executes once — one exchange, one
    // sampled boundary set, shared by every branch. No eager action
    // needed (an extra count() would be a second pass over the data).
    def apply(df: DataFrame): DataFrame = {
      val p = df.persist(StorageLevel.DISK_ONLY_2)
      synchronized { pinned ::= p }
      p
    }
    /** Unpersist every pass this instance pinned. */
    def release(blocking: Boolean = false): Unit = synchronized {
      pinned.foreach { df => df.unpersist(blocking); () }
      pinned = Nil
    }
  }

  case object ReliableCheckpoint extends Materialize {
    def apply(df: DataFrame): DataFrame = {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "Materialize.ReliableCheckpoint needs spark.sparkContext.setCheckpointDir(...)")
      df.checkpoint()
    }
  }
}
