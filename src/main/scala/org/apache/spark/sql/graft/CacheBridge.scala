package org.apache.spark.sql.graft

import java.lang.ref.WeakReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.SparkSession

/** Bridge into the `private[sql]` CacheManager for
  * [[graft.operators.Materialize]]'s releasable pins (same visibility
  * rationale as [[ColumnBridge]]).
  *
  * Why not just hold the pinned Dataset and call `unpersist()`? A
  * Dataset strongly references its SparkSession — and so does its
  * analyzed plan (LogicalRelation → HadoopFsRelation carries the
  * session). Materialize tracks pins in a WEAK-KEYED per-session map,
  * and per WeakHashMap semantics a value that strongly references its
  * own key prevents the entry from ever being cleared: every dropped
  * session that had pinned would leak permanently. So a pin holds only
  * WEAK references — the session, and the normalized plan that keys
  * the cache entry. The CacheManager itself holds that plan strongly
  * for exactly as long as the entry exists, so the weak plan ref dies
  * precisely when release would be a no-op anyway, and a dead session
  * takes its cache with it.
  */
object CacheBridge {

  final class PlanPin private[CacheBridge] (
      session: WeakReference[SparkSession],
      plan: WeakReference[LogicalPlan]) {
    /** Uncache the pinned plan if both the session and the cache entry
      * are still alive; otherwise there is nothing left to release. */
    def release(blocking: Boolean): Unit =
      for (s <- Option(session.get); p <- Option(plan.get))
        s.sharedState.cacheManager
          .uncacheQuery(s, p, cascade = false, blocking = blocking)
  }

  /** Weak pin of `df`'s cache entry — call AFTER `df.persist(...)`. */
  def pin(df: DataFrame): PlanPin =
    new PlanPin(
      new WeakReference(df.sparkSession.asInstanceOf[SparkSession]),
      new WeakReference(df.queryExecution.normalized))
}
