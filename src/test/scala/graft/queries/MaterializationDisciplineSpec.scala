package graft.queries

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the MEASURED semantics behind the repo's multi-reference
  * materialization discipline (the q151/q153/q170 comments), so the
  * choice between the three pinning forms stays fact-based:
  *
  *  - `cache()` shares blocks AS THEY COMPUTE, even between two
  *    branches of ONE action — but the entry leaks per call outside
  *    an explicit unpersist/clearCache (why the registry avoids it);
  *  - EAGER `localCheckpoint(true)` computes the upstream exactly once
  *    in its own up-front job, blocks freed with the frame — pay the
  *    extra job boundary only when construction-time materialization
  *    is itself the point (boundary consistency in GlobalIndex/
  *    GlobalPrefix: every consumer MUST see one partitioning);
  *  - LAZY `localCheckpoint(false)` is persist-backed until the first
  *    job completes, so two consumers inside one action SHARE the
  *    upstream exactly like cache (measured here — this spec exists
  *    because the opposite was plausibly assumed during a review
  *    pass), later actions read the finalized checkpoint, and blocks
  *    free with the frame. For leak-free multi-reference pinning
  *    inside one query, lazy is the default choice.
  */
class MaterializationDisciplineSpec extends SparkSpec {

  private def base: DataFrame = {
    MaterializationProbe.computes.set(0)
    import spark.implicits._
    spark.range(0, 400, 1, 4).mapPartitions { it =>
      MaterializationProbe.computes.incrementAndGet(); it
    }.toDF("v")
  }

  /** Two branches of one action over `df`; returns upstream partition
    * computations observed. */
  private def twoConsumersOneAction(df: DataFrame): Long = {
    val a = df.groupBy((col("v") % 10).as("k")).count()
    val b = df.agg(sum("v"))
    a.crossJoin(b).collect()
    MaterializationProbe.computes.get
  }

  test("eager localCheckpoint computes the upstream exactly once for two branches") {
    assert(twoConsumersOneAction(base.localCheckpoint(true)) == 4,
      "eager checkpoint must run each source partition once")
  }

  test("lazy localCheckpoint ALSO shares within one action (persist-backed until finalize)") {
    assert(twoConsumersOneAction(base.localCheckpoint(false)) == 4,
      "lazy checkpoint must share the upstream between branches of one action")
    // and a SECOND action reuses the now-finalized checkpoint
    val df = base.localCheckpoint(false)
    df.agg(sum("v")).collect()
    val afterFirst = MaterializationProbe.computes.get
    df.groupBy((col("v") % 10).as("k")).count().collect()
    assert(MaterializationProbe.computes.get == afterFirst,
      "a later action must read the materialized checkpoint, not recompute")
  }

  test("cache shares blocks between branches of one action (but leaks without unpersist)") {
    val df = base.cache()
    try assert(twoConsumersOneAction(df) == 4,
      "cached blocks must be shared as they compute")
    finally { df.unpersist(); () }
  }
}

/** Executor-visible probe (closures capture statics, never the suite). */
object MaterializationProbe {
  val computes = new AtomicLong(0)
}
