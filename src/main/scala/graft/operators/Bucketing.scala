package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the 100 TB technique for repeated
  * equi-joins on a stable key (fact-to-fact joins the broadcast path
  * can't serve): write both sides bucketed AND sorted by the join key,
  * and every later join on that key is exchange-free — each task
  * sort-merges bucket i against bucket i, no shuffle of either side,
  * ever again. The write pays one shuffle ONCE; every subsequent join
  * (daily pipelines re-joining the same tables) rides for free.
  *
  * Spark only recognizes bucket layout through the catalog, so the
  * helper materializes managed tables (`saveAsTable`); `nBuckets`
  * should match or evenly divide across both sides.
  */
object Bucketing {

  /** Write `df` bucketed+sorted by `key` as managed table `name`
    * (overwriting), and return the catalog-backed frame. */
  def writeBucketed(df: DataFrame, name: String, key: String,
      nBuckets: Int): DataFrame = {
    val spark = df.sparkSession
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)
    spark.table(name)
  }

  /** True when `df`'s physical plan contains no shuffle exchange —
    * the assertion that a bucketed join is actually co-located.
    *
    * AQE wraps any plan that contains a shuffle in an
    * `AdaptiveSparkPlanExec`, which is a LEAF node — a naive
    * `plan.exists` never descends into it and reports every adaptive
    * plan (i.e. every plan WITH a shuffle) as exchange-free. So the
    * scan recurses through adaptive wrappers and materialized query
    * stages before looking for `ShuffleExchangeLike`. */
  def isExchangeFree(df: DataFrame): Boolean =
    !hasShuffle(df.queryExecution.executedPlan)

  private def hasShuffle(plan: org.apache.spark.sql.execution.SparkPlan): Boolean =
    plan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        hasShuffle(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        hasShuffle(s.plan)
      case _ => false
    }
}
