package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight shuffle diagnostics: the audits a pipeline runs BEFORE
  * committing to a partitioning/join strategy at 100 TB. Cheap by
  * construction — every profile is an aggregation over the key
  * columns only (column-pruned scan, one shuffle), never a
  * materialization of the data being profiled.
  */
object Diagnostics {

  /** Group-size histogram for a prospective shuffle/join key, bucketed
    * by decimal magnitude (1-9, 10-99, ...): how skewed is this key,
    * and how hot is the hottest group? Read it before choosing between
    * a plain shuffle, `broadcast`, [[graft.operators.SkewJoin]]
    * salting, or AQE skew splitting. Two shuffles total: the per-key
    * count and the (tiny, |magnitudes|-row) histogram roll-up. */
  def keyLoadProfile(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("k"))
      .agg(count(lit(1)).as("n"))
      .groupBy(length(col("n").cast("string")).as("magnitude"))
      .agg(count(lit(1)).as("n_keys"), max(col("n")).as("max_group"),
        sum(col("n")).as("n_rows"))
      .orderBy(col("magnitude"))
}
