package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global running SUM over a total order — WITHOUT the
  * single-partition window `SUM() OVER (ORDER BY …)` plans (one task
  * accumulates the world: the same 100 TB cliff [[GlobalIndex]]
  * removes for row numbering, generalized here to the prefix-scan
  * monoid). Cumulative revenue curves, Lorenz/market-share curves,
  * token-budget watermarks over a whole corpus — all this shape.
  *
  * Classic two-phase distributed scan: range-partition on the order
  * keys, compute the LOCAL running sum inside each partition (window
  * keyed by `spark_partition_id()` — every sort is task-local),
  * aggregate ONE ROW PER PARTITION of totals, exclusive-prefix-sum
  * those (a window over control-plane-sized data), and broadcast-join
  * the offsets back: global prefix = local prefix + partition offset.
  *
  * Like [[GlobalIndex]], everything is ONE plan so both consumers hang
  * off the SAME sampled range exchange (exchange reuse is a
  * correctness precondition — boundaries are RDD-id-seeded;
  * GlobalPrefixSpec asserts the ReusedExchange). The result is
  * boundary-invariant: it equals the prefix sum under the total order
  * whatever boundaries the sampler picked.
  *
  * `keys` must be a TOTAL order; `value` should be integral for
  * cross-engine exactness (sum of longs; ANSI throws on overflow
  * rather than wrapping).
  */
object GlobalPrefix {

  def runningSum(
      df: DataFrame,
      keys: Seq[Column],
      value: Column,
      outCol: String = "running",
      numPartitions: Option[Int] = None): DataFrame = {
    require(keys.nonEmpty, "at least one ordering key")
    val withV = df.withColumn("_v", value)
    val ranged = numPartitions
      .map(n => withV.repartitionByRange(n, keys: _*))
      .getOrElse(withV.repartitionByRange(keys: _*))
      .withColumn("_pid", spark_partition_id())

    val local = ranged.withColumn("_lp",
      sum(col("_v")).over(Window.partitionBy(col("_pid")).orderBy(keys: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val offsets = ranged.groupBy(col("_pid"))
      .agg(sum(col("_v")).as("_t"))
      .withColumn("_offset",
        coalesce(sum(col("_t")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_t")

    local.join(broadcast(offsets), Seq("_pid"), "left")
      .withColumn(outCol, coalesce(col("_offset"), lit(0L)) + col("_lp"))
      .drop("_pid", "_lp", "_offset", "_v")
  }
}
