package graft.tools

import graft.{GraftSession, SparkEntry}

/** Post-execution plan dump: runs one registry query to completion so
  * AQE finalizes, then prints the FINAL physical plan — the form in
  * which runtime exchange/stage reuse is visible (the initial plan
  * shows duplicate subtrees that AQE may still dedup at stage
  * submission). Usage: PlanRuntime <queryName> [sfDir]
  */
object PlanRuntime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    val fin = p.split("== Initial Plan ==").head
    println("== FINAL ==")
    println(fin)
    println("hashEx=" + fin.linesIterator.count(_.contains("Exchange hashpartitioning")))
    println("rangeEx=" + fin.linesIterator.count(_.contains("Exchange rangepartitioning")))
    println("reused=" + fin.linesIterator.count(l => l.contains("ReusedExchange") || l.contains("TableCacheQueryStage")))
    println("scans=" + fin.linesIterator.count(_.contains("Scan parquet")))
    spark.stop()
  }
}
