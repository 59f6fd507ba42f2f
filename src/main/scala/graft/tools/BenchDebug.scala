package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch harness for bisecting bench-loop contamination: runs the
  * first N queries in bench order, timing each, optionally skipping
  * the inter-query cache/RDD cleanup, optionally running one query
  * twice in a row. Usage: BenchDebug <sfDir> <uptoName> [noclean] [repeat]
  */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val upto = args(1)
    val clean = !args.contains("noclean")
    val repeat = args.contains("repeat")
    val spark = GraftSession.local()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val names = SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ != upto) :+ upto
    names.foreach { name =>
      val reps = if (repeat && name == upto) 2 else 1
      (1 to reps).foreach { _ =>
        if (clean) {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        }
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[benchdebug] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
