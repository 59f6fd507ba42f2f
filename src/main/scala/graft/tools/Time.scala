package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Single-query timing helper for plan iteration:
  * `runMain graft.tools.Time <queryName> [sfDir] [reps]` — full
  * materialization through the noop sink, same as Bench, with an
  * untimed warm-up of the entry query for JIT/codegen parity.
  */
object Time {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: Time <queryName> [sfDir] [reps]\navailable: "
        + SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val name = args(0)
    if (!SparkEntry.queries.contains(name)) {
      System.err.println(s"unknown query '$name'; available: "
        + SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.local()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch {
      case e: Throwable => // a broken warm-up skews rep 1 with JIT/codegen cost
        System.err.println(s"[time] WARNING warm-up failed: ${e.getMessage}")
    }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[time] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
