package graft.tools

import graft.{GraftSession, SparkEntry}

/** Batch timing + plan-dump helper for optimization iteration:
  * `runMain graft.tools.TimeMany <sfDir> <reps> <q1,q2,...> [plansDir]`
  * — times each named query `reps` times through the noop sink (same
  * methodology as Bench: isolate, min-of-N) in ONE JVM, and when
  * `plansDir` is given also writes each query's
  * `explain("formatted")` to `<plansDir>/<name>.txt`. Accepts bare
  * numeric prefixes ("19" = q19_…) like the bench compact line.
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: TimeMany <sfDir> <reps> <q1,q2,...|top:N> [plansDir]")
      sys.exit(2)
    }
    val dir = args(0)
    val reps = args(1).toInt
    val plansDir = if (args.length > 3) Some(args(3)) else None
    val all = SparkEntry.queries
    def resolve(q: String): String =
      if (all.contains(q)) q
      else all.keys.find(_.stripPrefix("q").takeWhile(_ != '_') == q.stripPrefix("q"))
        .getOrElse {
          System.err.println(s"unknown query '$q'"); sys.exit(2); ""
        }
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty).map(resolve)
    val spark = GraftSession.local()
    // per-stage metrics collector: empirical decomposition of each
    // query's time (guide §1.1 — where is the time actually going)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, String, Long, Int, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          val wall = (for {
            a <- si.completionTime; b <- si.submissionTime
          } yield a - b).getOrElse(-1L)
          stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(90),
            wall, si.numTasks, tm.executorRunTime, tm.executorCpuTime / 1000000L,
            tm.shuffleReadMetrics.fetchWaitTime, tm.shuffleWriteMetrics.bytesWritten))
          ()
        }
      })
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch {
      case e: Throwable =>
        System.err.println(s"[time-many] WARNING warm-up failed: ${e.getMessage}")
    }
    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    plansDir.foreach(d => java.nio.file.Files
      .createDirectories(java.nio.file.Paths.get(d)))
    val results = names.map { name =>
      val fn = all(name)
      plansDir.foreach { d =>
        val txt = fn(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"$name.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      val ts = (1 to reps).map { i =>
        isolate()
        if (i == reps) stages.clear() // profile the warmest rep only
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[time-many] $name rep $i: $dt%.3f s")
        dt
      }
      Thread.sleep(300) // let async stage events drain
      val st = stages.toArray(Array.empty[(Int, String, Long, Int, Long, Long, Long, Long)])
      println(s"[stages] $name — stageId wall(ms) tasks runTime(ms) cpu(ms) fetchWait(ms) shufWrKB name")
      st.sortBy(-_._3).take(12).foreach { case (id, nm, w, nt, rt, cpu, fw, sw) =>
        println(f"[stages]   $id%5d $w%7d $nt%5d $rt%8d $cpu%8d $fw%6d ${sw / 1024}%8d  $nm")
      }
      println(f"[stages]   total-wall=${st.map(_._3).sum}%d ms over ${st.length} stages")
      name -> ts.min
    }
    println("[time-many] ---- min seconds ----")
    results.foreach { case (n, t) => println(f"[time-many] $n%-40s $t%.3f") }
    println(f"[time-many] sum-of-mins: ${results.map(_._2).sum}%.3f")
    spark.stop()
  }
}
