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
      else {
        // ALL matches, not .find: with a single find, two queries
        // sharing a numeric prefix would silently time whichever the
        // map iterates first (the r20 ADVICE wrong-query-timing bug)
        val ms = all.keys.filter(
          _.stripPrefix("q").takeWhile(_ != '_') == q.stripPrefix("q")).toSeq
        ms match {
          case Seq(one) => one
          case Seq() =>
            System.err.println(s"unknown query '$q'"); sys.exit(2); ""
          case many =>
            System.err.println(
              s"ambiguous query '$q': ${many.sorted.mkString(", ")}")
            sys.exit(2); ""
        }
      }
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty).map(resolve)
    val spark = GraftSession.local()
    // per-stage metrics collector: empirical decomposition of each
    // query's time (guide §1.1 — where is the time actually going)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, String, Long, Int, Long, Long, Long, Long)]()
    // per-task durations per stage: the skew evidence (max vs median
    // task time, guide §2.5) a stage-aggregate listener cannot show
    val taskDur = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          taskDur.computeIfAbsent(te.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
            .add(te.taskInfo.duration)
          ()
        }
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
        if (i == reps) { stages.clear(); taskDur.clear() } // profile the warmest rep only
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[time-many] $name rep $i: $dt%.3f s")
        dt
      }
      Thread.sleep(300) // let async stage events drain
      val st = stages.toArray(Array.empty[(Int, String, Long, Int, Long, Long, Long, Long)])
      println(s"[stages] $name — stageId wall(ms) tasks runTime(ms) cpu(ms) fetchWait(ms) shufWrKB taskMax/Med(ms) name")
      st.sortBy(-_._3).take(12).foreach { case (id, nm, w, nt, rt, cpu, fw, sw) =>
        val ds = Option(taskDur.get(id))
          .map(_.toArray(Array.empty[java.lang.Long]).map(_.longValue).sorted)
          .getOrElse(Array.empty[Long])
        val (mx, md) =
          if (ds.isEmpty) (-1L, -1L) else (ds.last, ds(ds.length / 2))
        println(f"[stages]   $id%5d $w%7d $nt%5d $rt%8d $cpu%8d $fw%6d ${sw / 1024}%8d $mx%6d/$md%-6d $nm")
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
