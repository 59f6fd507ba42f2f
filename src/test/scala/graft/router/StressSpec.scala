package graft.router

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicReference

import graft.SparkSpec
import graft.core.Message
import graft.sources.MemoryPubSub

/** Concurrency soak, parity with the reference's stress mode
  * (pubsub/tests/test_pubsub.go:216-233 runs the acceptance suite in
  * parallel; test_asserts.go:39-76 asserts uuid set-equality). The
  * contended surfaces here are MemoryPubSub's TrieMaps + synchronized
  * publish and the Router's per-handler StreamingQueries — none of
  * which had a test under parallel load before this suite.
  */
class StressSpec extends SparkSpec {

  private def msg(u: String) =
    Message(u, Map.empty, u.getBytes("UTF-8"), new Timestamp(1700000000000L))

  /** Run `n` threads, re-throwing the first failure on the test thread. */
  private def inParallel(n: Int)(body: Int => Unit): Unit = {
    val failure = new AtomicReference[Throwable]
    val threads = (0 until n).map { i =>
      new Thread(() => try body(i)
      catch { case t: Throwable => failure.compareAndSet(null, t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    if (failure.get() != null) throw failure.get()
  }

  test("8 concurrent publishers x 4 topics through a running router lose nothing") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    val topics = (0 until 4).map(i => s"stress_in_$i")
    topics.foreach { t =>
      router.addHandler(s"stress-$t", t, ps, "stress_out", ps,
        Middlewares.passthrough)
    }
    router.run() // queries live BEFORE the publish storm — real contention
    val perThread = 50
    inParallel(8) { t =>
      (0 until perThread).foreach { i =>
        ps.publish(topics((t + i) % topics.size), Seq(msg(s"s$t-$i")))
      }
    }
    router.processAllAvailable(); router.close()
    val expected =
      (for (t <- 0 until 8; i <- 0 until perThread) yield s"s$t-$i").toSet
    val got = ps.subscribeBatch("stress_out").collect()
      .map(_.getAs[String]("uuid")).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("two consumer groups under concurrent publish each see every message") {
    val ps = new MemoryPubSub(spark)
    val routers = Seq("g1", "g2").map { g =>
      val r = new Router(spark, group = Some(g))
      r.addHandler("cg-stress", "cg_stress_in", ps, s"cg_stress_out_$g", ps,
        Middlewares.passthrough)
      r.run()
    }
    val perThread = 50
    inParallel(4) { t =>
      (0 until perThread).foreach(i => ps.publish("cg_stress_in", Seq(msg(s"c$t-$i"))))
    }
    routers.foreach(_.processAllAvailable()); routers.foreach(_.close())
    val expected = (for (t <- 0 until 4; i <- 0 until perThread) yield s"c$t-$i").toSet
    Seq("g1", "g2").foreach { g =>
      val got = ps.subscribeBatch(s"cg_stress_out_$g").collect()
        .map(_.getAs[String]("uuid")).toSet
      assert(got == expected, s"group $g: ${expected.size - got.size} missing")
    }
  }

  test("HTTP subscriber under 8 concurrent posting clients loses nothing") {
    val sub = new graft.sources.HttpSubscriber(spark)
    try {
      val url = s"http://localhost:${sub.boundPort}"
      inParallel(8) { t =>
        val pub = new graft.sources.HttpPublisher(url)
        (0 until 25).foreach(i => pub.publish("http_stress", Seq(msg(s"h$t-$i"))))
      }
      val got = sub.subscribeBatch("http_stress").collect()
        .map(_.getAs[String]("uuid")).toSet
      val expected = (for (t <- 0 until 8; i <- 0 until 25) yield s"h$t-$i").toSet
      assert(got == expected, s"${expected.size - got.size} messages lost")
    } finally sub.close()
  }

  test("replay history stays bounded at maxHistoryPerTopic under a long publish run") {
    val ps = new MemoryPubSub(spark, maxHistoryPerTopic = 100)
    inParallel(4) { t =>
      (0 until 100).foreach(i => ps.publish("bounded_hist", Seq(msg(s"b$t-$i"))))
    }
    val kept = ps.subscribeBatch("bounded_hist").collect()
    assert(kept.length == 100, s"history grew to ${kept.length}, cap is 100")
    // FIFO: the newest publish survives (publish is synchronized, so the
    // cap keeps the tail of the interleaved global order)
    val all = kept.map(_.getAs[String]("uuid")).toSet
    assert(all.size == 100)
  }

  test("racing publishers with one writer id deliver the epoch exactly once") {
    import spark.implicits._
    val ps = new MemoryPubSub(spark)
    inParallel(8) { _ =>
      ps.publishEpoch("stress_race", Seq(msg("ra"), msg("rb")).toDF(), "w-0")
    }
    val got = ps.subscribeBatch("stress_race").collect().map(_.getAs[String]("uuid"))
    assert(got.length == 2 && got.toSet == Set("ra", "rb"))
  }
}
