package graft.tools

import graft.SparkSpec
import graft.core.Message
import graft.sources.{FilePubSub, SqlPubSub}

/** Drives the `mill` CLI body (`Mill.run`) end-to-end — file root and
  * jdbc: root — plus the usage-error contract: a bad invocation
  * returns exit code 2 AFTER the cleanup finallys run (pre-fix,
  * sys.exit inside the try skipped them, abandoning a live JDBC
  * connection and the SparkSession to JVM teardown). */
class MillSpec extends SparkSpec {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("millspec").toString

  test("produce then consume round-trips over a file root, exit code 0") {
    val root = tmpRoot()
    assert(Mill.run(Array("produce", root, "t1", "hello", "k=v"), spark) == 0)
    // the CLI wrote through the real transport: a plain subscriber sees it
    val fp = new FilePubSub(spark, root)
    val got = fp.subscribeBatch("t1").collect()
    assert(got.length == 1)
    assert(new String(got.head.getAs[Array[Byte]]("payload"), "UTF-8") == "hello")
    assert(got.head.getAs[Map[String, String]]("metadata") == Map("k" -> "v"))
    assert(Mill.run(Array("consume", root, "t1"), spark) == 0)
  }

  test("produce/consume/prune/drop-group work against a jdbc: root") {
    val url = "jdbc:derby:memory:millspec;create=true"
    assert(Mill.run(Array("produce", url, "mt", "payload-1"), spark) == 0)
    val sp = new SqlPubSub(spark, url)
    try {
      val got = sp.subscribeBatch("mt").collect()
      assert(got.length == 1)
      assert(new String(got.head.getAs[Array[Byte]]("payload"), "UTF-8") == "payload-1")
    } finally sp.close()
    // a group acks everything, then the CLI's maintenance entries run
    val consumer = new SqlPubSub(spark, url, group = "g1")
    try {
      consumer.subscribeInitialize("mt")
      consumer.ack("mt", 1) // one record published above: offset 1 acked
    } finally consumer.close()
    assert(Mill.run(Array("prune", url, "mt"), spark) == 0)
    assert(Mill.run(Array("drop-group", url, "g1", "mt"), spark) == 0)
  }

  test("usage errors return 2 through the cleanup path, never a transport open") {
    // too few args
    assert(Mill.run(Array("consume"), spark) == 2)
    // unknown command
    assert(Mill.run(Array("frobnicate", tmpRoot(), "t"), spark) == 2)
    // transport/command mismatches (must NOT open a connection: the
    // file root below does not exist and the jdbc URL has no
    // ;create=true — either would throw if opened)
    assert(Mill.run(Array("compact", "jdbc:derby:memory:nope_db", "t"), spark) == 2)
    assert(Mill.run(Array("prune", "/nonexistent/millspec", "t"), spark) == 2)
    assert(Mill.run(Array("drop-group", "/nonexistent/millspec", "t"), spark) == 2)
    assert(Mill.run(Array("produce", tmpRoot(), "t"), spark) == 2,
      "produce without a payload is a usage error")
    // the session handed in must survive every error path
    assert(!spark.sparkContext.isStopped,
      "Mill.run must never stop the session it was handed")
  }
}
