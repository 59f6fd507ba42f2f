package graft.sources

import java.io.{PipedInputStream, PipedOutputStream}
import java.sql.Timestamp

import graft.SparkSpec
import graft.core.Message

/** io.Reader/Writer transport over an in-process pipe: framing
  * round-trip (metadata + binary payloads survive), in-band topic
  * routing, and EOF-terminated drain.
  */
class IoSpec extends SparkSpec {

  private def msg(u: String, p: Array[Byte], meta: Map[String, String] = Map.empty) =
    Message(u, meta, p, new Timestamp(1700000000000L))

  test("frame marshal/unmarshal round-trips binary payloads and metadata") {
    val m = msg("f1", Array[Byte](0, 1, -1, 127), Map("k" -> "v", "j" -> ""))
    val back = IoFraming.unmarshal(IoFraming.marshal(m))
    assert(back.uuid == m.uuid)
    assert(back.metadata == m.metadata)
    assert(back.payload.toSeq == m.payload.toSeq)
    assert(back.ts == m.ts)
  }

  test("frame stays ONE line with hostile metadata (newlines, quotes, control chars)") {
    // the framing invariant NDJSON depends on: JSON escaping must keep
    // every frame newline-free or a hostile metadata value would split
    // a message in two at the reader
    val m = msg("f2", Array[Byte](1),
      Map("evil" -> "line1\nline2\r\"quoted\\ tab\t"))
    val line = IoFraming.marshal(m)
    assert(!line.contains('\n') && !line.contains('\r'),
      s"marshal must escape newlines inside the frame: $line")
    val back = IoFraming.unmarshal(line)
    assert(back.metadata == m.metadata, s"got ${back.metadata}")
  }

  test("marshal tolerates null ts/metadata/payload (nullable schema fields)") {
    // pre-fix: m.ts.getTime NPE'd mid-publish AFTER earlier frames
    // were flushed — partial emission plus a poisoned retry. Null ts
    // defaults to epoch 0 (the SQL transport's rowMessage rule).
    val m = graft.core.Message("nt1", null, null, null)
    val line = IoFraming.marshal(m)
    val back = IoFraming.unmarshal(line)
    assert(back.uuid == "nt1")
    assert(back.metadata == Map.empty[String, String])
    assert(back.payload.isEmpty)
    assert(back.ts.getTime == 0L)
  }

  test("a corrupt frame mid-stream is dropped; later frames still drain") {
    val po = new PipedOutputStream()
    val pi = new PipedInputStream(po, 1 << 16)
    val sub = new StreamSubscriber(spark, pi)
    try {
      val pub = new StreamPublisher(po)
      pub.publish("io_bad", Seq(msg("before", "a".getBytes)))
      po.write("this is not json\n".getBytes("UTF-8")); po.flush()
      pub.publish("io_bad", Seq(msg("after", "b".getBytes)))
      po.close() // EOF ends the drain
      sub.awaitDrained()
      val got = sub.subscribeBatch("io_bad").collect().map(_.getAs[String]("uuid")).toSet
      assert(got == Set("before", "after"),
        s"frames after the corrupt line must not be lost: $got")
    } finally sub.close()
  }

  test("an oversized line is skipped at the cap instead of buffering toward driver OOM") {
    // the decode-bomb rule at the stream edge: readLine-style draining
    // buffers an UNBOUNDED line, so one multi-GB line on an open pipe
    // would OOM the driver before frame parsing could reject it. The
    // reader must drop the line AT the cap (bounded memory), resume at
    // the next newline, and deliver every later frame.
    val po = new PipedOutputStream()
    val pi = new PipedInputStream(po, 1 << 16)
    val sub = new StreamSubscriber(spark, pi, maxLineChars = 4096)
    try {
      val pub = new StreamPublisher(po)
      pub.publish("io_bomb", Seq(msg("before", "a".getBytes)))
      // a 64 KiB line against a 4 KiB cap, written in chunks the pipe
      // buffer can hold — the reader must consume it as it streams
      val chunk = "x".repeat(8192).getBytes("UTF-8")
      (0 until 8).foreach { _ => po.write(chunk); po.flush() }
      po.write('\n'); po.flush()
      pub.publish("io_bomb", Seq(msg("after", "b".getBytes)))
      po.close()
      sub.awaitDrained()
      val got = sub.subscribeBatch("io_bomb").collect()
        .map(_.getAs[String]("uuid")).toSet
      assert(got == Set("before", "after"),
        s"frames after the oversized line must not be lost: $got")
    } finally sub.close()
  }

  test("publisher pipe -> subscriber routes frames to their in-band topics") {
    val out = new PipedOutputStream()
    val in = new PipedInputStream(out, 1 << 16)
    val sub = new StreamSubscriber(spark, in)
    val pub = new StreamPublisher(out)
    try {
      pub.publish("io_a", Seq(
        msg("a1", "alpha".getBytes("UTF-8"), Map("h" -> "1")),
        msg("a2", "beta".getBytes("UTF-8"))))
      pub.publish("io_b", Seq(msg("b1", "gamma".getBytes("UTF-8"))))
      pub.close() // EOF ends the drain
      sub.awaitDrained()
      val a = sub.subscribeBatch("io_a").collect()
        .map(r => r.getAs[String]("uuid") ->
          new String(r.getAs[Array[Byte]]("payload"), "UTF-8")).toMap
      assert(a == Map("a1" -> "alpha", "a2" -> "beta"))
      val aMeta = sub.subscribeBatch("io_a").collect()
        .map(r => r.getAs[String]("uuid") ->
          r.getAs[Map[String, String]]("metadata")).toMap
      assert(aMeta("a1") == Map("h" -> "1"), "in-band topic key must be stripped")
      val b = sub.subscribeBatch("io_b").collect().map(_.getAs[String]("uuid"))
      assert(b.toSeq == Seq("b1"))
    } finally sub.close()
  }
}
