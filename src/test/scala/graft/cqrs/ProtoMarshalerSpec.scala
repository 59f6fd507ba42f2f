package graft.cqrs

import graft.SparkSpec
import graft.router.Router
import graft.sources.MemoryPubSub

// Top-level fixtures (constructed reflectively by unmarshal).
case class Test1(a: Long)                       // protobuf docs' classic example
case class FloatMsg(x: Float)                   // Fixed64 narrows on decode
case class SearchRequest(query: String, pageNumber: Int, resultPerPage: Int)
case class Telemetry(id: Long, score: Double, tag: String, blob: Array[Byte],
    enabled: Boolean)

/** Protobuf marshaler parity (marshaler_protobuf.go:14-90) via the
  * spec-conformant wire codec: golden bytes straight from the public
  * protobuf encoding documentation, proto3 default omission, unknown-
  * field skipping, and end-to-end dispatch through a CommandProcessor.
  */
class ProtoMarshalerSpec extends SparkSpec {

  private val test1Schema = ProtoSchema(ProtoField(1, "a", PType.VarInt))
  private val searchSchema = ProtoSchema(
    ProtoField(1, "query", PType.Str),
    ProtoField(2, "pageNumber", PType.VarInt),
    ProtoField(3, "resultPerPage", PType.VarInt))
  private val telemetrySchema = ProtoSchema(
    ProtoField(1, "id", PType.VarInt),
    ProtoField(2, "score", PType.Fixed64),
    ProtoField(3, "tag", PType.Str),
    ProtoField(4, "blob", PType.Bytes),
    ProtoField(5, "enabled", PType.VarInt))

  private val marshaler = new ProtoMarshaler(Map(
    classOf[Test1] -> test1Schema,
    classOf[SearchRequest] -> searchSchema,
    classOf[Telemetry] -> telemetrySchema))

  test("golden bytes match the protobuf encoding spec's worked example") {
    // `message Test1 { int32 a = 1; }` with a = 150 encodes as
    // 08 96 01 — the canonical example in the protobuf docs.
    val m = marshaler.marshal(Test1(150L))
    assert(m.payload.toSeq == Seq(0x08, 0x96, 0x01).map(_.toByte))
    // `message Test2 { string b = 2; }` with b = "testing" encodes as
    // 12 07 74 65 73 74 69 6e 67 — the docs' string example.
    val test2Schema = ProtoSchema(ProtoField(2, "b", PType.Str))
    val s = ProtoWire.encode(test2Schema, Map("b" -> "testing"))
    assert(s.toSeq == (Seq(0x12, 0x07).map(_.toByte) ++ "testing".getBytes("UTF-8")))
  }

  test("round-trips every supported field kind and stamps the type name") {
    val v = Telemetry(42L, 2.5, "t-1", Array[Byte](1, 2, 3), enabled = true)
    val m = marshaler.marshal(v)
    assert(m.get("name") == classOf[Telemetry].getName)
    val back = marshaler.unmarshal[Telemetry](m)
    assert(back.id == v.id && back.score == v.score && back.tag == v.tag
      && back.enabled == v.enabled)
    assert(back.blob.toSeq == v.blob.toSeq)
  }

  test("proto3 defaults are omitted on the wire and restored on decode") {
    val m = marshaler.marshal(Telemetry(0L, 0.0, "", Array.emptyByteArray,
      enabled = false))
    assert(m.payload.isEmpty, "all-default message must encode to zero bytes")
    val back = marshaler.unmarshal[Telemetry](m)
    assert(back == Telemetry(0L, 0.0, "", back.blob, enabled = false))
    assert(back.blob.isEmpty)
  }

  test("unknown fields are skipped per spec (forward compatibility)") {
    // append field 9 (varint) = 7 to a Test1 payload; decode ignores it
    val extra = marshaler.marshal(Test1(150L)).payload ++
      Array[Byte]((9 << 3).toByte, 7)
    val decoded = ProtoWire.decode(test1Schema, extra)
    assert(decoded("a") == 150L)
  }

  test("crafted negative length-delimited fields throw instead of spinning the decoder") {
    // unknown field tag (number 9, wire type 2) followed by a 5-byte
    // varint whose low 32 bits are -6: the unchecked `pos += len.toInt`
    // moved pos exactly back to the tag start and the decode loop spun
    // forever at 100% CPU — unreachable by any error middleware
    val evil = marshaler.marshal(Test1(150L)).payload ++
      Array[Byte](((9 << 3) | 2).toByte,
        0xFA.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x0F.toByte)
    val e = intercept[IllegalArgumentException] {
      ProtoWire.decode(test1Schema, evil)
    }
    assert(e.getMessage.contains("corrupt"))
    // and an over-length field (past the buffer) also throws loudly
    val tooLong = marshaler.marshal(Test1(150L)).payload ++
      Array[Byte](((9 << 3) | 2).toByte, 0x7F.toByte)
    intercept[IllegalArgumentException] { ProtoWire.decode(test1Schema, tooLong) }
  }

  test("over-long varints throw instead of wrapping bits (JVM shift-mod-64)") {
    // 11+ continuation bytes push shift past 63; the JVM masks shift
    // amounts mod 64, so bits would silently wrap into LOW positions
    // and the field would decode to garbage that 'processes
    // successfully' — corrupt data bypassing the exception path
    val evil = Array.fill[Byte](12)(0x80.toByte) :+ 0x01.toByte
    val e = intercept[IllegalArgumentException] {
      ProtoWire.decode(test1Schema, evil)
    }
    assert(e.getMessage.contains("varint"))
  }

  test("a ProtoSchema field naming no case-class field fails marshal loudly") {
    // encode's skip-absent-value rule would otherwise DROP the field
    // silently: every round trip loses the value to the proto3 default
    // with no error anywhere
    val typoSchema = ProtoSchema(ProtoField(1, "valueA", PType.VarInt)) // field is 'a'
    val m = new ProtoMarshaler(Map(classOf[Test1] -> typoSchema))
    val e = intercept[IllegalArgumentException] { m.marshal(Test1(150L)) }
    assert(e.getMessage.contains("valueA"))
  }

  test("Str fields reject non-String values instead of encoding toString garbage") {
    val badSchema = ProtoSchema(ProtoField(1, "a", PType.Str)) // field a is Long
    val m = new ProtoMarshaler(Map(classOf[Test1] -> badSchema))
    val e = intercept[IllegalArgumentException] { m.marshal(Test1(150L)) }
    assert(e.getMessage.contains("not a String"))
  }

  test("Float fields round-trip (Fixed64 decode narrows to the declared float)") {
    val schema = ProtoSchema(ProtoField(1, "x", PType.Fixed64))
    val m = new ProtoMarshaler(Map(classOf[FloatMsg] -> schema))
    val back = m.unmarshal[FloatMsg](m.marshal(FloatMsg(2.5f)))
    assert(back == FloatMsg(2.5f))
  }

  test("wire codec round-trips randomized values incl. negatives and extremes") {
    val rnd = new scala.util.Random(42) // deterministic
    val extremes = Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L)
    (0 until 50).foreach { i =>
      val v = Telemetry(
        if (i < extremes.size) extremes(i) else rnd.nextLong(),
        if (i % 7 == 0) 0.0 else rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10),
        rnd.alphanumeric.take(rnd.nextInt(30)).mkString,
        Array.fill(rnd.nextInt(20))(rnd.nextInt().toByte),
        rnd.nextBoolean())
      val back = marshaler.unmarshal[Telemetry](marshaler.marshal(v))
      assert(back.id == v.id && back.score == v.score && back.tag == v.tag
        && back.enabled == v.enabled, s"case $i: $v vs $back")
      assert(back.blob.toSeq == v.blob.toSeq, s"case $i blob")
    }
  }

  test("unregistered types are rejected (NoProtoMessageError analogue)") {
    intercept[IllegalArgumentException] {
      marshaler.marshal(AddUser("ada", 1))
    }
  }

  test("command processor dispatches protobuf commands end to end") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    val bus = new CommandBus(ps, marshaler = marshaler)
    new CommandProcessor(router, ps, ps, marshaler)
      .addHandler[SearchRequest]("proto_results") { (c, _) =>
        Seq(Telemetry(c.pageNumber.toLong, 1.0, c.query, Array.emptyByteArray,
          enabled = true))
      }
    bus.send(SearchRequest("needle", 3, 10))
    router.run(); router.processAllAvailable(); router.close()
    val out = ps.subscribeBatch("proto_results").collect()
    assert(out.length == 1)
    val meta = out.head.getAs[Map[String, String]]("metadata")
    assert(meta("name") == classOf[Telemetry].getName)
    val ev = marshaler.unmarshal[Telemetry](graft.core.Message(
      out.head.getAs[String]("uuid"), meta,
      out.head.getAs[Array[Byte]]("payload"),
      out.head.getAs[java.sql.Timestamp]("ts")))
    assert(ev.id == 3L && ev.tag == "needle" && ev.enabled)
  }
}
