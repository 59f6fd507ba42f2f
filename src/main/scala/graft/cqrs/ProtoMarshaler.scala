package graft.cqrs

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import scala.reflect.ClassTag

import graft.core.{Ids, Message}

/** Protobuf field kinds supported by the wire codec. Wire types per
  * the public protobuf encoding spec: varint (0), fixed 64-bit (1),
  * length-delimited (2). */
sealed abstract class PType(val wireType: Int)
object PType {
  case object VarInt extends PType(0)  // int32/int64/bool
  case object Fixed64 extends PType(1) // double
  case object Str extends PType(2)     // UTF-8 string
  case object Bytes extends PType(2)   // raw bytes
}

final case class ProtoField(number: Int, name: String, ptype: PType)

/** Declared in CASE-CLASS FIELD ORDER — [[ProtoMarshaler.unmarshal]]
  * feeds the primary constructor positionally. */
final case class ProtoSchema(fields: ProtoField*) {
  require(fields.map(_.number).distinct.size == fields.size, "duplicate field numbers")
  val byNumber: Map[Int, ProtoField] = fields.map(f => f.number -> f).toMap
}

/** Canonical proto3 wire-format codec: fields serialized in field-
  * number order, default values (0 / false / "" / empty bytes)
  * omitted, unknown fields skipped by wire type on decode. Bytes are
  * interoperable with any proto3 library given the same schema —
  * spec-conformant, no protobuf runtime needed.
  */
object ProtoWire {

  def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  def encode(schema: ProtoSchema, values: Map[String, Any]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    schema.fields.sortBy(_.number).foreach { f =>
      def tag(): Unit = writeVarint(out, ((f.number.toLong << 3) | f.ptype.wireType))
      (f.ptype, values.getOrElse(f.name, null)) match {
        case (_, null) => ()
        case (PType.VarInt, v) =>
          val n = v match {
            case b: Boolean => if (b) 1L else 0L
            case i: Int => i.toLong
            case l: Long => l
            case other => throw new IllegalArgumentException(
              s"field ${f.name}: ${other.getClass.getName} is not a varint value")
          }
          if (n != 0L) { tag(); writeVarint(out, n) }
        case (PType.Fixed64, v) =>
          val d = v match {
            case d: Double => d
            case fl: Float => fl.toDouble
            case other => throw new IllegalArgumentException(
              s"field ${f.name}: ${other.getClass.getName} is not a double value")
          }
          if (d != 0.0d) {
            tag()
            val bits = java.lang.Double.doubleToLongBits(d)
            (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xff).toInt))
          }
        case (PType.Str, v) =>
          // strict like the VarInt/Fixed64 branches: toString would
          // silently encode "Some(x)" / "42" for a mis-schema'd field
          val s = v match {
            case s: String => s
            case other => throw new IllegalArgumentException(
              s"field ${f.name}: ${other.getClass.getName} is not a String value")
          }
          val b = s.getBytes(StandardCharsets.UTF_8)
          if (b.nonEmpty) { tag(); writeVarint(out, b.length.toLong); out.write(b) }
        case (PType.Bytes, v) =>
          val b = v.asInstanceOf[Array[Byte]]
          if (b.nonEmpty) { tag(); writeVarint(out, b.length.toLong); out.write(b) }
      }
    }
    out.toByteArray
  }

  /** Decode to field-name → value; absent fields take proto3 defaults. */
  def decode(schema: ProtoSchema, bytes: Array[Byte]): Map[String, Any] = {
    var pos = 0
    def checkedLen(raw: Long): Int = {
      if (raw < 0 || pos + raw > bytes.length)
        throw new IllegalArgumentException(
          s"corrupt length-delimited field: len=$raw at pos=$pos of ${bytes.length}")
      raw.toInt
    }
    def varint(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do {
        // cap at 10 bytes (shift 63 is the last valid position): the
        // JVM masks shift amounts mod 64, so an over-long varint would
        // silently wrap bits into LOW positions and decode to garbage
        // that "processes successfully" — corrupt data bypassing the
        // exception path poison-routing depends on
        if (shift > 63) throw new IllegalArgumentException(
          s"over-long varint at pos=$pos (corrupt proto stream)")
        b = bytes(pos) & 0xff; pos += 1
        acc |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      acc
    }
    val got = scala.collection.mutable.Map.empty[String, Any]
    while (pos < bytes.length) {
      val key = varint()
      val number = (key >>> 3).toInt
      val wire = (key & 0x7).toInt
      schema.byNumber.get(number).filter(_.ptype.wireType == wire) match {
        case Some(f) => f.ptype match {
          case PType.VarInt => got(f.name) = varint()
          case PType.Fixed64 =>
            var bits = 0L
            (0 until 8).foreach(i => { bits |= (bytes(pos) & 0xffL) << (8 * i); pos += 1 })
            got(f.name) = java.lang.Double.longBitsToDouble(bits)
          case PType.Str =>
            val len = checkedLen(varint())
            got(f.name) = new String(bytes, pos, len, StandardCharsets.UTF_8); pos += len
          case PType.Bytes =>
            val len = checkedLen(varint())
            got(f.name) = java.util.Arrays.copyOfRange(bytes, pos, pos + len); pos += len
        }
        case None => wire match { // unknown field: skip per spec
          case 0 => varint(); ()
          case 1 => pos += 8
          // checked: a crafted negative length would move pos BACKWARD
          // (e.g. exactly to the tag start) and spin the decode loop
          // forever at 100% CPU with no exception — the one failure
          // shape no error middleware can catch
          case 2 => pos += checkedLen(varint())
          case 5 => pos += 4
          case w => throw new IllegalArgumentException(s"unsupported wire type $w")
        }
      }
    }
    schema.fields.map { f =>
      f.name -> got.getOrElse(f.name, f.ptype match {
        case PType.VarInt => 0L
        case PType.Fixed64 => 0.0d
        case PType.Str => ""
        case PType.Bytes => Array.emptyByteArray
      })
    }.toMap
  }
}

/** Protobuf command/event marshaler, parity with `ProtoMarshaler`
  * (reference: components/cqrs/marshaler_protobuf.go:14-90): typed
  * value ↔ Message with proto3 wire-format payload and the type name
  * in metadata "name". Where the Go reference requires values to
  * implement `proto.Message` (generated code), this one takes an
  * explicit [[ProtoSchema]] per case class — the moral equivalent of
  * the descriptor — and rejects unregistered types the way the
  * reference returns `NoProtoMessageError`.
  */
final class ProtoMarshaler(
    schemas: Map[Class[_], ProtoSchema],
    nameOf: Class[_] => String = Names.fullyQualified,
    newUuid: () => String = () => Ids.newUuid()) extends Marshaler {

  def name(cls: Class[_]): String = nameOf(cls)

  private def schemaOf(cls: Class[_]): ProtoSchema =
    schemas.getOrElse(cls, throw new IllegalArgumentException(
      s"${cls.getName} has no registered ProtoSchema (NoProtoMessageError analogue)"))

  def marshal(v: Any): Message = {
    val p = v match {
      case p: Product => p
      case other => throw new IllegalArgumentException(
        s"${other.getClass.getName} is not a case class")
    }
    val values = p.productElementNames.zip(p.productIterator).toMap
    val schema = schemaOf(v.getClass)
    // loud on a schema/field-name mismatch: encode's getOrElse-null
    // skip would otherwise DROP the field silently and unmarshal would
    // fill the proto3 default — data loss on every round trip that
    // surfaces nowhere
    val unmatched = schema.fields.map(_.name).filterNot(values.contains)
    require(unmatched.isEmpty,
      s"${v.getClass.getName}: ProtoSchema field(s) ${unmatched.mkString(", ")} " +
        "match no case-class field — the value would silently encode as the proto3 default")
    Message(newUuid(), Map(NameKey -> nameOf(v.getClass)),
      ProtoWire.encode(schema, values),
      new Timestamp(System.currentTimeMillis()))
  }

  def unmarshal[T](m: Message)(implicit ct: ClassTag[T]): T = {
    val cls = ct.runtimeClass
    val schema = schemaOf(cls)
    val decoded = ProtoWire.decode(schema, m.payload)
    val ctor = cls.getDeclaredConstructors
      .find(_.getParameterCount == schema.fields.size)
      .getOrElse(throw new IllegalArgumentException(
        s"${cls.getName}: no ${schema.fields.size}-arg constructor"))
    val args = schema.fields.zip(ctor.getParameterTypes).map { case (f, pt) =>
      coerce(decoded(f.name), pt)
    }
    ctor.newInstance(args: _*).asInstanceOf[T]
  }

  /** Varints decode as Long; narrow to the constructor's declared
    * primitive. */
  private def coerce(v: Any, target: Class[_]): AnyRef = (v, target) match {
    case (l: Long, t) if t == java.lang.Integer.TYPE || t == classOf[java.lang.Integer] =>
      java.lang.Integer.valueOf(l.toInt)
    case (l: Long, t) if t == java.lang.Boolean.TYPE || t == classOf[java.lang.Boolean] =>
      java.lang.Boolean.valueOf(l != 0L)
    case (l: Long, t) if t == java.lang.Short.TYPE => java.lang.Short.valueOf(l.toShort)
    // Fixed64 decodes as Double; a Float field marshals fine (encode
    // widens) but without this narrowing every unmarshal of the type
    // threw 'argument type mismatch' — an encode/decode asymmetry
    case (d: Double, t) if t == java.lang.Float.TYPE || t == classOf[java.lang.Float] =>
      java.lang.Float.valueOf(d.toFloat)
    case (other, _) => other.asInstanceOf[AnyRef]
  }
}
