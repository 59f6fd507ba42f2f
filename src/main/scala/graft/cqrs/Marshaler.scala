package graft.cqrs

import java.sql.Timestamp

import scala.reflect.ClassTag

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import graft.core.{Ids, Message}

/** Shared Jackson codec (Jackson + scala module ship with Spark).
  * Static so executor tasks resolve it by class, never by closure
  * serialization. */
object JsonCodec {
  lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }
  def write(v: Any): Array[Byte] = mapper.writeValueAsBytes(v)
  def read[T](bytes: Array[Byte], cls: Class[T]): T = mapper.readValue(bytes, cls)
}

/** Type-name generation, parity with `FullyQualifiedStructName` /
  * `StructName` (reference: components/cqrs/name.go:17-57). */
object Names {
  def fullyQualified(cls: Class[_]): String = cls.getName
  def short(cls: Class[_]): String = cls.getSimpleName.stripSuffix("$")
  def of[T](implicit ct: ClassTag[T]): String = fullyQualified(ct.runtimeClass)
}

/** Command/event codec contract, parity with `CommandEventMarshaler`
  * (reference: components/cqrs/marshaler.go:12-28): typed value ↔
  * Message with the type name stamped into metadata key "name". */
trait Marshaler extends Serializable {
  val NameKey = "name"
  def name(cls: Class[_]): String
  def nameFromMessage(m: Message): String = m.get(NameKey)
  def marshal(v: Any): Message
  def unmarshal[T](m: Message)(implicit ct: ClassTag[T]): T
}

/** JSON marshaler, parity with `JSONMarshaler`
  * (reference: components/cqrs/marshaler_json.go:15-53); the name is
  * stamped at marshaler_json.go:25,51-53. The protobuf variant is
  * [[ProtoMarshaler]]. */
final class JsonMarshaler(
    nameOf: Class[_] => String = Names.fullyQualified,
    newUuid: () => String = () => Ids.newUuid()) extends Marshaler {

  def name(cls: Class[_]): String = nameOf(cls)

  def marshal(v: Any): Message =
    Message(newUuid(), Map(NameKey -> nameOf(v.getClass)),
      JsonCodec.write(v), new Timestamp(System.currentTimeMillis()))

  def unmarshal[T](m: Message)(implicit ct: ClassTag[T]): T =
    JsonCodec.read(m.payload, ct.runtimeClass.asInstanceOf[Class[T]])
}
