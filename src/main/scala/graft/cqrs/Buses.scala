package graft.cqrs

import graft.core.Message
import graft.sources.Publisher

/** Command bus, parity with `cqrs.CommandBus`
  * (reference: components/cqrs/command_bus.go:70-74,116-168):
  * marshal typed command → resolve topic from the command name →
  * `onSend` hook → publish. One command, one message — the send path
  * is driver-side by design (commands originate outside the dataflow);
  * high-volume command streams enter through a [[graft.router.Router]]
  * handler instead.
  */
final class CommandBus(
    publisher: Publisher,
    generatePublishTopic: String => String = _ => "commands",
    marshaler: Marshaler = new JsonMarshaler(),
    onSend: Message => Message = identity) {

  def send(cmd: Any): Unit = {
    val msg = onSend(marshaler.marshal(cmd))
    publisher.publish(generatePublishTopic(marshaler.nameFromMessage(msg)), Seq(msg))
  }
}

/** Event bus, parity with `cqrs.EventBus`
  * (reference: components/cqrs/event_bus.go:69-72,117-146). */
final class EventBus(
    publisher: Publisher,
    generatePublishTopic: String => String = _ => "events",
    marshaler: Marshaler = new JsonMarshaler(),
    onPublish: Message => Message = identity) {

  def publish(event: Any): Unit = {
    val msg = onPublish(marshaler.marshal(event))
    publisher.publish(generatePublishTopic(marshaler.nameFromMessage(msg)), Seq(msg))
  }
}
