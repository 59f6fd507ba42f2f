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
    // topic from the FRESHLY MARSHALED message, not the hook's output:
    // a hook that rebuilds/strips metadata (tracing decorators do)
    // would drop the name stamp, route to generatePublishTopic("") and
    // have every processor ack-drop the command — silent total loss.
    // The reference derives the topic from the command TYPE, never
    // from mutable metadata (command_bus.go:116-168).
    val marshaled = marshaler.marshal(cmd)
    val topic = generatePublishTopic(marshaler.nameFromMessage(marshaled))
    publisher.publish(topic, Seq(onSend(marshaled)))
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
    // same rule as CommandBus.send: topic from the marshaled message,
    // hook applied after — metadata-rebuilding hooks must not reroute
    val marshaled = marshaler.marshal(event)
    val topic = generatePublishTopic(marshaler.nameFromMessage(marshaled))
    publisher.publish(topic, Seq(onPublish(marshaled)))
  }
}
