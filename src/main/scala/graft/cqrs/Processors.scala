package graft.cqrs

import scala.reflect.ClassTag

import graft.core.Message
import graft.router.{Middlewares, Router}
import graft.sources.{Publisher, Subscriber}

/** Typed handler, parity with the generics-based `NewCommandHandler` /
  * `NewEventHandler` constructors (reference:
  * components/cqrs/command_handler.go:37-59, event_handler.go:38-73):
  * a function from the unmarshaled value to produced messages, plus
  * the type name it dispatches on.
  */
final case class TypedHandler(name: String, fn: Message => Seq[Message])

object TypedHandler {
  /** `NewCommandHandler[C]`-style constructor: dispatch on C's name,
    * unmarshal, handle. The original envelope is passed alongside the
    * typed value (ctx.go:16-27 original-message access). */
  def apply[C: ClassTag](marshaler: Marshaler)(
      handle: (C, Message) => Seq[Any]): TypedHandler = {
    // the MARSHALER's name, not Names.of: a marshaler configured with a
    // custom nameOf (Names.short) stamps that name at publish time, and
    // a dispatch key derived any other way silently ack-drops every
    // message (the mismatch surfaces nowhere — no error, no handler)
    val n = marshaler.name(scala.reflect.classTag[C].runtimeClass)
    TypedHandler(n, m => handle(marshaler.unmarshal[C](m), m).map {
      case out: Message => out
      case typed => marshaler.marshal(typed)
    })
  }
}

/** Command processor, parity with `cqrs.CommandProcessor`
  * (reference: components/cqrs/command_processor.go:13-61 config,
  * :315-375 dispatch): one router handler (= one StreamingQuery) per
  * command type; messages whose metadata `name` doesn't match are
  * acked and ignored (:327-335); handler errors follow
  * `AckCommandHandlingErrors` (:358-366) — true acks (drops), false
  * routes to the poison topic so the batch still never wedges.
  */
final class CommandProcessor(
    router: Router,
    subscriber: Subscriber,
    publisher: Publisher,
    marshaler: Marshaler = new JsonMarshaler(),
    generateSubscribeTopic: String => String = _ => "commands",
    ackHandlingErrors: Boolean = false,
    errorsTopic: String = "commands_errors") {

  def addHandler[C: ClassTag](publishTopic: String)(
      handle: (C, Message) => Seq[Any]): this.type =
    addHandlers(publishTopic, TypedHandler[C](marshaler)(handle))

  def addHandlers(publishTopic: String, handlers: TypedHandler*): this.type = {
    handlers.foreach { th =>
      // locals only in the closure — `this` must not serialize into tasks
      val nameKey = marshaler.NameKey
      val expect = th.name
      val fn = th.fn
      val dispatch: Middlewares.Handler = { m =>
        if (m.get(nameKey) != expect) Seq.empty // ack-ignore (:327-335)
        else fn(m)
      }
      val errorMode: Middlewares.Middleware =
        if (ackHandlingErrors) Middlewares.ignoreErrors((_: Throwable) => true)
        else Middlewares.poisonQueue(errorsTopic)
      router.addHandler(s"cqrs-cmd-${th.name}", generateSubscribeTopic(th.name),
        subscriber, publishTopic, publisher, dispatch, middlewares = Seq(errorMode))
    }
    this
  }
}

/** Event processor, parity with `cqrs.EventProcessor`
  * (reference: components/cqrs/event_processor.go:13-59,252-292,
  * 314-371): 0..N handlers per event type, each its own subscription
  * (own StreamingQuery); unknown events are acked
  * (`AckOnUnknownEvent`). */
final class EventProcessor(
    router: Router,
    subscriber: Subscriber,
    publisher: Publisher,
    marshaler: Marshaler = new JsonMarshaler(),
    generateSubscribeTopic: String => String = _ => "events") {

  // atomic: concurrent registration must not race to one query name
  // PER-EVENT-TYPE counters, not one global sequence: query names key
  // the checkpoint paths, so a global counter would rename (and orphan
  // the checkpoints of) every handler registered AFTER any newly-added
  // one — the whole topic reprocessed, every side effect duplicated.
  // Per-type, a second handler for the SAME type gets -2 and unrelated
  // registrations never shift existing names.
  private val counters =
    scala.collection.concurrent.TrieMap.empty[String, java.util.concurrent.atomic.AtomicInteger]

  def addHandler[E: ClassTag](publishTopic: String)(
      handle: (E, Message) => Seq[Any]): this.type =
    addHandlers(publishTopic, TypedHandler[E](marshaler)(handle))

  def addHandlers(publishTopic: String, handlers: TypedHandler*): this.type = {
    handlers.foreach { th =>
      val n = counters.getOrElseUpdate(th.name,
        new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
      val nameKey = marshaler.NameKey
      val expect = th.name
      val fn = th.fn
      val dispatch: Middlewares.Handler = { m =>
        if (m.get(nameKey) != expect) Seq.empty
        else fn(m)
      }
      router.addHandler(s"cqrs-evt-${th.name}-$n",
        generateSubscribeTopic(th.name), subscriber, publishTopic, publisher,
        dispatch)
    }
    this
  }
}

/** Event group processor, parity with `cqrs.EventGroupProcessor`
  * (reference: components/cqrs/event_processor_group.go:143-158
  * AddHandlersGroup, :204-271 dispatch loop): ALL handlers of a group
  * share ONE subscription (one StreamingQuery), preserving relative
  * order across event types on the shared stream — the property the
  * per-type processor cannot give. Dispatch is a per-message match over
  * the group's name table inside the single flatMap.
  */
final class EventGroupProcessor(
    router: Router,
    subscriber: Subscriber,
    publisher: Publisher,
    marshaler: Marshaler = new JsonMarshaler(),
    onUnknownEvent: Message => Seq[Message] = _ => Seq.empty) {

  def addHandlersGroup(groupName: String, subscribeTopic: String,
      publishTopic: String, handlers: TypedHandler*): this.type = {
    // .toMap would silently keep only the LAST handler for a duplicated
    // event type — the dropped one never fires and nothing reports it
    val dups = handlers.groupBy(_.name).filter(_._2.sizeIs > 1).keys
    require(dups.isEmpty,
      s"group '$groupName': duplicate handler(s) for ${dups.mkString(", ")}")
    val table = handlers.map(h => h.name -> h.fn).toMap
    val unknown = onUnknownEvent
    val nameKey = marshaler.NameKey
    val dispatch: Middlewares.Handler = { m =>
      table.get(m.get(nameKey)) match {
        case Some(fn) => fn(m)
        case None => unknown(m)
      }
    }
    router.addHandler(s"cqrs-group-$groupName", subscribeTopic, subscriber,
      publishTopic, publisher, dispatch)
    this
  }
}
