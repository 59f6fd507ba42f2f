package graft.cqrs

import graft.SparkSpec
import graft.router.{Ctx, Router}
import graft.sources.MemoryPubSub

// Top-level fixtures: Jackson instantiates by runtime class.
case class AddUser(name: String, age: Int)
case class UserAdded(name: String, ok: Boolean)
case class RemoveUser(name: String)
case class AuditEvent(what: String)

/** CQRS layer semantics, parity targets in components/cqrs
  * (command_bus.go, command_processor.go:315-375 dispatch,
  * event_processor_group.go:204-271 group dispatch,
  * marshaler_json.go name stamping).
  */
class CqrsSpec extends SparkSpec {

  private val marshaler = new JsonMarshaler()

  test("marshaler roundtrips typed values and stamps the type name (marshaler_json.go:25)") {
    val m = marshaler.marshal(AddUser("ada", 36))
    assert(m.get("name") == classOf[AddUser].getName)
    assert(marshaler.unmarshal[AddUser](m) == AddUser("ada", 36))
  }

  test("bus topic routing survives a metadata-rebuilding onSend/onPublish hook") {
    // the topic derives from the FRESHLY MARSHALED message, never from
    // the hook's output: a tracing hook that rebuilds metadata (and
    // drops the name stamp) used to route to generatePublishTopic("")
    // — every processor then ack-dropped the message, silent total loss
    val ps = new MemoryPubSub(spark)
    val bus = new CommandBus(ps,
      generatePublishTopic = n => if (n.isEmpty) "lost" else "cmds_ok",
      onSend = m => m.copy(metadata = Map("trace" -> "t1"))) // drops 'name'
    bus.send(AddUser("lin", 30))
    assert(ps.subscribeBatch("lost").count() == 0,
      "hook-stripped metadata must not reroute the command")
    val got = ps.subscribeBatch("cmds_ok").collect()
    assert(got.length == 1 &&
      got.head.getAs[Map[String, String]]("metadata") == Map("trace" -> "t1"))
    val eps = new MemoryPubSub(spark)
    val ebus = new EventBus(eps,
      generatePublishTopic = n => if (n.isEmpty) "lost_e" else "evts_ok",
      onPublish = m => m.copy(metadata = Map.empty))
    ebus.publish(AuditEvent("x"))
    assert(eps.subscribeBatch("lost_e").count() == 0)
    assert(eps.subscribeBatch("evts_ok").count() == 1)
  }

  test("command bus → processor → typed result event, end to end") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    val bus = new CommandBus(ps)
    new CommandProcessor(router, ps, ps)
      .addHandler[AddUser]("user_events") { (c, _) => Seq(UserAdded(c.name, ok = true)) }

    bus.send(AddUser("grace", 45))
    router.run(); router.processAllAvailable(); router.close()

    val out = ps.subscribeBatch("user_events").collect()
    assert(out.length == 1)
    val meta = out.head.getAs[Map[String, String]]("metadata")
    assert(meta("name") == classOf[UserAdded].getName)
    val ev = JsonCodec.read(out.head.getAs[Array[Byte]]("payload"), classOf[UserAdded])
    assert(ev == UserAdded("grace", ok = true))
  }

  test("mismatched command type is acked and ignored (command_processor.go:327-335)") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    val bus = new CommandBus(ps)
    new CommandProcessor(router, ps, ps)
      .addHandler[AddUser]("user_events2") { (c, _) => Seq(UserAdded(c.name, ok = true)) }

    bus.send(RemoveUser("turing")) // no handler for this type
    bus.send(AddUser("hopper", 85))
    router.run(); router.processAllAvailable(); router.close()

    val out = ps.subscribeBatch("user_events2").collect()
    assert(out.length == 1) // only the matching command produced output
    assert(JsonCodec.read(out.head.getAs[Array[Byte]]("payload"), classOf[UserAdded]).name == "hopper")
  }

  test("handler errors route to the errors topic when not acked (AckCommandHandlingErrors=false)") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    val bus = new CommandBus(ps)
    new CommandProcessor(router, ps, ps, errorsTopic = "cmd_dlq")
      .addHandler[AddUser]("user_events3") { (c, _) =>
        if (c.age < 0) throw new IllegalArgumentException(s"bad age ${c.age}")
        Seq(UserAdded(c.name, ok = true))
      }

    bus.send(AddUser("ok", 1))
    bus.send(AddUser("bad", -5))
    router.run(); router.processAllAvailable(); router.close()

    assert(ps.subscribeBatch("user_events3").count() == 1)
    val dlq = ps.subscribeBatch("cmd_dlq").collect()
    assert(dlq.length == 1)
    assert(dlq.head.getAs[Map[String, String]]("metadata")(Ctx.ReasonPoisoned).contains("bad age"))
  }

  test("event group processor dispatches multiple types on ONE shared subscription") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    val busTopic = "group_events"
    val ebus = new EventBus(ps, _ => busTopic)
    new EventGroupProcessor(router, ps, ps)
      .addHandlersGroup("g1", busTopic, "group_out",
        TypedHandler[UserAdded](marshaler) { (e, _) => Seq(AuditEvent(s"added:${e.name}")) },
        TypedHandler[AuditEvent](marshaler) { (e, _) => Seq(AuditEvent(s"audited:${e.what}")) })

    ebus.publish(UserAdded("k", ok = true))
    ebus.publish(AuditEvent("x"))
    router.run(); router.processAllAvailable(); router.close()

    // exactly one router handler (one query) serves the whole group
    assert(router.handlerNames == Seq("cqrs-group-g1"))
    val outs = ps.subscribeBatch("group_out").collect()
      .map(r => JsonCodec.read(r.getAs[Array[Byte]]("payload"), classOf[AuditEvent]).what).toSet
    assert(outs == Set("added:k", "audited:x"))
  }

  test("event processor runs N independent handlers per event type (event_processor.go:252-292)") {
    val ps = new MemoryPubSub(spark)
    val router = new Router(spark)
    val ebus = new EventBus(ps)
    new EventProcessor(router, ps, ps)
      .addHandler[UserAdded]("audit1") { (e, _) => Seq(AuditEvent(s"a1:${e.name}")) }
      .addHandler[UserAdded]("audit2") { (e, _) => Seq(AuditEvent(s"a2:${e.name}")) }

    ebus.publish(UserAdded("z", ok = true))
    router.run(); router.processAllAvailable(); router.close()

    assert(ps.subscribeBatch("audit1").count() == 1)
    assert(ps.subscribeBatch("audit2").count() == 1)
  }
}
