package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The shared JDK-HttpServer property-defaulting: both graft creation
  * sites (ingest edge, metrics endpoint) call [[JdkHttpServerDefaults
  * .ensure]] BEFORE `HttpServer.create`, and a post-latch property
  * change is warned about instead of being silently inert.
  */
class JdkHttpServerDefaultsSpec extends AnyFunSuite {

  test("ensure() defaults maxReqTime/drainAmount and latches once") {
    JdkHttpServerDefaults.ensure()
    assert(System.getProperty("sun.net.httpserver.maxReqTime") != null,
      "dribbler wall-clock bound must be defaulted")
    assert(System.getProperty("sun.net.httpserver.drainAmount") != null,
      "no-drain-on-reject must be defaulted")
    assert(JdkHttpServerDefaults.latched.isDefined,
      "first ensure() records the latched values")
  }

  test("a property change AFTER the latch warns loudly (it is inert for this JVM)") {
    JdkHttpServerDefaults.ensure() // latch with current values
    val cap = new CaptureLogger
    val prevLogger = JdkHttpServerDefaults.logger
    val prevProp = System.getProperty("sun.net.httpserver.maxReqTime")
    JdkHttpServerDefaults.logger = cap
    try {
      System.setProperty("sun.net.httpserver.maxReqTime", "99999")
      JdkHttpServerDefaults.ensure()
      assert(cap.has("warn", "INERT"),
        s"post-latch change must warn; got ${cap.entries}")
    } finally {
      if (prevProp == null) System.clearProperty("sun.net.httpserver.maxReqTime")
      else System.setProperty("sun.net.httpserver.maxReqTime", prevProp)
      JdkHttpServerDefaults.logger = prevLogger
    }
    // restored values match the latch again: no further warning
    val cap2 = new CaptureLogger
    JdkHttpServerDefaults.logger = cap2
    try {
      JdkHttpServerDefaults.ensure()
      assert(cap2.entries.isEmpty, s"restored values must not warn: ${cap2.entries}")
    } finally JdkHttpServerDefaults.logger = prevLogger
  }

  test("the metrics endpoint path runs ensure() before creating its server") {
    // the r18 ADVICE scenario: a metrics server starting FIRST in the
    // JVM used to leave the ingest hardening silently inert. The
    // MetricsHttp.serve path must leave the latch recorded.
    val ep = graft.metrics.MetricsHttp.serve(new graft.metrics.GraftMetrics)
    try assert(JdkHttpServerDefaults.latched.isDefined,
      "MetricsHttp.serve must route through JdkHttpServerDefaults.ensure")
    finally ep.close()
  }
}
