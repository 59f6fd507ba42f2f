package graft.sources

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.sql.{Connection, DriverManager, SQLException, SQLIntegrityConstraintViolationException}
import java.util.concurrent.atomic.AtomicBoolean

/** Test-only JDBC shim simulating PostgreSQL's TRANSACTION-LEVEL abort
  * semantics on top of embedded Derby. Derby aborts only the failing
  * STATEMENT and leaves the transaction usable — the lenient case — so
  * a probe misordered after a duplicate-key hit passes on Derby but
  * wedges every task retry on PostgreSQL ("current transaction is
  * aborted, commands ignored until end of transaction block", SQLSTATE
  * 25P02). This shim pins the strict contract the epoch writers'
  * rollback-before-probe ordering relies on: after ANY statement in an
  * open transaction hits an integrity-constraint violation, every
  * further execute on that connection throws until `rollback()`.
  *
  * URL shape: `jdbc:abortsim:<rest>` delegates to `jdbc:<rest>`, e.g.
  * `jdbc:abortsim:derby:memory:db;create=true`. Executor-side writers
  * resolve connections through `DriverManager.getConnection(url)`, so
  * passing a shim URL injects the fault without touching the code
  * under test. */
object AbortSimDriver extends java.sql.Driver {
  val Prefix = "jdbc:abortsim:"

  @volatile private var registered = false
  def ensureRegistered(): Unit = synchronized {
    if (!registered) { DriverManager.registerDriver(this); registered = true }
  }

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(Prefix)

  override def connect(url: String, info: java.util.Properties): Connection =
    if (!acceptsURL(url)) null
    else wrap(DriverManager.getConnection("jdbc:" + url.substring(Prefix.length), info))

  private def unwrapInvoke(target: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
    try m.invoke(target, args: _*)
    catch { case e: InvocationTargetException => throw e.getCause }

  private def wrap(real: Connection): Connection = {
    val aborted = new AtomicBoolean(false)

    def wrapStmt(st: AnyRef, iface: Class[_]): AnyRef =
      Proxy.newProxyInstance(getClass.getClassLoader, Array(iface),
        new InvocationHandler {
          override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
            if (m.getName.startsWith("execute")) {
              if (aborted.get())
                throw new SQLException("abortsim: current transaction is " +
                  "aborted, commands ignored until end of transaction block",
                  "25P02")
              try m.invoke(st, args: _*)
              catch {
                case e: InvocationTargetException => e.getCause match {
                  case icv: SQLIntegrityConstraintViolationException =>
                    if (!real.getAutoCommit) aborted.set(true)
                    // PostgreSQL's driver throws a PLAIN SQLException
                    // carrying SQLState 23505, NEVER the
                    // SQLIntegrityConstraintViolationException subclass
                    // Derby uses — rethrow in the PG shape so a
                    // subclass-only dup catch fails under this shim
                    // exactly as it would against real PostgreSQL
                    throw new SQLException(icv.getMessage, "23505", icv)
                  case sq: SQLException =>
                    // PG aborts the transaction on ANY statement error
                    if (!real.getAutoCommit) aborted.set(true)
                    throw sq
                  case other => throw other
                }
              }
            } else unwrapInvoke(st, m, args)
        })

    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "rollback" =>
              aborted.set(false)
              unwrapInvoke(real, m, args)
            case "commit" =>
              if (aborted.get())
                throw new SQLException(
                  "abortsim: cannot commit an aborted transaction", "25P02")
              unwrapInvoke(real, m, args)
            case "prepareStatement" | "createStatement" | "prepareCall" =>
              wrapStmt(unwrapInvoke(real, m, args), m.getReturnType)
            case _ => unwrapInvoke(real, m, args)
          }
      }).asInstanceOf[Connection]
  }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
