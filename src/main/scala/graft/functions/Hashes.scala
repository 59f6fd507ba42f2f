package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** JVM-side hash helpers, callable from generated code (static refs). */
object HashUtil {
  def adler32(bytes: Array[Byte]): Long = {
    val a = new java.util.zip.Adler32()
    a.update(bytes, 0, bytes.length)
    a.getValue
  }
}

/** Adler32 checksum of a binary column, as a native Catalyst expression
  * with codegen (no UDF boxing). Parity with the reference's
  * `NewMessageHasherAdler32` dedup hasher
  * (reference: message/router/middleware/deduplicator.go:219-234).
  */
case class Adler32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_adler32"
  protected override def nullSafeEval(input: Any): Any =
    HashUtil.adler32(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.adler32($c)")
  override protected def withNewChildInternal(newChild: Expression): Adler32Expr =
    copy(child = newChild)
}

/** Hash column functions. Two families:
  *  - fast path: `xxhash64` (Spark-native, codegen'd) — use in
  *    production pipelines;
  *  - portable path: md5-prefix-as-long — bit-identical across engines
  *    (Spark `conv(substr(md5 ..))` == DuckDB `('0x'||substr(md5 ..))::BIGINT`),
  *    used where the correctness oracle must reproduce the hash.
  */
object Hashes {

  def adler32(c: Column): Column = ColumnBridge.column(
    Adler32Expr(ColumnBridge.expression(c.cast(BinaryType))))

  /** First 15 hex chars of md5 as a positive 60-bit long. Engine-portable. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c.cast(BinaryType)), 1, 15), 16, 10).cast(LongType)

  /** Salted portable hash — the seed-parameterized hash family used by
    * MinHash permutations. */
  def md5Long(c: Column, salt: Int): Column =
    md5Long(concat(lit(s"$salt:"), c.cast("string")))

  /** Fast salted 64-bit hash (xxhash64, codegen'd) — the production
    * MinHash hash family; not oracle-portable. */
  def fastLong(c: Column, salt: Int): Column = xxhash64(lit(salt), c)

  /** Content hash used by exact dedup: hex md5 (engine-portable). */
  def contentHash(c: Column): Column = md5(c.cast(BinaryType))
}
