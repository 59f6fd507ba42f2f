package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gated operator query: the Spark plan plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle that must
  * produce the identical result on the same parquet tables. Column
  * names/aliases MUST match between `fn` output and `oracle` — the
  * driver sorts columns by name before hashing.
  */
case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Read one of the driver-generated tables (TESTDATA.md), pinning
    * `events.ts` to session-zoned TIMESTAMP whatever the parquet
    * physical type is. Two generations of driver data exist:
    * nanosecond int64 (read as long under
    * `spark.sql.legacy.parquet.nanosAsLong`, converted with integer
    * division — a double division would lose precision past 2^53 ns)
    * and microsecond timestamps without a UTC flag, which Spark 4
    * infers as TIMESTAMP_NTZ (`inferTimestampNTZ` default). NTZ breaks
    * numeric casts the query corpus relies on (`cast(ts as double)`),
    * so re-cast to LTZ — value-preserving because the session zone is
    * pinned UTC ([[graft.GraftSession]]), and identical to what DuckDB
    * sees (naive TIMESTAMP). */
  /** Schema-inference cache, keyed by parquet path: without it every
    * t() call re-reads the file footer ON THE DRIVER to infer the
    * schema — a per-query fixed cost paid once per referenced table
    * per construction (the ~150-query sub-second tail pays it 1-3×
    * each, every bench pass). The tables are immutable driver
    * fixtures, so the first inference is definitive; this is METADATA
    * only (what a catalog provides in production — the data itself is
    * recomputed from parquet on every read). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    val df = spark.read.schema(schema).parquet(path)
    schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
}
