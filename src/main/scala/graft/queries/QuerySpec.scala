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
  import org.apache.spark.sql.types.LongType

  /** Read one of the driver-generated tables (TESTDATA.md). The
    * `events` table carries nanosecond timestamps, which Spark only
    * reads as long (`spark.sql.legacy.parquet.nanosAsLong`); convert
    * to microsecond TIMESTAMP with integer division (a double division
    * would lose precision past 2^53 ns). DuckDB truncates ns->us the
    * same way, so both engines see identical values. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
