package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{LlmQueries, QuerySpec, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry is one operator from SURVEY.md §2 (or the LLM-pipeline
  * extension surface), expressed as its batch-verifiable Spark plan;
  * `oracleSql` holds the DuckDB-equivalent SQL for the driver's
  * correctness compare.
  */
object SparkEntry {

  val allSpecs: Seq[QuerySpec] = RelationalQueries.specs ++ LlmQueries.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allSpecs.find(_.name == "q14_star_join").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(s => s.oracle.map(s.name -> _)).toMap
}
