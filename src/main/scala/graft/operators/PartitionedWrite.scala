package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Partition-scoped overwrite — the incremental-refresh write for a
  * date/source-partitioned table. A plain `mode(Overwrite)` on a
  * partitioned directory TRUNCATES THE WHOLE TABLE to write one day's
  * correction; the lakehouse shape is dynamic partition overwrite:
  * replace exactly the partitions present in the incoming frame, leave
  * every other partition's files untouched. At 100 TB that is the
  * difference between rewriting a table and rewriting a day.
  *
  * Spark-first: this is the built-in
  * `spark.sql.sources.partitionOverwriteMode=dynamic` behavior — no
  * custom committer. The helper scopes the session flag to the one
  * write (a session-wide dynamic default silently changes the
  * semantics of every other overwrite in the job) and restores the
  * prior value even on failure.
  *
  * Schema evolution rides the same layout: files written before a
  * column existed read back alongside new files via `mergeSchema`
  * (old rows surface NULL for the added column) — see
  * [[readMerged]].
  */
object PartitionedWrite {

  /** Write `df` partitioned by `partitionCols` under `dir`, replacing
    * ONLY the partitions `df` contains. Partitions absent from `df`
    * keep their existing data (a full `Overwrite` would delete them).
    */
  def overwritePartitions(df: DataFrame, dir: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitioned overwrite needs partition columns")
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try
      df.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCols: _*)
        .parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Read a partitioned table whose files span schema versions:
    * `mergeSchema` unions the per-file schemas (added columns are NULL
    * on old rows). Schema union is a FOOTER operation — no data is
    * rewritten to evolve the schema. */
  def readMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)
}
