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
  * `partitionOverwriteMode=dynamic` behavior — no custom committer.
  * The flag is passed as a WRITER option, never as session state (a
  * session-wide dynamic default silently changes the semantics of
  * every other overwrite in the job, and a set/restore dance races
  * concurrent writers).
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
    * The mode rides the WRITER (`option("partitionOverwriteMode",…)`
    * overrides the session conf for this one write) — a session-conf
    * set/restore would race any concurrent write on another thread of
    * the same session into silently changed overwrite semantics. */
  def overwritePartitions(df: DataFrame, dir: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitioned overwrite needs partition columns")
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(dir)
  }

  /** Read a partitioned table whose files span schema versions:
    * `mergeSchema` unions the per-file schemas (added columns are NULL
    * on old rows). Schema union is a FOOTER operation — no data is
    * rewritten to evolve the schema. */
  def readMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)
}
