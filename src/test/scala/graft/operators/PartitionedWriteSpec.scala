package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dynamic partition overwrite: a refresh replaces exactly the
  * partitions it carries and leaves the rest byte-identical; a full
  * Overwrite (the naive spelling) would truncate the table. Schema
  * evolution: pre-evolution files read back via mergeSchema with NULL
  * in the added column.
  */
class PartitionedWriteSpec extends SparkSpec {

  import spark.implicits._

  test("overwritePartitions replaces only the partitions present in the frame") {
    val dir = Files.createTempDirectory("graft-dpo-").toString + "/t"
    val day1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0))
    val day2 = Seq((3L, "2024-01-02", 30.0))
    PartitionedWrite.overwritePartitions(
      (day1 ++ day2).toDF("id", "d", "v"), dir, Seq("d"))

    // correction for day 2 only — day 1 must survive untouched
    PartitionedWrite.overwritePartitions(
      Seq((3L, "2024-01-02", 99.0), (4L, "2024-01-02", 40.0)).toDF("id", "d", "v"),
      dir, Seq("d"))

    val got = spark.read.parquet(dir)
      .select(col("id"), col("d"), col("v"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0), // untouched
      (3L, "2024-01-02", 99.0), (4L, "2024-01-02", 40.0)), // replaced
      s"got $got")

    // negative control: a plain full Overwrite of day 2 truncates day 1
    Seq((5L, "2024-01-02", 50.0)).toDF("id", "d", "v")
      .write.mode("overwrite").partitionBy("d").parquet(dir)
    val truncated = spark.read.parquet(dir).count()
    assert(truncated == 1L,
      s"full overwrite drops other partitions (the hazard the operator scopes away): $truncated")
  }

  test("never touches the session-wide overwrite mode, even when the write fails") {
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    val dir = Files.createTempDirectory("graft-dpo-fail-").toString + "/t"
    intercept[Exception] {
      // duplicate column name -> analysis error inside the write
      PartitionedWrite.overwritePartitions(
        Seq((1L, "a")).toDF("d", "d"), dir, Seq("d"))
    }
    assert(spark.conf.get(key) == "static",
      "the dynamic mode must ride the writer option, not session state")
  }

  test("mergeSchema reads files that predate an added column (NULL backfill)") {
    val dir = Files.createTempDirectory("graft-evo-").toString + "/t"
    PartitionedWrite.overwritePartitions(
      Seq((1L, "2024-01-01", 10.0)).toDF("id", "d", "v"), dir, Seq("d"))
    // schema v2 adds a quality column; only the new partition has it
    PartitionedWrite.overwritePartitions(
      Seq((2L, "2024-01-02", 20.0, 0.9)).toDF("id", "d", "v", "q"), dir, Seq("d"))

    val merged = PartitionedWrite.readMerged(spark, dir)
      .select(col("id"), col("v"), col("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(merged == Set((1L, 10.0, None), (2L, 20.0, Some(0.9))),
      s"old files must surface NULL for the added column: $merged")
  }
}
