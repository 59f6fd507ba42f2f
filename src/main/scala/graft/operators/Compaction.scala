package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Size-targeted parquet compaction — the small-files operator. A
  * streaming sink or a many-task write leaves thousands of KB-sized
  * files; every downstream scan then pays per-file open/footer/seek
  * cost, and at 100 TB the NameNode/listing overhead alone dominates.
  * Compaction rewrites a directory into files near a target size,
  * optionally range-clustered on sort keys so parquet min/max footers
  * become disjoint ranges (scan pruning — the 1-D sibling of
  * [[graft.functions.ZOrder]], which handles the 2-D case).
  *
  * File count comes from the directory's ACTUAL byte size (an FS
  * listing — metadata, not data), never from in-memory plan estimates
  * that miss parquet's compression ratio. The swap is crash-safe in
  * the same rename-aside order as StreamingQuota.compact: materialize
  * `.compact` fully, move live aside to `.old`, promote, delete —
  * every crash point leaves a complete directory to adopt.
  */
object Compaction {

  /** Rewrite `dir` into ~`targetBytes` parquet files; returns the
    * output file count. With `sortBy`, files are range-partitioned and
    * internally sorted on those keys (globally disjoint ranges). */
  def compactParquet(spark: SparkSession, dir: String, targetBytes: Long,
      sortBy: Seq[String] = Nil): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(dir)
    // self-healing (same contract as FilePubSub.compact): a crash
    // between "live moved aside" and "compacted dir promoted" leaves
    // live MISSING — finish forward from the complete .compact copy if
    // it exists, else roll back from .old, so no crash window strands
    // the directory or loses data
    if (!fs.exists(live)) {
      val tmp0 = new Path(dir + ".compact"); val old0 = new Path(dir + ".old")
      if (fs.exists(tmp0)) { fs.rename(tmp0, live); fs.delete(old0, true); () }
      else if (fs.exists(old0)) { fs.rename(old0, live); () }
    }
    val total = fs.listStatus(live).iterator
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt

    val df = spark.read.parquet(dir)
    val out =
      if (sortBy.nonEmpty)
        df.repartitionByRange(nFiles, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      else df.repartition(nFiles)

    val tmp = new Path(dir + ".compact")
    val old = new Path(dir + ".old")
    fs.delete(tmp, true); fs.delete(old, true)
    out.write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(live, old), s"compact: cannot move $live aside")
    require(fs.rename(tmp, live), s"compact: cannot promote $tmp")
    fs.delete(old, true)
    nFiles
  }
}
