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
      // CHECKED recovery (GenerationSwap contract): an unchecked false
      // rename here proceeded to delete the .old rollback copy while
      // live was still absent — the silent-failure class the
      // choreography exists to kill
      val tmp0 = new Path(dir + ".compact"); val old0 = new Path(dir + ".old")
      if (fs.exists(tmp0)) {
        graft.streaming.GenerationSwap.renameOrThrow(fs, tmp0, live)
        graft.streaming.GenerationSwap.deleteIfExists(fs, old0)
      } else if (fs.exists(old0)) {
        graft.streaming.GenerationSwap.renameOrThrow(fs, old0, live)
      }
    }
    val entries = fs.listStatus(live)
    // partitioned layouts (key=value subdirs) would be read through
    // partition discovery and rewritten FLAT — partition columns
    // demoted to data, downstream pruned readers broken, and the
    // non-recursive size here would read 0 bytes and force ONE output
    // file. Refuse loudly: compact partitioned tables per partition.
    val partDirs = entries.filter(e => e.isDirectory &&
      e.getPath.getName.contains("="))
    require(partDirs.isEmpty,
      s"compactParquet: $dir is hive-partitioned " +
        s"(${partDirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
        "compact each partition directory, not the table root " +
        "(a flat rewrite would demote partition columns to data)")
    val total = entries.iterator
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
    graft.streaming.GenerationSwap.deleteIfExists(fs, tmp)
    graft.streaming.GenerationSwap.deleteIfExists(fs, old)
    out.write.mode("overwrite").parquet(tmp.toString)
    // shared rename-aside choreography — one definition of the crash
    // contract across compact/migrate sites
    graft.streaming.GenerationSwap.replaceLive(fs, dir, tmp.toString)
    nFiles
  }
}
