package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query names — builder-side
    // fast iteration on one gate (the driver always passes two args)
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // same inter-query isolation as Bench: drop cache entries and
      // straggler checkpoint RDD blocks (iterative queries leave one
      // block set per round) so a 117-query run's footprint stays flat
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // anchors for the oracle-less rows, next to the oracle SQL: the
    // driver's correctness artifact marks those rows "no_oracle" — this
    // file (and the stderr echo) names the hash-matched twin / green
    // spec gating each one, so the consumer verifies the anchor instead
    // of archaeologizing (AnchorsSpec pins exact coverage)
    val anchorsJson = SparkEntry.anchors.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/anchors.json"), anchorsJson)
    SparkEntry.anchors.toSeq.sortBy(_._1).foreach { case (k, v) =>
      System.err.println(s"[verify] no_oracle $k; anchor=$v")
    }
    spark.stop()
  }
}
