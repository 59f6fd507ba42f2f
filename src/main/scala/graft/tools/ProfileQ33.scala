package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftSession
import graft.functions.DedupFunctions

/** Stage-by-stage wall-time breakdown of q33 (dup-cluster resolution),
  * the bench's most expensive query. Each stage materializes through a
  * count/noop so the number is the stage's real job time, not lazy
  * planning. Run: `SPARK_GRAFT_CPUS=32 sbt -batch
  * 'runMain graft.tools.ProfileQ33 /root/testdata/sf0.1'`.
  */
object ProfileQ33 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()

    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def cand: DataFrame = DedupFunctions.minhashCandidates(
      docs, "doc_id", "text", shingleN = 3, k = 12, r = 2, portable = true)

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $label%-40s ${s}%8.3f s  ($r)")
    }

    // JIT/codegen warm-up on the small slice of the same plan
    DedupFunctions.dupClusters(DedupFunctions.minhashCandidates(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", 3, 12, 2, portable = true)).count()

    time("candidates (q20 path, fresh)") { cand.count() }

    val candP = cand.persist(StorageLevel.MEMORY_AND_DISK)
    time("candidates materialize (persist)") { candP.count() }

    time("edges: explode+distinct (cand cached)") {
      candP.select(explode(array(
        struct(col("d1").as("a"), col("d2").as("b")),
        struct(col("d2").as("a"), col("d1").as("b")),
        struct(col("d1").as("a"), col("d1").as("b")),
        struct(col("d2").as("a"), col("d2").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .distinct().count()
    }

    time("dupClusters tail only (cand cached)") {
      DedupFunctions.dupClusters(candP).count()
    }
    candP.unpersist()

    time("q33 full (fresh, = bench shape)") {
      DedupFunctions.dupClusters(cand).orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}
