package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: the bit kernel, and the property that justifies it —
  * after Morton clustering, per-file min/max boxes are tight in BOTH
  * dimensions, so a filter on the NON-leading dimension prunes most
  * files (a single-dim sort layout prunes none of them).
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("interleave16 bit kernel: known codes, ordering, and inverse") {
    assert(ZOrderUtil.interleave16(0, 0) == 0L)
    assert(ZOrderUtil.interleave16(1, 0) == 1L) // x in even bits
    assert(ZOrderUtil.interleave16(0, 1) == 2L) // y in odd bits
    assert(ZOrderUtil.interleave16(3, 5) == // 0b011 interleave 0b101
      (((1L << 0) | (1L << 2)) | ((1L << 1) | (1L << 5))))
    assert(ZOrderUtil.interleave16(0xFFFF, 0xFFFF) == 0xFFFFFFFFL)
    // z-curve locality: quadrant order (both-low < mixed < both-high)
    val z = (x: Int, y: Int) => ZOrderUtil.interleave16(x, y)
    assert(z(10, 10) < z(40000, 10) && z(40000, 10) < z(40000, 40000))
  }

  test("expression matches the JVM kernel and survives codegen") {
    val df = (0 until 1000).map(i => (i * 37 % 65536, i * 101 % 65536)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        ZOrder.zvalue16(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrderUtil.interleave16(r.getInt(0), r.getInt(1)))
    }
    // and via the SQL registry (GraftExtensions is installed by GraftSession)
    val sql = spark.sql("SELECT graft_zvalue16(12345, 54321) AS z").head.getLong(0)
    assert(sql == ZOrderUtil.interleave16(12345, 54321))
  }

  test("clustered layout prunes on the non-leading dimension; x-sort does not") {
    // 64x64 grid scaled to 16-bit keys: every (x, y) combination occurs,
    // so any 1-D sort necessarily stripes the other dimension
    val grid = for { x <- 0 until 64; y <- 0 until 64 }
      yield (x << 10, y << 10)
    val df = grid.toDF("x", "y")
    val files = 32

    // per-"file" (partition) min/max boxes, as parquet footers would record
    def boxes(laidOut: org.apache.spark.sql.DataFrame) =
      laidOut.withColumn("pid", spark_partition_id())
        .groupBy(col("pid"))
        .agg(min(col("y")).as("y_lo"), max(col("y")).as("y_hi"))
        .collect().map(r => (r.getAs[Int]("y_lo"), r.getAs[Int]("y_hi")))

    // a narrow slice in y — the dimension the sort does NOT lead with
    val (qLo, qHi) = (20 << 10, 23 << 10)
    def touched(bs: Array[(Int, Int)]) =
      bs.count { case (lo, hi) => lo <= qHi && hi >= qLo }

    val zBoxes = boxes(ZOrder.cluster(df, col("x"), col("y"), files))
    val xBoxes = boxes(df.repartitionByRange(files, col("x"))
      .sortWithinPartitions(col("x")))

    assert(zBoxes.length == files && xBoxes.length == files)
    // x-sorted files each span (nearly) all of y: no pruning possible
    assert(touched(xBoxes) >= files - 2,
      s"x-sort should not prune a y-filter: ${touched(xBoxes)}/$files")
    // z-ordered files are y-tight: the y-slice touches a small fraction
    assert(touched(zBoxes) <= files / 2,
      s"z-order should prune most files for a y-slice: ${touched(zBoxes)}/$files")
  }
}
