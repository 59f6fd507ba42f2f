package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compressibility signal: repetitive text compresses far below
  * varied prose, the expression agrees with a driver-side deflate of
  * the same bytes, and degenerate inputs behave.
  */
class TextQualitySpec extends SparkSpec {

  import spark.implicits._

  test("compressionRatio separates boilerplate from varied text") {
    val repetitive = Array.fill(200)("buy now click here").mkString(" ")
    val varied = (0 until 200)
      .map(i => s"w${i * 7919 % 9973}x${i * 104729 % 99991}").mkString(" ")
    val rows = Seq((1L, repetitive), (2L, varied), (3L, ""))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.compressionRatio(col("text")).as("cr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) < 0.1, s"boilerplate must compress hard, got ${rows(1L)}")
    assert(rows(2L) > 0.4, s"varied text must resist compression, got ${rows(2L)}")
    assert(rows(2L) > rows(1L) * 3, s"separation too weak: $rows")
    assert(rows(3L) == 1.0, "empty input is defined as 1.0")
  }

  test("expression matches a driver-side deflate of the same bytes") {
    val texts = Seq("table scan row batch", "aaaaaaaaaaaaaaaaaaaa", "x")
    val fromExpr = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextFunctions.compressionRatio(col("text")).as("cr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val expected = HashUtil.deflateRatio(t.getBytes("UTF-8"))
      assert(fromExpr(i.toLong) == expected, s"'$t': ${fromExpr(i.toLong)} vs $expected")
    }
  }

  test("callable from SQL via the extension registry") {
    val r = spark.sql(
      "SELECT graft_deflate_ratio('spark spark spark spark spark spark') AS cr")
      .collect().head.getDouble(0)
    assert(r > 0 && r < 1.0)
  }
}
