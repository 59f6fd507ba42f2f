package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[VectorFunctions.hardNegatives]]: same-label items never rank (even
  * when nearest), the hardest cross-label item ranks first, null labels
  * count as different from everything, and self never matches.
  */
class HardNegativesSpec extends SparkSpec {

  import spark.implicits._

  // planted geometry on the unit circle: angle encodes similarity
  private def vec(deg: Double) = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  private def run(rows: Seq[(Long, Seq[Float], Option[Int])], k: Int = 2) = {
    val df = rows.toDF("vec_id", "embedding", "label")
    VectorFunctions.hardNegatives(
        df.filter(col("vec_id") === 0L), df, "vec_id", "embedding", "label", k)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toList.sorted
  }

  test("the nearest SAME-label item is skipped; hardest cross-label wins") {
    val rows = Seq(
      (0L, vec(0), Some(1)),
      (1L, vec(1), Some(1)),   // nearest overall but same label
      (2L, vec(10), Some(2)),  // hardest negative
      (3L, vec(40), Some(3)),
      (4L, vec(170), Some(2)))
    assert(run(rows) == List((1, 2L), (2, 3L)))
  }

  test("a null label differs from every concrete label (valid negative)") {
    val rows = Seq(
      (0L, vec(0), Some(1)),
      (1L, vec(5), Option.empty[Int]),  // null label: valid negative
      (2L, vec(90), Some(1)))
    assert(run(rows, k = 3) == List((1, 1L)))
  }

  test("two null-labeled items are the SAME label (null-safe equality)") {
    val rows = Seq(
      (0L, vec(0), Option.empty[Int]),
      (1L, vec(5), Option.empty[Int]),  // same (null) label: skipped
      (2L, vec(30), Some(7)))
    assert(run(rows, k = 3) == List((1, 2L)))
  }

  test("no cross-label candidates -> query emits no rows") {
    val rows = Seq((0L, vec(0), Some(1)), (1L, vec(5), Some(1)))
    assert(run(rows) == Nil)
  }
}
