package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TableDiff: classification, changed-column attribution, null
  * semantics, the empty-diff identity, and the digest tier's
  * mismatch-localization contract.
  */
class TableDiffSpec extends SparkSpec {

  import spark.implicits._

  private val left = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))

  private def run(right: Seq[(Long, String, Double)]) =
    TableDiff.diff(left.toDF("k", "name", "v"), right.toDF("k", "name", "v"),
        Seq("k"))
      .orderBy("k").as[(Long, String, String)].collect().toList

  test("added / removed / changed classification with column attribution") {
    val right = Seq(
      (1L, "a", 10.0),     // unchanged -> absent
      (2L, "B", 20.0),     // name changed
      (3L, "c", 33.0),     // v changed
      (9L, "z", 1.0))      // added; 4 removed
    assert(run(right) == List(
      (2L, "changed", "name"), (3L, "changed", "v"),
      (4L, "removed", ""), (9L, "added", "")))
  }

  test("multiple changed columns list in column order") {
    assert(run(Seq((1L, "A", 11.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0))) == List((1L, "changed", "name,v")))
  }

  test("identical tables diff to empty") {
    assert(run(left) == Nil)
  }

  test("null vs value IS a change; null vs null is not") {
    val l = Seq((1L, Some("x")), (2L, Option.empty[String])).toDF("k", "s")
    val r = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val got = TableDiff.diff(l, r, Seq("k"))
      .as[(Long, String, String)].collect().toList
    assert(got == List((1L, "changed", "s")))
  }

  test("schema mismatch is rejected") {
    intercept[IllegalArgumentException] {
      TableDiff.diff(Seq((1L, "a")).toDF("k", "x"),
        Seq((1L, "a")).toDF("k", "y"), Seq("k"))
    }
  }

  test("bucket digests: equal tables agree; a mismatch localizes to its bucket") {
    val a = (0L until 1000L).map(i => (i, s"n$i", i * 1.5)).toDF("k", "name", "v")
    val b = (0L until 1000L).map(i =>
      (i, s"n$i", if (i == 137L) -1.0 else i * 1.5)).toDF("k", "name", "v")
    val da = TableDiff.bucketDigests(a, Seq("k"), 16)
      .as[(Long, Long, Long, Long)].collect().toMap2
    val db = TableDiff.bucketDigests(b, Seq("k"), 16)
      .as[(Long, Long, Long, Long)].collect().toMap2
    assert(da.keySet == db.keySet)
    val bad = da.keys.filter(k => da(k) != db(k)).toList
    // exactly one bucket differs — the one key 137 hashes into
    assert(bad.size == 1)
    val expected = a.filter(col("k") === 137L)
      .select(pmod(xxhash64(col("k")), lit(16))).head.getLong(0)
    assert(bad.head == expected)
    // counts still agree (same cardinality, different content)
    assert(da(bad.head)._1 == db(bad.head)._1)
  }

  test("digest is partitioning-invariant (bit_xor and masked sum commute)") {
    val a = (0L until 500L).map(i => (i, s"x$i")).toDF("k", "s")
    val one = TableDiff.bucketDigests(a.repartition(1), Seq("k"), 8)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toList
    val many = TableDiff.bucketDigests(a.repartition(17), Seq("k"), 8)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toList
    assert(one == many)
  }

  test("a value MOVED between columns (nulls filling the gaps) changes the digest") {
    // xxhash64 SKIPS null children: without per-field null sentinels,
    // (x, NULL) and (NULL, x) folded identically and this real change
    // digested as "equal" — a false negative in the pre-filter whose
    // only job is to have none
    val l = Seq((1L, Some("x"), Option.empty[String])).toDF("k", "a", "b")
    val r = Seq((1L, Option.empty[String], Some("x"))).toDF("k", "a", "b")
    val dl = TableDiff.bucketDigests(l, Seq("k"), 4)
      .as[(Long, Long, Long, Long)].collect().toList
    val dr = TableDiff.bucketDigests(r, Seq("k"), 4)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(dl != dr, "a column-shifted value must change the bucket digest")
  }

  test("even multiplicities do not XOR-cancel into a false 'equal'") {
    // {R,R} vs {S,S}: both XOR to 0 with equal counts — only the
    // masked-sum component distinguishes them
    val l = Seq((1L, "r"), (1L, "r")).toDF("k", "s")
    val r = Seq((1L, "s"), (1L, "s")).toDF("k", "s")
    val dl = TableDiff.bucketDigests(l, Seq("k"), 2)
      .as[(Long, Long, Long, Long)].collect().toList
    val dr = TableDiff.bucketDigests(r, Seq("k"), 2)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(dl != dr, "duplicated-row buckets must not digest equal")
  }

  private implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
