package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental near-dup dedup against a frozen stored band index
  * (`minhashBandIndex` / `incrementalCandidates`) — the restartable
  * batch form of continuous-ingestion dedup: only the new slice is
  * scanned; the accepted corpus participates through its persisted
  * (band, band_key, doc_id) rows.
  */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private val baseA = "the quick brown fox jumps over the lazy dog while " +
    "the cat sleeps on the warm windowsill and birds sing in the garden"
  private val baseB = "distributed query engines shuffle data between " +
    "executors using hash partitioning and broadcast small dimension tables"
  private val unrelated = "completely different content about baking bread " +
    "with sourdough starter and long slow fermentation in a dutch oven"

  private def bands(rows: (Long, String)*) =
    DedupFunctions.minhashBandIndex(rows.toDF("doc_id", "text"),
      "doc_id", "text", shingleN = 3, k = 16, r = 4, portable = false)

  private def cands(newRows: Seq[(Long, String)],
      index: org.apache.spark.sql.DataFrame) =
    DedupFunctions.incrementalCandidates(newRows.toDF("doc_id", "text"),
      index, "doc_id", "text", shingleN = 3, k = 16, r = 4,
      portable = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("cross-slice duplicates are caught through the index; unrelated docs are not") {
    val index = bands(1L -> baseA, 2L -> baseB)
    val got = cands(Seq(10L -> baseA, 11L -> unrelated), index)
    assert(got.contains((1L, 10L)), "new clone of an accepted doc must pair")
    assert(!got.exists { case (a, b) => a == 11L || b == 11L },
      "unrelated new doc must not pair")
  }

  test("within-slice duplicates are caught without any index hit") {
    val index = bands(1L -> baseB)
    val got = cands(Seq(20L -> baseA, 21L -> baseA), index)
    assert(got.contains((20L, 21L)), "new-vs-new dup must pair")
    assert(!got.exists { case (a, b) => a == 1L || b == 1L })
  }

  test("append lifecycle: a grown index catches dups against every accepted slice") {
    // slice 1 accepted -> index1; slice 2 dedups against index1, is
    // accepted, its bands APPEND; slice 3 must catch dups vs BOTH
    // earlier slices without any re-scan of their text (only band rows
    // participate)
    val idx1 = bands(1L -> baseA)
    val slice2 = Seq(30L -> baseB)
    assert(cands(slice2, idx1).isEmpty)
    val idx2 = idx1.unionByName(bands(slice2: _*))
    val got = cands(Seq(40L -> baseA, 41L -> baseB), idx2)
    assert(got.contains((1L, 40L)), "dup vs slice-1 doc missed")
    assert(got.contains((30L, 41L)), "dup vs slice-2 doc missed")
  }

  test("build-time cap drops boilerplate buckets from the index") {
    // 1200 identical docs -> every band bucket is over the default
    // 1000 cap -> the index build drops them entirely
    val boiler = (0L until 1200L).map(i => (i, baseA))
    val idx = DedupFunctions.minhashBandIndex(boiler.toDF("doc_id", "text"),
      "doc_id", "text", shingleN = 3, k = 16, r = 4, portable = false)
    assert(idx.count() == 0, "over-cap buckets must not enter the index")
    // and a sub-cap corpus keeps all its bands (4 bands per doc)
    val small = bands(1L -> baseA, 2L -> baseB)
    assert(small.count() == 8)
  }

  test("a bucketed stored index joins without reshuffling the index side") {
    // the q147 scale claim made executable: persist the band index
    // BUCKETED by the join key and the incremental join moves only the
    // new slice's bands — the index side scans its buckets in place
    val idx = bands(1L -> baseA, 2L -> baseB)
    idx.write.mode("overwrite")
      .bucketBy(8, "band", "band_key").sortBy("band", "band_key")
      .format("parquet").saveAsTable("graft_inc_idx")
    // at 100 TB neither side broadcasts — force the sort-merge regime
    // the claim is about (under broadcast, bucketing is moot)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val nb = bands(10L -> baseA, 11L -> unrelated)
      val joined = nb.join(spark.table("graft_inc_idx")
          .withColumnRenamed("doc_id", "acc_id"), Seq("band", "band_key"))
      val p = joined.queryExecution.executedPlan.toString
      // the index scan must be bucket-aware...
      assert(p.contains("Bucketed: true"),
        s"index side must scan its buckets in place:\n$p")
      // ...and the only hash exchanges in the plan belong to the
      // new-bands side (its window build + its shuffle TO the index's
      // bucket layout); the index contributes none
      val idxScanIdx = p.indexOf("graft_inc_idx")
      assert(idxScanIdx > 0)
      val afterIdx = p.substring(idxScanIdx)
      assert(!afterIdx.contains("Exchange hashpartitioning"),
        s"no exchange may sit on/under the index branch:\n$p")
      // correctness unchanged through the bucketed path
      val got = joined.filter(col("acc_id") =!= col("doc_id"))
        .select(col("acc_id"), col("doc_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_inc_idx")
    }
  }

  test("endurance property: K random slices with cross-slice clones — incremental equals one-shot after EVERY append, prior text never re-read") {
    // The continuous-ingestion claim under ITERATION, not a single
    // append: fold K=5 randomly generated slices (planted clones of
    // docs from random EARLIER slices at random distances, plus
    // within-slice clones), and after every append assert (a) the
    // incremental pair set equals the one-shot generator on the union
    // minus accepted-internal pairs, and (b) the incremental plan's
    // only FILE input is the stored band index — the accepted slices'
    // text is structurally unreachable (parquet round-trip cuts the
    // lineage, mirroring q147's frozen index).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu",
      "xi", "omicron", "pi", "rho", "sigma", "tau", "upsilon")
    val docGen: Gen[String] = for {
      len <- Gen.choose(6, 14)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val params = Gen.Parameters.default
    (0 until 3).foreach { trial =>
      val rng = new scala.util.Random(900 + trial)
      val idxDir = java.nio.file.Files
        .createTempDirectory(s"graft-inc-endure-$trial").toString + "/idx"
      var accepted = Vector.empty[(Long, String)]
      (0 until 5).foreach { sliceNo =>
        val nBase = 4 + rng.nextInt(4)
        val base = (0 until nBase).map { j =>
          (sliceNo * 1000L + j,
            docGen.pureApply(params, Seed(trial * 10000L + sliceNo * 100L + j)))
        }
        // planted clones: of a random doc from any EARLIER slice
        // (random distance back), and of a same-slice sibling
        val crossClones =
          if (accepted.isEmpty) Seq.empty
          else (0 until (1 + rng.nextInt(2))).map { c =>
            val src = accepted(rng.nextInt(accepted.size))
            (sliceNo * 1000L + 500L + c, src._2)
          }
        val intraClone =
          if (rng.nextBoolean()) Seq((sliceNo * 1000L + 900L, base.head._2))
          else Seq.empty
        val slice = base ++ crossClones ++ intraClone
        if (sliceNo == 0) {
          bands(slice: _*).write.mode("overwrite").parquet(idxDir)
        } else {
          val stored = spark.read.parquet(idxDir)
          val incDf = DedupFunctions.incrementalCandidates(
            slice.toDF("doc_id", "text"), stored, "doc_id", "text",
            shingleN = 3, k = 16, r = 4, portable = false)
          // (b) plan audit FIRST: every file scan reads the index dir
          // (string form — under AQE the adaptive wrapper is a leaf,
          // so node-collect can't see inside; toString can)
          val scans = incDf.queryExecution.executedPlan.toString
            .linesIterator.filter(_.contains("FileScan")).toSeq
          assert(scans.nonEmpty &&
            scans.forall(_.contains(s"graft-inc-endure-$trial")),
            s"slice $sliceNo: plan reads files outside the index:\n" +
              scans.mkString("\n"))
          // (a) pair-set equality with the one-shot generator
          val inc = incDf.collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val full = DedupFunctions.minhashCandidates(
              (accepted ++ slice).toDF("doc_id", "text"), "doc_id",
              "text", shingleN = 3, k = 16, r = 4, portable = false)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          val accIds = accepted.map(_._1).toSet
          val expected = full.filterNot { case (a, b) =>
            accIds.contains(a) && accIds.contains(b)
          }
          assert(inc == expected, s"trial $trial slice $sliceNo: " +
            s"missing ${expected -- inc}; extra ${inc -- expected}")
          assert(crossClones.isEmpty || inc.nonEmpty,
            s"trial $trial slice $sliceNo: planted cross-slice clones " +
              "produced no candidates")
          bands(slice: _*).write.mode("append").parquet(idxDir)
        }
        accepted ++= slice
      }
    }
  }

  test("pair set matches the one-shot candidate generator on the combined corpus") {
    // incremental(old -> index, new) must equal the minhashCandidates
    // pairs of old ∪ new, minus the old-vs-old pairs — the invariant
    // that makes incremental ingestion equivalent to periodic full
    // re-dedup
    val old = Seq(1L -> baseA, 2L -> baseB, 3L -> unrelated)
    val fresh = Seq(10L -> baseA, 11L -> baseB, 12L -> (baseA + " extra"))
    val inc = cands(fresh, bands(old: _*))
    val full = DedupFunctions.minhashCandidates(
        (old ++ fresh).toDF("doc_id", "text"), "doc_id", "text",
        shingleN = 3, k = 16, r = 4, portable = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oldIds = old.map(_._1).toSet
    val expected = full.filterNot { case (a, b) =>
      oldIds.contains(a) && oldIds.contains(b)
    }
    assert(inc == expected,
      s"missing: ${expected -- inc}; extra: ${inc -- expected}")
  }
}
