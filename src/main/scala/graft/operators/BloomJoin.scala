package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Bloom-prefiltered semi join: before shuffling a 100 TB fact table
  * to join a selective build side, probe a Bloom filter of the build
  * keys AT THE SCAN — rows that can't match never enter the exchange.
  * This is the manual form of Spark's AQE runtime filter, exposed as
  * an operator so the pipeline author controls when it fires (AQE
  * injects one only under its own heuristics) and can persist/ship
  * the filter (it is just bytes) across jobs of a multi-step pipeline.
  *
  * EXACTNESS: a Bloom filter has false positives but no false
  * negatives, and the real join afterwards removes every false
  * positive — so the result is bit-identical to the unfiltered join
  * (the oracle gate proves it against the plain form). The filter is
  * a plan reference object (one broadcast-sized bitset, built with one
  * aggregation over the build side — never collected row-by-row).
  */
object BloomJoin {

  /** `fact` semi-joined to `build` on `key`, with a Bloom pre-filter
    * of `expectedKeys`/`fpp` probed before the shuffle. */
  def semiJoin(fact: DataFrame, build: DataFrame, key: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    // integral keys ONLY: stat.bloomFilter inserts a string key via its
    // UTF-8 bytes, but the probe hashes the value AS A LONG — for a
    // string column the two never meet, so the pre-filter would drop
    // almost every matching row (false NEGATIVES, silently breaking
    // the exactness contract). Fail loudly instead of wrongly.
    // BOTH sides must be integral: the filter is BUILT on the build
    // side's column, so a string-typed build key (dimension-table
    // drift) with an integral fact key inserts UTF-8 bytes and probes
    // longs — the two never meet and the pre-filter false-NEGATIVES
    // away nearly every matching row
    Seq("fact" -> fact, "build" -> build).foreach { case (side, df) =>
      val keyType = df.schema(key).dataType
      require(Seq("byte", "short", "integer", "long")
          .contains(keyType.typeName),
        s"BloomJoin.semiJoin: $side key '$key' must be integral, got " +
          s"$keyType (string keys would be inserted as bytes but " +
          "probed as longs)")
    }
    val bf = build.stat.bloomFilter(col(key), expectedKeys, fpp)
    fact.filter(Hashes.bloomContains(col(key).cast("long"), bf))
      .join(build.select(col(key)).distinct(), Seq(key), "left_semi")
  }
}
