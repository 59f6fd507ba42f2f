package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Engine-wide determinism harness: EVERY gated query must produce an
  * identical result when run twice in one session. At 100 TB this is
  * the property that makes retries, speculative execution, and AQE
  * re-plans safe — a query whose output drifts between physically
  * identical runs cannot be checkpointed, diffed, or incrementally
  * recomputed. The library bans `rand()`/time-derived expressions in
  * favor of content-derived hashes precisely so this holds; this spec
  * enforces it for every current and FUTURE query without per-query
  * test code (new `SparkEntry.queries` entries are picked up
  * automatically).
  *
  * sf0.001 keeps the sweep fast; determinism failures are shape bugs
  * (unordered ties, capped collections, time dependence), not
  * data-volume bugs, so the smallest SF exercises them.
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def fingerprint(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).toSeq

  test("every gated query is run-to-run deterministic") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val drifted = names.flatMap { name =>
      val a = fingerprint(name)
      val b = fingerprint(name)
      if (a == b) None
      else Some(s"$name: ${a.size} vs ${b.size} rows, first diff at " +
        a.zip(b).indexWhere { case (x, y) => x != y })
    }
    assert(drifted.isEmpty, s"non-deterministic queries:\n${drifted.mkString("\n")}")
  }
}
