package graft.functions

import java.util.Arrays

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile summary: fixed-memory rank estimates over a
  * column too large to sort — the percentile complement of
  * [[HeavyHitters]] (frequencies) and [[CountMin]] (point counts).
  *
  * Structure (KLL/MRL-family compactor ladder, Karnin–Lang–Liberty '16
  * / Manku–Rajagopalan–Lindsay '98, deterministic variant): level l
  * holds ≤ k values of weight 2^l. Level 0 fills with raw values; a
  * full level is sorted and every sorted PAIR collapses to its upper
  * element at double weight, promoted one level up (cascading). Memory
  * is O(k log(n/k)) regardless of input size; total weight is
  * preserved EXACTLY by construction (QuantileSketchSpec pins it), so
  * the summary is a true weighted CDF, never a biased sample.
  *
  * Where the randomized KLL flips a coin per pair, this keeps the
  * upper element deterministically: estimates gain a one-sided rank
  * bias bounded by the same O(n/k)-per-level geometry the randomized
  * analysis gives in expectation (the spec measures it on uniform and
  * heavy-skew data under 1/7/32-partition runs and pins rank error
  * ≤ 4n/k), in exchange for reproducibility inside one partitioning.
  *
  * EXACT regime — the oracle gate: with k ≥ group size, no compaction
  * ever fires under ANY partitioning (merges concatenate level 0 and
  * only compact past k), `finish` sorts weight-1 values, and
  * `quantile(q)` = the exact lower-rank order statistic ⌈q·n⌉ — which
  * is what q120 hash-matches against DuckDB's explicit rank selection.
  *
  * Spark-first: a typed [[Aggregator]] (TypedImperativeAggregate), so
  * the ladder lives as a live object per partition — map-side partial
  * sketches, buffer-only shuffles, O(1) amortized per row.
  */
object QuantileSketch {

  /** Smallest value whose cumulative weight reaches q·W, from a
    * `finish`-shaped interleaved [v0,w0,v1,w1,…] CDF (sorted by v). */
  def quantileFromCdf(cdf: Array[Double], q: Double): Double = {
    require(cdf.nonEmpty, "quantile of an empty summary")
    var total = 0.0
    var i = 1
    while (i < cdf.length) { total += cdf(i); i += 2 }
    val target = q * total
    var cum = 0.0
    i = 0
    while (i < cdf.length) {
      cum += cdf(i + 1)
      if (cum >= target) return cdf(i)
      i += 2
    }
    cdf(cdf.length - 2)
  }

  /** Buffer layout: buf(0) = Array(n0) metadata; buf(1) = level-0
    * storage at fixed capacity k (first n0 slots live, unsorted);
    * buf(l+1) for l ≥ 1 = level-l values, sorted, weight 2^l. */
  final class Summary(k: Int, qs: Array[Double])
      extends Aggregator[Option[Double], Array[Array[Double]], Array[Double]] {
    require(k >= 2 && k % 2 == 0, s"k must be even and >= 2: $k")

    override def zero: Array[Array[Double]] =
      Array(Array(0.0), new Array[Double](k))

    // OPTION input on purpose: the primitive encoder turns a NULL row
    // into 0.0 and silently injects zeros into the summary; the Option
    // form receives None and skips it, like every built-in aggregate
    // (percentile_approx, avg)
    override def reduce(
        buf: Array[Array[Double]], opt: Option[Double]): Array[Array[Double]] = {
      if (opt.isEmpty) return buf
      val v = opt.get
      val n0 = buf(0)(0).toInt
      if (n0 < k) { buf(1)(n0) = v; buf(0)(0) = n0 + 1; buf }
      else {
        val b = compactLevel0(buf)
        b(1)(b(0)(0).toInt) = v
        b(0)(0) += 1
        b
      }
    }

    override def merge(
        a: Array[Array[Double]],
        b: Array[Array[Double]]): Array[Array[Double]] = {
      var acc = a
      // level 0 of b feeds through reduce (keeps the capacity invariant)
      val bn0 = b(0)(0).toInt
      var i = 0
      while (i < bn0) { acc = reduce(acc, Some(b(1)(i))); i += 1 }
      // higher levels concatenate, then compact past k
      var l = 2
      while (l < b.length) {
        if (b(l).nonEmpty) {
          while (acc.length <= l) acc = acc :+ Array.emptyDoubleArray
          val joined = new Array[Double](acc(l).length + b(l).length)
          System.arraycopy(acc(l), 0, joined, 0, acc(l).length)
          System.arraycopy(b(l), 0, joined, acc(l).length, b(l).length)
          Arrays.sort(joined)
          acc(l) = joined
          acc = compactFrom(acc, l)
        }
        l += 1
      }
      acc
    }

    /** Sort + pair-collapse level 0 into level 1 (cascading), leaving
      * level 0 empty. Called only when level 0 holds exactly k items. */
    private def compactLevel0(
        buf: Array[Array[Double]]): Array[Array[Double]] = {
      val sorted = Arrays.copyOf(buf(1), k)
      Arrays.sort(sorted)
      val promoted = new Array[Double](k / 2)
      var i = 0
      while (i < k / 2) { promoted(i) = sorted(2 * i + 1); i += 1 }
      var b =
        if (buf.length > 2) buf else buf :+ Array.emptyDoubleArray
      val joined = new Array[Double](b(2).length + promoted.length)
      System.arraycopy(b(2), 0, joined, 0, b(2).length)
      System.arraycopy(promoted, 0, joined, b(2).length, promoted.length)
      Arrays.sort(joined)
      b(2) = joined
      b(0)(0) = 0.0
      compactFrom(b, 2)
    }

    /** Cascade: while the (sorted) level at storage index l exceeds k,
      * collapse its pairs upward. An odd count carries its minimum. */
    @annotation.tailrec
    private def compactFrom(
        buf: Array[Array[Double]], l: Int): Array[Array[Double]] = {
      if (l >= buf.length || buf(l).length <= k) buf
      else {
        val s = buf(l)
        val odd = s.length % 2 == 1
        val from = if (odd) 1 else 0
        val pairs = (s.length - from) / 2
        val promoted = new Array[Double](pairs)
        var i = 0
        while (i < pairs) { promoted(i) = s(from + 2 * i + 1); i += 1 }
        buf(l) = if (odd) Array(s(0)) else Array.emptyDoubleArray
        var b =
          if (buf.length > l + 1) buf else buf :+ Array.emptyDoubleArray
        val joined = new Array[Double](b(l + 1).length + promoted.length)
        System.arraycopy(b(l + 1), 0, joined, 0, b(l + 1).length)
        System.arraycopy(promoted, 0, joined, b(l + 1).length, promoted.length)
        Arrays.sort(joined)
        b(l + 1) = joined
        compactFrom(b, l + 1)
      }
    }

    /** Interleaved weighted CDF sorted by value; or the requested
      * quantiles when `qs` is non-empty. Empty input → empty array. */
    override def finish(buf: Array[Array[Double]]): Array[Double] = {
      val n0 = buf(0)(0).toInt
      var m = n0
      var l = 2
      while (l < buf.length) { m += buf(l).length; l += 1 }
      if (m == 0) return Array.emptyDoubleArray
      val pairs = new Array[(Double, Double)](m)
      var j = 0
      var i = 0
      while (i < n0) { pairs(j) = (buf(1)(i), 1.0); j += 1; i += 1 }
      l = 2
      while (l < buf.length) {
        val w = math.pow(2.0, (l - 1).toDouble)
        i = 0
        while (i < buf(l).length) {
          pairs(j) = (buf(l)(i), w); j += 1; i += 1
        }
        l += 1
      }
      val sorted = pairs.sortBy(_._1)
      val cdf = new Array[Double](2 * m)
      i = 0
      while (i < m) {
        cdf(2 * i) = sorted(i)._1
        cdf(2 * i + 1) = sorted(i)._2
        i += 1
      }
      if (qs.isEmpty) cdf else qs.map(q => quantileFromCdf(cdf, q))
    }

    override def bufferEncoder: Encoder[Array[Array[Double]]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Array[Double]]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Double]]()
  }

  /** Aggregate column: interleaved [value, weight, …] CDF of the
    * group (sorted by value). */
  def sketch(value: Column, k: Int): Column =
    udaf(new Summary(k, Array.empty),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]())(value)

  /** Aggregate column: ARRAY<DOUBLE> of the requested quantiles
    * (lower-rank order statistics of the summary's weighted CDF). */
  def quantiles(value: Column, k: Int, qs: Seq[Double]): Column =
    udaf(new Summary(k, qs.toArray),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]())(value)

  // ---- sketch-as-a-value lifecycle ---------------------------------
  // Same shelf pattern as [[DistinctSketch.sketchState]]: pre-aggregate
  // each slice (day / source / shard) to a stored ladder state, answer
  // cross-slice percentile questions by merging the handful of state
  // rows. In the exact regime (k ≥ the merged group's size) the merge
  // path only concatenates level 0, so merged-state quantiles ARE the
  // exact order statistics — the q129 gate.

  /** [[Summary]] with the ladder STATE as output — storable and
    * re-mergeable (ARRAY<ARRAY<DOUBLE>>). Level 0 is trimmed to its
    * live prefix: safe, because merge only READS a consumed state's
    * level 0 (the accumulating buffer keeps fixed-capacity storage). */
  final class SummaryState(k: Int)
      extends Aggregator[Option[Double], Array[Array[Double]], Array[Array[Double]]] {
    private val inner = new Summary(k, Array.empty)
    override def zero: Array[Array[Double]] = inner.zero
    override def reduce(b: Array[Array[Double]], v: Option[Double]): Array[Array[Double]] =
      inner.reduce(b, v)
    override def merge(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
      inner.merge(a, b)
    override def finish(buf: Array[Array[Double]]): Array[Array[Double]] = {
      val n0 = buf(0)(0).toInt
      buf.updated(1, Arrays.copyOf(buf(1), n0))
    }
    override def bufferEncoder: Encoder[Array[Array[Double]]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Array[Double]]]()
    override def outputEncoder: Encoder[Array[Array[Double]]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Array[Double]]]()
  }

  /** Merge stored ladder states → quantiles (or the CDF when `qs` is
    * empty). */
  final class SummaryMerge(k: Int, qs: Array[Double])
      extends Aggregator[Array[Array[Double]], Array[Array[Double]], Array[Double]] {
    private val inner = new Summary(k, qs)
    override def zero: Array[Array[Double]] = inner.zero
    // null state rows SKIP (SQL-aggregate rule): stored state tables
    // are an open parquet surface — one foreign/evolved null row must
    // not NPE the whole aggregation
    override def reduce(buf: Array[Array[Double]], st: Array[Array[Double]]): Array[Array[Double]] =
      if (st == null) buf else inner.merge(buf, st)
    override def merge(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
      inner.merge(a, b)
    override def finish(buf: Array[Array[Double]]): Array[Double] = inner.finish(buf)
    override def bufferEncoder: Encoder[Array[Array[Double]]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Array[Double]]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Double]]()
  }

  /** Merge stored ladder states → merged STATE (re-storable — the
    * compaction path for sketch tables, mirroring
    * [[DistinctSketch.mergeState]]). */
  final class SummaryMergeState(k: Int)
      extends Aggregator[Array[Array[Double]], Array[Array[Double]], Array[Array[Double]]] {
    private val inner = new SummaryState(k)
    override def zero: Array[Array[Double]] = inner.zero
    // null state rows skip — see SummaryMerge.reduce
    override def reduce(buf: Array[Array[Double]], st: Array[Array[Double]]): Array[Array[Double]] =
      if (st == null) buf else inner.merge(buf, st)
    override def merge(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
      inner.merge(a, b)
    override def finish(buf: Array[Array[Double]]): Array[Array[Double]] =
      inner.finish(buf)
    override def bufferEncoder: Encoder[Array[Array[Double]]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Array[Double]]]()
    override def outputEncoder: Encoder[Array[Array[Double]]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Array[Double]]]()
  }

  private def stateEnc =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[Array[Double]]]()

  /** Aggregate values → storable ladder state. */
  def sketchState(value: Column, k: Int): Column =
    udaf(new SummaryState(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]())(value)

  /** Aggregate stored states → merged state (for re-storage). */
  def mergeState(state: Column, k: Int): Column =
    udaf(new SummaryMergeState(k), stateEnc)(state)

  /** Aggregate stored states → ARRAY<DOUBLE> quantiles. */
  def mergeQuantiles(state: Column, k: Int, qs: Seq[Double]): Column =
    udaf(new SummaryMerge(k, qs.toArray), stateEnc)(state)

  /** Aggregate stored states → interleaved CDF. */
  def mergeCdf(state: Column, k: Int): Column =
    udaf(new SummaryMerge(k, Array.empty), stateEnc)(state)
}
