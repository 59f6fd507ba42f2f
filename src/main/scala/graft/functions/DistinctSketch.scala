package graft.functions

import java.util.Arrays

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable distinct-count sketch (HyperLogLog, Flajolet et al. '07,
  * with the HLL++-style sparse-exact low range of Heule et al. '13):
  * "how many distinct keys" over a key space too large to
  * groupBy-distinct, in 2^p longs regardless of corpus size.
  * Completes the sketch shelf: [[HeavyHitters]] (which keys are
  * frequent), [[CountMin]] (how often is THIS key), this (how many
  * keys at all).
  *
  * Input is a 64-BIT HASH, not the raw key — pair it with the
  * codegen'd `xxhash64(...)` so hashing rides the scan and the
  * aggregator sees only longs. Register index = top p bits; rho =
  * leading zeros of the remainder + 1.
  *
  * Two regimes, promoted one-way:
  *  - SPARSE (≤ sparseMax distinct hashes): the exact sorted hash set.
  *    The estimate is the set size — exact to the hash, which is what
  *    the q121 oracle gate hash-matches against a true
  *    COUNT(DISTINCT) (collision odds at gate scale ~1e-12, and
  *    deterministic either way).
  *  - DENSE: 2^p max-of-rho registers; bias-corrected harmonic-mean
  *    estimate with linear counting below 2.5·m. Relative error
  *    ~1.04/√m (p=12 → 1.6%); DistinctSketchSpec pins a 3σ envelope.
  *
  * Every merge path (sparse∪sparse, sparse→dense fold, dense max) is
  * commutative, associative, and idempotent — the estimate is
  * IDENTICAL under any partitioning or merge order, a strictly
  * stronger property than the compaction sketches can offer (the spec
  * asserts equality across 1/7/32-partition runs, not just bounds).
  *
  * Spark-first: a typed [[Aggregator]] — map-side partial sketches,
  * register-array shuffles only; raw keys never leave the scan stage.
  */
object DistinctSketch {

  /** Buffer: sparse = [0, n, h_0 … h_{n-1}, unused…] (sorted hashes,
    * doubling capacity); dense = [1, M_0 … M_{m-1}] (rho registers). */
  final class Sketch(p: Int, sparseMax: Int)
      extends Aggregator[Long, Array[Long], Long] {
    require(p >= 7 && p <= 18, s"p out of range [7,18]: $p")
    require(sparseMax >= 0, s"sparseMax must be >= 0: $sparseMax")
    private val m = 1 << p

    override def zero: Array[Long] = Array(0L, 0L, 0L, 0L)

    private def rho(h: Long): Int = {
      val w = h << p
      if (w == 0L) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
    }

    private def denseAdd(buf: Array[Long], h: Long): Unit = {
      val j = 1 + (h >>> (64 - p)).toInt
      val r = rho(h).toLong
      if (r > buf(j)) buf(j) = r
    }

    private def toDense(sparse: Array[Long]): Array[Long] = {
      val d = new Array[Long](1 + m)
      d(0) = 1L
      val n = sparse(1).toInt
      var i = 0
      while (i < n) { denseAdd(d, sparse(2 + i)); i += 1 }
      d
    }

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      if (buf(0) == 1L) { denseAdd(buf, h); buf }
      else {
        val n = buf(1).toInt
        val idx = Arrays.binarySearch(buf, 2, 2 + n, h)
        if (idx >= 0) buf
        else if (n >= sparseMax) { val d = toDense(buf); denseAdd(d, h); d }
        else {
          val at = -idx - 1
          val b =
            if (2 + n < buf.length) buf
            else Arrays.copyOf(buf, math.max(8, buf.length * 2))
          System.arraycopy(b, at, b, at + 1, 2 + n - at)
          b(at) = h
          b(1) = n + 1
          b
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      (a(0), b(0)) match {
        case (1L, 1L) =>
          var j = 1
          while (j <= m) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
          a
        case (1L, 0L) =>
          var i = 0; val n = b(1).toInt
          while (i < n) { denseAdd(a, b(2 + i)); i += 1 }
          a
        case (0L, 1L) => merge(b, a)
        case _ =>
          var acc = a
          var i = 0; val n = b(1).toInt
          while (i < n) { acc = reduce(acc, b(2 + i)); i += 1 }
          acc
      }
    }

    override def finish(buf: Array[Long]): Long = {
      if (buf(0) == 0L) buf(1)
      else {
        val alpha = 0.7213 / (1.0 + 1.079 / m)
        var sum = 0.0
        var zeros = 0
        var j = 1
        while (j <= m) {
          sum += math.pow(2.0, -buf(j).toDouble)
          if (buf(j) == 0L) zeros += 1
          j += 1
        }
        val e = alpha * m.toDouble * m.toDouble / sum
        val corrected =
          if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
          else e
        math.round(corrected)
      }
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Aggregate column: BIGINT distinct estimate of the group's 64-bit
    * hashes (exact while ≤ sparseMax distinct). Feed `xxhash64(key)`. */
  def sketch(hash: Column, p: Int = 12, sparseMax: Int = 8192): Column =
    udaf(new Sketch(p, sparseMax), Encoders.scalaLong)(hash)

  // ---- sketch-as-a-value lifecycle ---------------------------------
  // The 100 TB pattern behind every sketch shelf: PRE-AGGREGATE each
  // slice (day / source / shard) to a stored sketch state, then answer
  // cross-slice questions ("distinct users last 90 days", "vocabulary
  // shared by sources A and B") by merging a handful of state rows —
  // never rescanning the raw corpus. Union is a state merge;
  // intersection is inclusion–exclusion over union estimates (exact in
  // the sparse regime, the q125 gate).

  /** [[Sketch]] with the STATE as output — storable, re-mergeable. The
    * sparse buffer is trimmed to its live prefix so equal sets yield
    * byte-equal states whatever growth path the buffer took. */
  final class SketchState(p: Int, sparseMax: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private val inner = new Sketch(p, sparseMax)
    override def zero: Array[Long] = inner.zero
    override def reduce(b: Array[Long], h: Long): Array[Long] = inner.reduce(b, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] =
      if (buf(0) == 0L) Arrays.copyOf(buf, 2 + buf(1).toInt) else buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Merge stored states → BIGINT estimate of the union. */
  final class SketchMerge(p: Int, sparseMax: Int)
      extends Aggregator[Array[Long], Array[Long], Long] {
    private val inner = new Sketch(p, sparseMax)
    override def zero: Array[Long] = inner.zero
    // null state rows SKIP (SQL-aggregate rule): stored state tables
    // are an open parquet surface, and one foreign/evolved null row
    // must degrade like a null input to any built-in aggregate, not
    // NPE the whole aggregation
    override def reduce(buf: Array[Long], st: Array[Long]): Array[Long] =
      if (st == null) buf else inner.merge(buf, st)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    override def finish(buf: Array[Long]): Long = inner.finish(buf)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Merge stored states → merged STATE (roll daily states into a
    * monthly state and store THAT — compaction for sketch tables). */
  final class SketchMergeState(p: Int, sparseMax: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    private val inner = new SketchState(p, sparseMax)
    override def zero: Array[Long] = inner.zero
    // null state rows skip — see SketchMerge.reduce
    override def reduce(buf: Array[Long], st: Array[Long]): Array[Long] =
      if (st == null) buf else inner.merge(buf, st)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] = inner.finish(buf)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  private def longArrayEnc =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Aggregate 64-bit hashes → storable sketch state (ARRAY<BIGINT>). */
  def sketchState(hash: Column, p: Int = 12, sparseMax: Int = 8192): Column =
    udaf(new SketchState(p, sparseMax), Encoders.scalaLong)(hash)

  /** Aggregate stored states → BIGINT union-distinct estimate. */
  def mergeEstimate(state: Column, p: Int = 12, sparseMax: Int = 8192): Column =
    udaf(new SketchMerge(p, sparseMax), longArrayEnc)(state)

  /** Aggregate stored states → merged state (for re-storage). */
  def mergeState(state: Column, p: Int = 12, sparseMax: Int = 8192): Column =
    udaf(new SketchMergeState(p, sparseMax), longArrayEnc)(state)
}
