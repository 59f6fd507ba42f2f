package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling-anomaly screen — q76's batch semantics as a
  * per-key stateful streaming operator: flag an observation whose
  * value exceeds `factor`× the rolling mean of the preceding `window`
  * observations for its key, judged only once `minObs` history exists.
  * The comparison is the same integer cross-multiply as the batch
  * gate (`v * cnt > factor * sum` ≡ `v > factor * mean`) on
  * milli-unit longs — no float division anywhere, so batch and
  * streaming agree bit-for-bit on the same ordered input
  * (StreamingAnomalySpec pins this).
  *
  * State per key is a BOUNDED ring: `window` longs + head index +
  * fill count + running sum — constant regardless of stream length,
  * the property that keeps a 1000-executor state store flat while
  * the q76 batch form re-sorts a partition per run. Within a
  * micro-batch, rows are processed in ascending `id` order
  * (`flatMapGroupsWithState` iterators carry no order guarantee);
  * cross-batch order is the caller's trigger sequence, as with every
  * micro-batch stateful operator.
  *
  * `withTtl` evicts idle keys (processing-time timeout) — required at
  * corpus scale whenever the key space is open (per-user metrics,
  * per-device telemetry): an untouched key's ring is dropped and
  * rebuilds from empty (re-warming `minObs` observations) if the key
  * reappears.
  */
object StreamingAnomaly {

  /** One observation: key, ascending id (event id / offset), value in
    * milli-units (`floor(value * 1000)` — the q76 convention). */
  final case class Obs(key: String, id: Long, vMilli: Long)

  /** A flagged spike: the observation plus the window evidence that
    * convicted it (count and sum of the preceding ring). */
  final case class AnomalyFlag(key: String, id: Long, vMilli: Long,
      cnt: Int, rollSum: Long)

  /** Ring-buffer state. `ring` holds the last `min(filled, window)`
    * values; `pos` is the next write slot; `sum` is maintained
    * incrementally (no per-row rescan of the ring). */
  final case class Ring(ring: Array[Long], pos: Int, filled: Int, sum: Long)

  private def step(window: Int, minObs: Int, factor: Long)(
      rows: Iterator[Obs], st: GroupState[Ring]): Iterator[AnomalyFlag] = {
    // a checkpointed Ring from a run configured with a DIFFERENT
    // `window` must reset, not be reused: a larger window would walk
    // `pos` past the old array's end (ArrayIndexOutOfBounds on every
    // micro-batch), a smaller one would never trip the `filled ==
    // window` eviction and silently accumulate `sum` over values the
    // ring has overwritten — wrong anomaly verdicts forever. Resetting
    // re-warms the key over `minObs` observations, the same cost as a
    // TTL eviction.
    val prev = st.getOption.filter(_.ring.length == window)
      .getOrElse(Ring(new Array[Long](window), 0, 0, 0L))
    // ONE defensive copy per invocation, then mutate in place: cloning
    // the ring per OBSERVATION made a hot key's micro-batch O(rows ×
    // window) allocation for immutability nothing observes — only the
    // final update() is visible to the state store
    val ring = prev.ring.clone()
    var pos = prev.pos; var filled = prev.filled; var sum = prev.sum
    val out = Seq.newBuilder[AnomalyFlag]
    rows.toSeq.sortBy(_.id).foreach { o =>
      if (filled >= minObs && o.vMilli * filled > factor * sum)
        out += AnomalyFlag(o.key, o.id, o.vMilli, filled, sum)
      val evicted = if (filled == window) ring(pos) else 0L
      ring(pos) = o.vMilli
      pos = (pos + 1) % window
      filled = math.min(filled + 1, window)
      sum = sum + o.vMilli - evicted
    }
    st.update(Ring(ring, pos, filled, sum))
    out.result().iterator
  }

  /** Streaming transform (append output; state never evicted — only
    * for closed key sets). */
  def flags(ds: Dataset[Obs], window: Int = 20, minObs: Int = 10,
      factor: Long = 3L): Dataset[AnomalyFlag] = {
    require(window >= minObs && minObs >= 1 && factor >= 1)
    implicit val obsEnc = Encoders.product[Obs]
    implicit val flagEnc = Encoders.product[AnomalyFlag]
    implicit val ringEnc = Encoders.product[Ring]
    implicit val strEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Ring, AnomalyFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Obs], st: GroupState[Ring]) =>
          step(window, minObs, factor)(rows, st)
      }
  }

  /** [[flags]] with idle-key eviction for open key spaces. */
  def flagsWithTtl(ds: Dataset[Obs], idleTtl: String, window: Int = 20,
      minObs: Int = 10, factor: Long = 3L): Dataset[AnomalyFlag] = {
    require(window >= minObs && minObs >= 1 && factor >= 1)
    implicit val obsEnc = Encoders.product[Obs]
    implicit val flagEnc = Encoders.product[AnomalyFlag]
    implicit val ringEnc = Encoders.product[Ring]
    implicit val strEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Ring, AnomalyFlag](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_: String, rows: Iterator[Obs], st: GroupState[Ring]) =>
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            val it = step(window, minObs, factor)(rows, st)
            st.setTimeoutDuration(idleTtl)
            it
          }
      }
  }
}
