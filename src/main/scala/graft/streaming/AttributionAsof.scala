package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution with the AS-OF tie contract — the
  * unbounded twin of `rel/Analytics.attributionAsof` (r6 verdict item 3:
  * the twin had to wait until a batch variant adopted the asof-inclusive
  * tie rule, because batch `attribution` and the asof family disagree at
  * equal timestamps; this pair agrees by construction, spec-pinned).
  *
  * Same keyed-state pattern as [[AsofEnrich]] (the reference's stateful
  * eviction shape — TopSpeedWindowing.scala:60-72 — re-expressed as
  * watermark-horizon compaction), specialized to attribution:
  *
  *  - per invocation the key's rows process in (ts, touches-first,
  *    event_id) order — touches at the conversion's own timestamp are
  *    visible to it (the inclusive `touch_ts <= conv_ts` tie), and
  *    among equal-ts touches the max event_id ends up last-inserted,
  *    matching the batch variant's deterministic last-write-wins;
  *  - state holds the touch history within `horizon` of the newest
  *    timestamp seen plus the newest older touch (the carry-forward
  *    floor), so an out-of-order conversion up to `horizon` late is
  *    credited to the touch that was latest AT ITS OWN timestamp;
  *  - compaction bounds state by touch churn within the horizon, never
  *    by stream length.
  *
  * Emissions are FINAL (append semantics): a touch arriving in a later
  * micro-batch than a conversion it would have served does not
  * retro-credit it — the same finality contract as AsofEnrich and
  * Spark's watermarked stream-stream joins. streaming == batch holds
  * when touches arrive no later than the micro-batch of their first
  * dependent conversion (StreamingSpec exercises the boundary: same-
  * batch out-of-order, cross-batch late conversions, equal-ts ties). */
object AttributionAsof {

  /** Tagged union row: `isTouch = true` rows are touch events, others
    * conversions. */
  case class AttrRow(user: Long, ts: Long, isTouch: Boolean, eventId: Long)

  case class AttrOut(user: Long, conv_id: Long, conv_ts: Long,
                     touch_id: Option[Long], touch_ts: Option[Long])

  /** Touch history within the horizon + carry-forward floor, ascending
    * (ts, eventId); maxTs is the compaction clock (event time). */
  case class AttrState(touches: Vector[(Long, Long)], maxTs: Long)

  /** One pure fold step (shared core so streaming and any batch replay
    * cannot diverge): merge the invocation's rows in (ts, touches-first,
    * event_id) order, emit one attributed row per conversion, compact
    * history to the horizon. Returns (newState, emissions). */
  def advance(state: AttrState, rows: Seq[AttrRow],
              horizon: Long): (AttrState, Seq[AttrOut]) = {
    // The prior state stays IMMUTABLE through the fold and this
    // invocation's touches append to their own buffer: rows process in
    // ascending (ts, touches-first, event_id) order, so the buffer is
    // born sorted and every buffered touch already satisfies ts <=
    // conv_ts when a conversion is reached. A conversion's winner is
    // therefore max-by-(ts, eventId) of (a) the binary-searched latest
    // prior touch <= conv_ts and (b) the buffer's last element. One
    // sorted-run merge at the end replaces the per-touch Vector
    // insert — O(rows log rows + conversions·log history + history)
    // per invocation instead of O(touches·history).
    val base = state.touches.toArray
    // last index in base with ts <= target, -1 if none (base is sorted
    // by (ts, eventId), so that index also holds the max eventId there)
    def floorIdx(target: Long): Int = {
      var lo = 0; var hi = base.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (base(mid)._1 <= target) { ans = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      ans
    }
    val fresh = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val out = Vector.newBuilder[AttrOut]
    // touches sort BEFORE conversions at the same ts (inclusive tie);
    // event_id ordering makes the equal-ts winner the max id, exactly
    // the batch variant's struct-max
    val sorted = rows.sortBy(r => (r.ts, !r.isTouch, r.eventId))
    sorted.foreach { r =>
      if (r.isTouch) fresh += ((r.ts, r.eventId))
      else {
        val i = floorIdx(r.ts)
        val prior = if (i >= 0) Some(base(i)) else None
        val recent = fresh.lastOption
        val hit = (prior, recent) match {
          case (Some(p), Some(n)) =>
            Some(if (n._1 > p._1 || (n._1 == p._1 && n._2 > p._2)) n else p)
          case (p, n) => n.orElse(p)
        }
        out += AttrOut(r.user, r.eventId, r.ts, hit.map(_._2), hit.map(_._1))
      }
    }
    // merge the two ascending (ts, eventId) runs (prior touches may
    // interleave with cross-invocation stragglers)
    val merged = Vector.newBuilder[(Long, Long)]
    var bi = 0; var fi = 0
    while (bi < base.length || fi < fresh.length) {
      val takeBase = fi >= fresh.length || (bi < base.length &&
        (base(bi)._1 < fresh(fi)._1 ||
          (base(bi)._1 == fresh(fi)._1 && base(bi)._2 <= fresh(fi)._2)))
      if (takeBase) { merged += base(bi); bi += 1 }
      else { merged += fresh(fi); fi += 1 }
    }
    val touches = merged.result()
    val maxTs = (state.maxTs +: rows.map(_.ts)).max
    // compact: keep the horizon window plus ONE older touch as the floor
    val cutoff = maxTs - horizon
    val older = touches.lastIndexWhere(_._1 < cutoff)
    val compacted = if (older <= 0) touches else touches.drop(older)
    (AttrState(compacted, maxTs), out.result())
  }

  def fn(horizon: Long)(key: Long, rows: Iterator[AttrRow],
                        state: GroupState[AttrState]): Iterator[AttrOut] = {
    val (next, out) =
      advance(state.getOption.getOrElse(AttrState(Vector.empty, Long.MinValue)),
        rows.toSeq, horizon)
    state.update(next)
    out.iterator
  }

  /** Run over a tagged union (batch or streaming alike; streaming
    * callers use append output). `horizon` is how late a conversion may
    * arrive (in ts units) and still see the touch that was latest at
    * its own timestamp. */
  def run(ds: Dataset[AttrRow], horizon: Long): Dataset[AttrOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        fn(horizon))
  }
}
