package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stream-stream AS-OF join Spark has
  * no native operator for (stream-stream joins support equi + time-range
  * conditions, not "latest right row at or before the left timestamp").
  * The batch twin is `join/AsofJoin.asof`; this is its unbounded
  * formulation as keyed state (the same pattern as the reference's
  * stateful TopSpeed operator: per-key state + an eviction policy
  * bounding it — TopSpeedWindowing.scala:60-72's evictor, re-expressed
  * as a watermark-horizon compaction).
  *
  * Shape: tag dim updates and events, UNION them (one shuffle on key),
  * and fold per key in `flatMapGroupsWithState`:
  *
  *  - per invocation, the key's rows are processed in (ts, dims-first)
  *    order — dims-first makes the tie inclusive, matching the batch
  *    asof's `dim_ts <= ts`;
  *  - state holds the dim HISTORY within `horizon` of the newest
  *    timestamp seen, PLUS the newest older row (the carry-forward
  *    floor) — so an out-of-order event up to `horizon` late still
  *    matches the dim that was current AT ITS OWN timestamp, not
  *    whatever is current now. This is the part a naive latest-value
  *    cache gets wrong.
  *  - compaction runs every invocation: state is bounded by dim churn
  *    within the horizon, never by stream length — and the operator
  *    scales as keyed state always does (hash-partitioned StateStore
  *    per shuffle partition, same story as every stateful op here).
  *
  * Emissions are FINAL (append semantics): a dim update arriving LATER
  * than an already-emitted event it would have served does not
  * retro-correct it — identical to the finality contract of Spark's
  * watermarked stream-stream joins. The streaming==batch equivalence
  * therefore holds when dims arrive no later than the micro-batch of
  * their first dependent event (the spec exercises exactly the boundary:
  * same-batch out-of-order, cross-batch late events, equal-ts ties).
  */
object AsofEnrich {

  /** Tagged union row: `isDim = true` rows carry a dim value update,
    * others an event payload (both in `v`). */
  case class AsofRow(key: Long, ts: Long, isDim: Boolean, v: Double)

  case class AsofOut(key: Long, ts: Long, payload: Double,
                     dim_ts: Option[Long], dim_v: Option[Double])

  /** Dim history within the horizon + carry-forward floor, ascending ts.
    * maxTs is the newest timestamp seen on EITHER side (the compaction
    * clock — event time, not processing time). */
  case class AsofState(dims: Vector[(Long, Double)], maxTs: Long)

  /** One pure fold step (the TopSpeed.advance pattern: a pure core shared
    * by streaming and any future batch/v2-API twin, so runtimes cannot
    * diverge): merge the invocation's rows in (ts, dims-first) order,
    * emit one enriched row per event, then compact history to the
    * horizon. Returns (newState, emissions-in-ts-order). */
  def advance(state: AsofState, rows: Seq[AsofRow],
              horizon: Long): (AsofState, Seq[AsofOut]) = {
    var dims = state.dims
    val out = Vector.newBuilder[AsofOut]
    // dims sort BEFORE events at the same ts → inclusive tie like the
    // batch asof; sortBy is stable so equal (ts, side) rows keep arrival
    // order (dims at identical ts violate the asof uniqueness contract
    // on both formulations — last write wins here)
    val sorted = rows.sortBy(r => (r.ts, !r.isDim))
    sorted.foreach { r =>
      if (r.isDim) {
        // insert keeping ascending ts (out-of-order dims within the
        // invocation are fine; across invocations they only serve rows
        // not yet emitted)
        val i = dims.lastIndexWhere(_._1 <= r.ts) + 1
        dims =
          if (i > 0 && dims(i - 1)._1 == r.ts) dims.updated(i - 1, (r.ts, r.v))
          else (dims.take(i) :+ (r.ts, r.v)) ++ dims.drop(i)
      } else {
        val i = dims.lastIndexWhere(_._1 <= r.ts)
        val hit = if (i >= 0) Some(dims(i)) else None
        out += AsofOut(r.key, r.ts, r.v, hit.map(_._1), hit.map(_._2))
      }
    }
    val maxTs = (state.maxTs +: rows.map(_.ts)).max
    // compact: keep the horizon window plus ONE older row as the floor
    val cutoff = maxTs - horizon
    val older = dims.lastIndexWhere(_._1 < cutoff)
    val compacted = if (older <= 0) dims else dims.drop(older)
    (AsofState(compacted, maxTs), out.result())
  }

  def fn(horizon: Long)(key: Long, rows: Iterator[AsofRow],
                        state: GroupState[AsofState]): Iterator[AsofOut] = {
    val (next, out) =
      advance(state.getOption.getOrElse(AsofState(Vector.empty, Long.MinValue)),
        rows.toSeq, horizon)
    state.update(next)
    out.iterator
  }

  /** Run over a tagged union (batch or streaming alike; streaming callers
    * use append output). `horizon` is how late an event may arrive (in ts
    * units) and still see the dim that was current at its timestamp. */
  def run(ds: Dataset[AsofRow], horizon: Long): Dataset[AsofOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        fn(horizon))
  }
}
