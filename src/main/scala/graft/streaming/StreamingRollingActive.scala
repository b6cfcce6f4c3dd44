package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming maintenance of the DAU/WAU interval state — the unbounded
  * twin of `rel/Analytics.rollingActiveMerge`, completing the twin-pair
  * pattern for the sweep-line family. The per-user MERGED coverage
  * intervals are the state (a user active on day d covers
  * [d, d+windowDays−1]); interval union is associative and
  * order-independent, so folding each micro-batch's fresh point
  * intervals into the merged state equals the batch rebuild over all
  * data — INCLUDING late days (a day older than already-seen data
  * merges in correctly, possibly bridging two intervals into one; the
  * same property the batch merge spec pins, now across micro-batches).
  *
  * Emissions are versioned per-user snapshots of the merged set,
  * emitted only when the state CHANGES (a duplicate day inside existing
  * coverage is absorbed silently); downstream keeps the latest version
  * per user — append-mode-compatible without retraction. The day-level
  * sweep (`activeIntervalsAt`) stays a batch query over the emitted
  * state, exactly how the incremental batch pipeline composes.
  *
  * State is bounded by the user's merged-interval count (≤ their
  * active-day count, typically far smaller after merging) — the same
  * calendar-not-event-count bound as the batch operator; the merge
  * rule (new interval iff start > previous running-max end — adjacent
  * intervals do NOT merge) mirrors `mergeUserIntervals` exactly so the
  * twin comparison is bit-for-bit. */
object StreamingRollingActive {

  case class DayRow(user: Long, day: Int) // epoch day

  case class IvState(iv: Vector[(Int, Int)], version: Long)

  /** One versioned snapshot of a user's merged intervals (parallel
    * start/end arrays keep the encoder flat). */
  case class IvOut(user: Long, version: Long,
                   iv_start: Seq[Int], iv_end: Seq[Int])

  /** Pure interval-union fold, shared by streaming and any replay:
    * merge the batch's fresh [day, day+w−1] intervals into the state;
    * emit a new versioned snapshot iff the merged set changed. */
  def advance(state: IvState, rows: Seq[DayRow],
              windowDays: Int): (IvState, Option[(Vector[(Int, Int)], Long)]) = {
    require(windowDays >= 1)
    val fresh = rows.map(r => (r.day, r.day + windowDays - 1))
    val all = (state.iv ++ fresh).sorted
    val merged = all.foldLeft(Vector.empty[(Int, Int)]) {
      case (acc, (s, e)) =>
        acc.lastOption match {
          // merge iff s <= running-max end (adjacent does NOT merge —
          // mergeUserIntervals' strict `start > prevEnd` break rule)
          case Some((ps, pe)) if s <= pe => acc.init :+ ((ps, math.max(pe, e)))
          case _                         => acc :+ ((s, e))
        }
    }
    if (merged == state.iv) (state, None)
    else (IvState(merged, state.version + 1), Some((merged, state.version + 1)))
  }

  def fn(windowDays: Int)(key: Long, rows: Iterator[DayRow],
                          state: GroupState[IvState]): Iterator[IvOut] = {
    val (next, out) =
      advance(state.getOption.getOrElse(IvState(Vector.empty, 0L)),
        rows.toSeq, windowDays)
    state.update(next)
    out.iterator.map { case (iv, v) =>
      IvOut(key, v, iv.map(_._1), iv.map(_._2))
    }
  }

  /** Run over (user, day) activity rows (batch or streaming alike;
    * streaming callers use append output and keep the max-version row
    * per user). */
  def run(ds: Dataset[DayRow], windowDays: Int): Dataset[IvOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        fn(windowDays))
  }
}
