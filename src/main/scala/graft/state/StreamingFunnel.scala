package graft.state

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `Analytics.funnel` (the batch ordered-step
  * conversion funnel): per-user state tracks the earliest time each step
  * completed strictly after the previous one, emitting the user's updated
  * funnel row whenever it advances.
  *
  * State per user is `steps.length` optional timestamps — bounded and
  * tiny regardless of stream length or event volume, the property a
  * 100 TB event stream needs (contrast with buffering raw events).
  *
  * Exactness contract: incremental chain advancement equals the batch
  * funnel when each user's events are processed in EVENT-TIME order —
  * batches may split anywhere, and within a batch arrival order is
  * irrelevant (events are sorted by ts before folding). A cross-batch
  * time-travel arrival (an earlier step-1 event arriving after a later
  * one was folded) degrades gracefully: every recorded chain stays VALID
  * (each t_k still strictly follows its recorded t_{k-1}), it may just
  * not be the globally-earliest chain — the standard trade of streaming
  * funnel engines; feed watermark-ordered input where exactness matters.
  */
object StreamingFunnel extends Serializable {

  case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)
  case class FunnelRow(user_id: Long, times: Seq[Option[Long]]) {
    def t(i: Int): Option[Long] = times.lift(i).flatten
  }

  /** Pure per-user fold shared by the streaming runtime and the spec:
    * advance the chain with one event-time-sorted batch of events. */
  def advance(steps: Seq[String], state: Seq[Option[Long]],
              events: Seq[FunnelEvent]): Seq[Option[Long]] = {
    val ts = state.toArray
    // in-batch event-time sort (step index breaks ts ties so a view and
    // click at the same instant cannot chain — strict > like batch)
    for (e <- events.sortBy(ev => (ev.ts_us, steps.indexOf(ev.event_type)))) {
      val i = steps.indexOf(e.event_type)
      if (i == 0) {
        if (ts(0).forall(_ > e.ts_us)) ts(0) = Some(e.ts_us)
      } else if (i > 0 && ts(i).isEmpty) {
        if (ts(i - 1).exists(prev => e.ts_us > prev)) ts(i) = Some(e.ts_us)
      }
    }
    ts.toSeq
  }

  /** Update-mode stream: one FunnelRow per user per batch in which the
    * user's chain advanced (or first appeared with step 1). */
  def run(ds: Dataset[FunnelEvent], steps: Seq[String]): Dataset[FunnelRow] = {
    import ds.sparkSession.implicits._
    def fn(user: Long, events: Iterator[FunnelEvent],
           state: GroupState[Seq[Option[Long]]]): Iterator[FunnelRow] = {
      val prev = state.getOption.getOrElse(Seq.fill(steps.length)(None: Option[Long]))
      val next = advance(steps, prev, events.toSeq)
      if (next != prev) {
        state.update(next)
        if (next.head.isDefined) Iterator.single(FunnelRow(user, next))
        else Iterator.empty
      } else Iterator.empty
    }
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }
}
