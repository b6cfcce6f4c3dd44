package graft.state

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** A4's EXACT per-record emission cadence (`WordCount.java:82`
  * `keyBy(0).sum(1)` emits one updated count per input record; golden
  * sequence `TwitterExampleData.java:28`): a keyed running count that
  * emits one (seq, word, cnt) row PER INPUT RECORD, in input order within
  * each key — not per micro-batch. The input sequence number makes the
  * global emission order reconstructible downstream of the key shuffle,
  * so the full interleaved golden sequence is assertable without feeding
  * one record per batch (the r2-documented crutch, now closed).
  *
  * Works identically on bounded and unbounded datasets; state per key is
  * ONE long (the count so far) — bounded regardless of stream length.
  */
object RunningCount {

  case class WordIn(seq: Long, word: String)
  case class WordOut(seq: Long, word: String, cnt: Long)

  /** The fold shared by BOTH state APIs (the TopSpeed.advance pattern —
    * one pure core, so the runtimes can never diverge): count
    * monotonically increases across batches; within a batch, events are
    * processed in `seq` (arrival) order. */
  def advance(count: Long, events: Seq[WordIn]): (Long, Seq[WordOut]) = {
    var c = count
    val out = events.sortBy(_.seq).map { e =>
      c += 1
      WordOut(e.seq, e.word, c)
    }
    (c, out)
  }

  def fn(word: String, events: Iterator[WordIn],
         state: GroupState[Long]): Iterator[WordOut] = {
    val (c, out) = advance(state.getOption.getOrElse(0L), events.toSeq)
    state.update(c)
    out.iterator
  }

  def run(ds: Dataset[WordIn]): Dataset[WordOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.word)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }

  /** The same per-record cadence on the state-v2 API (`transformWithState`
    * + ValueState) — the A4 counterpart of TopSpeed.runTws, so both
    * reference stateful shapes have twins on both state runtimes. */
  class RunningCountProcessor extends StatefulProcessor[String, WordIn, WordOut] {
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(word: String, rows: Iterator[WordIn],
                                 timerValues: TimerValues): Iterator[WordOut] = {
      val prev = if (count.exists()) count.get() else 0L
      val (c, out) = advance(prev, rows.toSeq)
      count.update(c)
      out.iterator
    }
  }

  def runTws(ds: Dataset[WordIn]): Dataset[WordOut] = {
    import ds.sparkSession.implicits._
    ds.sparkSession.streams // bootstrap StateStoreCoordinator for batch runs
    ds.groupByKey(_.word)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Update)
  }
}
