package graft.state

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Per-key fold: count monotonically increases across batches; within a
    * batch, events are processed in `seq` (arrival) order. */
  def fn(word: String, events: Iterator[WordIn],
         state: GroupState[Long]): Iterator[WordOut] = {
    var c = state.getOption.getOrElse(0L)
    val out = events.toSeq.sortBy(_.seq).map { e =>
      c += 1
      WordOut(e.seq, e.word, c)
    }
    state.update(c)
    out.iterator
  }

  def run(ds: Dataset[WordIn]): Dataset[WordOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.word)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }
}
