package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSuite
import graft.streaming.AttributionAsof.{AttrOut, AttrRow, AttrState}

/** Streaming attribution vs the batch asof-tied variant — the twin pair
  * r6 deferred until the tie contract matched (batch `attribution`
  * excludes equal-ts later-id touches; `attributionAsof` and this twin
  * both include them). The equal-ts tie case is the load-bearing test. */
class AttributionAsofSpec extends SparkSuite {
  import spark.implicits._

  private def mem[A: Encoder]: MemoryStream[A] = MemoryStream[A](spark)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  // touches no later than their first dependent conversion's batch;
  // out-of-order within batches; BOTH equal-ts tie directions; a
  // pre-touch conversion; a late conversion (ts 15, batch 3) that must
  // credit the touch current at ts 15, not the newest one
  private val batch1 = Seq(
    AttrRow(1, 10, isTouch = true, 1L),
    AttrRow(1, 10, isTouch = false, 2L),  // tie, touch has LOWER id
    AttrRow(1, 20, isTouch = false, 3L),  // tie, touch has HIGHER id (4)
    AttrRow(1, 20, isTouch = true, 4L),
    AttrRow(2, 5, isTouch = false, 5L))   // conversion before any touch
  private val batch2 = Seq(
    AttrRow(1, 30, isTouch = true, 6L),
    AttrRow(1, 40, isTouch = true, 7L),   // two touches at one ts: max id
    AttrRow(1, 40, isTouch = true, 8L),
    AttrRow(1, 40, isTouch = false, 9L),
    AttrRow(2, 25, isTouch = true, 10L))
  private val batch3 = Seq(
    AttrRow(1, 15, isTouch = false, 11L), // late: touch@10 current at 15
    AttrRow(2, 50, isTouch = false, 12L))

  private val all = batch1 ++ batch2 ++ batch3

  private def asEvents: DataFrame = all
    .map(r => (r.user, r.eventId, r.ts,
      if (r.isTouch) "click" else "purchase"))
    .toDF("user_id", "event_id", "ts_us", "event_type")

  private def batchExpect: Seq[(Long, Long, Option[Long])] =
    graft.rel.Analytics.attributionAsofOf(asEvents, "click", "purchase")
      .select("user_id", "conv_id", "touch_id")
      .as[(Long, Long, Option[Long])].collect().sortBy(t => (t._1, t._2)).toSeq

  test("streaming attribution across micro-batches == batch attributionAsof") {
    val ms = mem[AttrRow]
    val q = AttributionAsof.run(ms.toDS(), horizon = 100L).writeStream
      .format("memory").queryName("attr_asof").outputMode("append").start()
    withQuery(q) {
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
      ms.addData(batch3: _*); q.processAllAvailable()
    }
    val got = spark.table("attr_asof").as[AttrOut].collect()
      .map(o => (o.user, o.conv_id, o.touch_id)).sortBy(t => (t._1, t._2))
    assert(got.toSeq === batchExpect)
    val byConv = got.map(t => t._2 -> t._3).toMap
    assert(byConv(2L) === Some(1L), "equal-ts lower-id touch credited")
    assert(byConv(3L) === Some(4L),
      "equal-ts HIGHER-id touch credited — the inclusive asof tie batch attribution excludes")
    assert(byConv(9L) === Some(8L), "two touches at one ts: max id wins")
    assert(byConv(5L) === None, "conversion before any touch stays null")
    assert(byConv(11L) === Some(1L), "late conversion served from history")
  }

  test("batch (single-invocation) run matches too; the rows-frame variant disagrees at the tie") {
    val got = AttributionAsof.run(all.toDS(), horizon = 100L)
      .as[AttrOut].collect()
      .map(o => (o.user, o.conv_id, o.touch_id)).sortBy(t => (t._1, t._2))
    assert(got.toSeq === batchExpect)
    // the documented contract difference vs plain attribution: the
    // strict-prefix variant must NOT credit touch 4 to conversion 3
    val strict = graft.rel.Analytics.attributionOf(asEvents, "click", "purchase")
      .select("conv_id", "touch_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(strict(3L) === Some(1L),
      "plain attribution excludes the equal-ts later-id touch (strict prefix)")
  }

  test("advance: horizon compaction bounds state; floor touch survives as carry-forward") {
    var st = AttrState(Vector.empty, Long.MinValue)
    (1L to 1000L).foreach { t =>
      val (next, _) = AttributionAsof.advance(st,
        Seq(AttrRow(1, t, isTouch = true, t)), 10L)
      st = next
    }
    assert(st.touches.length <= 12, s"state grew: ${st.touches.length}")
    val (_, out) = AttributionAsof.advance(st,
      Seq(AttrRow(1, 989, isTouch = false, 9999L)), 10L)
    assert(out.head.touch_id === Some(989L),
      "conversion older than the horizon matches the carry-forward floor")
  }
}
