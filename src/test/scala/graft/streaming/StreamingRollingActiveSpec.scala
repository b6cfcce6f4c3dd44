package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSuite
import graft.streaming.StreamingRollingActive.{DayRow, IvOut, IvState}

/** The DAU/WAU state twin: streaming interval maintenance across
  * micro-batches must equal the batch mergeUserIntervals over all data
  * — late days included (the bridging case is the load-bearing test). */
class StreamingRollingActiveSpec extends SparkSuite {
  import spark.implicits._

  private def mem[A: Encoder]: MemoryStream[A] = MemoryStream[A](spark)
  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  private val W = 3 // windowDays: day d covers [d, d+2]

  // user 1: days 10, 20 (two intervals), then LATE days in batch 3:
  // 14 covers [14,16] (new interval), and 12 covers [12,14] — it
  // BRIDGES [10,12] and [14,16] into [10,16] (start 12 <= prevEnd 12).
  // user 2: the same day re-arrives in every batch — absorbed after the
  // first, so exactly one emission ever (any later day would EXTEND
  // coverage: with W=3, day 51 covers [51,53] ⊄ [50,52]).
  private val batch1 = Seq(DayRow(1, 10), DayRow(2, 50))
  private val batch2 = Seq(DayRow(1, 20), DayRow(2, 50))
  private val batch3 = Seq(DayRow(1, 14), DayRow(1, 12), DayRow(2, 50))

  private val all = batch1 ++ batch2 ++ batch3

  test("streaming state across micro-batches == batch mergeUserIntervals; late day bridges") {
    val ms = mem[DayRow]
    val q = StreamingRollingActive.run(ms.toDS(), W).writeStream
      .format("memory").queryName("rolling_tw").outputMode("append").start()
    withQuery(q) {
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
      ms.addData(batch3: _*); q.processAllAvailable()
    }
    val out = spark.table("rolling_tw").as[IvOut].collect()
    // latest version per user is the current state
    val latest = out.groupBy(_.user).view
      .mapValues(os => os.maxBy(_.version))
      .mapValues(o => o.iv_start.zip(o.iv_end).toVector).toMap
    // batch truth: mergeUserIntervals over ALL days as point intervals
    // (epoch day -> DATE so the production column types are exercised)
    val iv = all.toDF("user_id", "d")
      .select(col("user_id"),
        date_add(to_date(lit("1970-01-01")), col("d")).as("iv_start"),
        date_add(to_date(lit("1970-01-01")), col("d") + (W - 1)).as("iv_end"))
    val expect = graft.rel.Analytics.mergeUserIntervals(iv, "user_id")
      .select(col("user_id"), datediff(col("iv_start"), to_date(lit("1970-01-01"))),
        datediff(col("iv_end"), to_date(lit("1970-01-01"))))
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(identity).toVector).toMap
    assert(latest === expect,
      "streaming interval state diverged from the batch merge")
    // the bridge actually happened: user 1 ends at [10,16] ∪ [20,22]
    assert(latest(1L) === Vector((10, 16), (20, 22)))
    // duplicate/absorbed days must NOT bump the version: user 2 saw
    // day 50 twice and then 51 (inside [50,52]) → exactly ONE emission
    assert(out.count(_.user == 2L) === 1,
      "absorbed days re-emitted state without a change")
  }

  test("advance: emits only on change; adjacent intervals stay split like the batch rule") {
    val (s1, e1) = StreamingRollingActive.advance(
      IvState(Vector.empty, 0L), Seq(DayRow(1, 10)), W)
    assert(e1.isDefined && s1.iv === Vector((10, 12)))
    // adjacent: day 13 covers [13,15]; batch rule keeps it separate
    val (s2, e2) = StreamingRollingActive.advance(s1, Seq(DayRow(1, 13)), W)
    assert(e2.isDefined && s2.iv === Vector((10, 12), (13, 15)))
    // absorbed duplicate day: no emission, version unchanged
    val (s3, e3) = StreamingRollingActive.advance(s2, Seq(DayRow(1, 10)), W)
    assert(e3.isEmpty && s3.iv === s2.iv && s3.version === s2.version)
    // an overlapping day EXTENDS (11 covers [11,13]; 11 <= 12 merges,
    // then 13 <= 13 chains into the next interval) — a real change
    val (s4, e4) = StreamingRollingActive.advance(s2, Seq(DayRow(1, 11)), W)
    assert(e4.isDefined && s4.iv === Vector((10, 15)))
  }
}
