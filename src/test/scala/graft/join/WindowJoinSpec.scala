package graft.join

import graft.SparkSuite

/** J1 windowed join multiplicity (`WindowJoinITCase.scala:65` analogue):
  * Flink's window join emits the full m×n cross product of key matches
  * within one window, and nothing across windows. */
class WindowJoinSpec extends SparkSuite {
  import spark.implicits._

  // (event_id, user_id, event_type, value, ts_sec)
  private def ev(rows: (Long, Long, String, Double, Long)*) =
    rows.toDF("event_id", "user_id", "event_type", "value", "ts_sec")

  test("duplicate keys in one window produce m×n pairs") {
    val df = ev(
      (1L, 1L, "signup", 1.0, 100L), (2L, 1L, "signup", 2.0, 200L),
      (3L, 1L, "purchase", 10.0, 300L), (4L, 1L, "purchase", 20.0, 400L),
      (5L, 1L, "purchase", 30.0, 500L))
    val out = WindowJoin.eventSliceJoin(df, "signup", "purchase", 3600L)
    assert(out.count() === 6L) // 2 signups × 3 purchases
    val grades = out.select("grade").as[Double].collect().toSeq
    assert(grades.count(_ == 1.0) === 3 && grades.count(_ == 2.0) === 3)
  }

  test("no pairs across window boundaries") {
    val df = ev(
      (1L, 2L, "signup", 1.0, 100L),        // window [0, 3600)
      (2L, 2L, "purchase", 10.0, 4000L))     // window [3600, 7200)
    assert(WindowJoin.eventSliceJoin(df, "signup", "purchase", 3600L).count() === 0L)
  }

  test("join is keyed: same window, different users never pair") {
    val df = ev(
      (1L, 1L, "signup", 1.0, 100L),
      (2L, 2L, "purchase", 10.0, 200L))
    assert(WindowJoin.eventSliceJoin(df, "signup", "purchase", 3600L).count() === 0L)
  }

  test("range join: pairs within the gap match exactly once, incl. across slots") {
    val df = ev(
      (1L, 1L, "signup", 0.0, 1000L),
      (2L, 1L, "purchase", 0.0, 1500L),   // |Δ| = 500  <= 1800 (same slot 0)
      (3L, 1L, "purchase", 0.0, 2000L),   // |Δ| = 1000 <= 1800 (slot 1 vs 0)
      (4L, 1L, "purchase", 0.0, 2800L),   // |Δ| = 1800 == gap, inclusive
      (5L, 1L, "purchase", 0.0, 2801L),   // |Δ| = 1801 — out
      (6L, 2L, "purchase", 0.0, 1000L))   // other key — out
    val out = WindowJoin.eventRangeJoin(df, "signup", "purchase", 1800L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    assert(out === Seq((1L, 2L), (1L, 3L), (1L, 4L))) // each pair exactly once
  }

  test("range join: negative timestamps bucket by floor division (pairs straddling t=0)") {
    // with truncate-toward-zero slots, -100 and 1700 would land in slots
    // 0 and 0 but -1900 vs -200 (|Δ|=1700) would land in slots -1 and 0
    // with slot -1 spanning [-3599, -1] — adjacency still holds there, but
    // -3700 vs -1900 (|Δ|=1800, slots -2 and -1 under floor) breaks under
    // truncation (slots -2..0 collapse); assert against the direct filter
    val df = ev(
      (1L, 1L, "signup", 0.0, -100L),
      (2L, 1L, "purchase", 0.0, 1700L),    // |Δ| = 1800, inclusive, straddles 0
      (3L, 1L, "purchase", 0.0, -1900L),   // |Δ| = 1800, inclusive, both negative
      (4L, 1L, "purchase", 0.0, -1901L),   // vs 1: |Δ| = 1801 — out
      (5L, 1L, "signup", 0.0, -3700L))     // vs 3: |Δ|=1800 in; vs 4: |Δ|=1799 in
    val out = WindowJoin.eventRangeJoin(df, "signup", "purchase", 1800L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    assert(out === Seq((1L, 2L), (1L, 3L), (5L, 3L), (5L, 4L)))
  }
}
