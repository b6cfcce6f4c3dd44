package graft.agg

import graft.SparkSuite

class SessionWindowSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: (Long, Long, Double)*) =
    Aggregations.sessionSum(
      rows.toDF("user_id", "ts_sec", "value"), "ts_sec", "user_id", "value", 30L)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))

  test("events within the gap merge into one session ending gap after the last") {
    assert(run((1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 35L, 4.0)) ===
      Seq((1L, 0L, 65L, 7.0))) // gaps 10 and 25 < 30 → one session [0, 35+30)
  }

  test("a gap of exactly `gapSec` still MERGES; one past it splits") {
    assert(run((1L, 0L, 1.0), (1L, 30L, 2.0)) ===
      Seq((1L, 0L, 60L, 3.0))) // t == prev + gap → same session
    assert(run((1L, 0L, 1.0), (1L, 31L, 2.0)) ===
      Seq((1L, 0L, 30L, 1.0), (1L, 31L, 61L, 2.0))) // t > prev + gap → split
  }

  test("sessions are per key") {
    assert(run((1L, 0L, 1.0), (2L, 5L, 2.0)) ===
      Seq((1L, 0L, 30L, 1.0), (2L, 5L, 35L, 2.0)))
  }

  test("valueStats: exact interpolated percentiles, hand-computed") {
    val df = (1 to 5).map(i => ("a", i.toDouble)).toDF("k", "v")
    val r = Aggregations.valueStats(df, "k", "v", Seq(0.5, 0.9))
      .as[(String, Double, Double, Double)].collect().head
    // sorted [1..5]: p50 idx=2 -> 3.0; p90 idx=3.6 -> 4 + 0.6*(5-4) = 4.6
    assert(r === (("a", 1.0, 3.0, 4.6)))
  }

  test("valueStats: >2 fractional digits fails loudly, not silently binned") {
    val df = Seq(("a", 1.001), ("a", 2.0)).toDF("k", "v")
    val ex = intercept[Exception] {
      Aggregations.valueStats(df, "k", "v", Seq(0.5)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("2 fractional digits")))
  }
}
