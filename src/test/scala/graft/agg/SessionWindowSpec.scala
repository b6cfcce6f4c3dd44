package graft.agg

import graft.SparkSuite
import org.apache.spark.sql.functions.{countDistinct, expr}

class SessionWindowSpec extends SparkSuite {
  // the valueStats fractional-digits guard deliberately fails a task
  override protected def expectedTaskFailureSubstrings: Seq[String] =
    Seq("2 fractional digits")

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

  test("approxProfile: sketch answers land within their error bounds of exact") {
    val df = graft.core.Tables.events(spark, "/root/testdata/sf0.01")
    val got = Aggregations.approxProfile(df, "event_type", "value", Seq(0.5, 0.99))
      .as[(String, Long, Long, Seq[Double])].collect().map(r => r._1 -> r).toMap
    // rank-error bound: each approx percentile must land between the
    // exact percentiles one point either side (GK guarantees far
    // tighter at accuracy 10000, but the bracket is distribution-free)
    val exact = df.groupBy($"event_type")
      .agg(countDistinct($"value").as("nd"),
        expr("percentile(value, array(0.49, 0.51, 0.98, 1.0))").as("ps"))
      .as[(String, Long, Seq[Double])].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === exact.keySet && got.nonEmpty)
    for ((k, (_, _, ad, aps)) <- got) {
      val (_, nd, brackets) = exact(k)
      assert(math.abs(ad - nd).toDouble / nd < 0.05,
        s"$k: approx distinct $ad vs exact $nd")
      val Seq(lo50, hi50, lo99, hi99) = brackets
      assert(aps(0) >= lo50 && aps(0) <= hi50, s"$k: p50 ${aps(0)} outside [$lo50, $hi50]")
      assert(aps(1) >= lo99 && aps(1) <= hi99, s"$k: p99 ${aps(1)} outside [$lo99, $hi99]")
    }
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
