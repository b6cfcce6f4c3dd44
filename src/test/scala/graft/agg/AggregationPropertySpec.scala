package graft.agg

import scala.util.Random

import graft.SparkSuite

/** SURVEY.md §5.2(6) property tests: algebraic relationships between the
  * incremental (streaming-shaped) and batch formulations, on seeded
  * randomized inputs (10 cases per property). */
class AggregationPropertySpec extends SparkSuite {
  import spark.implicits._

  private def cases: Seq[List[(Long, Long, Double)]] = {
    val rnd = new Random(42)
    (1 to 10).map { _ =>
      val n = 1 + rnd.nextInt(60)
      List.tabulate(n)(i =>
        (1L + rnd.nextInt(5), i.toLong, rnd.nextInt(2001).toDouble / 100.0 - 10.0))
    }
  }

  test("running sum's last value per key == keyed sum (A4 final state)") {
    cases.foreach { rows =>
      val df = rows.toDF("user_id", "event_id", "value")
      val running = Aggregations.runningSum(df, "user_id", "event_id", "value")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2)._3 }
      val keyed = Aggregations.keyedSum(df, "user_id", "value")
        .as[(Long, Double)].collect().toMap
      assert(running === keyed)
    }
  }

  test("maxBy returns a record attaining the per-key max (A6)") {
    cases.foreach { rows =>
      val df = rows.toDF("user_id", "event_id", "value")
      val got = Aggregations.maxBy(df, "user_id", "value", "event_id")
        .select("user_id", "value").as[(Long, Double)].collect().toMap
      val expected = rows.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._3).max }
      assert(got === expected)
    }
  }

  test("windowed sums partition the keyed sum (A5: sum over windows == total)") {
    cases.foreach { rows =>
      val df = rows.map { case (k, i, v) => (k, i, v, i * 2) } // ts = 2*i sec
        .toDF("user_id", "event_id", "value", "ts_sec")
      // The operator's sums are exact 2-decimal values, rounded to double
      // only at output — setScale(2) recovers the exact decimal on the
      // test side before summing, so equality is exact, not approximate.
      def dec2(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val windowed = Aggregations.windowSum(df, "ts_sec", "user_id", "value", 5L)
        .as[(Long, Long, Double)].collect()
        .groupBy(_._2).map { case (k, ws) => k -> ws.map(w => dec2(w._3)).sum }
      val keyed = Aggregations.keyedSum(df, "user_id", "value")
        .as[(Long, Double)].collect()
        .map { case (k, v) => k -> dec2(v) }.toMap
      assert(windowed === keyed)
    }
  }

  test("windowed join == join of window-bucketed slices (J1 batch equivalence)") {
    val rnd = new Random(7)
    (1 to 5).foreach { _ =>
      val n = 20 + rnd.nextInt(40)
      val rows = List.tabulate(n)(i => (
        i.toLong, 1L + rnd.nextInt(4),
        if (rnd.nextBoolean()) "signup" else "purchase",
        rnd.nextInt(100).toDouble, rnd.nextInt(50).toLong))
      val df = rows.toDF("event_id", "user_id", "event_type", "value", "ts_sec")
      val got = graft.join.WindowJoin.eventSliceJoin(df, "signup", "purchase", 10L).count()
      val expected = rows.groupBy(r => (r._2, r._5 / 10)).map { case (_, g) =>
        g.count(_._3 == "signup").toLong * g.count(_._3 == "purchase").toLong
      }.sum
      assert(got === expected)
    }
  }
}
