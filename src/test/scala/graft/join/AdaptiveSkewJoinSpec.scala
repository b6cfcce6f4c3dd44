package graft.join

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The profile → strategy loop: pick() must read the right remedy off
  * the skew histogram, and every strategy must produce identical rows —
  * physical choice, never semantic. */
class AdaptiveSkewJoinSpec extends SparkSuite {
  import spark.implicits._

  // 40% of the big side shares key 1 (the straggler maker); the rest is
  // uniform over 1..500
  private def skewedBig = (1 to 20000).map { i =>
    val k = if (i % 5 < 2) 1L else (i % 500 + 1).toLong
    (k, i.toLong)
  }.toDF("k", "payload")

  private def flatBig = (1 to 20000)
    .map(i => ((i % 500 + 1).toLong, i.toLong)).toDF("k", "payload")

  private def dim = (1 to 500).map(i => (i.toLong, s"d$i")).toDF("dk", "attr")

  private def profile(df: org.apache.spark.sql.DataFrame) =
    graft.rel.Analytics.skewProfile(df, "k")

  test("pick: hot key → Salted with enough salts to hit target partition size") {
    // forbid broadcast (budget 0) so the profile decides
    val s = AdaptiveSkewJoin.pick(profile(skewedBig), smallRows = 500,
      shufflePartitions = 16, broadcastMaxRows = 0)
    s match {
      case AdaptiveSkewJoin.Salted(n) =>
        // hot key has 8000 of 20000 rows; target = 1250 → ~7 salts
        assert(n >= 4 && n <= 16, s"salts=$n out of the sane range")
      case other => fail(s"expected Salted, got $other")
    }
  }

  test("pick: flat profile → Plain; tiny small side → BroadcastSmall") {
    assert(AdaptiveSkewJoin.pick(profile(flatBig), smallRows = 500,
      shufflePartitions = 16, broadcastMaxRows = 0) === AdaptiveSkewJoin.Plain)
    assert(AdaptiveSkewJoin.pick(profile(skewedBig), smallRows = 500,
      shufflePartitions = 16) === AdaptiveSkewJoin.BroadcastSmall)
  }

  test("every strategy returns the same rows on skewed and flat inputs") {
    for (big <- Seq(skewedBig, flatBig)) {
      val plain = AdaptiveSkewJoin.join(big, "k", dim, "dk",
          AdaptiveSkewJoin.Plain)
        .select("k", "payload", "dk", "attr")
        .as[(Long, Long, Long, String)].collect().sorted.toSeq
      for (s <- Seq(AdaptiveSkewJoin.BroadcastSmall,
                    AdaptiveSkewJoin.Salted(7))) {
        val got = AdaptiveSkewJoin.join(big, "k", dim, "dk", s)
          .select("k", "payload", "dk", "attr")
          .as[(Long, Long, Long, String)].collect().sorted.toSeq
        assert(got === plain, s"strategy $s diverged from plain join")
      }
    }
  }

  test("countAtMost: bounded probe — stops at the ceiling and plans a Limit") {
    val big = flatBig // 20000 rows
    assert(AdaptiveSkewJoin.countAtMost(big, 10L) === 10L,
      "count must stop at the ceiling, not scan to the true count")
    assert(AdaptiveSkewJoin.countAtMost(dim, 1000000L) === 500L,
      "below the ceiling the true count comes back")
    // the probe autoJoin runs over the small side is limit()-shaped, so a
    // misjudged 'small' side costs a bounded peek, not a full scan (a
    // LocalRelation constant-folds the limit away, so assert on a real
    // file-backed frame — the shape a production caller passes)
    val fileBacked = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val probe = fileBacked.limit(11)
    val plan = probe.queryExecution.optimizedPlan.toString
    assert(plan.contains("Limit"), s"probe did not plan a Limit:\n$plan")
    assert(AdaptiveSkewJoin.countAtMost(fileBacked, 11L) === 11L)
  }

  test("autoJoin cached-profile overload: same rows, no re-profiling scan") {
    val big = skewedBig
    val d = dim
    val prof = profile(big).localCheckpoint() // profiled ONCE by the caller
    val cached = AdaptiveSkewJoin.autoJoin(big, "k", d, "dk", prof,
        smallRows = 500L, broadcastMaxRows = 0L, skewFactor = 4.0)
      .select("k", "payload", "dk", "attr")
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    val plain = big.join(d, big("k") === d("dk"))
      .select("k", "payload", "dk", "attr")
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(cached === plain)
  }

  test("autoJoin end-to-end equals the plain join on a skewed input") {
    val big = skewedBig
    val d = dim
    val auto = AdaptiveSkewJoin.autoJoin(big, "k", d, "dk",
        broadcastMaxRows = 0)
      .select("k", "payload", "dk", "attr")
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    val plain = big.join(d, big("k") === d("dk"))
      .select("k", "payload", "dk", "attr")
      .as[(Long, Long, Long, String)].collect().sorted.toSeq
    assert(auto === plain)
  }
}
