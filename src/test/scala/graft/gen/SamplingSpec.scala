package graft.gen

import graft.SparkSuite

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private val ids = (1L to 2000L).map(i => (i, s"row$i")).toDF("doc_id", "v")

  test("hashSample keeps approximately the requested fraction, deterministically") {
    val a = Sampling.hashSample(ids, "doc_id", 0.25).as[(Long, String)].collect().toSet
    val b = Sampling.hashSample(ids, "doc_id", 0.25).as[(Long, String)].collect().toSet
    assert(a === b) // identical across runs
    assert(math.abs(a.size - 500) < 100, s"got ${a.size} of expected ~500")
  }

  test("a smaller fraction's sample is a SUBSET of a larger one (nested splits)") {
    val small = Sampling.hashSample(ids, "doc_id", 0.1).as[(Long, String)].collect().toSet
    val large = Sampling.hashSample(ids, "doc_id", 0.3).as[(Long, String)].collect().toSet
    assert(small.subsetOf(large))
  }

  test("trainTestSplit is disjoint, exhaustive, and consistent with hashSample") {
    val split = Sampling.trainTestSplit(ids, "doc_id", 0.1)
      .as[(Long, String, String)].collect()
    assert(split.length === 2000)
    val test = split.filter(_._3 == "test").map(_._1).toSet
    val sampled = Sampling.hashSample(ids, "doc_id", 0.1)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(test === sampled)
  }

  test("fraction edge cases: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.hashSample(ids, "doc_id", 0.0).count() === 0L)
    assert(Sampling.hashSample(ids, "doc_id", 1.0).count() === 2000L)
  }

  test("stratifiedSample: per-stratum keep set == hashSample at that rate; default applies") {
    val strat = (1L to 900L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "stratum")
    val out = Sampling.stratifiedSample(strat, "stratum", "doc_id",
      Map("s0" -> 0.5, "s1" -> 0.2), defaultRate = 0.0)
      .as[(Long, String)].collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    assert(!out.contains("s2")) // default 0.0 drops unlisted strata
    val s0 = Sampling.hashSample(strat.filter($"stratum" === "s0"), "doc_id", 0.5)
      .as[(Long, String)].collect().map(_._1).toSet
    val s1 = Sampling.hashSample(strat.filter($"stratum" === "s1"), "doc_id", 0.2)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(out("s0") === s0 && out("s1") === s1)
    assert(s0.nonEmpty && s1.nonEmpty && s1.size < s0.size)
  }

  test("deterministicShuffle: a stable permutation, independent of input partitioning") {
    val out = Sampling.deterministicShuffle(ids, "doc_id", seed = 7)
      .as[(Long, Long)].collect().toSeq
    // it IS a permutation: every id once, positions exactly 0..n-1
    assert(out.map(_._1).sorted == (1L to 2000L))
    assert(out.map(_._2).sorted == (0L until 2000L))
    // and it genuinely shuffles (identity order would betray a no-op)
    assert(out.sortBy(_._2).map(_._1).take(100) != (1L to 100L).toSeq)
    // partitioning-independence: same permutation from a reshaped input
    val reshaped = Sampling.deterministicShuffle(ids.repartition(7), "doc_id", seed = 7)
      .as[(Long, Long)].collect().toSeq
    assert(out.toSet == reshaped.toSet)
    // a different seed is a different permutation
    val other = Sampling.deterministicShuffle(ids, "doc_id", seed = 8)
      .as[(Long, Long)].collect().toSet
    assert(other != out.toSet)
  }

  test("percentileBand trims each stratum's tails, keeps every stratum") {
    import org.apache.spark.sql.functions._
    val df = (1L to 1000L).map(i => (i, s"s${i % 3}", (i * 37) % 500)).toDF("doc_id", "src", "score")
    val band = Sampling.percentileBand(df, "src", col("score"), "doc_id", 0.1, 0.9)
    val rows = band.collect()
    assert(rows.map(_.getString(1)).toSet == Set("s0", "s1", "s2"))
    // ranks inside the band only
    assert(rows.forall { r => val pr = r.getDouble(3); pr >= 0.1 && pr <= 0.9 })
    // ~80% of each stratum survives (percent_rank is exact, ties none here
    // thanks to the id tie-break, so the bound is tight to +-1 row)
    val kept = rows.groupBy(_.getString(1)).view.mapValues(_.length)
    for ((_, n) <- kept) assert(math.abs(n - 267) <= 2, s"stratum kept $n of ~267")
  }

  test("mixEpochs: integer weights repeat exactly; fractional part == hashSample keep set") {
    val docs = (1L to 600L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val out = Sampling.mixEpochs(docs, "source", "doc_id",
      Map("s0" -> 2.0, "s1" -> 1.5, "s2" -> 0.0), defaultWeight = 1.0)
      .as[(Long, String, Long, Long)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._4).sorted.toSeq).toMap
    // w=2.0: every s0 doc exactly epochs [1, 2]
    assert(docs.filter($"source" === "s0").as[(Long, String)].collect()
      .forall { case (id, _) => byDoc(id) === Seq(1L, 2L) })
    // w=0.0 drops the stratum entirely
    assert(out.forall(_._2 !== "s2"))
    // w=1.5: docs with 2 epochs are EXACTLY the hashSample(0.5) keep set
    val two = out.filter(r => r._2 === "s1" && r._3 === 2L).map(_._1).toSet
    val expect = Sampling.hashSample(docs.filter($"source" === "s1"), "doc_id", 0.5)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(two === expect && two.nonEmpty)
    // deterministic under repartitioning
    val again = Sampling.mixEpochs(docs.repartition(13), "source", "doc_id",
      Map("s0" -> 2.0, "s1" -> 1.5, "s2" -> 0.0), defaultWeight = 1.0)
      .as[(Long, String, Long, Long)].collect()
    assert(again.sortBy(r => (r._1, r._4)).toSeq === out.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("mixtureRates: scarcest stratum binds at rate 1, others scale to the target mix") {
    // counts: s0=600, s1=300, s2=100; target 1/3 each -> cap = min(cnt/share)
    // = 300 -> rates 100/600, 100/300, 100/100
    val docs = (1L to 1000L).map(i =>
      (i, if (i <= 600) "s0" else if (i <= 900) "s1" else "s2"))
      .toDF("doc_id", "stratum")
    val shares = Map("s0" -> (1.0 / 3), "s1" -> (1.0 / 3), "s2" -> (1.0 / 3))
    val r = Sampling.mixtureRates(docs, "stratum", shares)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(r.map(x => (x._1, x._2)).toSeq === Seq(("s0", 600L), ("s1", 300L), ("s2", 100L)))
    assert(math.abs(r(0)._3 - 100.0 / 600) < 1e-12)
    assert(math.abs(r(1)._3 - 100.0 / 300) < 1e-12)
    assert(r(2)._3 >= 1.0 - 1e-12) // binding stratum kept (essentially) in full
  }

  test("mixtureSample: output mixture approaches the target; deterministic; strata " +
    "outside the target mix drop") {
    val docs = (1L to 3000L).map(i =>
      (i, if (i % 6 < 3) "en" else if (i % 6 < 5) "de" else "fr"))
      .toDF("doc_id", "stratum") // en 1500, de 1000, fr 500
    val shares = Map("en" -> 0.5, "fr" -> 0.5) // de not in the target mix
    val out = Sampling.mixtureSample(docs, "stratum", "doc_id", shares)
      .as[(Long, String)].collect()
    assert(out.forall(_._2 != "de"))
    val bySt = out.groupBy(_._2).view.mapValues(_.length).toMap
    // cap = min(1500/.5, 500/.5) = 1000 -> fr rate 1 (all 500 kept),
    // en rate 1/3 (~500 kept, hash variance)
    assert(bySt("fr") === 500)
    assert(math.abs(bySt("en") - 500) < 80, s"en kept ${bySt("en")} of ~500")
    // deterministic under repartitioning
    val again = Sampling.mixtureSample(docs.repartition(17), "stratum", "doc_id", shares)
      .as[(Long, String)].collect()
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("tokenBudgetSample: equals the naive prefix rule; straddler kept; " +
    "zero-weight docs; under-budget stratum keeps everything") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813)
    val docs = ((1 to 400).map(i =>
      (i.toLong, s"s${i % 3}", rnd.nextInt(50).toLong)) ++ // incl. 0-token docs
      (1000 to 1004).map(i => (i.toLong, "tiny", 10L))     // total 50 < budget
      ).toDF("doc_id", "stratum", "ntok")
    val budget = 800L
    val got = Sampling.tokenBudgetSample(docs, "stratum", "doc_id", "ntok", budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // every recursion depth resolves to the SAME keep set
    for (lv <- Seq(1, 3)) {
      val atLv = Sampling.tokenBudgetSample(docs, "stratum", "doc_id", "ntok",
          budget, levels = lv)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(atLv === got, s"levels=$lv diverged from the default depth")
    }
    // naive reference: per stratum, hash order, keep while before < budget
    def hex(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes)
      md.take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    val expect = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        val ordered = rows.toSeq.sortBy(t => (hex(t._1), t._1))
        val cums = ordered.scanLeft(0L)(_ + _._3)
        ordered.zip(cums).filter(_._2 < budget).map(_._1)
      }.toSet
    assert(got === expect)
    // the under-budget stratum keeps all its docs
    assert(got.count(_._2 == "tiny") == 5)
    // budgets bind: each big stratum keeps a nonempty strict subset
    val perStratum = docs.collect().groupBy(_.getString(1)).view.mapValues(_.length)
    for (s <- Seq("s0", "s1", "s2")) {
      val kept = got.count(_._2 == s)
      assert(kept > 0 && kept < perStratum(s), s"stratum $s kept $kept")
    }
  }
}
