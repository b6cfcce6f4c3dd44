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
}
