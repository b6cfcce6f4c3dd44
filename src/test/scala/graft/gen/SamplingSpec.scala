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
}
