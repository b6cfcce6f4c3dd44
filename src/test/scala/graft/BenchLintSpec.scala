package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression lint (pure functions — no Spark): prior-capture
  * parsing must survive the real BENCH_LOCAL shape, and the regression
  * gates must require BOTH the ratio and the absolute floor so ambient
  * host drift (broad 1.3x swings on sub-0.3 s queries) stays quiet while
  * a real 2x-on-a-1 s-query regression fires. */
class BenchLintSpec extends AnyFunSuite {

  private val sample =
    """{"metric":"total","sf":"/root/testdata/sf0.1","errors":{},""" +
      """"exchanges":{"q_a":3,"q_b":12},"memo_sec":{"docs":1.5},""" +
      """"queries":{"q_a":0.25,"q_b":1.0,"q_c":-1.0},"value":1.25,"unit":"sec"}"""

  test("parsePrior extracts the sf tag and the per-query seconds map") {
    val (sf, qs) = Bench.parsePrior(sample)
    assert(sf === "/root/testdata/sf0.1")
    assert(qs === Map("q_a" -> 0.25, "q_b" -> 1.0, "q_c" -> -1.0))
  }

  test("parsePrior on junk input degrades to empty, never throws") {
    assert(Bench.parsePrior("")._2.isEmpty)
    assert(Bench.parsePrior("{\"queries\":{}}")._2.isEmpty)
    assert(Bench.parsePrior("not json at all")._2.isEmpty)
  }

  test("regressions: fires only past BOTH the 1.5x ratio and 0.3 s absolute gates") {
    val prior = Map("fast" -> 0.1, "slow" -> 1.0, "mid" -> 0.5, "err" -> 2.0)
    val now = Seq(
      "fast" -> 0.25, // 2.5x but only +0.15 s → quiet (noise floor)
      "slow" -> 2.2,  // 2.2x and +1.2 s → fires
      "mid" -> 0.7,   // +0.2 s and 1.4x → quiet on both gates
      "err" -> -1.0,  // failed this run → excluded (lands in errors map)
      "new" -> 9.9)   // no prior → nothing to compare
    assert(Bench.regressions(prior, now) === Seq(("slow", 1.0, 2.2)))
  }
}
