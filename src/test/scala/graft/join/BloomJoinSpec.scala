package graft.join

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables
import graft.functions.BloomFunctions

/** The bloom-pruned semi-join: exactness (== the plain semi-join — false
  * positives removed, false negatives impossible), actual pruning power
  * of the prefilter, and the probe staying inside whole-stage codegen. */
class BloomJoinSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def urgentKeys = Tables.orders(spark, sf)
    .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")

  test("bloomPrunedSemiJoin == plain left_semi join, bit for bit") {
    val li = Tables.lineitem(spark, sf)
    val viaBloom = BloomJoin.bloomPrunedSemiJoin(li, "l_orderkey",
        urgentKeys, "o_orderkey", expectedKeys = 10000L, fpp = 0.05)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = li.join(urgentKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBloom == plain)
    assert(plain.nonEmpty, "vacuous: no urgent lineitems at this SF")
  }

  test("prefilter never drops a true match and actually prunes") {
    val li = Tables.lineitem(spark, sf)
    val bloom = BloomFunctions.bloomOf(urgentKeys, "o_orderkey", 10000L, 0.02)
    val kept = BloomJoin.bloomPrefilter(li, "l_orderkey", bloom)
    val trueMatches = li.join(urgentKeys,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val keptN = kept.count()
    // no false negatives: every true match survives the probe
    assert(keptN >= trueMatches)
    // pruning power: a ~20%-selective dim + 2% fpp must drop most rows
    // (loose bound — fpp noise can't push a 0.2 selectivity above 0.5)
    assert(keptN < li.count() / 2,
      s"bloom prefilter barely pruned: kept $keptN of ${li.count()}")
  }

  test("undersized filter stays exact (capacity affects fpp, not correctness)") {
    val li = Tables.lineitem(spark, sf)
    val viaTiny = BloomJoin.bloomPrunedSemiJoin(li, "l_orderkey",
        urgentKeys, "o_orderkey", expectedKeys = 10L, fpp = 0.5)
      .count()
    val plain = li.join(urgentKeys,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(viaTiny == plain)
  }

  test("the probe runs inside whole-stage codegen, before any exchange") {
    val li = Tables.lineitem(spark, sf)
    val bloom = BloomFunctions.bloomOf(urgentKeys, "o_orderkey", 10000L, 0.02)
    val df = BloomJoin.bloomPrefilter(li, "l_orderkey", bloom)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("bloom_might_contain"), s"probe expression missing:\n$plan")
    assert(plan.contains("*("), "probe fell out of whole-stage codegen")
    assert(!plan.contains("Exchange"),
      "the prefilter alone must be map-side — no exchange")
  }
}
