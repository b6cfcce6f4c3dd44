package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions

/** Bloom-pruned semi-join: a manual runtime filter for the fact-⋈-dim
  * shape where the dim side is selective but the fact side would otherwise
  * shuffle in full.
  *
  * At 100 TB the exchange is the bottleneck: a semi-join on a 1%-selective
  * dim still shuffles 100% of the fact rows before the join can drop them.
  * Building a bloom filter over the dim keys (small side — the same build
  * Spark's AQE-injected runtime bloom filter performs) and probing it
  * map-side drops ~99% of fact rows BEFORE the exchange; the exact
  * semi-join afterwards removes the bloom's false positives, so the result
  * is exactly the plain semi-join's. fpp trades filter size against
  * residual shuffle volume (1% fpp ≈ 9.6 bits/key).
  *
  * Spark's own injected runtime filter does this automatically above its
  * size thresholds (10 GB probe-side scans); this operator is the explicit
  * form for pipelines that know their dim is selective — and the vehicle
  * for proving the mechanism at test scale.
  */
object BloomJoin {

  /** Rows of `big` whose `bigKey` appears in `dim.dimKey` — exactly
    * `big SEMI JOIN dim`, with a bloom pre-filter ahead of the shuffle.
    * `expectedKeys` sizes the filter (over-provisioning only lowers fpp;
    * under-provisioning only raises it — never correctness). */
  def bloomPrunedSemiJoin(big: DataFrame, bigKey: String,
                          dim: DataFrame, dimKey: String,
                          expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(dimKey)
    val bloom = BloomFunctions.bloomOf(keys, dimKey, expectedKeys, fpp)
    bloomPrefilter(big, bigKey, bloom)
      .join(keys, col(bigKey) === col(dimKey), "left_semi")
  }

  /** Just the map-side probe (exposed for plan/selectivity assertions):
    * keeps every true match plus fpp-rate false positives. */
  def bloomPrefilter(big: DataFrame, bigKey: String, bloom: Array[Byte]): DataFrame =
    big.filter(BloomFunctions.mightContain(col(bigKey), bloom))
}
