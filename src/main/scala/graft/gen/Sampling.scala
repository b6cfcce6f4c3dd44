package graft.gen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the training-pipeline sampler.
  *
  * `sample(frac)`/`randomSplit` depend on partitioning and seed plumbing;
  * a content-hash threshold depends only on the ROW ID, so the same doc
  * lands in the same split on every run, every engine, every cluster
  * size — the property stable train/test splits and incremental re-runs
  * at 100 TB actually need. Fully map-side: no shuffle, no state.
  *
  * Mechanics: first 8 hex chars of md5(id) compared against a fixed-width
  * hex threshold (lexicographic == numeric for fixed width) — exactly
  * reproducible in any engine with md5. */
object Sampling {

  private def bucketHex(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 8)

  /** Hex threshold string for a fraction of the 32-bit hash space. */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1]: $fraction")
    f"${math.floor(fraction * 4294967296.0).toLong.min(4294967295L)}%08x"
  }

  /** Keep ~`fraction` of rows, deterministically by id hash. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(bucketHex(col(idCol)) < lit(thresholdHex(fraction)))

  /** Stable train/test labeling: rows below the threshold are 'test',
    * the rest 'train' — disjoint, exhaustive, reproducible. */
  def trainTestSplit(df: DataFrame, idCol: String, testFraction: Double): DataFrame =
    if (testFraction >= 1.0) df.withColumn("split", lit("test"))
    else df.withColumn("split",
      when(bucketHex(col(idCol)) < lit(thresholdHex(testFraction)), "test")
        .otherwise("train"))

  /** Per-stratum threshold literal: rate >= 1.0 maps to a sentinel ABOVE
    * every hex bucket ('g' > 'f'), so a keep-everything stratum really
    * keeps everything — thresholdHex(1.0) alone would be "ffffffff" and
    * the strict `<` would drop the ~1-in-4.3-billion rows hashing there
    * (a certainty at 100 TB). Shared with the generated oracle. */
  def stratumThreshold(rate: Double): String =
    if (rate >= 1.0) "g" else thresholdHex(rate)

  /** Stratified sampling: a different keep-rate per stratum value — how a
    * training-data mix downsamples each source/language to its target
    * weight. Same id-hash determinism as hashSample (a row's fate never
    * depends on partitioning or on other rows), still fully map-side; a
    * stratum absent from `rates` falls back to `defaultRate`. Rates are
    * embedded as per-stratum threshold literals, so the SAME literals are
    * reproducible in the oracle. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(stratumThreshold(defaultRate)): Column) { case (acc, (k, r)) =>
        when(col(stratumCol) === k, lit(stratumThreshold(r))).otherwise(acc)
      }
    df.filter(bucketHex(col(idCol)) < threshold)
  }

  /** Training-mix epoch expansion — the "2.3 epochs of Wikipedia" knob:
    * a per-stratum weight w emits each row floor(w) times, plus once
    * more iff its id hash falls under frac(w), then explodes to one row
    * per (doc, epoch). In expectation every stratum contributes w× its
    * rows, but each individual doc's repeat count is DETERMINISTIC (same
    * hashing as [[hashSample]]) — reproducible on any cluster shape,
    * incrementally re-runnable, no RNG state. Pure map-side fan-out
    * (explode), no shuffle; weights < 1 downsample (floor 0 + fractional
    * keep), weights ≥ 1 upsample with epoch indices for curriculum or
    * shuffling downstream. */
  def mixEpochs(df: DataFrame, stratumCol: String, idCol: String,
                weights: Map[String, Double],
                defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0),
      "mix weights must be non-negative")
    def baseOf(w: Double): Long = math.floor(w).toLong
    val sorted = weights.toSeq.sortBy(_._1)
    val base = sorted.foldLeft(lit(baseOf(defaultWeight)): Column) {
      case (acc, (k, w)) => when(col(stratumCol) === k, lit(baseOf(w))).otherwise(acc)
    }
    val fracThr = sorted.foldLeft(
      lit(stratumThreshold(defaultWeight - baseOf(defaultWeight))): Column) {
      case (acc, (k, w)) =>
        when(col(stratumCol) === k, lit(stratumThreshold(w - baseOf(w)))).otherwise(acc)
    }
    df.withColumn("n_epochs",
        base + when(bucketHex(col(idCol)) < fracThr, 1L).otherwise(0L))
      .filter(col("n_epochs") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("n_epochs"))))
  }
}
