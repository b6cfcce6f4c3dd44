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

  /** Deterministic global corpus shuffle with STABLE POSITIONS — the
    * "shuffle the training set once, identically, on any cluster" step.
    * Order is by md5(seed:id) (then id — a total order), so the
    * permutation is a pure function of (seed, ids): no RNG state, no
    * partitioning dependence, resumable mid-epoch by position range.
    *
    * Scale shape: ONE range-partitioned sort on the hash key (Spark's
    * distributed sort — no global single-partition window), then
    * positions via the two-pass per-partition-offset scheme
    * (`zipWithIndex`: count job + offset map — no driver collection of
    * data, only one Long per partition). Range boundaries come from
    * sampling and vary run to run, but the emitted position is the global
    * rank in a TOTAL order, which no boundary placement can change. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(idCol).cast("long").as("id"))
      .withColumn("shuffle_key", md5(concat(lit(s"$seed:"), col("id").cast("string"))))
      .repartitionByRange(col("shuffle_key"), col("id"))
      .sortWithinPartitions("shuffle_key", "id")
    sorted.select("id").as[Long].rdd
      .zipWithIndex()
      .toDF(idCol, "pos")
  }

  /** Per-stratum percentile-band trim — "drop each source's bottom and
    * top x% by score" (outlier removal ahead of training). Exact ranks
    * via percent_rank = (rank-1)/(n-1) with an id tie-break, one shuffle
    * on the stratum + an in-partition sort. At extreme stratum skew
    * (one source = most of 100 TB) the per-stratum sort dominates; the
    * bounded-memory alternative is computing cut VALUES from a fixed-bin
    * histogram (see Aggregations.valueStats) and broadcasting them as a
    * map-side filter — this operator is the exact-rank formulation. */
  def percentileBand(df: DataFrame, stratumCol: String, scoreCol: Column,
                     idCol: String, lo: Double, hi: Double): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi, s"band must be 0<=lo<=hi<=1: [$lo,$hi]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(scoreCol, col(idCol))
    df.withColumn("pr", percent_rank().over(w))
      .filter(col("pr") >= lo && col("pr") <= hi)
  }

  /** Data-driven mixture balancing: given TARGET shares per stratum
    * (e.g. "the training mix should be 20% per language"), derive the
    * per-stratum acceptance rate that reaches the target mixture with
    * the LARGEST possible output — the scarcest stratum (min cnt/share)
    * is kept in full and every other stratum downsamples to match. This
    * is [[stratifiedSample]]'s missing front half: rates COMPUTED from
    * observed counts inside the query, not supplied by the caller.
    *
    * Entirely in-plan — the per-stratum count table (|strata| rows) and
    * the single-row capacity both stay distributed and broadcast back;
    * no driver collect, so the same plan runs unchanged on a 1000-
    * executor cluster. Every double op (`cnt/share` min, `cap·share/cnt`)
    * appears in the same order in the DuckDB oracle, so rates are
    * bit-identical cross-engine.
    *
    * Returns one row per observed stratum with share > 0:
    * (stratum, cnt, rate). Strata absent from `shares` are dropped
    * (share 0 — not part of the target mix). */
  def mixtureRates(df: DataFrame, stratumCol: String,
                   shares: Map[String, Double]): DataFrame = {
    require(shares.nonEmpty && shares.values.forall(_ > 0.0),
      "target shares must be positive")
    val shareCol = shares.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0): Column) { case (acc, (k, v)) =>
        when(col("stratum") === k, lit(v)).otherwise(acc)
      }
    val counts = df
      .groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .withColumn("share", shareCol)
      .filter(col("share") > 0.0)
    val cap = counts.agg(min(col("cnt") / col("share")).as("cap"))
    counts.crossJoin(broadcast(cap))
      .withColumn("rate", col("cap") * col("share") / col("cnt"))
      .select(col("stratum"), col("cnt").cast("bigint").as("cnt"), col("rate"))
  }

  /** Apply [[mixtureRates]] deterministically: same id-hash mechanics as
    * [[hashSample]], thresholds derived in-plan from the computed rates
    * (hex formatting mirrored in the oracle; rate ≥ 1 uses the 'g'
    * keep-all sentinel, see [[stratumThreshold]]). Two scans of `df`
    * (count pass + filter pass) — inherent to data-driven rates — but
    * the second pass is pure map-side filter against a broadcast
    * |strata|-row table. */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
                    shares: Map[String, Double]): DataFrame = {
    // internal names: the caller's stratum column may itself be called
    // "stratum", which would make the join condition ambiguous
    val thr = mixtureRates(df, stratumCol, shares)
      .withColumn("__mix_thr",
        when(col("rate") >= 1.0, lit("g"))
          .otherwise(lpad(lower(hex(floor(col("rate") * 4294967296.0).cast("bigint"))),
            8, "0")))
      .select(col("stratum").as("__mix_stratum"), col("__mix_thr"))
    df.join(broadcast(thr), df(stratumCol) === col("__mix_stratum"))
      .filter(bucketHex(col(idCol)) < col("__mix_thr"))
      .drop("__mix_stratum", "__mix_thr")
  }

  /** TOKEN-budget sampling: per stratum, keep documents in deterministic
    * (id-hash, id) order until `budgetTokens` is reached — "give me B
    * tokens of web, B of code", the unit training mixtures are actually
    * specified in (doc-count rates like [[mixtureSample]] over-sample
    * strata with long documents). A doc is kept iff the token total of
    * docs BEFORE it (in that order) is < budget, so the straddling doc
    * is included and every stratum gets ≥ 1 doc (budget ≥ 1).
    *
    * The naive formulation is a running sum over (stratum ORDER BY hash)
    * — a per-stratum monolithic sort whose parallelism is the stratum
    * count, the same closed-domain trap `rankFamily` exists for. This is
    * a RECURSIVE prefix cut instead: at each level, docs land in 256
    * hash-prefix buckets of the current unresolved slice;
    * per-(stratum, bucket) token sums (a tiny aggregate) give exact
    * bucket prefix offsets, which classify whole buckets as
    * keep-all (off + btok < budget), drop-all (off ≥ budget), or THE
    * boundary bucket (≤ 1 per stratum), which descends to the next
    * level. Each level divides the unresolved region by 256, so the
    * final ordered scan touches 256^-levels of a stratum — `levels` = 2
    * (default) is 1/65536, enough for any real corpus; the spec proves
    * all depths emit identical keep sets.
    *
    * Output: kept docs as (idCol, stratumCol, n_tokens). */
  def tokenBudgetSample(df: DataFrame, stratumCol: String, idCol: String,
                        tokensCol: String, budgetTokens: Long,
                        levels: Int = 2): DataFrame = {
    require(budgetTokens >= 1, s"budget must be >= 1 token: $budgetTokens")
    require(levels >= 1 && levels <= 4,
      s"levels must be in [1,4] (8 hex chars available): $levels")
    import org.apache.spark.sql.expressions.{Window => W}
    val fineW = 2 * levels
    val base = df.select(col(idCol), col(stratumCol),
        col(tokensCol).cast("bigint").as("n_tokens"))
      .withColumn("__h", bucketHex(col(idCol)))
    // THE one aggregate over the full data: token totals per
    // finest-level hash-prefix bucket. Every coarser level's sums are
    // re-aggregations of this ≤ 256^levels-buckets-per-stratum frame —
    // the r9 verdict's union-of-aggregates plan re-scanned and
    // re-shuffled base once per level per branch (18 exchanges); this
    // shape shuffles the full data exactly once, here.
    val fine = base
      .groupBy(col(stratumCol), substring(col("__h"), 1, fineW).as("__fb"))
      .agg(sum(col("n_tokens")).as("__ft"))
    // Recursive cut, walked entirely on the tiny bucket frame: at each
    // level the per-(stratum, prefix) sums locate the ≤ 1 straddling
    // bucket per stratum (cumulative sums are monotone, so exactly one
    // bucket straddles unless the stratum is under budget), which
    // descends with its exact prefix offset. Each level divides the
    // unresolved region by 256, and each level's window sorts ≤ 256
    // rows per stratum. Keep-all buckets need no tracking: kept
    // buckets are precisely those ORDERED BEFORE the boundary prefix —
    // the whole decision compresses to ONE ROW PER STRATUM.
    // Hop widths: ≥ 1 level (2 hex chars), ≤ 2 levels (4 chars) per hop,
    // so each hop's window sorts ≤ 256² = 65,536 rows per stratum — at
    // the default levels=2 the walk is ONE window directly over `fine`
    // (no re-aggregation), and levels=4 still needs only two hops.
    val widths = (1 to levels).map(_ * 2).filter(w => w % 4 == 0 || w == fineW)
    var bnd = Option.empty[DataFrame] // (stratumCol, __p, __pboff)
    var prevW = 0
    for (w <- widths) {
      val scoped = bnd match {
        case None => fine.withColumn("__pboff", lit(0L))
        case Some(b) => fine.join(
          broadcast(b.withColumnRenamed(stratumCol, "__bs")),
          col(stratumCol) === col("__bs") &&
            substring(col("__fb"), 1, prevW) === col("__p"))
          .drop("__bs", "__p")
      }
      val bucketed =
        if (w == fineW) scoped.select(col(stratumCol), col("__fb").as("__b"),
          col("__pboff"), col("__ft").as("__btok"))
        else scoped.groupBy(col(stratumCol),
          substring(col("__fb"), 1, w).as("__b"),
          col("__pboff")) // constant within a stratum's boundary path
          .agg(sum(col("__ft")).as("__btok"))
      val wB = W.partitionBy(col(stratumCol)).orderBy(col("__b"))
        .rowsBetween(W.unboundedPreceding, -1)
      val off = bucketed.withColumn("__boff",
        col("__pboff") + coalesce(sum(col("__btok")).over(wB), lit(0L)))
      bnd = Some(off
        .filter(col("__boff") < budgetTokens &&
          col("__boff") + col("__btok") >= budgetTokens)
        .select(col(stratumCol), col("__b").as("__p"),
          col("__boff").as("__pboff")))
      prevW = w
    }
    // One row per stratum: the finest-level boundary bucket and the
    // token total resolved before it. A stratum with NO row here never
    // crossed the budget (cumulative sums are monotone) — keep all.
    val dec = bnd.get.withColumnRenamed("__p", "__bb")
    // Single pass over base, one O(strata)-row broadcast: keep iff the
    // row's bucket sorts before the boundary bucket (or the stratum is
    // under budget); the bulk path never shuffles the data.
    val tagged = base
      .withColumn("__fb", substring(col("__h"), 1, fineW))
      .join(broadcast(dec), Seq(stratumCol), "left")
    val bulk = tagged
      .filter(col("__bb").isNull || col("__fb") < col("__bb"))
      .select(col(idCol), col(stratumCol), col("n_tokens"))
    // Base case: the per-row ordered scan, confined to the one boundary
    // bucket per stratum (1/256^levels of the data) — the only per-row
    // sort in the plan, and the only full-data exchange stays `fine`'s.
    val wD = W.partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(W.unboundedPreceding, -1)
    val boundaryKept = tagged.filter(col("__fb") === col("__bb"))
      .withColumn("__before",
        col("__pboff") + coalesce(sum(col("n_tokens")).over(wD), lit(0L)))
      .filter(col("__before") < budgetTokens)
      .select(col(idCol), col(stratumCol), col("n_tokens"))
    bulk.unionByName(boundaryKept)
  }
}
