package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed aggregation operators (SURVEY.md §2.4 A1–A6, §2.5 W1/W2).
  *
  * Determinism & oracle notes:
  *  - DOUBLE measures are cast to DECIMAL(18,2) before summing so the sum
  *    is exact and associative — partial (map-side) aggregation order can
  *    then never change the result, and the DuckDB oracle matches bit-wise.
  *    The final value is cast back to DOUBLE for a stable output schema.
  *  - Window *buckets* are emitted as epoch-second BIGINTs rather than
  *    Spark's `window` struct so the oracle SQL is engine-neutral.
  */
object Aggregations {

  /** Exact, associative sum of a DOUBLE measure (2 fractional digits). */
  def exactSum(measure: Column): Column =
    sum(measure.cast("decimal(18,2)")).cast("double")

  /** A4 running keyed sum (`WordCount.java:82` `keyBy(0).sum(1)`) —
    * the per-record emission sequence, reformulated as a cumulative SQL
    * window (SURVEY.md §2.4): one output row per input row carrying the
    * aggregate *as of* that row. Order is made total by (key, ordCol). */
  def runningSum(df: DataFrame, key: String, ord: String, measure: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
      col(key), col(ord),
      sum(col(measure).cast("decimal(18,2)")).over(w).cast("double").as("running_sum"))
  }

  /** A4 final state: plain keyed sum (what the running sum converges to). */
  def keyedSum(df: DataFrame, key: String, measure: String): DataFrame =
    df.groupBy(col(key)).agg(exactSum(col(measure)).as("sum_value"))

  /** Tumbling-window bucket of an epoch-seconds column, as epoch seconds
    * aligned to the epoch origin — identical to Spark's `window()` start
    * for epoch-aligned sizes, but engine-neutral for the oracle. Pure
    * integer arithmetic (`x - x mod size`): no double rounding ever. */
  def windowBucket(tsSec: Column, sizeSec: Long): Column =
    (tsSec - pmod(tsSec, lit(sizeSec))).cast("bigint")

  /** A5/W1: windowed keyed sum — per 5 s tumbling window per key
    * (`SocketWindowWordCount.scala:64-66`), re-expressed over event time.
    * `tsSec` is an epoch-seconds BIGINT column. */
  def windowSum(df: DataFrame, tsSec: String, key: String, measure: String,
                sizeSec: Long): DataFrame =
    df.groupBy(
        windowBucket(col(tsSec), sizeSec).as("wstart_sec"),
        col(key))
      .agg(exactSum(col(measure)).as("sum_value"))

  /** SLIDING (hopping) keyed window sum — each event lands in
    * size/slide overlapping windows (epoch-aligned starts). Expressed
    * through Spark's native `window(ts, size, slide)`, which EXPLODES
    * each row into its size/slide window assignments BEFORE the shuffle
    * — so partial aggregation still combines map-side and the exchange
    * carries one partial row per (window, key) pair per task, not the
    * size/slide-amplified event stream. Works identically on a
    * watermarked stream. `sizeSec` must be a multiple of `slideSec`. */
  def slidingWindowSum(df: DataFrame, tsSec: String, key: String,
                       measure: String, sizeSec: Long, slideSec: Long): DataFrame = {
    require(sizeSec > 0 && slideSec > 0 && sizeSec % slideSec == 0,
      s"size ($sizeSec) must be a positive multiple of slide ($slideSec)")
    df.groupBy(
        window(timestamp_seconds(col(tsSec)), s"$sizeSec seconds",
          s"$slideSec seconds").as("w"),
        col(key))
      .agg(exactSum(col(measure)).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("wstart_sec"),
        col(key), col("sum_value"))
  }

  /** Session-window keyed sum (window-layer extension; the reference's
    * pom still packages a pruned SessionWindowing example — SURVEY.md §0).
    * A session groups events per key whose gaps are <= `gapSec`; the
    * window closes `gapSec` after the last event (Spark `session_window`
    * semantics: an event at exactly prev + gap still MERGES — the break
    * is strictly greater than the gap).
    * Works on batch and — with a watermark upstream — streaming input.
    * Output: key, session_start/session_end as epoch seconds, sum. */
  def sessionSum(df: DataFrame, tsSec: String, key: String, measure: String,
                 gapSec: Long): DataFrame =
    df.withColumn("__ts", timestamp_seconds(col(tsSec)))
      .groupBy(session_window(col("__ts"), s"$gapSec seconds").as("w"), col(key))
      .agg(exactSum(col(measure)).as("sum_value"))
      .select(col(key),
        unix_timestamp(col("w.start")).as("session_start"),
        unix_timestamp(col("w.end")).as("session_end"),
        col("sum_value"))

  /** Per-key distribution statistics: exact interpolated percentiles +
    * min — the data-quality profile a pipeline computes before filtering.
    *
    * Formulated as a FIXED-BIN HISTOGRAM, not Spark's `percentile`: that
    * TypedImperativeAggregate buffers every value of a group in memory,
    * which OOMs an executor when one key holds billions of rows. The
    * measure carries 2 fractional digits, so `round(measure*100)` is an
    * EXACT integer bin — counting bins then interpolating between the two
    * bracketing order statistics reproduces `percentile`'s linear
    * interpolation exactly, with per-group state bounded by the value
    * DOMAIN (bins), not the row count.
    *
    * Plan shape: one partial-agg shuffle on (key, bin), one shuffle on
    * key for the cumulative window (sort-based, spillable), and the final
    * per-key agg reuses that partitioning — no third exchange.
    *
    * Interpolation (mirrors the DuckDB oracle op-for-op so doubles stay
    * bit-identical): rank r = 1 + p·(n−1); result = (lo + (r−⌊r⌋)·(hi−lo))
    * / 100 where lo/hi are the bins holding order statistics ⌊r⌋/⌈r⌉. */
  def valueStats(df: DataFrame, key: String, measure: String,
                 ps: Seq[Double]): DataFrame = {
    // math.round, not toInt: (0.29*100).toInt == 28 under floating point
    val names = ps.map(p => s"p${math.round(p * 100)}")
    require(names.distinct == names, s"percentile labels collide: $names")
    // NULL measures are excluded like `percentile` excluded them — and a
    // NULL bin would sort first in Spark's window but LAST in the
    // oracle's, silently skewing every cumulative count
    // loud-failure guard for the binning contract: the histogram is only
    // EXACT when every measure has <= 2 fractional digits (bin = value).
    // A general double would silently get binned percentiles, so assert
    // per row inside the scan (assert_true returns NULL when the
    // predicate holds, so the isNull keeps it in the plan for free).
    // null-safe EXPLICITLY (isNull || exact2dp), not by relying on the
    // enclosing And to short-circuit before assert_true sees a NULL
    // predicate — predicate reordering by a future optimizer change must
    // not turn NULL-measure rows into spurious failures
    val exact2dp = col(measure).isNull ||
      round(col(measure) * 100) / 100 === col(measure)
    val hist = df
      .filter(col(measure).isNotNull &&
        assert_true(exact2dp, lit(s"valueStats requires '$measure' values " +
          "with <= 2 fractional digits (exact fixed-bin histogram contract)"))
          .isNull)
      .groupBy(col(key), round(col(measure) * 100).cast("bigint").as("bin"))
      .agg(count(lit(1)).as("cnt"), min(col(measure)).as("measure_min"))
    val wCum = Window.partitionBy(col(key)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(key))))
    def rank(p: Double): Column =
      lit(1.0) + lit(p) * (col("n") - lit(1L)).cast("double")
    val brackets = ps.zip(names).flatMap { case (p, nm) =>
      Seq(min(when(col("cum") >= floor(rank(p)), col("bin"))).as(s"lo_$nm"),
          min(when(col("cum") >= ceil(rank(p)), col("bin"))).as(s"hi_$nm"))
    }
    val agged = cum.groupBy(col(key))
      .agg(min(col("measure_min")).as("min_v"), (max(col("n")).as("n") +: brackets): _*)
    val outs = ps.zip(names).map { case (p, nm) =>
      val r = rank(p)
      ((col(s"lo_$nm") + (r - floor(r)) * (col(s"hi_$nm") - col(s"lo_$nm"))) / 100.0)
        .as(nm)
    }
    agged.select(col(key) +: col("min_v") +: outs: _*)
  }

  /** At-scale profiling for ARBITRARY doubles: approximate distinct
    * counts (HyperLogLog++) and quantiles (GK summaries) — bounded
    * memory, single pass, mergeable partials, any value domain. The
    * complement to [[valueStats]], whose exactness is bought with the
    * 2-decimal contract; this one trades bounded relative error for no
    * contract at all. Sketches are engine-specific, so this operator is
    * verified by error-bound specs against exact answers, not by the
    * DuckDB hash oracle. */
  def approxProfile(df: DataFrame, key: String, measure: String,
                    ps: Seq[Double], relativeSD: Double = 0.02,
                    accuracy: Int = 10000): DataFrame =
    df.groupBy(col(key))
      .agg(
        count(col(measure)).as("n"),
        approx_count_distinct(col(measure), relativeSD).as("approx_distinct"),
        percentile_approx(col(measure),
          array(ps.map(lit): _*), lit(accuracy)).as("approx_ps"))

  /** A6 `maxBy` arg-max (`TopSpeedWindowing.scala:115`): the WHOLE record
    * holding the per-key max of `measure`. Ties broken by `tieBreak`
    * descending so the result is deterministic (Flink's maxBy keeps the
    * first-seen max; a stable tiebreak is the batch-checkable analogue). */
  def maxBy(df: DataFrame, key: String, measure: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(measure).desc, col(tieBreak).desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
