package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.agg.Aggregations.exactSum
import graft.ops.Tokenize

/** Structured Streaming twins of the batch operators (SURVEY.md §1.1:
  * "bounded runs = spark.read batch; unbounded runs = readStream with the
  * SAME transformation function applied to both").
  *
  * Every function here takes a DataFrame that may be batch OR streaming —
  * the transformations are identical; only source (`readStream`) and sink
  * (`writeStream` + output mode) differ at the call site:
  *
  *  - running word count (A4, `WordCount.java:82`): `outputMode("update")`
  *    emits the updated per-key count each micro-batch — the micro-batch
  *    analogue of Flink's per-record running emission.
  *  - windowed sum (A5/W1/W6, `SocketWindowWordCount.scala:64-66`):
  *    `withWatermark` + `window()`; append mode emits each window once
  *    the watermark passes its end (ascending timestamps ⇒ delay 0, the
  *    reference's `assignAscendingTimestamps` watermarking).
  *  - stream-stream windowed join (J1, `WindowJoin.scala:85-95`): both
  *    sides watermarked, equi-join on key + window bucket — Spark's
  *    symmetric-hash join state is pruned when the watermark passes the
  *    bucket, exactly the Flink window-buffer lifetime.
  *
  * State at scale: streaming aggregation/join state is hash-partitioned
  * by key across executors (StateStore per shuffle partition) — the same
  * partitioning story as the batch shuffles, so a 1000-executor cluster
  * shards state 1000 ways with no driver involvement.
  */
object StreamingTwins {

  /** A4 running word count — works on batch and streaming text alike.
    * Streaming callers use `outputMode("update")` (running emission) or
    * `complete` (full table refresh). */
  def runningWordCount(lines: DataFrame, textCol: String): DataFrame =
    Tokenize.wordCount(lines, textCol)

  /** A5/W1/W6 event-time tumbling windowed sum with watermark. `tsCol`
    * must be a TimestampType column. Output: wstart, key, sum_value.
    * Pass `slide` for a SLIDING (hopping) window: each event lands in
    * size/slide overlapping windows — the explode happens before the
    * shuffle, so partial aggregation still combines map-side, and the
    * streaming state is per (window, key) exactly like tumbling. */
  def windowedSum(df: DataFrame, tsCol: String, keyCol: String,
                  measureCol: String, windowSize: String,
                  watermarkDelay: String = "0 seconds",
                  slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), windowSize, s)
      case None => window(col(tsCol), windowSize)
    }
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(w.as("w"), col(keyCol))
      .agg(exactSum(col(measureCol)).as("sum_value"))
      .select(col("w.start").as("wstart"), col(keyCol), col("sum_value"))
  }

  /** J1 windowed stream-stream inner equi-join with dual watermarks:
    * cross product of key matches within the same tumbling window
    * (m×n multiplicity on duplicate keys, like Flink's window join).
    * Column layout mirrors the batch `WindowJoin.eventSliceJoin`. */
  def windowedJoin(grades: DataFrame, salaries: DataFrame,
                   tsCol: String, keyCol: String, windowSize: String,
                   watermarkDelay: String = "0 seconds"): DataFrame = {
    val g = grades.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol), window(col(tsCol), windowSize).as("gw"),
        col("grade"), col("g_id"))
    val s = salaries.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).as("s_key"), window(col(tsCol), windowSize).as("sw"),
        col("salary"), col("s_id"))
    g.join(s, col(keyCol) === col("s_key") && col("gw") === col("sw"), "inner")
      .select(col(keyCol), col("gw.start").as("wstart"),
        col("g_id"), col("s_id"), col("grade"), col("salary"))
  }

  /** INTERVAL stream-stream join — the precise time-range pairing the
    * tumbling-window join only approximates (a window join misses pairs
    * straddling a boundary; this one applies |ts_a − ts_b| <= gap
    * exactly, the streaming twin of `WindowJoin.eventRangeJoin`). The
    * two-sided time-bound range condition is what lets Spark derive a
    * state-eviction horizon from the watermarks: each side keeps only
    * `gap + delay` of history — bounded state, no window bucketing
    * error. Emits (key, a_id, b_id, a_ts, b_ts). */
  def intervalJoin(a: DataFrame, b: DataFrame, tsCol: String, keyCol: String,
                   gapSec: Long, watermarkDelay: String = "0 seconds"): DataFrame = {
    val l = a.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol), col(tsCol).as("a_ts"), col("a_id"))
    val r = b.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).as("b_key"), col(tsCol).as("b_ts"), col("b_id"))
    l.join(r,
        col(keyCol) === col("b_key") &&
          col("b_ts") >= col("a_ts") - expr(s"INTERVAL $gapSec SECONDS") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $gapSec SECONDS"))
      .select(col(keyCol), col("a_id"), col("b_id"), col("a_ts"), col("b_ts"))
  }

  /** LEFT OUTER windowed stream-stream join — an extension beyond the
    * reference (Flink's example joins inner only): unmatched left rows
    * are emitted with NULL right columns once the watermark passes their
    * window, bounding the wait exactly like the inner join bounds state.
    * Same column layout with nullable salary/s_id. */
  def windowedLeftJoin(grades: DataFrame, salaries: DataFrame,
                       tsCol: String, keyCol: String, windowSize: String,
                       watermarkDelay: String = "0 seconds"): DataFrame = {
    val g = grades.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol), window(col(tsCol), windowSize).as("gw"),
        col("grade"), col("g_id"))
    val s = salaries.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).as("s_key"), window(col(tsCol), windowSize).as("sw"),
        col("salary"), col("s_id"))
    g.join(s, col(keyCol) === col("s_key") && col("gw") === col("sw"), "left_outer")
      .select(col(keyCol), col("gw.start").as("wstart"),
        col("g_id"), col("s_id"), col("grade"), col("salary"))
  }

  /** FULL OUTER windowed stream-stream join (extension beyond the
    * reference's inner join, like [[windowedLeftJoin]]): unmatched rows
    * of EITHER side are emitted with NULLs once both watermarks pass
    * their window — bounded state, symmetric NULL-fill. The output key
    * is coalesced from whichever side exists. */
  def windowedFullJoin(grades: DataFrame, salaries: DataFrame,
                       tsCol: String, keyCol: String, windowSize: String,
                       watermarkDelay: String = "0 seconds"): DataFrame = {
    val g = grades.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).as("g_key"), window(col(tsCol), windowSize).as("gw"),
        col("grade"), col("g_id"))
    val s = salaries.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).as("s_key"), window(col(tsCol), windowSize).as("sw"),
        col("salary"), col("s_id"))
    g.join(s, col("g_key") === col("s_key") && col("gw") === col("sw"), "full_outer")
      .select(coalesce(col("g_key"), col("s_key")).as(keyCol),
        coalesce(col("gw.start"), col("sw.start")).as("wstart"),
        col("g_id"), col("s_id"), col("grade"), col("salary"))
  }

  /** Stream-static enrichment: each micro-batch of the stream joins the
    * STATIC dimension (the lookup-table pattern — user profiles, feature
    * stores, allow-lists). Stateless — no watermark, no streaming state:
    * the dim is broadcast to every executor once per batch, so a
    * 1000-executor cluster enriches without any shuffle of the stream
    * side. LEFT join: events without a dim row flow through with NULLs
    * (an inner join would silently drop them). Works identically on a
    * batch frame — the twin the spec asserts against. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), "left_outer")
}
