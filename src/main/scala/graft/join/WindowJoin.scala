package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.agg.Aggregations.windowBucket

/** J1: windowed stream-stream inner equi-join (SURVEY.md §2.6;
  * `WindowJoin.scala:85-95`).
  *
  * Flink buffers both sides per tumbling window and emits the cross
  * product of key matches when the window fires (m×n multiplicity on
  * duplicate keys). Batch-equivalently: inner join on
  * `key AND window_bucket`, which Spark plans as a single hash-partition
  * shuffle on (key is enough — bucket rides along) with AQE free to pick
  * broadcast if one side is small. At 100 TB both sides shuffle on the
  * join key; adding the bucket to the join key would NOT reduce the
  * shuffle (same partitioning), so we shuffle on the key alone and let
  * the bucket equality be evaluated in the join condition.
  */
object WindowJoin {

  /** Grade⋈Salary analogue over the events table: two event_type slices
    * joined per user within the same tumbling window. Both slice filters
    * are pushed down to the parquet scan. */
  def eventSliceJoin(events: DataFrame, typeA: String, typeB: String,
                     windowSec: Long): DataFrame = {
    val a = events.filter(col("event_type") === typeA)
      .select(col("user_id"),
        windowBucket(col("ts_sec"), windowSec).as("wb"),
        col("value").as("grade"),
        col("event_id").as("a_id"))
    val b = events.filter(col("event_type") === typeB)
      .select(col("user_id").as("b_user_id"),
        windowBucket(col("ts_sec"), windowSec).as("b_wb"),
        col("value").as("salary"),
        col("event_id").as("b_id"))
    a.join(b, a("user_id") === b("b_user_id") && a("wb") === b("b_wb"), "inner")
      // Person(name, grade, salary) projection (`WindowJoin.scala:94`)
      .select(col("user_id"), col("wb").as("wstart_sec"),
        col("a_id"), col("b_id"), col("grade"), col("salary"))
  }

  /** RANGE join: pairs of A/B events for the same key within
    * `maxGapSec` of each other (|ts_a − ts_b| <= gap) — the "what
    * happened near this event" join a naive formulation computes as a
    * per-key cross product with a non-equi filter (Spark plans that as
    * BroadcastNestedLoop or a full key-group cross — quadratic in hot
    * keys).
    *
    * Scale formulation: bucket time into `maxGapSec`-wide slots; a pair
    * within the gap is at most one slot apart, so replicating the B side
    * into its slot and both neighbors turns the range predicate into an
    * EQUI join on (key, slot) + an exact residual filter. Replication
    * factor 3 instead of a cross product; each qualifying pair matches
    * exactly once (A keeps its single slot, B's three replicas are
    * distinct slots). The residual keeps only |Δts| <= gap. */
  def eventRangeJoin(events: DataFrame, typeA: String, typeB: String,
                     maxGapSec: Long): DataFrame = {
    // exact integer FLOOR division, not `div`: `div` truncates toward
    // zero, so slots -1 and 0 would each span ~2 gap widths around t=0
    // and the one-slot-adjacency argument (hence recall) breaks for
    // negative timestamps. x - pmod(x, g) is exactly divisible by g, so
    // the `div` afterwards is exact division — no doubles involved.
    val slot = (c: String) =>
      expr(s"($c - ($c % $maxGapSec + $maxGapSec) % $maxGapSec) div $maxGapSec")
    val a = events.filter(col("event_type") === typeA)
      .select(col("user_id"), col("ts_sec").as("a_ts"),
        col("event_id").as("a_id"), slot("ts_sec").as("slot"))
    val b0 = events.filter(col("event_type") === typeB)
      .select(col("user_id").as("b_user_id"), col("ts_sec").as("b_ts"),
        col("event_id").as("b_id"))
    val b = b0.select(col("b_user_id"), col("b_ts"), col("b_id"),
      explode(array(slot("b_ts") - 1, slot("b_ts"), slot("b_ts") + 1)).as("slot"))
    a.join(b, a("user_id") === b("b_user_id") && a("slot") === b("slot"))
      .filter(abs(col("a_ts") - col("b_ts")) <= maxGapSec)
      .select(col("user_id"), col("a_id"), col("b_id"),
        col("a_ts"), col("b_ts"))
  }
}
