package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.agg.HeavyHitters

/** Streaming heavy hitters: the unbounded twin of
  * [[graft.agg.HeavyHitters]]. Batch gets exactness from a second
  * recount pass; a stream has no second pass, so the streaming form
  * reports the live Misra-Gries candidate set with its guarantees made
  * explicit instead: after N items, every item with true count > N/k is
  * IN the set, and each reported count is a lower bound undercounting by
  * at most N_bucket/k.
  *
  * Sharding: items hash to one of `buckets` lanes (xxhash64 — stable
  * across restarts, so state re-keys correctly from a checkpoint).
  * Every occurrence of an item lands in the SAME lane, so the per-lane
  * MG guarantee applies to the item's FULL count, and lanes only
  * tighten the error bound (N_bucket <= N) while giving the operator
  * the same keyed-state parallelism story as every stateful op here:
  * one sketch of at most k-1 counters per lane, hash-partitioned across
  * executors, bounded regardless of stream length or item cardinality.
  *
  * Folding batch after batch through the same counters IS Misra-Gries
  * of the concatenated stream (it is a one-pass algorithm); the state
  * transition is [[HeavyHitters.mgFold]], the identical core the batch
  * operator runs per partition — the two formulations cannot diverge.
  *
  * Emission (update mode): each trigger emits the lane's full current
  * candidate set PLUS a tombstone (lower_bound = 0) for every item that
  * fell out of the sketch since the previous trigger — without the
  * tombstones, a keep-latest-per-key consumer would retain stale
  * candidates forever (the same reason update-mode aggregations re-emit
  * changed keys). A consumer keeps the latest row per (bucket, item),
  * filters lower_bound > 0, and can trigger the batch recount over cold
  * storage whenever exact figures are needed (the lambda-architecture
  * handoff).
  */
object StreamingHeavyHitters {

  case class BucketItem(bucket: Int, item: String)
  case class Candidate(bucket: Int, item: String, lower_bound: Long,
                       bucket_n: Long)

  /** Pure state transition: fold the batch through the lane's counters.
    * State per lane: the counter map (<= k-1 entries) and the lane's
    * item count so far (the error-bound denominator). */
  def advance(state: (Map[String, Long], Long), items: Seq[String],
              k: Int): (Map[String, Long], Long) = {
    val counters = scala.collection.mutable.HashMap.from(state._1)
    HeavyHitters.mgFold(counters, items.iterator, k)
    (counters.toMap, state._2 + items.size)
  }

  /** Shared per-trigger emission: the lane's live candidates plus a
    * tombstone per item that fell out since the previous trigger — ONE
    * definition consumed by both state APIs, so their update streams
    * cannot diverge. */
  private def emit(bucket: Int, prevCounters: Map[String, Long],
                   counters: Map[String, Long], n: Long): Iterator[Candidate] = {
    val live = counters.map { case (item, c) => Candidate(bucket, item, c, n) }
    val tombstones = (prevCounters.keySet -- counters.keySet)
      .map(item => Candidate(bucket, item, 0L, n))
    (live ++ tombstones).toSeq.sortBy(_.item).iterator
  }

  def fn(k: Int)(bucket: Int, rows: Iterator[BucketItem],
                 state: GroupState[(Map[String, Long], Long)]): Iterator[Candidate] = {
    val prev = state.getOption.getOrElse((Map.empty[String, Long], 0L))
    val (counters, n) = advance(prev, rows.map(_.item).toSeq, k)
    state.update((counters, n))
    emit(bucket, prev._1, counters, n)
  }

  /** Lane assignment shared by both runtimes: xxhash64 (restart-stable)
    * normalized into [0, buckets) — Spark's % keeps the sign. */
  private def bucketed(items: Dataset[String], buckets: Int): Dataset[BucketItem] = {
    import items.sparkSession.implicits._
    items.toDF("item")
      .select(xxhash64($"item").mod(buckets).cast("int").as("bucket"), $"item")
      .withColumn("bucket", (($"bucket" % buckets) + buckets) % buckets)
      .as[BucketItem]
  }

  /** Items (one string column named `item`) → live candidate sets.
    * Works on batch and streaming datasets alike (streaming callers use
    * update output mode). */
  def run(items: Dataset[String], k: Int, buckets: Int): Dataset[Candidate] = {
    require(k >= 2 && buckets >= 1)
    import items.sparkSession.implicits._
    bucketed(items, buckets)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn(k))
  }

  /** v2-state twin state record: ValueState needs a Product encoder. */
  case class LaneState(counters: Map[String, Long], n: Long)

  /** The same operator on Spark 4's arbitrary-state v2 API
    * (`transformWithState` + `StatefulProcessor` + typed `ValueState`) —
    * the per-state-variable runtime with TTL/timer support and RocksDB
    * changelog checkpointing at scale. Wraps the SAME [[advance]] fold
    * and [[emit]] projection as the v1 path, so the spec can assert the
    * two APIs produce identical candidate sets AND tombstones, batch and
    * stream (the established twin pattern: TopSpeed, RunningCount). */
  class HeavyHittersProcessor(k: Int)
      extends StatefulProcessor[Int, BucketItem, Candidate] {
    @transient private var state: ValueState[LaneState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[LaneState]("mgLaneState",
        Encoders.product[LaneState], TTLConfig.NONE)
    override def handleInputRows(bucket: Int, rows: Iterator[BucketItem],
                                 timerValues: TimerValues): Iterator[Candidate] = {
      val prev = Option(state.get()).getOrElse(LaneState(Map.empty, 0L))
      val (counters, n) = advance((prev.counters, prev.n),
        rows.map(_.item).toSeq, k)
      state.update(LaneState(counters, n))
      emit(bucket, prev.counters, counters, n)
    }
  }

  /** [[run]]'s twin on the v2 state API. */
  def runTws(items: Dataset[String], k: Int, buckets: Int): Dataset[Candidate] = {
    require(k >= 2 && buckets >= 1)
    import items.sparkSession.implicits._
    // batch transformWithState needs the StateStoreCoordinator RPC
    // endpoint, bootstrapped by touching the StreamingQueryManager
    // (same workaround as TopSpeed.runTws)
    items.sparkSession.streams
    bucketed(items, buckets)
      .groupByKey(_.bucket)
      .transformWithState(new HeavyHittersProcessor(k),
        TimeMode.None(), OutputMode.Update)
  }
}
