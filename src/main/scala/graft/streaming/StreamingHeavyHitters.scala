package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  def fn(k: Int)(bucket: Int, rows: Iterator[BucketItem],
                 state: GroupState[(Map[String, Long], Long)]): Iterator[Candidate] = {
    val prev = state.getOption.getOrElse((Map.empty[String, Long], 0L))
    val (counters, n) = advance(prev, rows.map(_.item).toSeq, k)
    state.update((counters, n))
    val live = counters.map { case (item, c) => Candidate(bucket, item, c, n) }
    val tombstones = (prev._1.keySet -- counters.keySet)
      .map(item => Candidate(bucket, item, 0L, n))
    (live ++ tombstones).toSeq.sortBy(_.item).iterator
  }

  /** Items (one string column named `item`) → live candidate sets.
    * Works on batch and streaming datasets alike (streaming callers use
    * update output mode). */
  def run(items: Dataset[String], k: Int, buckets: Int): Dataset[Candidate] = {
    require(k >= 2 && buckets >= 1)
    import items.sparkSession.implicits._
    items.toDF("item")
      .select(xxhash64($"item").mod(buckets).cast("int").as("bucket"), $"item")
      // xxhash64 can be negative; mod keeps sign in Spark → normalize
      .withColumn("bucket", (($"bucket" % buckets) + buckets) % buckets)
      .as[BucketItem]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn(k))
  }
}
