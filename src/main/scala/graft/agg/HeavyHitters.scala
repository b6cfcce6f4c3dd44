package graft.agg

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact phi-heavy hitters (items with count > N/k) without a full
  * per-item shuffle: per-partition Misra-Gries candidate generation,
  * then one exact recount restricted to the (tiny) candidate set.
  *
  * Why not just `groupBy(item).count()`? At 100 TB the item column
  * (tokens, URLs, user agents) can hold billions of distinct values; the
  * full groupBy shuffles a partial count for every distinct item per
  * partition. The sketch path shuffles at most (k-1) candidate strings
  * per partition regardless of cardinality, and the recount's map-side
  * partial agg only materializes counters for candidate items — shuffle
  * volume is bounded by k x partitions, not by vocabulary size.
  *
  * Correctness is NOT approximate: Misra-Gries with (k-1) counters
  * retains every item whose partition-local count exceeds n_p/k, and if
  * a global count exceeds N/k = (sum n_p)/k then some partition's local
  * count exceeds n_p/k (averaging argument) — so the candidate union is
  * a superset of the true heavy hitters. The recount then computes exact
  * counts for candidates only and applies the exact threshold
  * `cnt * k > N` (integer arithmetic, no doubles), discarding false
  * positives. Output is deterministic and identical to the full groupBy.
  *
  * Reference scope: corpus term statistics at the scale where
  * `TextAnalysis.termStats`' full token shuffle stops being free
  * (cf. WordCount.java:83-87 — the reference's streaming word count is
  * the same aggregation without the cardinality problem).
  */
object HeavyHitters {

  /** The Misra-Gries fold, continuable from existing counters (MG is a
    * one-pass streaming algorithm: folding batch after batch through the
    * same counters IS the sketch of the concatenated stream, which is
    * what lets [[graft.streaming.StreamingHeavyHitters]] reuse this core
    * as keyed state). Counter values are LOWER bounds, undercounting by
    * at most n/k of the items folded so far. */
  private[graft] def mgFold(counters: scala.collection.mutable.HashMap[String, Long],
                            it: Iterator[String], k: Int): Unit =
    it.foreach { item =>
      if (counters.contains(item)) counters(item) += 1L
      else if (counters.size < k - 1) counters(item) = 1L
      else {
        // decrement-all step; drop zeroed counters
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { key =>
          val c = counters(key) - 1L
          if (c == 0L) dead += key else counters(key) = c
        }
        dead.foreach(counters.remove)
      }
    }

  /** Per-partition Misra-Gries: classic k-1 counter sketch. Returns the
    * surviving candidate items (counts are NOT emitted — MG counts are
    * lower bounds and never used; the recount supplies exact ones). */
  private[agg] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = new scala.collection.mutable.HashMap[String, Long]
    mgFold(counters, it, k)
    counters.keysIterator.toSeq.iterator
  }

  /** Exact heavy hitters of `itemCol` (string): all items with
    * `count > N/k`, with their exact counts and corpus total. NULL items
    * are excluded (they are not an item; mirrors count(col) semantics).
    *
    * Plan: three column-pruned scans of `items` (candidate sketch, the
    * corpus total, recount — scans are the cheap currency here; shuffles
    * are what the sketch eliminates), one <= (k-1) x partitions
    * candidate distinct, one broadcast semi-join, one candidate-only
    * partial-agg shuffle, and a broadcast of the single-row total. No
    * stage's state or shuffle grows with item cardinality.
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame =
    heavyHittersFrom(items, itemCol, k, candidateSketch(items, itemCol, k))

  /** The per-RUN candidate state for cross-run heavy hitters: the
    * distinct Misra-Gries survivors, ≤ (k−1)·partitions rows. This is
    * the frame a scheduled pipeline PERSISTS per run (the band-store
    * pattern): the union of per-run candidate sets is a superset of the
    * combined corpus's true φ-heavy hitters — if a global count exceeds
    * N/k = (Σ n_r)/k, some run's count exceeds n_r/k (averaging over
    * runs), and within that run some partition's local count exceeds
    * n_p/k (averaging again), so the item survives that partition's
    * sketch. No counter arithmetic ever merges: candidates are the
    * whole state, and the recount supplies exact counts. */
  def candidateSketch(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"heavyHitters needs k >= 2, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    val vals = items.select(col(itemCol).cast("string"))
      .filter(col(itemCol).isNotNull)
    val candidates: Dataset[String] =
      vals.as[String].mapPartitions(it => misraGries(it, k))
    candidates.toDF(itemCol).distinct()
  }

  /** Exact recount + threshold over a given candidate set — the second
    * half of [[heavyHitters]], split out so cross-run callers can feed
    * the UNION of persisted per-run sketches (see [[candidateSketch]])
    * and still get the exact answer for the combined corpus. */
  def heavyHittersFrom(items: DataFrame, itemCol: String, k: Int,
                       candidates: DataFrame): DataFrame = {
    require(k >= 2, s"heavyHitters needs k >= 2, got $k")
    val vals = items.select(col(itemCol).cast("string"))
      .filter(col(itemCol).isNotNull)
    val total = vals.agg(count(lit(1)).as("n_total"))
    vals
      .join(broadcast(candidates), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      // integer-exact threshold: cnt > N/k without division
      .filter(col("cnt") * lit(k.toLong) > col("n_total"))
  }
}
