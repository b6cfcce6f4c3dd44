package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.util.LongAccumulator

import graft.SparkSuite
import graft.dedup.Dedup

/** Injection helper at file scope (NOT a suite method): the closures
  * below ship to executors, and an instance method would drag the
  * non-serializable ScalaTest engine along with `this`. */
private object RetryInject extends Serializable {

  /** Throws on the first attempt of partition 0; on a RETRY attempt of
    * partition 0 bumps `retried` instead. The accumulator counts only
    * successful retry attempts — user-accumulator updates from failed
    * tasks are discarded (countFailedValues=false), so counting inside
    * the throwing attempt would always read zero — and a retry attempt
    * exists iff attempt 0 actually failed, which is the fact the spec
    * must not pass vacuously without. */
  def injectOnce(retried: LongAccumulator): Unit = {
    val tc = TaskContext.get()
    if (tc != null && tc.partitionId() == 0) {
      if (tc.attemptNumber() == 0)
        throw new RuntimeException("injected transient failure (attempt 0)")
      retried.add(1L)
    }
  }
}

/** Retry-determinism under task re-execution (r13 verdict item 6).
  *
  * At 100 TB, task retries and speculative execution re-run partitions;
  * every hash-exact correctness claim silently assumes every operator's
  * output is a pure function of its input partition — a task attempt
  * that produces different rows the second time silently corrupts the
  * job instead of failing it. The suite session runs `local[n,2]`
  * (spark.task.maxFailures = 2), so these specs can inject a REAL
  * transient failure — first attempt of partition 0 throws, the retry
  * succeeds — and assert the final output is byte-identical to an
  * uninjected run. An accumulator proves a retry attempt actually ran
  * (no vacuous pass if scheduling changes).
  *
  * Covered paths, per the verdict's ask:
  *  - [[AsyncMap.orderedWait]] — the mapPartitions sliding-window loop
  *    with in-flight futures; the retry must replay the window from the
  *    partition start, preserving the per-partition ordering guarantee;
  *  - [[Dedup.minhashLshPairs]] → [[Dedup.pairEditDistance]] — a
  *    pair-materializing chain (shuffle + join downstream of the failed
  *    map stage), retried at the SOURCE so the recomputed partition
  *    feeds every stage above it.
  */
class RetryDeterminismSpec extends SparkSuite {
  import scala.concurrent.Future

  test("orderedWait output and order survive a task retry") {
    import spark.implicits._
    val in = spark.range(0, 4000, 1, 8).as[Long]
    val clean = AsyncMap.orderedWait(in)(x => Future.successful(x * 3 + 1)).collect().toSeq

    val fired = spark.sparkContext.longAccumulator("retries-observed-async")
    val retried = AsyncMap.orderedWait(in) { x =>
      RetryInject.injectOnce(fired)
      Future.successful(x * 3 + 1)
    }.collect().toSeq
    assert(fired.value >= 1L, "no retry attempt observed — the spec proved nothing")
    assert(retried === clean) // same rows, same per-partition order
  }

  /** 240 docs over 8 partitions, 40 distinct texts (so LSH buckets are
    * duplicate-dense and the pair set is non-trivial). `inject` wires
    * the transient failure into the SOURCE partitions. */
  private def docs(inject: Option[LongAccumulator]): DataFrame = {
    import spark.implicits._
    spark.range(0, 240, 1, 8).mapPartitions { it =>
      inject.foreach(RetryInject.injectOnce)
      it
    }.map { i =>
      val c = i % 40
      (i, s"doc class $c: the quick brown fox $c jumps over the lazy dog ${c * 7} again")
    }.toDF("doc_id", "text")
  }

  test("minhash LSH pairs + edit-distance verify survive a task retry") {
    val d0 = docs(None)
    val cleanPairs = Dedup.minhashLshPairs(d0, n = 3, k = 32, rowsPerBand = 4)
    val clean = Dedup.pairEditDistance(d0, cleanPairs, prefixLen = 40, maxDist = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(clean.nonEmpty, "fixture produced no candidate pairs — fixture bug")

    val fired = spark.sparkContext.longAccumulator("retries-observed-pairs")
    val d1 = docs(Some(fired))
    val pairs = Dedup.minhashLshPairs(d1, n = 3, k = 32, rowsPerBand = 4)
    val retried = Dedup.pairEditDistance(d1, pairs, prefixLen = 40, maxDist = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(fired.value >= 1L, "no retry attempt observed — the spec proved nothing")
    assert(retried === clean)
  }
}
