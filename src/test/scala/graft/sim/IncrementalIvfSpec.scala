package graft.sim

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.core.Tables

/** Streaming twin of q_ivf_incremental (r17 verdict stretch item 8):
  * the oracle-checked batch query replays the arrival fold over
  * contiguous vec_id epochs; here the SAME epochs arrive as real
  * Structured Streaming micro-batches and foreachBatch folds each one
  * through [[Similarity.IncrementalIvfState.update]] — the exact state
  * (quantized long sums + counts) must match the batch fold row for
  * row, and the refresh must demonstrably move the centroids off their
  * seeds. */
class IncrementalIvfSpec extends SparkSuite {
  import spark.implicits._

  test("foreachBatch epoch folds land on the batch fold's exact state") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val expected = Similarity.incrementalCentroidState(emb, nlist = 16, chunks = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

    val data = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val n = data.map(_._1).max + 1
    val span = math.ceil(n.toDouble / 3).toLong

    val state = Similarity.incrementalIvfState(emb, nlist = 16)
    val seeds = state.centroids.map { case (c, v) => (c, v.clone()) }
    val stream = MemoryStream[(Long, Array[Float])](spark)
    val q = stream.toDS().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) state.update(df))
      .start()
    try {
      for (c <- 0L until 3L) {
        val epoch = data.filter { case (id, _) => id >= c * span && id < (c + 1) * span }
        stream.addData(epoch.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = state.stateDf(spark)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(streamed.length === 16 * 64)
    assert(streamed === expected)
    // the refresh is live: at least one centroid moved off its seed
    // (it is now a quantized-scale running mean)
    val moved = state.centroids.zip(seeds).count { case ((_, now), (_, s0)) =>
      !java.util.Arrays.equals(now, s0) }
    assert(moved > 0, "no centroid refreshed")
    // every member was folded exactly once
    assert(streamed.map(_._4).distinct.sorted.sum > 0)
    val totalMembers = streamed.filter(_._2 == 0).map(_._4).sum
    assert(totalMembers === n)
  }
}
