package graft.sim

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{avg, col, max}

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

  private def stateRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

  test("checkpoint persist + restore resumes the fold exactly (r18 item 5)") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val expected = stateRows(
      Similarity.incrementalCentroidState(emb, nlist = 16, chunks = 3))

    // interrupted fold: 2 of 3 epochs, parquet checkpoint, restore into
    // a FRESH state object, fold the third epoch there
    val n = emb.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
    val span = math.ceil(n.toDouble / 3).toLong
    val live = Similarity.incrementalIvfState(emb, nlist = 16)
    for (c <- 0L until 2L)
      live.update(emb.filter(col("vec_id") >= c * span &&
        col("vec_id") < math.min(n, (c + 1) * span)))
    val ckpt = Files.createTempDirectory("ivf_ckpt").resolve("state").toString
    live.saveCheckpoint(spark, ckpt)
    val restored = Similarity.restoreIncrementalIvfState(spark.read.parquet(ckpt))

    // the restored index refreshes to the SAME centroids the live state
    // serves (exact integer-ratio doubles — bitwise, not approximate)
    assert(restored.centroids.length === live.centroids.length)
    restored.centroids.zip(live.centroids).foreach { case ((rc, rv), (lc, lv)) =>
      assert(rc === lc)
      assert(java.util.Arrays.equals(rv, lv), s"centroid $rc diverged on restore")
    }

    restored.update(emb.filter(col("vec_id") >= 2 * span && col("vec_id") < n))
    assert(stateRows(restored.stateDf(spark)) === expected,
      "resumed 3-epoch state != uninterrupted 3-epoch state")

    // and SERVING through the resumed index equals serving through the
    // uninterrupted fold's index
    val servedResumed = Similarity
      .ivfTopKWith(emb, restored.centroids, nQueries = 5, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .sortBy(t => (t._1, t._3))
    val servedFresh = Similarity
      .incrementalIvfTopK(emb, nQueries = 5, k = 5, nlist = 16, chunks = 3,
        nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .sortBy(t => (t._1, t._3))
    assert(servedResumed === servedFresh)
  }

  test("decay halves the running state exactly (truncation toward zero) and " +
    "the decayed fold is recency-weighted, not cumulative") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val live = Similarity.incrementalIvfState(emb, nlist = 16)
    live.update(emb.filter(col("vec_id") < 400))
    val before = stateRows(live.stateDf(spark))
    live.decay()
    val after = stateRows(live.stateDf(spark))
    before.zip(after).foreach { case ((c1, i1, s1, n1), (c2, i2, s2, n2)) =>
      assert(c1 === c2 && i1 === i2)
      assert(s2 === s1 / 2, s"sum at ($c1,$i1): $s1 -> $s2") // Long / truncates
      assert(n2 === n1 / 2)
    }

    val cum = stateRows(
      Similarity.incrementalCentroidState(emb, nlist = 16, chunks = 3))
    val dec = stateRows(
      Similarity.decayedCentroidState(emb, nlist = 16, chunks = 3))
    assert(dec !== cum, "decayed fold collapsed to the cumulative fold")
    // the decayed state weighs old epochs at half per epoch of age, so
    // its total member count is strictly below the cumulative fold's
    // (which counts every vector once) but still positive
    val totalCum = cum.filter(_._2 == 0).map(_._4).sum
    val totalDec = dec.filter(_._2 == 0).map(_._4).sum
    assert(totalDec > 0 && totalDec < totalCum,
      s"decayed members $totalDec vs cumulative $totalCum")
  }

  test("decayed fold streaming twin lands on the batch decayed state") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val expected = stateRows(
      Similarity.decayedCentroidState(emb, nlist = 16, chunks = 3))

    val data = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val n = data.map(_._1).max + 1
    val span = math.ceil(n.toDouble / 3).toLong

    val state = Similarity.incrementalIvfState(emb, nlist = 16)
    var folded = 0
    val stream = MemoryStream[(Long, Array[Float])](spark)
    val q = stream.toDS().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) {
          // decay BETWEEN epochs, exactly like the batch fold: every
          // epoch after the first halves the prior state first
          if (folded > 0) state.decay()
          state.update(df)
          folded += 1
        }
      }
      .start()
    try {
      for (c <- 0L until 3L) {
        stream.addData(data.filter { case (id, _) =>
          id >= c * span && id < (c + 1) * span }.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(stateRows(state.stateDf(spark)) === expected,
      "streamed decayed fold != batch decayed fold")
  }

  test("restore rejects a truncated or cid-dropped checkpoint (r19 advisory 1)") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val live = Similarity.incrementalIvfState(emb, nlist = 16)
    live.update(emb.filter(col("vec_id") < 400))
    val full = live.checkpointDf(spark).cache()

    // a single dropped (cid, i) row — the silent-zero-sums corruption —
    // must fail loudly, not restore
    val oneRowShort = full.filter(!(col("cid") === 3L && col("i") === 7))
    val e1 = intercept[IllegalArgumentException] {
      Similarity.restoreIncrementalIvfState(oneRowShort)
    }
    assert(e1.getMessage.contains("damaged"), e1.getMessage)

    // an entire missing cid (partially-written multi-part file) too
    val cidShort = full.filter(col("cid") =!= 5L)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.restoreIncrementalIvfState(cidShort)
    }
    assert(e2.getMessage.contains("damaged"), e2.getMessage)

    // and the untouched checkpoint still restores bitwise
    val ok = Similarity.restoreIncrementalIvfState(full)
    ok.centroids.zip(live.centroids).foreach { case ((rc, rv), (lc, lv)) =>
      assert(rc === lc && java.util.Arrays.equals(rv, lv))
    }
    full.unpersist()
  }

  /** The r19 verdict item 2: the resume spec above drives
    * persist/restore manually; this one kills the ACTUAL streaming
    * query mid-fold and resumes BOTH checkpoints together — Spark's
    * source/commit checkpoint (checkpointLocation) and the IVF state
    * parquet — then asserts the final state equals the uninterrupted
    * fold. The foreachBatch is the idempotent-resume pattern a real
    * deployment needs: the IVF checkpoint is written to a
    * batchId-tagged directory AFTER the fold, the restart restores
    * from the highest tag and skips any batch Spark replays at or
    * below it (a crash between fold and commit replays that batch). */
  test("streaming restart resumes source checkpoint + IVF state together (r19 item 2)") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val expected = stateRows(
      Similarity.incrementalCentroidState(emb, nlist = 16, chunks = 3))

    val data = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val n = data.map(_._1).max + 1
    val span = math.ceil(n.toDouble / 3).toLong
    def epoch(c: Long) =
      data.filter { case (id, _) => id >= c * span && id < (c + 1) * span }

    val work = Files.createTempDirectory("ivf_restart")
    val ckptLoc = work.resolve("spark_ckpt").toString
    val ivfDir = work.resolve("ivf")
    Files.createDirectories(ivfDir)
    def savedBatches: Seq[Long] = {
      val s = Files.list(ivfDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("b")).map(_.drop(1).toLong).toSeq
      finally s.close()
    }

    val stream = MemoryStream[(Long, Array[Float])](spark)
    def startFolding(state: Similarity.IncrementalIvfState,
                     foldedThrough: Long) = {
      var last = foldedThrough
      stream.toDS().toDF("vec_id", "embedding")
        .writeStream
        .option("checkpointLocation", ckptLoc)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
          if (bid > last && !df.isEmpty) {
            state.update(df)
            state.saveCheckpoint(spark, ivfDir.resolve(s"b$bid").toString)
            last = bid
          }
        }
        .start()
    }

    // phase 1: fold epochs 0 and 1, then KILL the query
    val s1 = Similarity.incrementalIvfState(emb, nlist = 16)
    val q1 = startFolding(s1, -1L)
    try {
      for (c <- 0L until 2L) { stream.addData(epoch(c).toSeq); q1.processAllAvailable() }
    } finally q1.stop()

    // phase 2: restore the IVF state from the highest committed tag,
    // restart the SAME source checkpoint, feed the final epoch
    val maxBid = savedBatches.max
    val restored = Similarity.restoreIncrementalIvfState(
      spark.read.parquet(ivfDir.resolve(s"b$maxBid").toString))
    val q2 = startFolding(restored, maxBid)
    try {
      stream.addData(epoch(2L).toSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    // a NEW batch id was assigned after restart (the source checkpoint
    // resumed rather than replaying from scratch), and the resumed
    // state equals the uninterrupted 3-epoch fold
    assert(savedBatches.max > maxBid,
      s"no new batch after restart (saved: $savedBatches)")
    assert(stateRows(restored.stateDf(spark)) === expected,
      "restarted stream + restored IVF checkpoint != uninterrupted fold")
  }

  /** Online-vs-offline index QUALITY (r18 verdict item 4):
    * q_ivf_incremental proves the fold is exact arithmetic; this
    * measures whether the incrementally-refreshed centroids SEARCH as
    * well as trainCentroids' offline Lloyd rounds. Same clustered
    * synthetic regime as IvfCurveSpec (noise 0.9: true neighbors leak
    * across list boundaries, so centroid quality actually moves
    * recall); recall is against brute-force ground truth via the one
    * shared annRecall definition. Curve ships as
    * ANN_ONLINE_CURVE.json. */
  test("incremental centroids search within a band of offline Lloyd (curve recorded)") {
    val nlist = 64
    val nQ = 20
    val k = 10
    val emb = Similarity.syntheticEmbeddings(spark, 20000L, 32,
      nClusters = 64, seed = 20260812L, noise = 0.9).cache()
    val truth = Similarity.bruteForceTopK(emb, nQ, k).cache()
    def recallOf(cents: Array[(Long, Array[Double])], nprobe: Int): Double =
      Similarity.annRecall(truth,
          Similarity.ivfTopKWith(emb, cents, nQ, k, nprobe))
        .agg(avg(col("recall"))).collect()(0).getDouble(0)

    val trained = Similarity.trainCentroids(emb, nlist, iters = 3)
    val probes = Seq(1, 4)
    val chunkCounts = Seq(2, 4, 8)
    val trainedRec = probes.map(np => np -> recallOf(trained, np)).toMap
    val online = for {
      chunks <- chunkCounts
      cents = Similarity.incrementalIvfCentroids(emb, nlist, chunks)
      np <- probes
    } yield (chunks, np, recallOf(cents, np))

    val pts = probes.map(np =>
      f"""{"variant":"offline_lloyd3","nprobe":$np,"mean_recall":${trainedRec(np)}%.4f}""") ++
      online.map { case (c, np, r) =>
        f"""{"variant":"online_fold","chunks":$c,"nprobe":$np,"mean_recall":$r%.4f}""" }
    Files.writeString(Paths.get("ANN_ONLINE_CURVE.json"),
      s"""{"corpus_n":20000,"dim":32,"n_queries":$nQ,"k":$k,"nlist":$nlist,""" +
        s""""points":${pts.mkString("[\n  ", ",\n  ", "\n]")}}""" + "\n")

    // Band: at equal nlist/nprobe the one-pass online fold gives up at
    // most 5 recall points against 3 offline Lloyd rounds, at every
    // measured chunk count. (Measured headroom is recorded in the
    // committed curve; the assert is the contract.)
    online.foreach { case (chunks, np, r) =>
      assert(r >= trainedRec(np) - 0.05,
        s"online fold (chunks=$chunks, nprobe=$np) recall $r fell more " +
          s"than 0.05 below offline ${trainedRec(np)}")
    }
    emb.unpersist(); truth.unpersist()
  }
}
