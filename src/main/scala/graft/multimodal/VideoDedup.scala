package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Video-clip near-duplicate detection: per-frame perceptual hashes
  * over [[Multimodal.FrameContainer]] payloads, clip similarity by
  * SHARED-FRAME counting — the frame-level analogue of the text
  * layer's dupSpanCoverage ("how much of this clip is content seen in
  * that clip"), completing the image/audio/video multimodal dedup
  * triad. A re-encoded clip (every frame brightness-shifted) shares
  * ALL frame hashes with its source — byte-exact dedup sees nothing;
  * a trimmed or re-cut clip shares a subset, which the integer
  * (shared, n_a, n_b) output quantifies (consumers divide for
  * containment/Jaccard downstream — the surface stays hash-exact).
  *
  * Scale shape: container parse + per-frame decode + dHash is
  * map-side (zero shuffle, one long per frame out); the pair stage
  * groups by EXACT frame hash (dHash already absorbed the perceptual
  * variation) with the standard maxBucket skew guard — a degenerate
  * hash (flat black frames) cannot quadratically explode the stage —
  * then one keyed aggregation counts shared hashes per pair. No
  * all-pairs stage at any scale. */
object VideoDedup {

  /** Map-side: parse each container, decode each frame as BMP, hash —
    * (doc_id, frame_id, dhash). Corrupt containers and undecodable or
    * too-small frames drop here (quarantine via
    * [[Multimodal.explodeContainerFrames]] upstream if needed). */
  def videoFrameHashes(spark: SparkSession, videos: DataFrame): DataFrame = {
    import spark.implicits._
    videos.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Multimodal.FrameContainer.parseContainer(bytes) match {
          case Left(_) => Iterator.empty
          case Right(frames) =>
            frames.iterator.zipWithIndex.flatMap { case (f, i) =>
              ImageDedup.dhash(f).map(h => (id, i, h))
            }
        }
      }
      .toDF("doc_id", "frame_id", "dhash")
  }

  /** Shared-frame pair counts over (doc_id, ..., dhash) frame hashes:
    * for every clip pair sharing ≥ `minShared` DISTINCT frame hashes,
    * emit (doc_a, doc_b, shared_frames, n_a, n_b) — all integers.
    * Hashes shared by more than `maxBucket` clips are skipped (the
    * flat-frame skew guard, mirrored in the oracle).
    *
    * `maxBucket` is capped at 10⁴: one hash at the cap emits
    * C(maxBucket, 2) pairs from a single flatMapGroups call, and those
    * pairs land in the downstream (doc_a, doc_b) aggregation's tasks —
    * at 10⁴ that is ≤ 5·10⁷ bounded rows; a caller raising it to 10⁵
    * would mint a 5·10⁹-row hot task. Above the cap the right tool is
    * the containment gate ([[incrementalVideoNearDup]]), which never
    * materializes pairs. */
  def videoSharedFrames(frameHashes: DataFrame, minShared: Int = 2,
                        maxBucket: Int = 1000): DataFrame = {
    require(minShared >= 1 && maxBucket >= 2,
      s"minShared >= 1 and maxBucket >= 2 required: $minShared, $maxBucket")
    require(maxBucket <= 10000,
      s"maxBucket $maxBucket > 10000: C(maxBucket,2) pairs per degenerate " +
        "frame hash would concentrate in one reducer task; use the " +
        "incremental containment gate for corpora needing larger buckets")
    val spark = frameHashes.sparkSession
    import spark.implicits._
    // distinct (clip, hash): a frame repeated WITHIN a clip counts once
    // — set semantics, like shingle sets
    val dp = frameHashes.select(col("doc_id"), col("dhash")).distinct()
    val sizes = dp.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = dp.as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (_, it) =>
        val ids = it.map(_._1).take(maxBucket + 1).toArray
        if (ids.length > maxBucket || ids.length < 2) Iterator.empty
        else {
          java.util.Arrays.sort(ids)
          for {
            i <- ids.indices.iterator
            j <- (i + 1 until ids.length).iterator
          } yield (ids(i), ids(j))
        }
      }
      .toDF("doc_a", "doc_b")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared_frames"),
        col("n_a"), col("n_b"))
  }

  /** Ingest-time video gate with CONTAINMENT semantics — the clip form
    * of the band-store gates, but counting, not set membership: one
    * shared frame must NOT drop a distinct clip (a common intro frame
    * would nuke a whole corpus), so a new clip is rejected only when
    * ≥ `minSharedNum`/`minSharedDen` of its DISTINCT frame hashes are
    * already seen — in the cross-run frame-hash store or in an
    * earlier-id clip of the same batch. Integer cross-multiplied
    * threshold (drop iff shared·den ≥ num·n), no doubles. Clips with
    * zero decodable frames pass (quarantine upstream), mirroring the
    * other gates' no-evidence contract.
    *
    * Scale shape: one exchange on frame hash (min-doc + store
    * semi-mark), one on doc_id (the count); no pair stage at all —
    * the gate never materializes clip pairs, unlike
    * [[videoSharedFrames]] (the offline audit). */
  def incrementalVideoNearDup(spark: SparkSession, newVideos: DataFrame,
                              seenFrameHashes: DataFrame,
                              minSharedNum: Int = 1,
                              minSharedDen: Int = 2): DataFrame = {
    require(minSharedNum >= 1 && minSharedDen >= minSharedNum)
    val fh = videoFrameHashes(spark, newVideos)
      .select(col("doc_id"), col("dhash")).distinct()
    // first_doc as a window over the SAME dhash partitioning instead of
    // a separate aggregate + rejoin (r20): the old shape consumed `fh`
    // twice, so the whole container-decode + per-frame dHash pipeline
    // executed twice per gate; now one pass, and the store join rides
    // the window's exchange.
    val store = seenFrameHashes.select(col("fhash").as("dhash")).distinct()
      .withColumn("__instore", lit(1))
    val marked = fh
      .withColumn("first_doc", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("dhash"))))
      .join(store, Seq("dhash"), "left")
      .withColumn("hit",
        when(col("__instore").isNotNull ||
          col("first_doc") < col("doc_id"), 1L).otherwise(0L))
    val dropped = marked.groupBy(col("doc_id"))
      .agg(sum(col("hit")).as("shared"), count(lit(1)).as("n"))
      .filter(col("shared") * minSharedDen >= col("n") * minSharedNum)
      .select("doc_id")
    newVideos.join(dropped, Seq("doc_id"), "left_anti")
  }

  /** The (doc_id, fhash) frame-hash frame for store persistence —
    * kept AND dropped clips' frames are seen content. */
  def videoFrameStoreKeys(spark: SparkSession, videos: DataFrame): DataFrame =
    videoFrameHashes(spark, videos)
      .select(col("doc_id"), col("dhash").as("fhash")).distinct()

  /** foreachBatch sink, same idempotent-replay shape as the band-store
    * sinks: per-batch overwrite subdirs, store read excludes the
    * batch's own partition, kept frame checkpointed before the writes.
    * The store holds bare frame hashes per batch partition; compaction
    * is a distinct over (fhash) — set semantics again at the FRAME
    * level, so `Layout.compact`-style maintenance applies. */
  def incrementalVideoSink(out: String, minSharedNum: Int = 1,
                           minSharedDen: Int = 2)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val storeDir = s"$out/store"
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val storeExists = storePath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(storePath)
    val seen =
      if (storeExists)
        spark.read.parquet(storeDir)
          .filter(col("batch") =!= batchId)
          .select("fhash")
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "fhash", org.apache.spark.sql.types.LongType))))
    val stable = batch.localCheckpoint(true)
    val kept = incrementalVideoNearDup(spark, stable, seen,
      minSharedNum, minSharedDen).localCheckpoint(true)
    kept.write.mode("overwrite").parquet(s"$out/data/batch=$batchId")
    videoFrameStoreKeys(spark, stable).select("fhash").distinct()
      .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
  }

  /** Deterministic video corpus off the documents table: each doc packs
    * `frames` synthetic 36×32 BMP frames into a GFC1 container; frame f
    * draws pixel p from text byte (f·997 + p) mod len (997 coprime to
    * the frame size decorrelates frames), v = 32 + (byte mod 192).
    * Every doc with doc_id ≡ 0 (mod `shiftEvery`) also emits a
    * "re-encode": ALL frames brightness-shifted by `shiftDelta` at
    * doc_id + `copyOffset` (same gradients ⇒ same frame hashes, all
    * bytes differ); every doc with doc_id ≡ 1 (mod `shiftEvery`) emits
    * a TRIMMED copy (first frame dropped) — the partial-overlap case
    * whose shared count is n−1. */
  def synthDocVideos(documents: DataFrame, frames: Int = 4,
                     width: Int = 36, height: Int = 32,
                     shiftEvery: Int = 7, shiftDelta: Int = 8,
                     copyOffset: Long = 1L << 42): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val n = width * height
        def frame(f: Int, delta: Int): Array[Byte] = {
          val gray = new Array[Int](n)
          var p = 0
          while (p < n) {
            val b = if (bytes.isEmpty) 0 else bytes((f * 997 + p) % bytes.length) & 0xff
            gray(p) = 32 + b % 192 + delta
            p += 1
          }
          ImageDedup.packBmpGray24(width, height, gray)
        }
        def container(delta: Int, dropFirst: Boolean): Array[Byte] =
          Multimodal.FrameContainer.packContainer(
            (if (dropFirst) 1 until frames else 0 until frames)
              .map(f => frame(f, delta)))
        val base = (id, container(0, dropFirst = false))
        if (id % shiftEvery == 0)
          Iterator(base, (id + copyOffset, container(shiftDelta, dropFirst = false)))
        else if (id % shiftEvery == 1)
          Iterator(base, (id + copyOffset, container(0, dropFirst = true)))
        else Iterator.single(base)
      }
      .toDF("doc_id", "payload")
  }
}
