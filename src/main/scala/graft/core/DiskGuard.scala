package graft.core

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

/** Pre-flight scratch-space guard for long dump/oracle jobs (r12 verdict
  * item 3): two sessions died on mid-job disk exhaustion — the sf10
  * BATCH3 oracle FAILs, the CC-family sf100 aborts at hour two, and a
  * 42 GB orphaned DuckDB spill. The capacity signal already exists
  * (`Dedup.lshPairVolume` predicts the pair explode's cost in one
  * O(buckets) aggregate); this turns it into a refusal BEFORE any work
  * starts, naming the shortfall, instead of an `IOException: No space
  * left on device` after an hour of compute.
  *
  * Estimates, calibrated on measured failures, deliberately coarse:
  *  - pair-materializing queries: `candidates × 48 B` — the sf100 run
  *    put ~1.25e9 candidates through DISTINCT spill + edge cache +
  *    shuffle and exhausted >56 GB ⇒ ~45 B/candidate, rounded up;
  *  - everything else: the input directory's size once over — the r12
  *    sf100 non-pair suite's dumps and shuffle peaked well inside the
  *    corpus' own footprint.
  * The refusal gate is free < 1.5 × estimate (the verdict's margin).
  * GRAFT_DISK_GUARD=0 bypasses for deliberate experiments.
  */
object DiskGuard {

  /** Gated queries whose Verify dump materializes the minhash LSH
    * candidate class (directly or through the shared lsh_pairs /
    * clusters memos). Kept in sync with SparkEntry by
    * DiskGuardSpec, which cross-checks each name exists. */
  val pairMaterializing: Set[String] = Set(
    "q_minhash_lsh_pairs", "q_pair_editdist", "q_dedup_agreement",
    "q_dedup_clusters", "q_cluster_sizes", "q_dedup_keep",
    "q_canonical_keep", "q_split_leakage")

  /** Measured: >56e9 B scratch / 1.25e9 candidates ≈ 45 B, rounded. */
  val BytesPerCandidate = 48L

  def usableBytes(dir: String): Long = {
    val p = Paths.get(dir).toAbsolutePath
    val existing = Iterator.iterate(p)(_.getParent)
      .find(q => q == null || Files.exists(q)).flatMap(Option(_))
      .getOrElse(Paths.get("/"))
    Files.getFileStore(existing).getUsableSpace
  }

  /** Recursive byte size of a directory tree (0 if absent). */
  def dirBytes(dir: String): Long = {
    def walk(p: Path): Long =
      if (Files.isDirectory(p))
        Files.list(p).toArray.map(o => walk(o.asInstanceOf[Path])).sum
      else if (Files.exists(p)) Files.size(p)
      else 0L
    walk(Paths.get(dir))
  }

  /** Scratch estimate for dumping `names` against `sfDir`. Runs the
    * lshPairVolume pre-flight (seconds, zero pairs materialized) only
    * when a pair-materializing query is requested. */
  def estimateBytes(spark: SparkSession, sfDir: String,
                    names: Set[String]): Long = {
    val base = dirBytes(sfDir)
    val pair =
      if (names.intersect(pairMaterializing).isEmpty) 0L
      else graft.dedup.Dedup
        .lshPairVolume(Tables.documents(spark, sfDir), n = 2, k = 6,
          rowsPerBand = 2)
        .head().getAs[Long]("candidate_pairs") * BytesPerCandidate
    base + pair
  }

  /** Scratch-dir name patterns this engine (or a Spark JVM it started)
    * creates under a temp root: soak/ingest workdirs, the bucketed-table
    * warehouse, and Spark's own per-JVM spill dirs. A KILLED process
    * orphans these — Spark's shutdown hook never runs — and the r12
    * post-mortem found 42 GB of exactly such debris starving a later
    * oracle run. Only names matching here are ever candidates for the
    * janitor; a shared temp root is full of files that are not ours. */
  private val scratchName =
    "^(spark-|blockmgr-|graft-warehouse|graft-soak|graft-long-soak|graft-ingest|duck).*".r

  /** (totalBytes, newestMtimeMs) over a tree in one walk — the janitor
    * needs BOTH: size to report the reclaim, newest mtime so a dir some
    * live process is still writing (any file fresh) is never swept even
    * if its root mtime is old. */
  private def sizeAndNewest(p: Path): (Long, Long) =
    if (Files.isDirectory(p)) {
      val kids = try Files.list(p).toArray.map(_.asInstanceOf[Path])
                 catch { case _: java.io.IOException => Array.empty[Path] }
      val own = Files.getLastModifiedTime(p).toMillis
      kids.map(sizeAndNewest).foldLeft((0L, own)) {
        case ((b1, t1), (b2, t2)) => (b1 + b2, math.max(t1, t2)) }
    } else if (Files.exists(p))
      (Files.size(p), Files.getLastModifiedTime(p).toMillis)
    else (0L, 0L)

  /** Janitor for orphaned scratch (r13 verdict stretch item 8): sweep
    * each root for entries matching [[scratchName]] whose ENTIRE tree
    * has been idle longer than `maxAge`, delete them, and return
    * (path, bytesReclaimed) per deletion, logging each to stderr. The
    * pre-flight guard above refuses jobs when free space is short; this
    * closes the failure mode where the space is short only because a
    * previously KILLED run never cleaned up after itself. Conservative
    * by construction: recognized names only, a full day of idleness
    * (default), and concurrent live runs are safe because anything
    * actively written has a fresh mtime somewhere in its tree.
    * GRAFT_DISK_GUARD=0 disables, same switch as the pre-flight. */
  def sweepStaleScratch(
      roots: Seq[Path] = Seq(
        Paths.get(System.getProperty("java.io.tmpdir")),
        Paths.get("/root/repo/.tmp")),
      maxAgeMs: Long = 24L * 3600 * 1000,
      nowMs: Long = System.currentTimeMillis()): Seq[(String, Long)] = {
    if (sys.env.get("GRAFT_DISK_GUARD").contains("0")) return Nil
    val reclaimed = Seq.newBuilder[(String, Long)]
    for {
      root <- roots if Files.isDirectory(root)
      entry <- (try Files.list(root).toArray.map(_.asInstanceOf[Path])
                catch { case _: java.io.IOException => Array.empty[Path] })
      if scratchName.findFirstIn(entry.getFileName.toString).isDefined
    } {
      val (bytes, newest) = sizeAndNewest(entry)
      if (newest > 0 && nowMs - newest > maxAgeMs) {
        deleteTree(entry)
        val idleH = (nowMs - newest) / 3600000L
        System.err.println(
          f"[disk-guard] reclaimed ${bytes / 1e9}%.2f GB from $entry (idle ${idleH}h)")
        reclaimed += ((entry.toString, bytes))
      }
    }
    reclaimed.result()
  }

  private def deleteTree(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      (try Files.list(p).toArray.map(_.asInstanceOf[Path])
       catch { case _: java.io.IOException => Array.empty[Path] })
        .foreach(deleteTree)
    try Files.deleteIfExists(p) catch { case _: java.io.IOException => }
  }

  /** None = enough room; Some(message) = refuse, naming the shortfall. */
  def shortfall(freeBytes: Long, estimateBytes: Long,
                margin: Double = 1.5): Option[String] = {
    val need = (estimateBytes * margin).toLong
    if (freeBytes >= need) None
    else Some(f"estimated scratch ${estimateBytes / 1e9}%.1f GB " +
      f"(x$margin%.1f margin = ${need / 1e9}%.1f GB) exceeds free " +
      f"${freeBytes / 1e9}%.1f GB — short ${(need - freeBytes) / 1e9}%.1f GB; " +
      "free disk or set GRAFT_DISK_GUARD=0 to force")
  }
}
