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
