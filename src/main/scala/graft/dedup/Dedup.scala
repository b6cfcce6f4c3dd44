package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard — each shuffle-partitioned with no
  * per-executor global state, so they scale horizontally.
  *
  * Hashing is md5-hex everywhere: engine-neutral (identical in the DuckDB
  * oracle), and a *lexicographic min over k seeded hash strings* is a valid
  * MinHash permutation family. No Murmur dependence, no UDFs.
  *
  * Performance notes (these expressions run interpreted — higher-order
  * functions don't participate in whole-stage codegen):
  *  - Tokens are materialized as a real column in their own projection
  *    (`withTokens`) BEFORE any shingle construction. `element_at` back
  *    into a *computed* array expression re-evaluates the whole
  *    `filter(split(...))` tree per lambda element; against a materialized
  *    column it's a bound-reference array index. Catalyst's CollapseProject
  *    keeps the two projections separate because the token expression is
  *    non-cheap and referenced more than once.
  *  - Candidate pairs are generated INSIDE the reducer (collect_list over
  *    the bucket key, then array combinations) — one shuffle, no self-join,
  *    no re-execution of the signature pipeline per join side.
  *
  * Scale notes (100 TB):
  *  - exact dedup: one hash-partition shuffle on the content hash; the
  *    map side pre-aggregates so only (hash → min_id, count) moves.
  *  - MinHash: explode(shingles) runs map-side; the signature agg is one
  *    shuffle on doc_id (combiner applies — k running mins); LSH buckets
  *    by band key, whose cardinality grows with corpus size.
  *  - Skew guards: `maxBucket` caps an LSH band bucket (a mega-cluster of
  *    near-identical docs would otherwise go quadratic in one reducer);
  *    `maxDf` drops stop-shingles from the inverted index the same way.
  */
object Dedup {

  private def toks(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Materialize (doc_id, tk: array<string>) — the single tokenization
    * pass everything downstream indexes into. */
  private def withTokens(df: DataFrame): DataFrame =
    df.select(col("doc_id"), toks(col("text")).as("tk"))

  /** Word n-gram shingles over a MATERIALIZED token array column.
    * Guarded for docs shorter than n tokens: Spark's `sequence(1, 0)` is
    * DESCENDING `[1, 0]` (not empty like SQL generate_series) and
    * `element_at(tk, 0)` throws under ANSI mode — so short docs
    * short-circuit to an empty array. */
  def shinglesOf(tk: Column, n: Int): Column =
    if (n == 1) array_distinct(tk)
    else when(size(tk) >= n,
      array_distinct(transform(
        sequence(lit(1), size(tk) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(tk, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  /** (doc_id, shingle) — one row per DISTINCT shingle per doc. */
  def docShingles(df: DataFrame, n: Int): DataFrame =
    withTokens(df).select(col("doc_id"),
      explode(shinglesOf(col("tk"), n)).as("shingle"))

  /** All ordered pairs (a < b) from a SORTED id array, built in the
    * reducer: element i pairs with every later element. */
  private def sortedPairs(ids: Column): Column =
    flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + 2, size(ids)),
        b => struct(a.as("doc_a"), b.as("doc_b")))))

  /** Exact dedup: group by content hash, keep the smallest doc_id as the
    * canonical representative (deterministic, unlike dropDuplicates). */
  def exact(df: DataFrame): DataFrame =
    df.groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signature: k seeded min-hashes over word-`n`-gram shingles.
    * Output: doc_id, mh_0..mh_{k-1} (md5-hex strings).
    *
    * Computed by the custom expression `graft.functions.MinHashSig` in
    * one native pass per document — zero shuffle (the explode +
    * groupBy(doc_id) + k×min(md5) formulation shuffled every shingle
    * row). Docs with no shingles (< n tokens) are excluded, matching
    * the exploded formulation the oracle uses. */
  def minhashSignatures(df: DataFrame, n: Int, k: Int): DataFrame = {
    // The no-shingle filter tests size(tk) >= n (equivalent: >= n tokens
    // ⟺ >= 1 shingle), NOT size(sh) > 0 — a predicate on `sh` would be
    // pushed below the projection and re-evaluate the whole interpreted
    // shingle transform per row (measured 4.4 s vs 0.6 s at sf0.1).
    val sig = withTokens(df)
      .filter(size(col("tk")) >= n)
      .select(col("doc_id"), shinglesOf(col("tk"), n).as("sh"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.minhashSig(col("sh"), k).as("mh"))
    sig.select(col("doc_id") +:
      (0 until k).map(i => element_at(col("mh"), i + 1).as(s"mh_$i")): _*)
  }

  /** MinHash + LSH candidate pairs: signatures banded `rowsPerBand` mins
    * per band; docs sharing any band key become a candidate pair.
    * Single pass: all band keys are emitted with one `posexplode`, pairs
    * are generated per bucket in the reducer (one shuffle on the band
    * key), and buckets larger than `maxBucket` are dropped — the skew
    * guard against a near-dup mega-cluster going quadratic in one task.
    * Returns distinct (doc_a < doc_b) pairs. */
  def minhashLshPairs(df: DataFrame, n: Int, k: Int, rowsPerBand: Int,
                      maxBucket: Int = 1000): DataFrame = {
    require(k % rowsPerBand == 0,
      s"k=$k must be a multiple of rowsPerBand=$rowsPerBand (trailing " +
        "signature columns would be silently ignored)")
    val nBands = k / rowsPerBand
    val bandKeys = array((0 until nBands).map { b =>
      concat_ws("|",
        (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*)
    }: _*)
    val bands = minhashSignatures(df, n, k)
      .select(col("doc_id"), posexplode(bandKeys).as(Seq("band", "band_key")))
    bands.groupBy("band", "band_key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(sortedPairs(col("ids"))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
  }

  /** SimHash (default 64-bit, as a hex string): per document, bit b is
    * the majority vote of bit b of md5(token) across all token
    * occurrences. Hamming-close simhashes ⇒ similar token distributions.
    * Pure integer votes — engine-exact; hex-string output sidesteps
    * signed-64-bit edge cases in any downstream engine.
    *
    * Computed by the custom Catalyst expression `graft.functions.SimHash`
    * (codegen'd native vote loop, one call per document): zero shuffle,
    * scan speed — the Column-tree formulation (explode + 64 vote
    * aggregates) cost 2.6 s at sf0.1 for the same answer. Docs with no
    * tokens are excluded, matching the exploded formulation the oracle
    * uses. */
  def simhash(df: DataFrame, bits: Int = 64): DataFrame = {
    require(bits == 64, "the registered simhash64 function is 64-bit; " +
      "other widths go through graft.functions.SimHash directly")
    withTokens(df)
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.simhash64(col("tk")).as("simhash"))
  }

  /** Near-dup clustering: connected components over candidate pairs via
    * iterative min-label propagation — each doc ends up labeled with the
    * smallest doc_id in its component (the canonical representative a
    * dedup pipeline keeps). Converges in O(component diameter) rounds;
    * near-dup components are shallow, so the default cap is generous.
    *
    * Scale shape: every round is one hash-partition join + min-combine on
    * the edge list — the standard distributed CC loop (small-star style).
    * The loop iterates over PLANS, not collected data; `localCheckpoint`
    * truncates lineage each round so the plan doesn't grow unbounded.
    * Output: (doc_id, cluster_id) for every doc appearing in a pair. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id"))
      .localCheckpoint()
    // Labels only ever DECREASE, so the label sum is a strictly
    // decreasing potential function — equal sums == fixpoint. One cheap
    // aggregate per round instead of a change-detection join.
    // (coalesce(0): sum over zero rows is NULL — empty pair sets must
    // return an empty result, not throw.)
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("lbl")), lit(0L))).first().getLong(0)
    var prevSum = labelSum(labels)
    var converged = prevSum == 0L
    var i = 0
    while (!converged && i < maxIters) {
      val prop = edges.join(labels, edges("src") === labels("doc_id"))
        .groupBy(col("dst")).agg(min(col("lbl")).as("nlbl"))
      val next = labels.join(prop, labels("doc_id") === prop("dst"), "left")
        .select(labels("doc_id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      i += 1
    }
    if (!converged)
      System.err.println(s"[connectedComponents] iteration cap $maxIters hit " +
        "before the fixpoint — a component's diameter exceeds the cap and its " +
        "labels are NOT fully propagated; raise maxIters")
    edges.unpersist()
    labels.select(col("doc_id"), col("lbl").as("cluster_id"))
  }

  /** SimHash near-duplicate pairs: band the 64-bit fingerprint into 4
    * 16-bit nibble groups; docs sharing any band are candidates (by the
    * pigeonhole principle this has FULL recall for Hamming distance <= 3:
    * at most 3 differing bits cannot touch all 4 bands), then the exact
    * Hamming distance filters. Same single-pass bucket/pair shape as
    * minhashLshPairs, same maxBucket skew guard. */
  def simhashPairs(df: DataFrame, maxHamming: Int = 3,
                   maxBucket: Int = 1000): DataFrame = {
    require(maxHamming < 4, "4-band blocking only guarantees recall for hamming <= 3")
    val sh = simhash(df)
    val bandKeys = array((0 until 4).map(b =>
      concat(lit(b.toString), lit(":"), col("simhash").substr(b * 4 + 1, 4))): _*)
    val pairs = sh
      .select(col("doc_id"), col("simhash"), explode(bandKeys).as("band_key"))
      .groupBy("band_key")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("items"))
      .filter(size(col("items")).between(2, maxBucket))
      .select(explode(flatten(transform(col("items"), (a, i) =>
        transform(slice(col("items"), i + 2, size(col("items"))), b =>
          struct(a.getField("doc_id").as("doc_a"),
            b.getField("doc_id").as("doc_b"),
            a.getField("simhash").as("sh_a"),
            b.getField("simhash").as("sh_b")))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.sh_a").as("sh_a"), col("p.sh_b").as("sh_b"))
      .distinct()
    val hamming = (0 until 16).map { i =>
      bit_count(
        conv(col("sh_a").substr(i + 1, 1), 16, 10).cast("int")
          .bitwiseXOR(conv(col("sh_b").substr(i + 1, 1), 16, 10).cast("int")))
    }.reduce[Column](_ + _)
    pairs
      .select(col("doc_a"), col("doc_b"), hamming.cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Apply clustering to the corpus: every doc labeled with its cluster's
    * canonical id (itself when unpaired) and a keep/drop decision — the
    * final step of the dedup pipeline (keep one representative per
    * near-dup component, drop the rest). One left join on doc_id. */
  def applyClusters(docs: DataFrame, clusters: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        (col("cluster_id").isNull || col("doc_id") === col("cluster_id")).as("keep"))

  /** n-gram Jaccard near-dup pairs via a capped inverted index: group
    * doc-ids per shingle (one shuffle), drop shingles in more than
    * `maxDf` docs (stop-shingle skew guard — also bounds the per-shingle
    * pair fan-out at maxDf²), generate co-occurrence pairs in the
    * reducer, then |A∩B| / (|A|+|B|-|A∩B|) >= `threshold` over the
    * CAPPED shingle universe (sizes count only surviving shingles, so
    * numerator and denominator are consistent). */
  def ngramJaccardPairs(df: DataFrame, n: Int, maxDf: Long, threshold: Double): DataFrame = {
    val index = docShingles(df, n)
      .groupBy("shingle")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= maxDf)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = index.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val inter = index
      .filter(size(col("ids")) >= 2)
      .select(explode(sortedPairs(col("ids"))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("doc_a", "sz_a"), "doc_a")
      .join(sizes.toDF("doc_b", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
