package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    // one-pass native kernel == filter(split(text, " "), t => length(t) > 0)
    // (r20: the filter HOF ran interpreted per token — see TextKernels)
    graft.functions.GraftFunctions.spaceTokens(text)

  /** Materialize (doc_id, tk: array<string>) — the single tokenization
    * pass everything downstream indexes into. */
  private def withTokens(df: DataFrame): DataFrame =
    df.select(col("doc_id"), toks(col("text")).as("tk"))

  /** Word n-gram shingles over a MATERIALIZED token array column.
    * Guarded for docs shorter than n tokens: Spark's `sequence(1, 0)` is
    * DESCENDING `[1, 0]` (not empty like SQL generate_series) and
    * `element_at(tk, 0)` throws under ANSI mode — so short docs
    * short-circuit to an empty array. `distinct = false` keeps every
    * OCCURRENCE (frequency consumers like repetitionScore); the default
    * dedups per doc (set-semantics consumers: MinHash, Jaccard). */
  def shinglesOf(tk: Column, n: Int, distinct: Boolean = true): Column = {
    def dedup(c: Column) = if (distinct) array_distinct(c) else c
    if (n == 1) dedup(tk)
    // n >= 2: the native WordShingles kernel (TextKernels.scala) replaces
    // the interpreted transform/element_at/concat_ws HOF chain — m−n+1
    // lambda frames per doc became one codegen'd scalar call (r20). The
    // when/otherwise guard keeps null/short-input semantics identical.
    else when(size(tk) >= n,
      graft.functions.GraftFunctions.wordShingles(tk, n, distinct))
      .otherwise(array().cast("array<string>"))
  }

  /** (doc_id, shingle) — one row per DISTINCT shingle per doc. */
  def docShingles(df: DataFrame, n: Int): DataFrame =
    withTokens(df).select(col("doc_id"),
      explode(shinglesOf(col("tk"), n)).as("shingle"))

  /** All ordered pairs (a < b) from a SORTED id array, built in the
    * reducer: element i pairs with every later element. Native kernel
    * (r20) == the nested transform/slice HOF chain, which interpreted
    * one lambda frame per PAIR — see TextKernels.SortedPairs. */
  private def sortedPairs(ids: Column): Column =
    graft.functions.GraftFunctions.sortedPairs(ids)

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
  /** (doc_id, band, band_key) rows — the shared LSH banding step:
    * signatures cut into `k / rowsPerBand` bands, one key per band, all
    * emitted with a single `posexplode`. Docs with < n tokens have no
    * signature and produce no rows. */
  private def bandFrame(df: DataFrame, n: Int, k: Int, rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0,
      s"k=$k must be a multiple of rowsPerBand=$rowsPerBand (trailing " +
        "signature columns would be silently ignored)")
    val nBands = k / rowsPerBand
    val bandKeys = array((0 until nBands).map { b =>
      concat_ws("|",
        (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*)
    }: _*)
    minhashSignatures(df, n, k)
      .select(col("doc_id"), posexplode(bandKeys).as(Seq("band", "band_key")))
  }

  /** Candidate-pair VOLUME under the same banding as [[minhashLshPairs]]
    * — `sum C(bucket,2)` over surviving buckets plus the count of
    * over-cap buckets dropped by the skew guard — WITHOUT materializing
    * a single pair. At 100 TB this is the capacity-planning query a
    * dedup job runs FIRST, because the pair explode's cost is exactly
    * this number (pre-`distinct`) and on a duplicate-dense corpus it
    * grows super-linearly (the GenScale factor-100 documents replica,
    * measured via graft.apps.PairVolume: 67,132 candidate pairs at
    * sf0.1 → 214,107,900 at 100× the docs — 3189× the volume for 100×
    * the data, with 159 over-cap buckets dropped by the skew guard).
    *
    * Computed CLASS-decomposed (r14 verdict item 5): a minhash band key
    * is a function of text content alone, so a bucket's MEMBER count is
    * the sum of member counts of the content classes in it. Group to
    * classes first (one exact-dedup-shaped shuffle on text), band one
    * representative per class, and aggregate member-weighted bucket
    * sizes — identical output to banding every row, but the band
    * explode and bucket shuffle are O(classes), not O(members). The raw
    * formulation burned 31.9 s at sf100 (5× the production pairing it
    * gates) banding 100 copies of every class; this form does the same
    * math on 1/100th the band rows. */
  def lshPairVolume(df: DataFrame, n: Int, k: Int, rowsPerBand: Int,
                    maxBucket: Int = 1000): DataFrame = {
    val cls = df.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("m"))
    val sz = sum(col("m")) // member-weighted bucket size, exact
    bandFrame(cls.select("doc_id", "text"), n, k, rowsPerBand)
      .join(cls.select("doc_id", "m"), Seq("doc_id"))
      .groupBy("band", "band_key").agg(sz.as("sz"))
      .agg(
        sum(when(col("sz").between(2, maxBucket),
          col("sz") * (col("sz") - 1) / 2).otherwise(lit(0L)))
          .cast("bigint").as("candidate_pairs"),
        count(when(col("sz") > maxBucket, lit(1))).as("buckets_over_cap"),
        count(when(col("sz").between(2, maxBucket), lit(1)))
          .as("buckets_pairing"))
  }

  def minhashLshPairs(df: DataFrame, n: Int, k: Int, rowsPerBand: Int,
                      maxBucket: Int = 1000): DataFrame = {
    val bands = bandFrame(df, n, k, rowsPerBand)
    bands.groupBy("band", "band_key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(sortedPairs(col("ids"))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
  }

  /** Class-representative LSH pairing — the production mitigation for
    * pair-materialization blowup on duplicate-dense corpora. Every
    * signature here is a function of TEXT CONTENT only, so byte-identical
    * documents share all band keys and the raw member-level candidate set
    * of [[minhashLshPairs]] is exactly the expansion of a CLASS-level
    * pair table: group documents into content classes (distinct text),
    * band ONE representative per class, weight every bucket-size decision
    * by MEMBER count (so the `maxBucket` skew guard admits and drops
    * precisely the buckets the raw operator would), and emit class pairs
    * with their implied member-pair counts instead of the members.
    *
    * Exactness invariant (spec-asserted): member pair (a, b) is a raw
    * candidate iff cls(a), cls(b) share a band bucket whose member-
    * weighted size lies in [2, maxBucket] — exactly the survival
    * condition of the class pair here — and distinct class pairs expand
    * to disjoint member-pair sets, so
    * `sum(member_pairs) == count(minhashLshPairs(df))`.
    *
    * Scale: candidate volume collapses from O(Σ C(bucket_members, 2)) to
    * O(Σ C(bucket_classes, 2)). On the GenScale replica the member count
    * grows with the scale factor while the class count stays fixed, so
    * the raw operator's output grows ~quadratically (1.92B candidates,
    * ~47 GB scratch at sf100) while this one's stays CONSTANT — the
    * pre-aggregation (one exact-dedup-shaped shuffle on text) is the only
    * stage that sees every row. This is the pairing a 100 TB dedup job
    * should run; the raw member expansion exists for pipelines that need
    * per-member pair rows downstream.
    *
    * Output: repr_a <= repr_b (class representatives = min doc_id per
    * class), member counts n_a / n_b, and member_pairs = n_a * n_b for
    * distinct classes or C(n_a, 2) within one class; rows implying zero
    * member pairs (a singleton class sharing a bucket) are dropped. */
  def lshReprPairs(df: DataFrame, n: Int, k: Int, rowsPerBand: Int,
                   maxBucket: Int = 1000): DataFrame = {
    val cls = df.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("m"))
    // Band the representatives only; rejoin the member count (the class
    // table is orders of magnitude smaller than the corpus — AQE
    // broadcasts it when it fits).
    val bands = bandFrame(cls.select("doc_id", "text"), n, k, rowsPerBand)
      .join(cls.select("doc_id", "m"), Seq("doc_id"))
    // Pair generation in the reducer, self-pair included: element i also
    // pairs with itself (slice is 1-based, so element i sits at i+1),
    // carrying the intra-class C(m,2) member pairs.
    val ids = col("ids")
    // native kernel (r20) == the nested transform/slice HOF chain,
    // which interpreted one lambda frame per pair — TextKernels.ReprPairs
    val reprPairs = graft.functions.GraftFunctions.reprPairs(ids)
    bands.groupBy("band", "band_key")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("m")))).as("ids"),
        sum(col("m")).as("members"))
      .filter(col("members").between(2, maxBucket))
      .select(explode(reprPairs).as("p"))
      .select(col("p.repr_a").as("repr_a"), col("p.repr_b").as("repr_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
      .distinct()
      .withColumn("member_pairs",
        when(col("repr_a") === col("repr_b"),
          (col("n_a") * (col("n_a") - 1) / 2).cast("bigint"))
          .otherwise(col("n_a") * col("n_b")))
      .filter(col("member_pairs") > 0)
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

  /** Near-dup clustering: connected components over candidate pairs —
    * each doc ends up labeled with the smallest doc_id in its component
    * (the canonical representative a dedup pipeline keeps).
    *
    * Algorithm: recursive PARTITION-LOCAL CONTRACTION (two-phase
    * MapReduce CC in the Kiveris large/small-star family, on
    * co-partitioned RDDs):
    *  1. hash-partition the edge list at ~`edgesPerPartition` per task
    *     and run a min-rooted union-find INSIDE each partition (bounded
    *     state: one long-map over that partition's endpoints), emitting
    *     each node's partition-local root;
    *  2. `reduceByKey(min)` merges each node's roots across partitions
    *     into this level's node→root mapping;
    *  3. contract: every partition-local root that is NOT its node's
    *     merged minimum becomes one (root, minRoot) edge — a graph over
    *     ROOTS only, geometrically smaller; recurse until the edge list
    *     fits one partition, where union-find finishes exactly;
    *  4. compose labels back DOWN the levels — label(node) =
    *     label_above(root(node)), falling back to root(node) for
    *     components already settled at that level.
    *
    * Why RDDs and not a DataFrame loop (the one deliberate drop below
    * Catalyst in this engine — the same judgment GraphX makes): a
    * declarative fixpoint loop re-runs analysis+optimization+planning
    * per composed batch (measured 0.5-0.6 s of driver time per batch
    * even over checkpointed inputs), and min-label propagation needs
    * DIAMETER rounds (measured 12 on the sf0.1 LSH graph) where
    * contraction needs log_{fanin}(#partitions) levels — zero at any
    * interactive scale, 2-3 at 100 TB. Each level is a constant number
    * of shuffles of a geometrically shrinking edge list with strictly
    * bounded per-task memory; determinism holds because union-by-min
    * yields the component minimum under any edge order.
    *
    * Throws IllegalStateException if `maxLevels` contractions do not
    * reach a single partition — a silently partial labeling would make
    * downstream keep/drop decisions quietly wrong.
    * Output: (doc_id, cluster_id) for every doc appearing in a pair. */
  def connectedComponents(pairs: DataFrame, maxLevels: Int = 12,
                          edgesPerPartition: Long = 500000L): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    val spark = pairs.sparkSession
    import spark.implicits._

    // min-rooted union-find over one partition's edges; path compression
    // keeps it near-linear, union-by-min makes every tree root the
    // minimum of its merged set. Emits (node, root) for every endpoint
    // seen, roots included as self-entries.
    def localForest(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      it.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val nodes = parent.keysIterator.toArray
      nodes.iterator.map(k => (k, find(k)))
    }

    // partition count follows the DATA, uncapped by the session's shuffle
    // parallelism: the bounded-per-task-memory contract (a LongMap over
    // one partition's endpoints) is only real if ~edgesPerPartition
    // actually holds. Long arithmetic — an Int division would wrap
    // negative past ~10^15 edges and collapse everything to 1 partition.
    def partsFor(nEdges: Long): Int =
      math.min(nEdges / edgesPerPartition + 1L, Int.MaxValue.toLong).toInt

    // _SER storage throughout: a boxed Tuple2[Long, Long] costs ~48 B
    // cached deserialized vs ~16 B serialized, and at dense duplication
    // (the GenScale 100× replica: every band bucket near the cap) the
    // edge list alone reaches 10⁷-10⁸ rows ACROSS SEVERAL persisted
    // levels — deserialized caching was the difference between fitting
    // and an executor OOM, measured at the sf10 pair-class capture.
    val pairRdd = pairs
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)].rdd
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    var cached = List[RDD[_]](pairRdd)
    val nEdges = pairRdd.count() // materializes the candidate chain once

    var edges: RDD[(Long, Long)] = pairRdd
    var p = partsFor(nEdges)
    var levelMaps = List.empty[RDD[(Long, Long)]] // per-level node→root
    var levels = 0
    while (p > 1 && levels < maxLevels) {
      val forest = edges.partitionBy(new HashPartitioner(p))
        .mapPartitions(localForest)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      val m = forest.reduceByKey(math.min(_: Long, _: Long))
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      cached = forest :: m :: cached
      levelMaps ::= m
      // every partition-local root joins its node's merged minimum: these
      // edges carry exactly the cross-partition connectivity (a node seen
      // in k partitions links its k roots through minRoot)
      val nextEdges = forest.join(m)
        .collect { case (_, (root, minRoot)) if root != minRoot => (root, minRoot) }
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      cached = nextEdges :: cached
      edges = nextEdges
      p = partsFor(edges.count())
      levels += 1
    }
    if (p > 1)
      throw new IllegalStateException(
        s"connectedComponents did not contract to one partition in " +
          s"$maxLevels levels — labels would be partial and downstream " +
          "keep/drop decisions silently wrong; raise maxLevels")

    // exact finish on the (now single-partition) edge list
    var labels: RDD[(Long, Long)] = edges
      .partitionBy(new HashPartitioner(1))
      .mapPartitions(localForest)

    // compose downward: each level's nodes adopt their root's label;
    // left join because a component that settled at this level has no
    // entry above — its root IS its label
    for (m <- levelMaps) {
      labels = m.map { case (node, root) => (root, node) }
        .leftOuterJoin(labels)
        .map { case (root, (node, lbl)) => (node, lbl.getOrElse(root)) }
    }

    // localCheckpoint, not a bare persist: it truncates the composed
    // join lineage AND its blocks are ContextCleaner-managed, so
    // repeated invocations (q_dedup_clusters, q_dedup_keep, pipeline
    // runs) don't accumulate caller-unreachable cached blocks
    val out = labels.localCheckpoint()
    out.count()
    cached.foreach(_.unpersist())
    out.toDF("doc_id", "cluster_id")
  }

  /** [[connectedComponents]] over the CLASS graph instead of the member
    * pair graph (r14 verdict item 6) — the clustering a 100 TB dedup job
    * should run. Exactness argument (the same one
    * tools/sf100_cc_oracle.py validates oracle-side, and
    * [[lshReprPairs]] asserts pair-side):
    *  - a minhash band key is a function of text content alone, so every
    *    member of a content class carries exactly its representative's
    *    band rows, and a surviving bucket (member-weighted size in
    *    [2, maxBucket] — [[lshReprPairs]] mirrors the raw admission) is
    *    a full CLIQUE over the members of the classes in it;
    *  - therefore the member-level component structure IS the class-
    *    level one: classes sharing a surviving bucket merge, every
    *    member of an active class (≥1 surviving bucket) joins its
    *    class's component, members of inactive classes never appear;
    *  - labels agree too: a component's cluster_id is its minimum
    *    member doc_id, representatives are per-class minimum doc_ids,
    *    and min over a component's members = min over its classes'
    *    representatives.
    * The raw member-level form ([[connectedComponents]] over
    * [[minhashLshPairs]]) persists ~1.9B edges across several levels at
    * the GenScale sf100 replica (measured ~47 GB scratch — DiskGuard-
    * refused); this form's edge list is O(classes² per bucket) and its
    * only full-data stages are the exact-dedup-shaped class shuffle and
    * the final label-expansion join — both linear, both shuffle on keys
    * a 1000-executor cluster partitions cleanly.
    * Output: (doc_id, cluster_id), byte-identical to the raw form. */
  def connectedComponentsByClass(docs: DataFrame, n: Int, k: Int,
                                 rowsPerBand: Int,
                                 maxBucket: Int = 1000): DataFrame = {
    val rp = lshReprPairs(docs, n, k, rowsPerBand, maxBucket)
    val edges = rp.filter(col("repr_a") =!= col("repr_b"))
      .select(col("repr_a").as("doc_a"), col("repr_b").as("doc_b"))
    val classLabels = connectedComponents(edges)
      .withColumnRenamed("doc_id", "repr")
    // active classes: any surviving bucket yields a pair row naming the
    // class (a cross row, or the intra-class self row when m >= 2) —
    // exactly the classes whose members appear in raw member pairs
    val active = rp
      .select(explode(array(col("repr_a"), col("repr_b"))).as("repr"))
      .distinct()
    // a class whose component never crossed class lines has no entry in
    // classLabels — its representative IS the label (intra-class clique)
    val reprLabel = active.join(classLabels, Seq("repr"), "left")
      .select(col("repr"),
        coalesce(col("cluster_id"), col("repr")).as("cluster_id"))
    val cls = docs.groupBy(col("text")).agg(min(col("doc_id")).as("repr"))
    docs.select(col("doc_id"), col("text"))
      .join(cls, Seq("text"))
      .join(reprLabel, Seq("repr"))
      .select(col("doc_id"), col("cluster_id"))
  }

  /** SimHash near-duplicate pairs: band the 64-bit fingerprint into
    * `bands` equal hex-digit groups; docs sharing any band are candidates
    * (by the pigeonhole principle this has FULL recall for Hamming
    * distance <= bands-1: that many differing bits cannot touch every
    * band), then the exact Hamming distance filters. More bands buy
    * recall at the cost of coarser buckets — 4 bands covers Hamming <= 3
    * with 16-bit selectivity; 8 bands covers <= 7 but its 8-bit bands
    * collide ~2^8 times more, so the candidate volume grows
    * quadratically in corpus size over 256 buckets per band. That makes
    * the PER-CANDIDATE cost the whole game: the pair stage is a typed
    * per-bucket loop (the embeddingNearDupPairs judgment — Catalyst
    * expression trees are the wrong tool for per-pair enumeration, and
    * ran interpreted at 30 s/sf0.1 for the 8-band case) with the
    * fingerprint pre-split into two 32-bit longs so the Hamming test is
    * two XOR+popcounts — candidates that fail it die inside the reducer
    * without ever materializing. Same maxBucket skew guard as
    * minhashLshPairs, mirrored in the oracle. */
  def simhashPairs(df: DataFrame, maxHamming: Int = 3,
                   maxBucket: Int = 1000, bands: Int = 4): DataFrame = {
    require(bands > 0 && 16 % bands == 0, s"bands=$bands must divide the 16 hex digits")
    require(maxHamming < bands,
      s"$bands-band blocking only guarantees recall for hamming <= ${bands - 1}")
    val w = 16 / bands
    import df.sparkSession.implicits._
    val bandKeys = array((0 until bands).map(b =>
      concat(lit(b.toString), lit(":"), col("simhash").substr(b * w + 1, w))): _*)
    simhash(df)
      .select(col("doc_id"), col("simhash"), explode(bandKeys).as("band_key"))
      .select(col("band_key"), col("doc_id"),
        // conv yields an unsigned decimal string; 8 hex digits < 2^32
        // always fit a long (the full 16 would not)
        conv(col("simhash").substr(1, 8), 16, 10).cast("long").as("hi"),
        conv(col("simhash").substr(9, 8), 16, 10).cast("long").as("lo"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val items = it.map(t => (t._2, t._3, t._4)).take(maxBucket + 1).toArray
        if (items.length > maxBucket || items.length < 2) Iterator.empty
        else {
          java.util.Arrays.sort(items, Ordering.by((t: (Long, Long, Long)) => t._1))
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          var i = 0
          while (i < items.length) {
            var j = i + 1
            while (j < items.length) {
              val h = java.lang.Long.bitCount(items(i)._2 ^ items(j)._2) +
                java.lang.Long.bitCount(items(i)._3 ^ items(j)._3)
              if (h <= maxHamming) buf += ((items(i)._1, items(j)._1, h))
              j += 1
            }
            i += 1
          }
          buf.iterator
        }
      }
      .toDF("doc_a", "doc_b", "hamming")
      .distinct()
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

  /** Canonical-document selection: per near-dup cluster keep the BEST
    * member by `scoreCol` (ties → min doc_id), not the arbitrary
    * min-id representative [[applyClusters]] keeps — production dedup
    * retains the most complete/highest-quality copy, and which copy
    * survives changes the training mix. Unclustered docs are their own
    * singleton (keep=true).
    *
    * Scale shape: the cluster assignment join is the same left join as
    * [[applyClusters]]; the argmax is a row_number over the CLUSTER
    * partitioning — clusters are near-dup groups (small by
    * construction; q_cluster_sizes is the audit), so the per-partition
    * sort is bounded by the largest cluster, never the corpus. */
  def canonicalKeep(docs: DataFrame, clusters: DataFrame,
                    scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc, col("doc_id").asc)
    docs.select(col("doc_id"), col(scoreCol))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col(scoreCol))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("keep"))
  }

  /** Benchmark decontamination — drop training documents that share any
    * word n-gram with an evaluation set (the step that keeps test
    * benchmarks out of the training mix). `benchDocs` is (doc_id, text)
    * of the eval set: its distinct shingles are tiny next to the corpus
    * and broadcast into a hash join; per-doc hit counts come from one
    * aggregation of the matched shingles. Output: every corpus doc with
    * its contaminated-shingle count and keep decision — downstream
    * filters on `keep`.
    *
    * Scale shape: corpus shingles stream map-side into the broadcast
    * join; the only shuffle is the per-doc hit count (partial-agg
    * combined), plus one left join back to the doc list. */
  def decontaminate(docs: DataFrame, benchDocs: DataFrame, n: Int): DataFrame = {
    val benchShingles = docShingles(benchDocs, n).select("shingle").distinct()
    val hits = docShingles(docs, n)
      .join(broadcast(benchShingles), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    docs.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        col("n_contaminated").isNull.as("keep"))
  }

  /** Cross-modality dedup agreement — the "measure, don't guess" signal
    * for near-dup pipelines: given three candidate pair sets over the
    * same corpus ids (lexical MinHash-LSH, bitwise SimHash, and
    * embedding-cosine), report each method's pair count and every
    * intersection size in ONE row. Low pairwise agreement flags a method
    * (or threshold) that is out of tune before anyone deletes data.
    *
    * Inputs must share the (doc_a, doc_b) normalized-pair shape
    * (doc_a < doc_b). Two coalescing full outer joins on the pair key,
    * then a single global aggregate — at 100 TB the joins shuffle only
    * the pair sets (tiny next to the corpus) and the aggregate is one
    * partial-agg reduction. */
  def pairAgreement(mh: DataFrame, sh: DataFrame, em: DataFrame): DataFrame =
    mh.select(col("doc_a"), col("doc_b"), lit(1).as("in_mh"))
      .join(sh.select(col("doc_a"), col("doc_b"), lit(1).as("in_sh")),
        Seq("doc_a", "doc_b"), "full")
      .join(em.select(col("doc_a"), col("doc_b"), lit(1).as("in_em")),
        Seq("doc_a", "doc_b"), "full")
      .agg(
        count(col("in_mh")).as("n_minhash"),
        count(col("in_sh")).as("n_simhash"),
        count(col("in_em")).as("n_embed"),
        count(when(col("in_mh") === 1 && col("in_sh") === 1, 1)).as("n_mh_sh"),
        count(when(col("in_mh") === 1 && col("in_em") === 1, 1)).as("n_mh_em"),
        count(when(col("in_sh") === 1 && col("in_em") === 1, 1)).as("n_sh_em"),
        count(when(col("in_mh") === 1 && col("in_sh") === 1 &&
          col("in_em") === 1, 1)).as("n_all"))

  /** n-gram Jaccard near-dup pairs via a capped inverted index: group
    * doc-ids per shingle (one shuffle), drop shingles in more than
    * `maxDf` docs (stop-shingle skew guard — also bounds the per-shingle
    * pair fan-out at maxDf²), generate co-occurrence pairs in the
    * reducer, then |A∩B| / (|A|+|B|-|A∩B|) >= `threshold` over the
    * CAPPED shingle universe (sizes count only surviving shingles, so
    * numerator and denominator are consistent). */
  def ngramJaccardPairs(df: DataFrame, n: Int, maxDf: Long, threshold: Double): DataFrame =
    jaccardFromIntersections(ngramPairIntersections(df, n, maxDf), threshold)

  /** Jaccard scoring over a precomputed [[ngramPairIntersections]] frame
    * (callers sharing the frame across several scorings memoize it). */
  def jaccardFromIntersections(inter: DataFrame, threshold: Double): DataFrame =
    inter
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  /** Asymmetric CONTAINMENT near-dup pairs over the same capped inverted
    * index: containment(A in B) = |A∩B| / |A|. Jaccard misses the
    * quote-inclusion case — a short document wholly copied into a long
    * one has tiny Jaccard (the union is dominated by the long doc) but
    * containment 1.0 in one direction. Emits both directions and keeps
    * pairs where EITHER clears the threshold; the consumer decides which
    * side is the quote and which the quoter. */
  def containmentFromIntersections(inter: DataFrame, threshold: Double): DataFrame =
    inter
      .withColumn("cont_a_in_b", col("inter").cast("double") / col("sz_a"))
      .withColumn("cont_b_in_a", col("inter").cast("double") / col("sz_b"))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= threshold)
      .select("doc_a", "doc_b", "cont_a_in_b", "cont_b_in_a")

  /** k-nearest-neighbor similarity graph from a precomputed
    * [[ngramPairIntersections]] frame: symmetrize the pair scores and
    * keep each document's top-k neighbors by Jaccard — the graph
    * construction step feeding cluster-then-pick pipelines. The rank
    * filter plans as WindowGroupLimit (map-side per-doc top-k BEFORE the
    * exchange), so the shuffle carries O(docs·k), not the pair set;
    * ordering is (jaccard desc, neighbor) — total, so the graph is
    * deterministic under ties. */
  def jaccardKnn(inter: DataFrame, k: Int): DataFrame = {
    val j = inter.withColumn("jaccard",
      col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
    val sym = j.select(col("doc_a").as("doc_id"), col("doc_b").as("neighbor"),
        col("jaccard"))
      .unionByName(j.select(col("doc_b").as("doc_id"),
        col("doc_a").as("neighbor"), col("jaccard")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("neighbor"))
    sym.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** Shared machinery for [[ngramJaccardPairs]] /
    * [[containmentFromIntersections]]: (doc_a, doc_b, inter, sz_a, sz_b)
    * over the capped shingle universe (sizes count only surviving
    * shingles, so numerators and denominators stay consistent). */
  def ngramPairIntersections(df: DataFrame, n: Int, maxDf: Long): DataFrame = {
    // localCheckpoint (not persist): the index is read three times (pair
    // generation + two size joins) so it must be materialized once, and
    // checkpoint blocks are ContextCleaner-managed — a plain persist here
    // leaked two CacheManager entries per invocation (r2 ADVICE).
    val index = docShingles(df, n)
      .groupBy("shingle")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= maxDf)
      .localCheckpoint()
    val sizes = index.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
      .localCheckpoint()
    index
      .filter(size(col("ids")) >= 2)
      .select(explode(sortedPairs(col("ids"))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("doc_a", "sz_a"), "doc_a")
      .join(sizes.toDF("doc_b", "sz_b"), "doc_b")
  }

  /** Sub-document (line/paragraph-level) dedup — the CCNet/RefinedWeb
    * step that removes boilerplate REPEATED ACROSS documents while
    * keeping each document's unique content. The corpus has no newline
    * structure, so the "paragraph" unit is a deterministic chunker:
    * consecutive `k`-token windows. Every chunk keeps only its FIRST
    * global occurrence (min (doc_id, idx) — a total order, so the result
    * is partitioning-independent), and each document is reassembled from
    * its surviving chunks in original order.
    *
    * Scale shape: ONE corpus scan, one shuffle on the chunk text, one
    * shuffle on doc_id to reassemble. First-occurrence selection is
    * `row_number() over (partition by chunk order by doc_id, idx) = 1`
    * ON PURPOSE: Catalyst's WindowGroupLimit rewrite pushes the rank
    * filter below the exchange (a map-side top-1 per chunk), so the
    * shuffle carries at most one candidate per (chunk, input partition) —
    * strictly less data than the groupBy-min + join-back formulation,
    * which also re-scans the corpus for the join side. The per-doc chunk
    * count is computed from the token array BEFORE the explode (no
    * second scan). Documents whose every chunk is owned elsewhere drop
    * out (fully-boilerplate docs). */
  def chunkDedup(df: DataFrame, k: Int): DataFrame = {
    require(k > 0)
    val chunks = df
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        expr(s"((size(tk)-1) div $k) + 1").cast("bigint").as("n_chunks"),
        posexplode(expr(
          s"transform(sequence(0, (size(tk)-1) div $k), " +
            s"i -> array_join(slice(tk, i*$k+1, $k), ' '))")))
      .toDF("doc_id", "n_chunks", "idx", "chunk")
    val w = Window.partitionBy(col("chunk")).orderBy(col("doc_id"), col("idx"))
    chunks.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"), col("n_chunks"))
      .agg(sort_array(collect_list(struct(col("idx"), col("chunk")))).as("cs"))
      .select(col("doc_id"), col("n_chunks"),
        expr("size(cs)").cast("bigint").as("n_kept"),
        expr("array_join(transform(cs, c -> c.chunk), ' ')").as("text_dedup"))
  }

  /** Incremental exact dedup — the cross-RUN shape: a pipeline ingesting
    * daily batches must not re-admit content already accepted in ANY
    * previous run, without ever re-scanning previous runs' text. The
    * state that crosses runs is a content-hash STORE (16 bytes/doc —
    * a 100 TB corpus's store is ~tens of GB, a routine shuffle side).
    *
    * Two steps, each one shuffle: first-occurrence-within-batch on the
    * hash (`row_number = 1` — WindowGroupLimit keeps one candidate per
    * hash per map task, same rationale as [[chunkDedup]]), then an
    * anti-join against the store. The surviving rows' hashes are exactly
    * what the caller appends to the store for the next run. */
  def incrementalExact(newDocs: DataFrame, seenHashes: DataFrame): DataFrame = {
    val hashed = newDocs.withColumn("text_hash", md5(col("text")))
    val w = Window.partitionBy(col("text_hash")).orderBy(col("doc_id"))
    hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .join(seenHashes, Seq("text_hash"), "left_anti")
  }

  /** Streaming twin of [[incrementalExact]]: a `foreachBatch` sink that
    * dedups every micro-batch against the ACCUMULATED hash store — the
    * unbounded-history complement to `dropDuplicatesWithinWatermark`
    * (which bounds state by TIME; this bounds nothing and pays O(store)
    * disk, the right trade when "seen once, ever" is the contract).
    *
    * Idempotent replay by construction: both writes go to
    * `batch=<batchId>` subdirectories in overwrite mode, so a replayed
    * batch overwrites its own output instead of duplicating it, and the
    * store read EXCLUDES the current batch's own partition — a replay
    * whose earlier attempt already wrote its store subdir must not
    * anti-join against its own hashes (that path would overwrite the
    * data dir with an empty frame). The kept frame is eagerly
    * localCheckpoint'ed so the second write cannot re-evaluate the
    * anti-join against a store that now contains its own hashes. */
  def incrementalSink(out: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val storeDir = s"$out/store"
    // Hadoop FileSystem, not java.io.File: the store is the production
    // cross-run state and lives wherever `out` points — on HDFS/S3 a
    // local-File exists() is always false and every previously-seen
    // document would be silently re-admitted.
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val storeExists = storePath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(storePath)
    val seen =
      if (storeExists)
        spark.read.parquet(storeDir)
          .filter(col("batch") =!= batchId)
          .select("text_hash")
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "text_hash", org.apache.spark.sql.types.StringType))))
    val kept = incrementalExact(batch, seen).localCheckpoint(true)
    kept.write.mode("overwrite").parquet(s"$out/data/batch=$batchId")
    kept.select("text_hash").write.mode("overwrite")
      .parquet(s"$storeDir/batch=$batchId")
  }

  /** Incremental NEAR-dup gate — [[incrementalExact]]'s contract lifted
    * from "same bytes" to "near-duplicate content": a new document is
    * rejected when any of its MinHash LSH band keys was already seen, in
    * this batch by an earlier-id document or in ANY previous run via the
    * band-key store. The cross-run state is band keys only
    * (`k/rowsPerBand` short strings per doc — same tens-of-GB-per-100 TB
    * order as the exact store), never text.
    *
    * Unlike the all-pairs LSH path this formulation has NO quadratic
    * stage and needs no bucket cap: within-batch survival is a per-key
    * `min(doc_id)` (partial-aggregated map-side), the store check is one
    * left-semi join, and the final gate is one anti-join — three
    * shuffles total, all linear in batch + store size. A doc dropped
    * within-batch still shields later docs (any-earlier-ID rule, same
    * pinned semantics as `Similarity.semanticDedup`). Docs too short to
    * shingle (< n tokens) have no band keys: always admitted, never
    * stored — the gate is about CONTENT overlap, which they can't have.
    *
    * Returns the kept documents; callers append `bandKeys(kept…)` of the
    * WHOLE batch (kept and dropped — dropped docs are still seen
    * content) to the store for the next run, as [[incrementalNearDupSink]]
    * does. */
  def incrementalNearDup(newDocs: DataFrame, seenBands: DataFrame,
                         n: Int = 2, k: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val bands = bandFrame(newDocs, n, k, rowsPerBand)
      .select(col("doc_id"), concat_ws("#", col("band"), col("band_key")).as("bkey"))
    // ONE pass over the band frame (r20, same fix as
    // ImageDedup.incrementalBandGate): the old two-branch shape ran the
    // whole signature pipeline twice — within-batch drop and store drop
    // now evaluate on a single pass, the store join riding the window's
    // bkey partitioning; OR-null keeps semi-join miss semantics.
    val w = Window.partitionBy(col("bkey"))
    val seen = seenBands.select(col("bkey")).distinct()
      .withColumn("in_store", lit(true))
    val dropped = bands
      .withColumn("first_id", min(col("doc_id")).over(w))
      .join(seen, Seq("bkey"), "left")
      .filter(col("doc_id") > col("first_id") || col("in_store"))
      .select("doc_id").distinct()
    newDocs.join(dropped, Seq("doc_id"), "left_anti")
  }

  /** The (doc_id, bkey) frame [[incrementalNearDup]] gates on — exposed
    * so sinks can persist the batch's keys to the cross-run store. */
  def nearDupBandKeys(docs: DataFrame, n: Int = 2, k: Int = 6,
                      rowsPerBand: Int = 2): DataFrame =
    bandFrame(docs, n, k, rowsPerBand)
      .select(col("doc_id"), concat_ws("#", col("band"), col("band_key")).as("bkey"))

  /** Streaming twin of [[incrementalNearDup]] — same `foreachBatch`
    * idempotent-replay shape as [[incrementalSink]]: per-batch overwrite
    * subdirectories, store read excludes the batch's own partition, kept
    * frame eagerly checkpointed before the two writes. The store records
    * the ENTIRE batch's band keys (dropped docs are seen content too —
    * a third copy arriving next run must still be rejected even though
    * the second was). */
  def incrementalNearDupSink(out: String, n: Int = 2, k: Int = 6,
                             rowsPerBand: Int = 2)(batch: DataFrame, batchId: Long): Unit = {
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
          .select("bkey")
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "bkey", org.apache.spark.sql.types.StringType))))
    val stable = batch.localCheckpoint(true)
    val kept = incrementalNearDup(stable, seen, n, k, rowsPerBand)
      .localCheckpoint(true)
    kept.write.mode("overwrite").parquet(s"$out/data/batch=$batchId")
    nearDupBandKeys(stable, n, k, rowsPerBand).select("bkey").distinct()
      .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
  }

  /** Cross-run store maintenance for [[incrementalNearDupSink]]: the
    * store accrues one partition per batch, with band keys REPEATED
    * across batches (each batch writes its own distinct set — cheap at
    * write time, append-only, replay-safe). Over months of runs the
    * store's read cost grows with run count, not content. Compaction
    * folds it to one globally-distinct, range-sorted copy — the same
    * maintenance job as file compaction (`sources/Layout.compact`), but
    * for dedup STATE: gate semantics are pure set membership, so
    * `distinct` preserves them exactly (spec-asserted).
    *
    * Writes to `destDir` (callers swap directories atomically at the
    * orchestration layer — an in-place rewrite could race a concurrent
    * ingest's store read). Keys land range-partitioned and sorted so the
    * gate's semi-join against a compacted store can sort-merge without a
    * shuffle on the store side, and so per-file min/max statistics prune
    * store files when the batch's key range is narrow. Returns
    * (before, after) row counts for ops telemetry. */
  def compactBandStore(spark: org.apache.spark.sql.SparkSession,
                       storeDir: String, destDir: String): (Long, Long) =
    compactBandStoreRetain(spark, storeDir, destDir, minBatch = Long.MinValue)

  /** Compaction + TTL retention: additionally age out keys whose NEWEST
    * sighting is older than `minBatch` — the content hasn't recurred for
    * that many runs, so the gate stops charging state for it (a
    * re-arrival after age-out is admitted once and re-recorded; that is
    * the retention trade, chosen explicitly by the caller). Retention is
    * on max(batch) per key, NOT per row: a key seen in an old batch AND
    * a recent one survives with its full dedup power. Bounds the store
    * in TIME the way `distinct` bounds it in CONTENT.
    *
    * The compacted store stays AGE-AWARE: each key is written under its
    * newest batch partition (not a flattened batch=-1), so retention
    * composes — the NEXT compaction still sees true last-sighting ages,
    * and the sink's own-batch exclusion filter keeps working. */
  def compactBandStoreRetain(spark: org.apache.spark.sql.SparkSession,
                             storeDir: String, destDir: String,
                             minBatch: Long): (Long, Long) = {
    // enforced, not just documented: an in-place rewrite would overwrite
    // the store while before.count() below still needs to re-read it
    require(destDir != storeDir,
      s"compaction must write to a fresh directory, got destDir == storeDir == $storeDir")
    val before = spark.read.parquet(storeDir)
    val compacted = before
      .groupBy(col("bkey"))
      .agg(max(col("batch").cast("long")).as("batch"))
      .filter(col("batch") >= minBatch)
      .repartitionByRange(col("bkey"))
      .sortWithinPartitions("bkey")
      .localCheckpoint(true)
    compacted.write.mode("overwrite").partitionBy("batch").parquet(destDir)
    (before.count(), compacted.count())
  }

  /** Candidate-pair verification by edit distance — the "verify" stage a
    * production dedup pipeline runs between LSH candidate generation and
    * cluster formation (MinHash recall is probabilistic; edit distance is
    * the ground-truth-ish signal that kills coincidental band collisions).
    *
    * Scale shape: the pair set is tiny relative to the corpus (bounded by
    * the LSH bucket cap), so this is two key-equi joins that pull ONLY the
    * compared prefixes through the shuffle — never full documents.
    * `prefixLen` bounds the per-pair cost; document prefixes discriminate
    * near-duplicates as well as full texts at a fraction of the compute
    * (the standard truncated-comparison trade). `maxDist` makes the DP
    * BANDED — O(len·maxDist) with early exit instead of O(len²), emitting
    * -1 beyond the threshold: a verifier only cares whether the distance
    * is small, not how big a large one is.
    *
    * The pair frame is BYTE-tiny but CPU-dense (a quadratic kernel per
    * row), exactly the shape AQE's size-based coalescing mis-sizes: ~1 MB
    * of pairs collapses to ONE post-join partition and the whole kernel
    * runs single-threaded (measured 23 s at sf0.1). The explicit
    * repartition before the scoring projection spreads the kernel across
    * the cluster — the general lesson for compute-bound-not-size-bound
    * stages.
    *
    * Both engines implement character-level Levenshtein over the same
    * ASCII corpus, so the distance is engine-exact. */
  def pairEditDistance(docs: DataFrame, pairs: DataFrame, prefixLen: Int,
                       maxDist: Int): DataFrame = {
    val prefixed = docs.select(col("doc_id"),
      substring(col("text"), 1, prefixLen).as("prefix"))
    val p = pairs.repartition(
      pairs.sparkSession.sessionState.conf.numShufflePartitions)
    p.join(prefixed.select(col("doc_id").as("doc_a"), col("prefix").as("pa")), "doc_a")
      .join(prefixed.select(col("doc_id").as("doc_b"), col("prefix").as("pb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pa"), col("pb"), maxDist).as("editdist"))
  }

  /** Duplicated-span coverage: per document, the fraction of token
    * positions lying inside at least one n-gram that also occurs in a
    * DIFFERENT document — exact modulo 64-bit hash collisions (n-grams
    * travel as xxhash64 keys; a collision would count a non-duplicated
    * span as duplicated with probability ~N²/2⁶⁵ over N distinct
    * n-grams — negligible but nonzero, and the reason the DuckDB oracle,
    * which compares full strings, could in principle diverge at extreme
    * corpus sizes) — the sub-document signal behind suffix-array
    * "exact substring" training-data dedup (find the copied spans, not
    * just near-identical whole docs). Unlike [[chunkDedup]]'s fixed
    * k-token chunks, spans here are position-free: a copied paragraph is
    * found wherever it lands in the target doc.
    *
    * Shape, all linear: positional n-grams (one row per position, n-gram
    * carried as a 64-bit xxhash so the two shuffles move 8-byte keys, not
    * strings), corpus-duplicate detection as `min(doc_id) != max(doc_id)`
    * (map-side-combining partial min/max — cheaper than count_distinct
    * and exact for the >= 2-docs question), a semi-join back to
    * occurrences, and interval union per doc. The union exploits that all
    * intervals have length n and arrive sorted by start: each occurrence
    * adds `min(n, start - prev_start)` covered tokens (first adds n), so
    * a per-doc window with lag(start) replaces interval bookkeeping; the
    * window is bounded by document length, never corpus size.
    *
    * The occurrence frame is consumed twice (duplicate detection + the
    * semi-join), so it is localCheckpoint'd: one tokenize+explode pass
    * materialized, two cheap columnar reads — the same
    * materialize-what-you-reread rule as [[ngramPairIntersections]]
    * (measured 1.62 s → 1.39 s min-of-3 at sf0.1). */
  def dupSpanCoverage(df: DataFrame, n: Int): DataFrame = {
    val base = withTokens(df)
      .select(col("doc_id"), col("tk"), size(col("tk")).cast("bigint").as("n_tokens"))
    val occ = base
      .select(col("doc_id"), posexplode(shinglesOf(col("tk"), n, distinct = false)))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("start"),
        xxhash64(col("col")).as("ng"))
      .localCheckpoint()
    val dup = occ.groupBy(col("ng"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("ng"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val covered = occ.join(dup, Seq("ng"), "left_semi")
      .withColumn("contrib",
        least(lit(n), coalesce(col("start") - lag(col("start"), 1).over(w), lit(n))))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).cast("bigint").as("covered"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered"), lit(0L)).as("dup_covered"),
        when(col("n_tokens") > 0,
          coalesce(col("covered"), lit(0L)).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Provenance overlap matrix: for every source pair, the number of
    * DISTINCT n-grams both sources contain — the "which feeds copy from
    * which" audit run before choosing what to dedup against what (a
    * crawl that mirrors another source inflates its apparent volume).
    *
    * Scale shape: (source, ngram-hash) distinct — an 8-byte-key shuffle
    * — then per-ngram source SETS via collect_set, which is bounded by
    * the SOURCE DOMAIN (provenance labels are a small closed set; this
    * operator assumes that, unlike doc-id buckets which need caps), and
    * reducer-side unordered-pair expansion. No doc-to-doc quadratic
    * stage anywhere: a viral n-gram present in all S sources costs
    * C(S,2) pair rows, not pairs-of-documents.
    *
    * Measured negative result (don't "optimize" this): fusing the
    * pre-distinct into the groupBy (collect_set straight off the
    * occurrence stream — one shuffle instead of two) is SLOWER at sf0.1
    * (1.39 s vs 1.20 s min-of-3): per-ngram set state is
    * high-cardinality, so ObjectHashAggregate falls back to sort-based,
    * while the distinct stays in codegen hash-agg. Two cheap codegen
    * exchanges beat one object-agg exchange here. */
  def sourceOverlap(df: DataFrame, n: Int): DataFrame = {
    val ng = df.select(col("source"), toks(col("text")).as("tk"))
      .select(col("source"), explode(shinglesOf(col("tk"), n)).as("s"))
      .select(col("source"), xxhash64(col("s")).as("ng"))
      .distinct()
    val bySources = ng.groupBy(col("ng"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) > 1)
    val pairs = flatten(transform(col("srcs"), (a, i) =>
      transform(slice(col("srcs"), i + 2, size(col("srcs"))),
        b => struct(a.as("source_a"), b.as("source_b")))))
    bySources.select(explode(pairs).as("p"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
