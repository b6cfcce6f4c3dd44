package graft.dedup

import graft.SparkSuite

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("shingles: docs shorter than n produce no shingles, not an ANSI error") {
    val sh = Dedup.docShingles(docs("", "one", "one two", "a b c"), 2)
      .as[(Long, String)].collect().toSeq.sorted
    assert(sh === Seq((2L, "one two"), (3L, "a b"), (3L, "b c")))
  }

  test("shingles are distinct per doc") {
    val sh = Dedup.docShingles(docs("x y x y x y"), 2).count()
    assert(sh === 2L) // {"x y", "y x"} only
  }

  test("exact dedup keeps the smallest doc_id per content hash") {
    val r = Dedup.exact(docs("same", "same", "other"))
      .as[(String, Long, Long)].collect().map(t => (t._2, t._3)).toSeq.sorted
    assert(r === Seq((0L, 2L), (2L, 1L)))
  }

  test("minhash signatures: identical shingle sets give identical signatures") {
    val sig = Dedup.minhashSignatures(docs("a b c d", "a b c d", "q r s t"), 2, 6)
      .collect().map(r => (r.getLong(0), r.toSeq.drop(1))).sortBy(_._1)
    assert(sig(0)._2 === sig(1)._2)
    assert(sig(0)._2 !== sig(2)._2)
  }

  test("LSH pairs finds identical docs; distinct pairs only") {
    val pairs = Dedup.minhashLshPairs(docs("a b c d", "a b c d", "q r s t"), 2, 6, 2)
      .as[(Long, Long)].collect().toSeq
    assert(pairs === Seq((0L, 1L)))
  }

  test("lshReprPairs: class pairs with member counts; intra-class C(m,2)") {
    // two classes: "a b c d" ×3 (class repr 0), "a b c x" ×2 (repr 3) —
    // near-dup texts sharing band keys, plus an unrelated singleton
    val d = docs("a b c d", "a b c d", "a b c x", "a b c d", "a b c x",
      "q r s t")
    val r = Dedup.lshReprPairs(d, 2, 6, 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    // intra-class rows: (0,0) C(3,2)=3 and (2,2) C(2,2)=1; the cross row
    // (0,2) 3*2=6 appears iff the classes share a band bucket
    assert(r.contains((0L, 0L, 3L, 3L, 3L)))
    assert(r.contains((2L, 2L, 2L, 2L, 1L)))
    assert(r.forall { case (a, b, na, nb, mp) =>
      a <= b && mp > 0 && (a != b || na == nb) })
    // the singleton class never implies a pair
    assert(!r.exists { case (a, b, _, _, _) => a == 5L || b == 5L })
  }

  test("lshReprPairs exactness: sum(member_pairs) == raw pair count, " +
    "member-weighted cap drops the same buckets") {
    // duplicate-dense corpus: 30 copies of one text (over a cap of 8 →
    // its bucket is dropped by BOTH operators), 3+2 copies of two
    // near-dup texts, singletons
    val texts = Seq.fill(30)("big dup cluster text") ++
      Seq.fill(3)("a b c d") ++ Seq.fill(2)("a b c x") ++
      Seq("lone wolf one", "another singleton")
    val d = docs(texts: _*)
    val raw = Dedup.minhashLshPairs(d, 2, 6, 2, maxBucket = 8).count()
    val repr = Dedup.lshReprPairs(d, 2, 6, 2, maxBucket = 8)
    import org.apache.spark.sql.functions.sum
    val implied = repr.agg(sum("member_pairs")).head().getLong(0)
    assert(implied === raw)
    assert(raw > 0) // the identity isn't vacuous
    // the 30-copy class was capped out: its repr never appears
    assert(repr.filter($"n_a" === 30L || $"n_b" === 30L).count() === 0L)
  }

  test("LSH maxBucket cap drops mega-buckets (skew guard)") {
    val five = docs("a b c", "a b c", "a b c", "a b c", "a b c")
    assert(Dedup.minhashLshPairs(five, 2, 6, 2).count() === 10L) // C(5,2)
    assert(Dedup.minhashLshPairs(five, 2, 6, 2, maxBucket = 4).count() === 0L)
  }

  test("lshPairVolume predicts the pair explode without materializing it") {
    // 4 identical docs + 2 unique: every band bucket for the clones has
    // size 4 ⇒ C(4,2)=6 per band × 3 bands = 18 candidate slots (the
    // explode's cost), while the DISTINCT pair frame has only C(4,2)=6
    // rows — volume counts work, pairs count output.
    val six = docs("a b c", "a b c", "a b c", "a b c", "q r s", "x y z")
    val v = Dedup.lshPairVolume(six, 2, 6, 2).head()
    assert(v.getLong(0) === 18L)   // candidate_pairs
    assert(v.getLong(1) === 0L)    // buckets_over_cap
    assert(v.getLong(2) === 3L)    // buckets_pairing (one per band)
    assert(Dedup.minhashLshPairs(six, 2, 6, 2).count() === 6L)
    // the skew cap zeroes the volume AND counts the dropped buckets
    val capped = Dedup.lshPairVolume(six, 2, 6, 2, maxBucket = 3).head()
    assert(capped.getLong(0) === 0L)
    assert(capped.getLong(1) === 3L)
  }

  test("incrementalExact: within-batch first occurrence, store hits dropped, survivors feed the store") {
    import org.apache.spark.sql.functions.md5
    import org.apache.spark.sql.functions.col
    // history contains "old"; the new batch has an internal dup of "fresh"
    // and a re-arrival of "old"
    val store = Seq("old").toDF("t").select(md5(col("t")).as("text_hash"))
    val batch = Seq((10L, "fresh"), (11L, "old"), (12L, "fresh"), (13L, "brand"))
      .toDF("doc_id", "text")
    val kept = Dedup.incrementalExact(batch, store)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept === Seq(10L, 13L)) // first "fresh" and "brand"; no "old", no second "fresh"
    // idempotence across runs: append survivors' hashes, re-run same batch -> nothing new
    val store2 = store.union(
      Dedup.incrementalExact(batch, store).select("text_hash"))
    assert(Dedup.incrementalExact(batch, store2).count() == 0)
  }

  test("incrementalNearDup: near-dup (not byte-equal) content is gated, short docs pass") {
    import org.apache.spark.sql.functions.col
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    val nearDup = base.replace("lazy", "sleepy") // most bigrams shared
    // sanity: the pair actually collides on >= 1 LSH band
    val pairDocs = Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text")
    assert(Dedup.minhashLshPairs(pairDocs, 2, 6, 2).count() === 1L,
      "test texts must be LSH-colliding for the rest to be meaningful")
    // store knows `base`; the batch carries a near-dup of it, an
    // in-batch near-dup pair, a fresh doc, and a 1-token doc
    val store = Dedup.nearDupBandKeys(Seq((0L, base)).toDF("doc_id", "text"))
      .select("bkey").distinct()
    val batch = Seq(
      (10L, nearDup),                          // near-dup of stored content
      (11L, "completely different text about spark and flink engines"),
      (12L, "completely different text about spark and flink systems"), // near-dup of 11
      (13L, "hi")                              // < n tokens: no bands, always kept
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalNearDup(batch, store)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept === Seq(11L, 13L))
    // cross-run idempotence: append the batch's keys, re-run -> only the
    // bandless short doc survives the gate again
    val store2 = store.union(Dedup.nearDupBandKeys(batch).select("bkey")).distinct()
    val kept2 = Dedup.incrementalNearDup(batch, store2)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept2 === Seq(13L))
  }

  test("simhash: 64-bit hex output, equal for identical docs") {
    val r = Dedup.simhash(docs("alpha beta gamma", "alpha beta gamma", "x"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(r.forall(_._2.matches("[0-9a-f]{16}")))
    assert(r(0)._2 === r(1)._2)
    assert(r(0)._2 !== r(2)._2)
  }

  test("connected components: empty pair set yields an empty result, no crash") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() === 0L)
  }

  test("connected components: multi-hop chains collapse to the min doc_id") {
    // chain 1-2-3 (no direct 1-3 edge) + isolated pair 7-8
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("connected components: a long path converges within the iteration cap") {
    val pairs = (1L until 15L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(cc.forall(_._2 == 1L) && cc.length === 15)
  }

  test("connected components: multi-level contraction path == single-pass result") {
    // Force the recursive contraction branch with a 2-edges-per-partition
    // budget: components spanning many partitions must still collapse to
    // their global min, and settled components must survive composition.
    // Graph: long path 1..10, triangle 20-21-22, isolated pair 30-31.
    val edges = (1L until 10L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L))
    val pairs = edges.toDF("doc_a", "doc_b")
    val expected = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val multi = Dedup.connectedComponents(pairs, edgesPerPartition = 2L)
      .as[(Long, Long)].collect().toMap
    assert(expected ===
      ((1L to 10L).map(_ -> 1L) ++ Seq(20L -> 20L, 21L -> 20L, 22L -> 20L,
        30L -> 30L, 31L -> 30L)).toMap)
    assert(multi === expected)
  }

  test("connectedComponentsByClass == CC over raw member pairs, byte-identical: " +
    "cross-class merges, intra-class-only cliques, capped buckets, inactive docs") {
    // duplicate-dense corpus exercising every admission case the class
    // decomposition must mirror: a 30-copy class capped out at
    // maxBucket=8 (absent from BOTH), two near-dup classes that merge
    // across class lines, a 4-copy class whose component never crosses
    // class lines (label = its own representative), singletons that
    // never pair, and a sub-n-token doc with no signature at all
    val texts = Seq.fill(30)("big dup cluster text") ++
      Seq.fill(3)("a b c d") ++ Seq.fill(2)("a b c x") ++
      Seq.fill(4)("z z top tribute band") ++
      Seq("lone wolf one", "another singleton", "xx")
    val d = docs(texts: _*)
    val raw = Dedup.connectedComponents(
        Dedup.minhashLshPairs(d, 2, 6, 2, maxBucket = 8))
      .as[(Long, Long)].collect().toSeq.sorted
    val byCls = Dedup.connectedComponentsByClass(d, 2, 6, 2, maxBucket = 8)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(raw.nonEmpty) // the identity isn't vacuous
    assert(byCls === raw)
    // the intra-class-only clique is present and labeled by its repr
    // (doc_ids 35..38), proving the coalesce path for class components
    // that never crossed class lines
    assert(byCls.filter(_._1 >= 35L).forall(_._2 === 35L))
    assert(byCls.count(_._1 >= 35L) === 4)
    // all-singleton corpus: both forms empty
    val singletons = docs("aa bb cc", "dd ee ff", "gg hh ii")
    assert(Dedup.connectedComponentsByClass(singletons, 2, 6, 2).count() === 0L)
  }

  test("decontaminate: docs sharing any bench bigram are dropped, others kept") {
    val d = docs("the quick brown fox", "a quick brown dog", "totally unrelated words here")
    // bench = doc 0; doc 1 shares the bigram "quick brown"; doc 2 clean
    val r = Dedup.decontaminate(d, d.filter($"doc_id" === 0L), n = 2)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(r(0)._3 === false) // the bench doc flags itself
    assert(r(1) === ((1L, 1L, false)))
    assert(r(2) === ((2L, 0L, true)))
  }

  test("simhash pairs: 8-band candidates cover everything 4-band finds") {
    // pigeonhole: 8 bands guarantee recall to hamming 7 ⊇ hamming ≤ 3,
    // so the 4-band pair set must be a subset of the 8-band one
    val d = docs("alpha beta gamma delta", "alpha beta gamma delta",
      "alpha beta gamma x", "alpha beta y x", "zz yy xx ww vv uu")
    val p4 = Dedup.simhashPairs(d)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val p8 = Dedup.simhashPairs(d, maxHamming = 7, bands = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(p4.subsetOf(p8))
    assert(p8.contains((0L, 1L)))
  }

  test("pair agreement: hand-computed counts over three pair sets") {
    val mh = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val sh = Seq((1L, 2L), (3L, 4L), (7L, 8L)).toDF("doc_a", "doc_b")
    val em = Seq((1L, 2L), (9L, 10L)).toDF("doc_a", "doc_b")
    val r = Dedup.pairAgreement(mh, sh, em)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r === ((3L, 3L, 2L, 2L, 1L, 1L, 1L)))
  }

  test("simhash pairs: identical docs at hamming 0; disjoint docs not paired") {
    val d = docs("alpha beta gamma delta", "alpha beta gamma delta",
      "zz yy xx ww vv uu tt ss")
    val pairs = Dedup.simhashPairs(d)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs === Seq((0L, 1L, 0)))
  }

  test("ngram jaccard: hand-computed overlap, threshold respected") {
    // doc0: shingles {a b, b c, c d}; doc1: {a b, b c, c x}
    // jaccard = 2 / (3 + 3 - 2) = 0.5
    val d = docs("a b c d", "a b c x")
    val r = Dedup.ngramJaccardPairs(d, 2, maxDf = 20L, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(r === Seq((0L, 1L, 0.5)))
    assert(Dedup.ngramJaccardPairs(d, 2, maxDf = 20L, threshold = 0.51).count() === 0L)
  }

  test("ngram jaccard: maxDf drops stop-shingles from numerator AND denominator") {
    // "t u" appears in 3 docs → dropped at maxDf=2; docs 0,1 still share "u v"
    val d = docs("t u v", "t u v", "t u x")
    val r = Dedup.ngramJaccardPairs(d, 2, maxDf = 2L, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(r === Seq((0L, 1L, 1.0))) // capped universe: both docs = {"u v"}
  }

  test("chunkDedup: first global occurrence survives, docs reassemble in order, " +
    "fully-boilerplate docs drop out") {
    // k=2 chunks: doc0 = ["a b","c d"], doc1 = ["a b","e f"], doc2 = ["c d"]
    val d = docs("a b c d", "a b e f", "c d")
    val r = Dedup.chunkDedup(d, k = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // doc0 owns "a b" and "c d"; doc1 keeps only "e f"; doc2 loses its
    // single chunk to doc0 and disappears
    assert(r.toSeq === Seq((0L, 2L, 2L, "a b c d"), (1L, 2L, 1L, "e f")))
  }

  test("canonicalKeep: best-by-score survives per cluster, not min-id; singletons keep") {
    // cluster 10: docs 10 (len 5), 11 (len 9), 12 (len 9) → 11 wins the
    // tie against 12 by id, and min-id 10 does NOT survive; 99 is
    // unclustered → singleton keep
    val d = Seq((10L, 5L), (11L, 9L), (12L, 9L), (99L, 1L))
      .toDF("doc_id", "n_chars")
    val clusters = Seq((10L, 10L), (11L, 10L), (12L, 10L))
      .toDF("doc_id", "cluster_id")
    val r = Dedup.canonicalKeep(d, clusters, "n_chars")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(r === Seq((10L, 10L, false), (11L, 10L, true),
      (12L, 10L, false), (99L, 99L, true)))
    // exactly one survivor per cluster, always
    val perCluster = r.groupBy(_._2).view.mapValues(_.count(_._3)).toMap
    assert(perCluster.values.forall(_ == 1))
  }

  test("chunkDedup: ragged tail chunk is its own unit and result is partition-independent") {
    val d = docs("p q r s t", "p q r s t")  // k=2 → ["p q","r s","t"]
    val r1 = Dedup.chunkDedup(d, k = 2).as[(Long, Long, Long, String)]
      .collect().sortBy(_._1)
    assert(r1.toSeq === Seq((0L, 3L, 3L, "p q r s t")))
    val r2 = Dedup.chunkDedup(d.repartition(7), k = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r2.toSeq === r1.toSeq)
  }

  test("dupSpanCoverage: overlapping spans union, same-doc repeats don't count, " +
    "short docs get 0") {
    // n=2: docs 0/1 share "a b c" (spans [1,2]+[2,3] → union covers 3
    // tokens of each); doc 2 repeats "x y" INSIDE itself only (min ==
    // max doc → not duplicated); doc 3 is 1 token (< n → no n-grams)
    val d = docs("a b c p", "q a b c", "x y z x y", "w")
    val r = Dedup.dupSpanCoverage(d, n = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(r.toSeq === Seq(
      (0L, 4L, 3L, 0.75), (1L, 4L, 3L, 0.75),
      (2L, 5L, 0L, 0.0), (3L, 1L, 0L, 0.0)))
  }

  test("sourceOverlap: counts distinct shared n-grams per source pair, " +
    "multi-source grams expand to all pairs") {
    import org.apache.spark.sql.functions.{col, element_at, lit}
    // n=2: "a b" in {s1,s2} (1 pair); "c d" in {s1,s2,s3} (3 pairs);
    // within-source repetition (two s1 docs with "a b") must not inflate
    val d = docs("a b x", "a b y c d", "a b z c d", "c d q")
      .withColumn("source",
        element_at(lit(Array("s1", "s1", "s2", "s3")),
          col("doc_id").cast("int") + 1))
    val r = Dedup.sourceOverlap(d, n = 2)
      .as[(String, String, Long)].collect().sortBy(p => (p._1, p._2))
    assert(r.toSeq === Seq(("s1", "s2", 2L), ("s1", "s3", 1L), ("s2", "s3", 1L)))
  }

  test("containment pairs: a doc fully quoted inside a longer one scores 1.0 " +
    "one-way while Jaccard stays low") {
    val d = docs("p q r s t u v w x y z a b c d e f g h i", "p q r s")
    val inter = Dedup.ngramPairIntersections(d, n = 2, maxDf = 20L)
    val cont = Dedup.containmentFromIntersections(inter, threshold = 0.9)
      .as[(Long, Long, Double, Double)].collect()
    // doc 1's 3 bigrams all occur in doc 0 → containment(b in a) = 1.0
    assert(cont.toSeq === Seq((0L, 1L, 3.0 / 19.0, 1.0)))
    val jac = Dedup.jaccardFromIntersections(inter, threshold = 0.5).collect()
    assert(jac.isEmpty, "Jaccard should bury the quote-inclusion pair")
  }

  test("dupSpanCoverage: disjoint duplicated spans in one doc sum, not merge") {
    // n=2: doc 0 shares "a b" with doc 1 and "c d" with doc 2; spans
    // [1,2] and [4,5] are disjoint → 4 covered tokens of 5
    val d = docs("a b z c d", "a b", "c d")
    val r = Dedup.dupSpanCoverage(d, n = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(r.head === ((0L, 5L, 4L, 0.8)))
    assert(r.toSeq.drop(1) === Seq((1L, 2L, 2L, 1.0), (2L, 2L, 2L, 1.0)))
  }
}
