package graft.sim

import graft.SparkSuite

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(64)(i => (math.sin(seed * 64 + i) * 10).toFloat)

  test("embedding near-dup: identical vectors pair at cosine 1.0, distinct ones don't") {
    val emb = Seq((0L, vec(1)), (1L, vec(1)), (2L, vec(2)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(emb, planes = 4, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((0L, 1L)))
    assert(math.abs(pairs.head._3 - 1.0) < 1e-12)
  }

  test("cosine_sim: NULL on length mismatch or null elements, like the HOF folds") {
    import org.apache.spark.sql.functions._
    val df = spark.sql(
      """SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d)) AS mismatch,
        |       cosine_sim(array(1.0d, cast(null AS double)), array(1.0d, 2.0d)) AS nullelem,
        |       cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS same""".stripMargin)
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getDouble(2) === 1.0)
  }

  test("cosine_sim expression is bit-identical to the HOF fold formulation") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val paired = emb.as("a").crossJoin(emb.as("b"))
      .select(col("a.v").as("va"), col("b.v").as("vb"))
    val hof = Similarity.dot(col("va"), col("vb")) /
      (Similarity.norm(col("va")) * Similarity.norm(col("vb")))
    val both = paired.select(
      Similarity.cosine(col("va"), col("vb")).as("native"), hof.as("hof"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    assert(both.forall { case (n, h) =>
      java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h)
    })
  }

  test("trained IVF: training moves centroids, search stays exact, deterministic") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val seed = Similarity.trainCentroids(emb, nlist = 4, iters = 0)
    val trained = Similarity.trainCentroids(emb, nlist = 4, iters = 2)
    assert(seed.map(_._1).toSeq === trained.map(_._1).toSeq)
    assert(seed.zip(trained).exists { case ((_, a), (_, b)) => !a.sameElements(b) },
      "two Lloyd rounds left every centroid untouched")
    // decimal-sum means ⇒ bit-deterministic training
    val again = Similarity.trainCentroids(emb, nlist = 4, iters = 2)
    assert(trained.zip(again).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    // nlist=1 degenerates to brute force regardless of training
    val brute = Similarity.bruteForceTopK(emb, nQueries = 5, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val one = Similarity.ivfTopKTrained(emb, nQueries = 5, k = 3, nlist = 1, iters = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(one === brute)
  }

  test("int8 quantization: hand-computed values, zero-vector guard, range") {
    val emb = Seq(
      (0L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector → all-zero, no NaN
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(emb)
      .as[(Long, Int, Int)].collect().toSeq.sorted
    assert(q === Seq(
      (0L, 0, 127), (0L, 1, -64), (0L, 2, 32), (0L, 3, 0),
      (1L, 0, 0), (1L, 1, 0), (1L, 2, 0), (1L, 3, 0)))
    val full = Similarity.quantizeInt8(
      Seq((2L, vec(7))).toDF("vec_id", "embedding"))
      .as[(Long, Int, Int)].collect()
    assert(full.forall(r => r._3 >= -127 && r._3 <= 127))
    assert(full.exists(r => math.abs(r._3) == 127)) // the max attains the scale
  }

  test("IVF with nlist=1 degenerates to brute force (single probe list)") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.bruteForceTopK(emb, nQueries = 5, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, nQueries = 5, k = 3, nlist = 1)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(ivf === brute)
    assert(ivf.nonEmpty)
  }

  test("IVF nprobe=2 recall is >= nprobe=1 (results move toward brute force)") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.bruteForceTopK(emb, 5, 3)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    def recall(nprobe: Int): Double = {
      val got = Similarity.ivfTopK(emb, 5, 3, nlist = 8, nprobe = nprobe)
        .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
      got.count(brute.contains).toDouble / brute.size
    }
    assert(recall(2) >= recall(1))
    assert(recall(8) === 1.0) // probing every list IS brute force
  }

  test("ivfSweep: each grid point is bit-identical to the standalone ivfTopK call") {
    // the shared-assignment sweep (one localCheckpoint'd corpus, P probe
    // joins) must not change results vs rebuilding the chain per point
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = Seq(1, 2, 4)
    val sweep = Similarity.ivfSweep(emb, nQueries = 5, k = 3, nlist = 8, probes)
      .as[(Long, Long, Double, Int, Int)].collect()
      .groupBy(_._5).view.mapValues(_.map(t => (t._1, t._2, t._3, t._4)).toSet).toMap
    for (np <- probes) {
      val solo = Similarity.ivfTopK(emb, nQueries = 5, k = 3, nlist = 8, nprobe = np)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(sweep(np) === solo, s"sweep diverges from ivfTopK at nprobe=$np")
    }
  }

  test("recallSweep: exploded-probe plan matches the per-point ivfTopK+annRecall composition") {
    // the single-plan sweep must reproduce EXACTLY the recalls of the
    // P-plan composition it replaces — grid column included
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = Seq(1, 2, 4)
    val gt = Similarity.bruteForceTopK(emb, nQueries = 5, k = 3)
    val got = Similarity.recallSweep(emb, gt, nQueries = 5, k = 3,
        nlist = 8, probes = probes)
      .as[(Long, Int, Double)].collect().toSet
    val expect = probes.flatMap { np =>
      Similarity.annRecall(gt,
          Similarity.ivfTopK(emb, nQueries = 5, k = 3, nlist = 8, nprobe = np))
        .as[(Long, Double)].collect().map { case (q, r) => (q, np, r) }
    }.toSet
    assert(got === expect)
  }

  test("recallSweep plan: one corpus pass — exchange count stays single-digit for a 3-point grid") {
    // the reason the exploded plan exists: the per-point composition
    // paid ~17 exchanges; this one must not creep back toward it
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val gt = Similarity.bruteForceTopK(emb, nQueries = 5, k = 3)
    val df = Similarity.recallSweep(emb, gt, nQueries = 5, k = 3,
      nlist = 8, probes = Seq(1, 2, 4))
    df.collect()
    val s = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = s.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 8, s"recallSweep pays $exchanges exchanges:\n$s")
  }

  test("IVF with more lists probes fewer candidates but keeps exact cosines") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ivf = Similarity.ivfTopK(emb, nQueries = 5, k = 3, nlist = 8)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val brute = Similarity.bruteForceTopK(emb, nQueries = 5, k = 3)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // Every IVF hit that brute force also ranked must carry the SAME score
    ivf.foreach { case (q, n, c, _) =>
      brute.get((q, n)).foreach(bc => assert(bc === c)) }
    assert(ivf.nonEmpty)
  }

  test("filteredTopK: every hit is in-filter; pre-filter beats post-filter when selective") {
    import org.apache.spark.sql.functions.col
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val labels = Seq(1, 2)
    val pre = Similarity.filteredTopK(emb, nQueries = 5, k = 3, labels)
      .collect()
    assert(pre.nonEmpty)
    assert(pre.forall(r => labels.contains(r.getInt(2))), "out-of-filter hit")
    // pre-filter yields k in-filter hits per query (when enough exist);
    // post-filtering the UNfiltered top-k returns strictly fewer here
    val perQ = pre.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQ.values.forall(_ == 3), s"short result lists: ${perQ.toMap}")
    val post = Similarity.bruteForceTopK(emb, nQueries = 5, k = 3)
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label")),
        "neighbor_id")
      .filter(col("label").isin(labels: _*))
      .collect()
    assert(post.length < pre.length,
      s"post-filter unexpectedly kept ${post.length} >= ${pre.length}")
  }

  test("filteredIvfTopK: hits are in-filter; scores bit-match the filtered brute force") {
    import org.apache.spark.sql.functions.col
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val labels = Seq(1, 2)
    val ivf = Similarity.filteredIvfTopK(emb, nQueries = 5, k = 3,
        nlist = 8, labels = labels, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.nonEmpty)
    val inFilter = emb.filter(col("label").isin(labels: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ivf.forall(t => inFilter.contains(t._2)), "out-of-filter hit")
    // every (query, neighbor) the filtered brute force also ranked must
    // carry the SAME cosine — the filter must not perturb scoring
    val brute = Similarity.filteredTopK(emb, nQueries = 5, k = 3, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    ivf.foreach { case (q, n, c) =>
      brute.get((q, n)).foreach(bc => assert(bc === c)) }
  }

  test("labelCentroidsQ: hand-computed integer accumulators per (label, dim)") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 1),   // q = (127, 0)
      (1L, Seq(0.5f, 0.5f), 1),   // q = (127, 127)
      (2L, Seq(0.0f, -2.0f), 2)   // q = (0, -127)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.labelCentroidsQ(emb)
      .collect().map(x => (x.getInt(0), x.getInt(1)) ->
        (x.getLong(2), x.getLong(3))).toMap
    assert(r === Map(
      (1, 0) -> ((254L, 2L)), (1, 1) -> ((127L, 2L)),
      (2, 0) -> ((0L, 1L)), (2, 1) -> ((-127L, 1L))))
  }

  test("RationalArgmax: any fold/merge tree equals the sorted-rational winner") {
    // Partial aggregation reorders and re-brackets the fold arbitrarily;
    // correctness rests on the max being associative + commutative over
    // the (rational desc, label asc) total order. Exercise randomized
    // candidate sets (deliberately including exact-tie rationals like
    // 2/4 vs 1/2 and score overflow territory) under random permutations
    // and random merge splits, against the naive sort-based winner.
    val rnd = new scala.util.Random(42)
    val A = Similarity.RationalArgmax
    def fold(xs: Seq[Similarity.RationalCand]): Similarity.RationalCand =
      xs.foldLeft(A.zero)(A.reduce)
    def treeMerge(xs: Seq[Similarity.RationalCand]): Similarity.RationalCand =
      if (xs.size <= 3) fold(xs)
      else {
        val (l, r) = xs.splitAt(1 + rnd.nextInt(xs.size - 1))
        A.merge(treeMerge(l), treeMerge(r))
      }
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(8)
      val cands = (0 until n).map { i =>
        val denom = 1L + rnd.nextInt(4)
        val num = (rnd.nextInt(9) - 4).toLong * denom / (1L + rnd.nextInt(2))
        Similarity.RationalCand(i,
          if (rnd.nextBoolean()) num else num * 1000000007L,
          if (rnd.nextBoolean()) denom else denom * 999999937L)
      }
      val expected = cands.minBy(c =>
        (BigDecimal(-c.score) / BigDecimal(c.n), c.label))
      val shuffled = rnd.shuffle(cands)
      assert(A.finish(fold(shuffled)) === expected.label,
        s"fold disagreed on $cands")
      assert(A.finish(treeMerge(shuffled)) === expected.label,
        s"merge tree disagreed on $cands")
    }
  }

  test("centroidConfusion: separable clusters sit on the diagonal; ties break low") {
    import spark.implicits._
    // two clean clusters on orthogonal axes + one zero vector whose
    // scores tie at 0 against every centroid → predicted label must be
    // the SMALLEST label (deterministic tie-break)
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 1), (1L, Seq(0.9f, 0.1f), 1),
      (2L, Seq(0.0f, 1.0f), 2), (3L, Seq(0.1f, 0.9f), 2),
      (4L, Seq(0.0f, 0.0f), 9)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidConfusion(emb)
      .collect().map(x => (x.getInt(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(r((1, 1)) == 2L && r((2, 2)) == 2L, s"clusters off-diagonal: $r")
    assert(r((9, 1)) == 1L, s"zero vector must tie-break to label 1: $r")
  }

  test("centroidConfusion: imbalanced labels — true-mean argmax, not raw-sum bias") {
    import spark.implicits._
    // label 1 has TEN vectors on the x axis, label 2 ONE vector near the
    // y axis. The raw centroid-SUM dot product (the r6 ADVICE defect)
    // scores the lone label-2 vector higher against label 1 (its sum is
    // 10x a mean) — 14*1270 = 17780 vs 14*14 + 127*127 = 16325 — and
    // would misclassify it; the count-cross-multiplied MEAN comparison
    // (17780/10 vs 16325/1) keeps it at home.
    val emb = ((0 until 10).map(i => (i.toLong, Seq(1.0f, 0.0f), 1)) :+
      ((10L, Seq(0.1f, 0.9f), 2))).toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidConfusion(emb)
      .collect().map(x => (x.getInt(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(r((2, 2)) == 1L,
      s"lone minority vector must classify to its own (nearer) mean centroid: $r")
    assert(r((1, 1)) == 10L, s"majority cluster stays on the diagonal: $r")
  }
}
