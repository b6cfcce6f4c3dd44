package graft.sim

import graft.SparkSuite

class SemanticDedupSpec extends SparkSuite {
  import spark.implicits._

  // two well-separated directions so cluster membership is unambiguous
  private def east(scale: Float): Array[Float] = Array(scale, 0.01f, 0f, 0f)
  private def north(scale: Float): Array[Float] = Array(0.01f, scale, 0f, 0f)

  test("earlier-id cluster-mate above threshold drops the later; survivors keep=1") {
    // ids 0,1 are the centroids (nlist=2); 2 duplicates 0's direction,
    // 3 duplicates 1's, 4 is a north vector below the 0.99 threshold
    val emb = Seq(
      (0L, east(1f)), (1L, north(1f)),
      (2L, east(5f)), (3L, north(2f)),
      (4L, Array(0.5f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.semanticDedup(emb, nlist = 2, threshold = 0.99)
      .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(r.map(_._1) === Seq(0L, 1L, 2L, 3L, 4L))
    // keep: centroids stay (no earlier mate), scaled copies drop, the
    // off-axis north vector survives the 0.99 bar
    assert(r.map(_._3) === Seq(1, 1, 0, 0, 1))
    // cluster ids are the assigned centroid ids
    assert(r.map(_._2) === Seq(0L, 1L, 0L, 1L, 1L))
  }

  test("oversized cluster: members all kept, dedup skipped (CPU guard)") {
    val emb = (0L until 10L).map(i => (i, east(1f + i))).toDF("vec_id", "embedding")
    val r = Similarity.semanticDedup(emb, nlist = 1, threshold = 0.5, maxCluster = 5)
      .as[(Long, Long, Int)].collect().toSeq
    assert(r.size === 10 && r.forall(_._3 === 1))
  }

  test("oversized clusters bypass the groupByKey; bounded ones still dedup") {
    // cluster 0 (east): 9 members > maxCluster=5 → map-side keep=1 path;
    // cluster 1 (north): 3 members ≤ 5 → grouped, scaled copy drops
    val emb = (Seq((0L, east(1f)), (1L, north(1f)),
      (10L, north(3f)), (11L, Array(0.5f, 1f, 0f, 0f))) ++
      (2L until 10L).map(i => (i, east(1f + i)))).toDF("vec_id", "embedding")
    val df = Similarity.semanticDedup(emb, nlist = 2, threshold = 0.99,
      maxCluster = 5)
    val r = df.as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    // east members (0, 2..9): kept wholesale; north: 10 duplicates 1's
    // direction and drops, 11 is off-axis and survives
    assert(r.filter(t => t._2 == 0L).forall(_._3 == 1))
    assert(r.find(_._1 == 10L).get._3 === 0)
    assert(r.find(_._1 == 11L).get._3 === 1)
    assert(r.size === 12)
    // the buffer bound is structural, not behavioral: the grouped path
    // sits above a csz <= maxCluster filter, the > maxCluster rows join
    // the result through a group-free projection
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("MapGroups"), s"no grouped path in plan:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("Filter") &&
      l.contains("csz") && l.contains("<= 5")),
      s"grouped path is not size-bounded:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("Filter") &&
      l.contains("csz") && l.contains("> 5")),
      s"no bypass route for oversized clusters:\n$plan")
  }

  test("drop rule is earlier-ID, not earlier-KEPT: a dropped doc still shields") {
    // chain: 0 ~ 1 (>= t), 1 ~ 2 (>= t), 0 !~ 2. Earlier-id rule drops
    // BOTH 1 (via 0) and 2 (via the already-dropped 1) — one pass,
    // order-free; a kept-chain greedy would keep 2.
    // unit vectors 10° apart: cos(10°)≈0.985 pairs adjacent ids above the
    // 0.98 bar, cos(20°)≈0.940 keeps 0↔2 below it
    def ang(deg: Double): Array[Float] =
      Array(math.cos(math.toRadians(deg)).toFloat, math.sin(math.toRadians(deg)).toFloat, 0f, 0f)
    val a = ang(0); val b = ang(10); val c = ang(20)
    val emb = Seq((0L, a), (1L, b), (2L, c)).toDF("vec_id", "embedding")
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      d / (math.sqrt(x.map(p => p.toDouble * p).sum) * math.sqrt(y.map(p => p.toDouble * p).sum))
    }
    val t = 0.98
    assert(cos(a, b) >= t && cos(b, c) >= t && cos(a, c) < t)
    val r = Similarity.semanticDedup(emb, nlist = 1, threshold = t)
      .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(r.map(_._3) === Seq(1, 0, 0))
  }
}
