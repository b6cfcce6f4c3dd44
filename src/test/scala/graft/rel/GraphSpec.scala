package graft.rel

import org.apache.spark.sql.functions._

import graft.SparkSuite

class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def census(edges: Seq[(String, String)]) =
    Graph.triangleCensus(edges.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head

  test("triangleCensus: K4 has 4 triangles; a path has none") {
    val k4 = for {
      Seq(x, y) <- Seq("a", "b", "c", "d").combinations(2).toSeq
    } yield (x, y)
    assert(census(k4) === ((4L, 6L, 4L)))
    assert(census(Seq(("a", "b"), ("b", "c"), ("c", "d"))) === ((4L, 3L, 0L)))
  }

  test("triangleCensus: duplicates, reversed edges, and self-loops are tolerated") {
    // one triangle declared messily: dup edge, both directions, self-loop
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "b"),
      ("b", "c"), ("c", "a"), ("a", "a"))
    assert(census(messy) === ((3L, 3L, 1L)))
  }

  test("triangleCensus: hub graph — every triangle found exactly once") {
    // star hub h–x1..x10 plus rim edges x1–x2, x3–x4 → exactly 2
    // triangles; a naive wedge count at the hub would enumerate 45
    // candidate pairs, the degree orientation keeps the hub a SINK
    val star = (1 to 10).map(i => ("h", s"x$i"))
    val rim = Seq(("x1", "x2"), ("x3", "x4"))
    assert(census(star ++ rim) === ((11L, 12L, 2L)))
  }

  test("triangleCensus property: equals the set-based count on seeded random graphs") {
    val rnd = new scala.util.Random(20260813)
    for (c <- 1 to 8) {
      val n = 4 + rnd.nextInt(9)
      val nodes = (0 until n).map(i => s"v$i")
      val edges = (for {
        i <- 0 until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.35
      } yield (nodes(i), nodes(j))).toSeq
      if (edges.nonEmpty) {
        val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val naive = (for {
          i <- 0 until n; j <- (i + 1) until n; k <- (j + 1) until n
          if adj.getOrElse(nodes(i), Set()).contains(nodes(j)) &&
            adj.getOrElse(nodes(j), Set()).contains(nodes(k)) &&
            adj.getOrElse(nodes(i), Set()).contains(nodes(k))
        } yield 1).size.toLong
        val present = edges.flatMap(e => Seq(e._1, e._2)).distinct.size.toLong
        assert(census(edges) === ((present, edges.size.toLong, naive)),
          s"case $c: n=$n edges=${edges.size}")
      }
    }
  }
}
