package graft.join

import graft.SparkSuite

class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  test("asof: latest right row at-or-before each left ts per key; no-match keeps NULL") {
    val left = Seq((1L, 10L, 100L), (1L, 5L, 101L), (2L, 7L, 102L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 5L, 900L), (1L, 9L, 901L), (2L, 8L, 902L))
      .toDF("k", "ts", "rid")
    val got = AsofJoin.asof(left, right, "k", "ts")
      .select("k", "ts", "lid", "rid")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(got === Set(
      (1L, 10L, 100L, Some(901L)), // latest of {5, 9} <= 10
      (1L, 5L, 101L, Some(900L)),  // equal timestamps match (inclusive)
      (2L, 7L, 102L, None)))       // right row at 8 is in the future
  }

  test("asof: a matched right row with a NULL field is taken WHOLE, not stitched") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 5L, Option(10.0), 2L), (1L, 9L, Option.empty[Double], 7L))
      .toDF("k", "ts", "price", "qty")
    val got = AsofJoin.asof(left, right, "k", "ts")
      .select("lid", "price", "qty")
      .as[(Long, Option[Double], Option[Long])].collect().toSeq
    // the ts=9 row wins entirely: price NULL from THAT row, not 10.0
    // carried over from ts=5 (per-column fill would fabricate a row
    // that never existed)
    assert(got === Seq((100L, None, Some(7L))))
  }

  test("asof: every left row survives exactly once (left-outer cardinality)") {
    val left = (0L until 50L).map(i => (i % 5, i, i)).toDF("k", "ts", "lid")
    val right = (0L until 10L).map(i => (i % 5, i * 3, i + 1000)).toDF("k", "ts", "rid")
    val out = AsofJoin.asof(left, right, "k", "ts")
    assert(out.count() === 50L)
    assert(out.select("lid").distinct().count() === 50L)
  }

  test("asof: contract-violating right ties resolve deterministically, not by partition order") {
    // two right rows at the SAME (key, ts) violate the uniqueness
    // contract; the xxhash64 tie-break must pick the same winner
    // regardless of input partitioning
    val left = Seq((1L, 10L, 100L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 5L, 7L), (1L, 5L, 9L)).toDF("k", "ts", "rid")
    val picks = (1 to 8).map { n =>
      AsofJoin.asof(left, right.repartition(n), "k", "ts")
        .select("rid").as[Long].collect().head
    }
    assert(picks.distinct.size === 1)
  }
}
