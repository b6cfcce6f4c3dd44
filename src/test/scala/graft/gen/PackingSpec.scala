package graft.gen

import graft.SparkSuite

class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("contiguous packing: a doc belongs to the bin its cumulative start falls in") {
    val docs = Seq((0L, 1000L), (1L, 1000L), (2L, 500L), (3L, 2000L), (4L, 100L))
      .toDF("doc_id", "n")
    val out = Packing.packSequences(docs, "doc_id", "n", budget = 2048L, shards = 1)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // cum-before: 0, 1000, 2000, 2500, 4500 → div 2048 → 0, 0, 0, 1, 2
    assert(out === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L))
  }

  test("sharded packing is deterministic and shards partition the docs") {
    val docs = (0L until 100L).map(i => (i, 100L + i)).toDF("doc_id", "n")
    val a = Packing.packSequences(docs, "doc_id", "n", 1000L, 4)
      .as[(Long, Int, Long, Long)].collect().sortBy(_._1)
    val b = Packing.packSequences(docs, "doc_id", "n", 1000L, 4)
      .as[(Long, Int, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._2).distinct.sorted.toSeq === Seq(0, 1, 2, 3))
    assert(a.forall(r => r._2 === (r._1 % 4).toInt))
  }

  test("negative ids shard with truncated % (sign of dividend), matching SQL") {
    // pmod(-3, 8) = 5 but the oracle's `-3 % 8` = -3; the Spark side must
    // use the same truncated semantics or negative-id corpora diverge
    val docs = Seq((-3L, 10L), (-11L, 10L), (5L, 10L)).toDF("doc_id", "n")
    val shards = Packing.packSequences(docs, "doc_id", "n", 100L, 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(shards === Map(-3L -> -3, -11L -> -3, 5L -> 5))
  }
}
