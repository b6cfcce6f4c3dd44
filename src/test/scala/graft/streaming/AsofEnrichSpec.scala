package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSuite
import graft.streaming.AsofEnrich.{AsofOut, AsofRow, AsofState}

/** Streaming as-of enrichment vs the batch asof join, plus the pure-fold
  * state-bounding properties. */
class AsofEnrichSpec extends SparkSuite {
  import spark.implicits._

  private def mem[A: Encoder]: MemoryStream[A] = MemoryStream[A](spark)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  // batches: dims no later than their first dependent event's batch;
  // out-of-order within batches; equal-ts tie; pre-dim event; a late
  // event (ts 15) arriving AFTER later dims were seen (batch 3) that
  // must match the dim current at ts 15, not the newest one
  private val batch1 = Seq(
    AsofRow(1, 10, isDim = true, 1.0), AsofRow(1, 5, isDim = false, 50.0),
    AsofRow(1, 10, isDim = false, 100.0), // tie: matches dim ts=10
    AsofRow(2, 20, isDim = true, 2.0))
  private val batch2 = Seq(
    AsofRow(1, 30, isDim = true, 3.0), AsofRow(1, 35, isDim = false, 300.0),
    AsofRow(2, 25, isDim = false, 200.0))
  private val batch3 = Seq(
    AsofRow(1, 15, isDim = false, 150.0), // late: dim@10 current at 15
    AsofRow(2, 40, isDim = false, 400.0))

  private val all = batch1 ++ batch2 ++ batch3

  private def events: DataFrame = all.filterNot(_.isDim)
    .map(r => (r.key, r.ts, r.v)).toDF("key", "ts", "payload")
  private def dims: DataFrame = all.filter(_.isDim)
    .map(r => (r.key, r.ts, r.v)).toDF("key", "ts", "dval")

  test("streaming enrichment across micro-batches == batch asof join") {
    val ms = mem[AsofRow]
    val q = AsofEnrich.run(ms.toDS(), horizon = 100L).writeStream
      .format("memory").queryName("asof_enrich").outputMode("append").start()
    withQuery(q) {
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
      ms.addData(batch3: _*); q.processAllAvailable()
    }
    val got = spark.table("asof_enrich").as[AsofOut].collect()
      .map(o => (o.key, o.ts, o.payload, o.dim_v)).sortBy(t => (t._1, t._2))
    val expect = graft.join.AsofJoin.asof(events, dims, "key", "ts")
      .as[(Long, Long, Double, Option[Double])].collect()
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === expect.toSeq)
    // the interesting rows, explicitly: pre-dim NULL, inclusive tie,
    // and the late event served from history (dim@10, not dim@30)
    val byKeyTs = got.map(t => (t._1, t._2) -> t._4).toMap
    assert(byKeyTs((1L, 5L)) === None)
    assert(byKeyTs((1L, 10L)) === Some(1.0))
    assert(byKeyTs((1L, 15L)) === Some(1.0))
    assert(byKeyTs((1L, 35L)) === Some(3.0))
  }

  test("batch (single-invocation) run == batch asof join too") {
    val got = AsofEnrich.run(all.toDS(), horizon = 100L)
      .as[AsofOut].collect()
      .map(o => (o.key, o.ts, o.payload, o.dim_v)).sortBy(t => (t._1, t._2))
    val expect = graft.join.AsofJoin.asof(events, dims, "key", "ts")
      .as[(Long, Long, Double, Option[Double])].collect()
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === expect.toSeq)
  }

  test("advance: horizon compaction bounds state; floor row survives as carry-forward") {
    var st = AsofState(Vector.empty, Long.MinValue)
    // 1000 dim updates at ts = 1..1000, horizon 10
    (1L to 1000L).foreach { t =>
      val (next, _) = AsofEnrich.advance(st, Seq(AsofRow(1, t, isDim = true, t.toDouble)), 10L)
      st = next
    }
    assert(st.dims.length <= 12, s"state grew: ${st.dims.length}")
    // an event older than the horizon still matches the carry-forward
    // floor (the newest dim at-or-before the cutoff)
    val (_, out) = AsofEnrich.advance(st, Seq(AsofRow(1, 989, isDim = false, 0.0)), 10L)
    assert(out.head.dim_v === Some(989.0))
  }

  test("advance: same-ts duplicate dim takes last-write-wins, no history growth") {
    val (st, _) = AsofEnrich.advance(AsofState(Vector.empty, Long.MinValue),
      Seq(AsofRow(1, 10, isDim = true, 1.0), AsofRow(1, 10, isDim = true, 2.0)), 100L)
    assert(st.dims === Vector((10L, 2.0)))
  }
}
