package graft.sources

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-group pruning via range layout: the same narrow time-slice filter
  * over the same rows must READ FEWER BYTES from a range-clustered
  * parquet layout than from a random one — parquet min/max stats can
  * only skip row groups whose value range excludes the predicate, and
  * only the clustered layout has tight ranges. Asserted on executor
  * input metrics, not on plan text. */
class LayoutSpec extends SparkSuite {

  private def bytesReadOf(action: => Unit): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      // the listener bus is async and its drain API is private — wait
      // until no new task-end events have arrived for 200 ms
      var last = -1L
      var spins = 0
      while (bytes.get() != last && spins < 50) {
        last = bytes.get(); Thread.sleep(200); spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    bytes.get()
  }

  test("range-clustered layout reads a fraction of the bytes for a time-slice scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    // 10 x sf0.1 (1M rows): big enough that row-group data dwarfs the
    // per-file footer/dictionary bytes every scan pays regardless of
    // pruning (at 100k rows the ~3.5 KB x 8 footers were most of the
    // pruned scan's bytes and hid the effect)
    val ev1 = Tables.events(spark, "/root/testdata/sf0.1")
      .select("event_id", "ts_ns", "user_id", "value")
    val ev = (1 to 10).map(_ => ev1).reduce(_ union _)
    // same rows, two layouts: random 8-way split vs range-clustered
    ev.repartition(8).write.mode("overwrite").parquet(s"$tmp/random")
    Layout.writeRangeLayout(ev, s"$tmp/ranged", "ts_ns", buckets = 8)

    val mm = ev.agg(min("ts_ns"), max("ts_ns")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // a ~3% slice of the time domain
    val cut = lo + (hi - lo) / 32
    def slice(df: DataFrame) =
      df.filter(col("ts_ns") >= lo && col("ts_ns") <= cut)

    val expected = slice(ev).count()
    var gotRandom = 0L; var gotRanged = 0L
    val bRandom = bytesReadOf { gotRandom = slice(spark.read.parquet(s"$tmp/random")).count() }
    val bRanged = bytesReadOf { gotRanged = slice(Layout.read(spark, s"$tmp/ranged")).count() }

    assert(gotRandom === expected && gotRanged === expected) // same answer
    assert(expected > 0)
    // random layout: every row group spans the whole ts domain -> no skip;
    // ranged: only ~1 of 8 groups overlaps the slice. Require a 2x margin
    // so footer/overhead noise can't flake the assert.
    assert(bRanged * 2 < bRandom,
      s"range layout did not prune: ranged=$bRanged random=$bRandom")
  }
}
