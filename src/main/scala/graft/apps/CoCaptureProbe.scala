package graft.apps

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.core.{Args, GraftSession}

/** In-suite co-capture inflation probe (r15 verdict item 2).
  *
  * The sf30 suite measured q_adaptive_join at 219.9 s in-capture vs
  * 55.9 s standalone (BENCH_SF30_ADAPTIVE.json) — adjudicated as
  * co-capture adjacency but with the MECHANISM unnamed. The structural
  * difference between the two runs is small and enumerable:
  * q_adaptive_join is alphabetically FIRST, so at the target SF nothing
  * precedes it — but the suite's untimed warm-up pass runs all ~148
  * queries at the warm SF first (building and caching every shared-scan
  * memo), while the standalone run warms only itself. Candidate
  * mechanisms, from the verdict: page-cache eviction by the warm-up,
  * executor-heap pressure from retained cache/broadcast blocks, GC debt.
  *
  * This probe runs the SAME timed query (q_adaptive_join at the target
  * SF, min-of-N like Bench) under three modes in fresh JVMs:
  *
  *  - `clean`     — warm-up = the probe query only (standalone twin);
  *  - `debris`    — warm-up = ALL queries at the warm SF (suite twin);
  *  - `mitigated` — debris warm-up, then `spark.catalog.clearCache()` +
  *    unpersist of every retained RDD + `System.gc()` before timing —
  *    the candidate Bench mitigation.
  *
  * Per timed run it reports the deltas that discriminate the candidate
  * mechanisms: summed task JVM GC time, memory/disk spill, shuffle
  * fetch-wait, input bytes read, plus session-level cache census
  * (persistent RDDs, storage memory used) and OS page-cache size from
  * /proc/meminfo before timing. One JSON line.
  *
  * Usage: runMain graft.apps.CoCaptureProbe --data <sfDir>
  *   [--warm /root/testdata/sf0.1] [--mode clean|debris|mitigated]
  *   [--query q_adaptive_join] [--runs 3]
  */
object CoCaptureProbe {

  private final class MetricsListener extends SparkListener {
    val gcMs = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val fetchWaitMs = new AtomicLong
    val inputBytes = new AtomicLong
    val shuffleReadBytes = new AtomicLong
    // Per-stage executor-time census for the profile mode: stageId →
    // (name, tasks, executorRunMs, gcMs, shuffleReadBytes, inputBytes).
    val stages = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Long, Long, Long, Long, Long)]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        gcMs.addAndGet(m.jvmGCTime)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        fetchWaitMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
        shuffleReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        stages.merge(t.stageId,
          ("", 1L, m.executorRunTime, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead, m.inputMetrics.bytesRead),
          (a, b) => (a._1, a._2 + b._2, a._3 + b._3, a._4 + b._4,
            a._5 + b._5, a._6 + b._6))
      }
      ()
    }
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val info = s.stageInfo
      stages.computeIfPresent(info.stageId,
        (_, v) => (info.name.takeWhile(_ != '\n').take(80), v._2, v._3, v._4, v._5, v._6))
      ()
    }
    def stageRows(minRunMs: Long): Seq[String] = {
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._2._3)
        .filter(_._2._3 >= minRunMs)
        .map { case (id, (nm, tasks, run, gc, sr, in)) =>
          // Stage names carry arbitrary plan text — escape or the
          // artifact line stops being JSON (r16 advisory).
          s"""{"stage":$id,"name":"${graft.core.Json.escape(nm)}","tasks":$tasks,"run_ms":$run,""" +
            s""""gc_ms":$gc,"shuffle_read":$sr,"input_bytes":$in}""" }
    }
    def snapshot(): Map[String, Long] = Map(
      "gc_ms" -> gcMs.get(), "mem_spill" -> memSpill.get(),
      "disk_spill" -> diskSpill.get(), "fetch_wait_ms" -> fetchWaitMs.get(),
      "input_bytes" -> inputBytes.get(), "shuffle_read" -> shuffleReadBytes.get())
  }

  private def pageCacheKb(): Long = {
    val src = java.nio.file.Path.of("/proc/meminfo")
    if (!java.nio.file.Files.isReadable(src)) -1L
    else java.nio.file.Files.readString(src).linesIterator
      .find(_.startsWith("Cached:"))
      .map(_.split("\\s+")(1).toLong).getOrElse(-1L)
  }

  def main(args: Array[String]): Unit = {
    val a = Args(args)
    val data = a.getOrElse("data", "/root/repo/testdata_sf30_full")
    val warm = a.getOrElse("warm", "/root/testdata/sf0.1")
    val mode = a.getOrElse("mode", "debris")
    val qname = a.getOrElse("query", "q_adaptive_join")
    val runs = a.getOrElse("runs", "3").toInt
    require(Set("clean", "debris", "mitigated")(mode), s"bad mode $mode")

    val spark = GraftSession.build(s"graft-cocapture-$mode")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    val queries = graft.SparkEntry.queries
    val fn = queries(qname)

    def runOnce(dir: String, name: String): Unit =
      try queries(name)(spark, dir).queryExecution.toRdd.count(): Unit
      catch { case e: Throwable =>
        System.err.println(s"[cocapture] warm $name failed: ${e.getMessage}") }

    // ---- warm-up
    val tW0 = System.nanoTime()
    mode match {
      case "clean" => runOnce(warm, qname)
      case _       => queries.keys.toSeq.sorted.foreach(n => runOnce(warm, n))
    }
    val warmSec = (System.nanoTime() - tW0) / 1e9

    // ---- cache census after warm-up (what the warm-up retained)
    def cacheCensus(s: SparkSession): (Int, Long) = {
      val rdds = s.sparkContext.getPersistentRDDs
      val storage = s.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum
      (rdds.size, storage)
    }
    val (cachedRddsBefore, storageBefore) = cacheCensus(spark)

    if (mode == "mitigated") {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    val (cachedRdds, storageUsed) = cacheCensus(spark)
    val pageCacheBefore = pageCacheKb()

    // ---- timed runs (min-of-N, Bench's shape)
    val perRun = (1 to runs).map { _ =>
      val m0 = listener.snapshot()
      val t0 = System.nanoTime()
      fn(spark, data).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      val m1 = listener.snapshot()
      (sec, m1.map { case (k, v) => k -> (v - m0(k)) })
    }
    val best = perRun.map(_._1).min
    val runsJson = perRun.map { case (sec, m) =>
      s"""{"sec":${math.rint(sec * 100) / 100},""" +
        m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}"
    }.mkString("[", ",", "]")

    // Stage-time breakdown (the r15 stretch profile ask): stages with
    // >= 1 s of summed executor time, heaviest first, captured across
    // all timed runs of this JVM.
    val stagesJson = listener.stageRows(1000L).mkString("[", ",", "]")
    val json =
      s"""{"metric":"cocapture_probe","mode":"$mode","query":"$qname",""" +
      s""""data":"$data","warm":"$warm","warm_sec":${math.rint(warmSec * 10) / 10},""" +
      s""""cached_rdds_after_warm":$cachedRddsBefore,"storage_used_after_warm":$storageBefore,""" +
      s""""cached_rdds_at_timing":$cachedRdds,"storage_used_at_timing":$storageUsed,""" +
      s""""page_cache_kb_before_timing":$pageCacheBefore,""" +
      s""""best_sec":${math.rint(best * 100) / 100},"runs":$runsJson,""" +
      s""""stages":$stagesJson}"""
    try spark.stop() catch { case _: Throwable => }
    println(json)
  }
}
