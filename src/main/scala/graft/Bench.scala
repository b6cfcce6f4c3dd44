package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Per-round benchmark: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line; the same JSON is also
  * written to `BENCH_LOCAL.json` (and `SPARK_GRAFT_BENCH_OUT` if set) so
  * the driver's parse can never be defeated by sbt's `[info]` prefix.
  *
  * Measurement rules:
  *  - Full materialization: `queryExecution.toRdd.count()` executes the
  *    final physical plan with every output column alive — Catalyst
  *    cannot prune a map-only query down to a parquet-metadata count.
  *  - JVM warm-up: one untimed pass of all queries at sf0.001 before the
  *    timed run (codegen + JIT + parquet footer caches).
  *  - Failures are NOT swallowed into timings: a failed query records
  *    -1 and its error lands in the JSON `errors` map and on stderr.
  */
object Bench {

  /** Minimal extraction of the per-query seconds + sf tag from a prior
    * bench JSON line (no JSON lib on the classpath; the file is written
    * by this object, so the shape is known). Returns (sfDir, name→sec). */
  def parsePrior(json: String): (String, Map[String, Double]) = {
    val sf = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
    val qBlock = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
    val pair = """"([A-Za-z0-9_]+)":(-?[0-9.eE+\-]+)""".r
    (sf, pair.findAllMatchIn(qBlock)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap)
  }

  /** Per-query regression lint (r6 verdict item 2): vs the prior
    * committed capture AT THE SAME SF, flag queries that got BOTH
    * >1.5x slower and >0.3 s absolutely worse — the broad-based
    * environment drift this host shows stays below one gate or the
    * other for most queries, so a populated list is a real signal, not
    * ambient noise. */
  def regressions(prior: Map[String, Double],
                  now: Seq[(String, Double)]): Seq[(String, Double, Double)] =
    now.collect {
      case (name, sec) if sec >= 0 && prior.get(name).exists(p =>
        p > 0 && sec > 1.5 * p && sec - p > 0.3) =>
        (name, prior(name), sec)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    // The local capture path is overridable so off-sf captures (sf1
    // scaling runs) don't clobber the committed sf0.1 baseline the
    // regression lint compares against.
    val localPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOCAL", "BENCH_LOCAL.json")
    val prior: Map[String, Double] =
      try {
        val txt = Files.readString(Paths.get(localPath))
        val (priorSf, qs) = parsePrior(txt)
        if (priorSf == sfDir) qs else Map.empty[String, Double]
      } catch { case _: Throwable => Map.empty }
    val spark = GraftSession.build("graft-bench")

    def runOnce(dir: String, name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, org.apache.spark.sql.DataFrame] =
      try {
        val df = fn(spark, dir)
        df.queryExecution.toRdd.count()
        Right(df)
      } catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }

    // Warm-up (untimed, small SF): JIT, codegen cache, shuffle machinery.
    SparkEntry.queries.foreach { case (name, fn) => runOnce(warmDir, name, fn) }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Plan-shape telemetry: exchange mentions in the final (post-AQE)
    // executed plan — a lost broadcast or an extra shuffle shows up as a
    // count bump between rounds without anyone reading explain output.
    // Substring count on the plan text (matches Exchange /
    // BroadcastExchange / ReusedExchange alike) — a regression SIGNAL,
    // not an exact exchange census.
    val exchanges = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def exchangesOf(df: org.apache.spark.sql.DataFrame): Int = {
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      plan.sliding("Exchange".length).count(_ == "Exchange")
    }
    // Shuffle-VOLUME telemetry (the regression exchange counts can't
    // see: a lost pushdown fattens the same exchange). One global
    // task-end listener; per query, the counter delta across the 3 timed
    // runs / 3. The listener bus is async — a short stability poll after
    // each query bounds cross-attribution without adding a 4th run.
    val shuffleWritten = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        shuffleWritten.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def drainedShuffleCount(): Long = {
      var last = -1L; var spins = 0
      while (shuffleWritten.get() != last && spins < 20) {
        last = shuffleWritten.get(); Thread.sleep(100); spins += 1
      }
      shuffleWritten.get()
    }
    val shuffleMb = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // Single-partition lint (r4 verdict #8): global sorts over an
    // unbounded single-partition shuffle (the q_vocab_encode defect
    // class) — see graft.core.PlanAudit for what is and isn't flagged.
    val sp1 = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    // Best of 3 timed runs per query: a single run is exposed to one-off
    // GC pauses / compilation stalls (observed 4x spikes on this host,
    // and 2-3x ambient drift between back-to-back full runs); min-of-3
    // pins the noise floor without hiding real cost.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val s0 = drainedShuffleCount()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val r = runOnce(sfDir, name, fn)
        (r, (System.nanoTime() - t0) / 1e9)
      }
      times.collectFirst { case (Left(err), _) => err } match {
        case Some(err) =>
          System.err.println(s"[bench] $name FAILED: $err")
          errors += name -> err
          name -> -1.0
        case None =>
          times.last._1.foreach { df =>
            exchanges += name -> (try exchangesOf(df) catch { case _: Throwable => -1 })
            sp1 += name -> (try graft.core.PlanAudit
              .unboundedSinglePartitionSorts(df.queryExecution.executedPlan)
              catch { case _: Throwable => -1 })
          }
          val perRun = (drainedShuffleCount() - s0) / 3.0
          shuffleMb += name -> math.rint(perRun / 1024.0 / 1024.0 * 100) / 100
          name -> times.map(_._2).min
      }
    }
    val ok = results.filter(_._2 >= 0)
    // Honest memo accounting: SparkEntry's shared-scan memos are built
    // inside the FIRST run of the first query that needs them, so
    // min-of-3 timing would silently hide their cost. Report build
    // seconds per memo key and fold them into the total.
    import scala.jdk.CollectionConverters._
    val memo = SparkEntry.memoSeconds.asScala.toSeq
      .collect { case ((dir, key), sec) if dir == sfDir => key -> sec }
      .sortBy(_._1)
    val memoTotal = memo.map(_._2).sum
    val memoJson = memo.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val qs = results.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      s"\"$k\":\"${v.replace("\\", "\\\\").replace("\"", "\\\"").takeWhile(_ >= ' ')}\""
    }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum + memoTotal
    val exJson = exchanges.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val shJson = shuffleMb.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val spJson = sp1.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    // Field order is truncation-proof BY DESIGN (r4's driver tail capture
    // lost the seconds map): telemetry maps first, then the per-query
    // seconds + total + unit LAST, so any tail of the line still carries
    // the headline numbers.
    val regressed = regressions(prior, results)
    regressed.foreach { case (n, p, c) =>
      System.err.println(f"[bench] REGRESSED $n: $p%.3f s -> $c%.3f s (${c / p}%.2fx)")
    }
    val regJson = regressed.map { case (n, p, c) =>
      s""""$n":{"prior":$p,"now":$c}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","sf":"$sfDir","errors":$errJson,"regressed":$regJson,"exchanges":$exJson,"shuffle_mb":$shJson,"sp1_unbounded":$spJson,"memo_sec":$memoJson,"queries":$qs,"value":$total,"unit":"sec"}"""
    println(json)
    Files.writeString(Paths.get(localPath), json + "\n")
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p => Files.writeString(Paths.get(p), json + "\n"))
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
