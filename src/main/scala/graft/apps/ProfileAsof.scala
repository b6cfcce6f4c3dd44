package graft.apps

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.join.AsofJoin
import graft.tools.GenScale

/** Closes the r6-carried "AsofMergeJoinExec CodegenSupport?" question
  * with a measurement instead of a hunch: a stack-sampling profile of
  * the merge stage, classifying every sample of a task that is inside
  * the AsofMergeJoinExec merge into
  *   - projection: frames in the (already code-generated)
  *     UnsafeProjection.apply above the merge frame — the work
  *     WholeStageCodegen fusion would absorb,
  *   - copy: UnsafeRow/InternalRow.copy of the retained right row,
  *   - merge: everything else (comparators, iterator advance, null
  *     checks) — the loop body itself.
  * If projection + iterator glue is a minor share of merge-stage time,
  * adding CodegenSupport to the operator cannot win more than that
  * share and the carried item retires with the number recorded.
  *
  * The instance is the q_asof_native shape on a GenScale-replicated
  * events table (factor via --factor, default 50: ~5M purchase rows at
  * sf0.1 base) so the merge stage runs tens of seconds — thousands of
  * 2 ms samples. Usage:
  *   run_main.sh graft.apps.ProfileAsof [--data /root/testdata/sf0.1]
  *     [--factor 50]
  */
object ProfileAsof {

  def main(args: Array[String]): Unit = {
    val a = graft.core.Args(args)
    val dir = a.getOrElse("data", "/root/testdata/sf0.1")
    val factor = a.getOrElse("factor", "50").toInt
    val spark = GraftSession.build("profile-asof")

    val ev0 = Tables.events(spark, dir)
    val userStride = ev0.agg(max("user_id")).head.getLong(0) + 1
    val evStride = ev0.agg(max("event_id")).head.getLong(0) + 1
    val ev = GenScale.replicate(ev0, factor,
      Map("user_id" -> userStride, "event_id" -> evStride))

    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"), col("event_id"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"), col("event_id"))
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("view_id"))
      .select(col("user_id"), col("ts_us"), col("view_id"),
        col("ts_us").as("view_ts_us"))
    val joined = AsofJoin.asofNative(p, v, "user_id", "ts_us")

    // warm-up: JIT + codegen caches, so the profile isn't compilation
    joined.queryExecution.toRdd.count()

    val inMerge = new AtomicLong
    val inProjection = new AtomicLong
    val inCopy = new AtomicLong
    @volatile var sampling = true
    val bean = ManagementFactory.getThreadMXBean
    val sampler = new Thread(() => {
      while (sampling) {
        // cheap dump: no monitor/synchronizer info
        bean.dumpAllThreads(false, false).foreach { ti =>
          val frames = ti.getStackTrace
          val mergeIdx = frames.indexWhere(f =>
            f.getClassName.contains("AsofMergeJoinExec"))
          if (mergeIdx >= 0) {
            inMerge.incrementAndGet()
            val above = frames.take(mergeIdx)
            if (above.exists(f =>
                f.getClassName.contains("UnsafeProjection") ||
                (f.getClassName.contains("GeneratedClass") &&
                  f.getMethodName == "apply")))
              inProjection.incrementAndGet()
            else if (above.exists(f => f.getMethodName == "copy"))
              inCopy.incrementAndGet()
          }
        }
        Thread.sleep(2)
      }
    }, "asof-sampler")
    sampler.setDaemon(true)

    val t0 = System.nanoTime()
    sampler.start()
    val rows = joined.queryExecution.toRdd.count()
    sampling = false
    sampler.join(1000)
    val sec = (System.nanoTime() - t0) / 1e9

    val total = inMerge.get().toDouble.max(1.0)
    val json =
      s"""{"rows":$rows,"factor":$factor,"sec":$sec,""" +
        s""""merge_samples":${inMerge.get()},""" +
        s""""projection_samples":${inProjection.get()},""" +
        s""""copy_samples":${inCopy.get()},""" +
        s""""projection_share":${inProjection.get() / total},""" +
        s""""copy_share":${inCopy.get() / total}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PROFILE_ASOF.json"), json + "\n")
    spark.stop()
  }
}
