package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.rel.Analytics

/** One-off measurement: rankFamily's banded path vs the monolithic
  * per-type window at a given SF — the crossover evidence behind the
  * AQE-style `rowsPerBand` adaptivity knob (the gate SFs always take
  * the shortcut, so the banded path's real-scale cost is otherwise
  * only argued, never timed). Prints per-variant best-of-3 seconds and
  * asserts the outputs are identical before timing.
  *
  * Usage: runMain graft.tools.TimeBanding <sfDir> [bands] [collapse]
  * — `collapse` maps every row to ONE event_type, the closed-domain
  * trap the banding exists for (a monolithic window then sorts the
  * whole input in a single task). */
object TimeBanding {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val bands = args.lift(1).map(_.toInt).getOrElse(32)
    val collapse = args.lift(2).contains("collapse")
    val spark = GraftSession.build("graft-time-banding")
    val ev0 = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val ev = (if (collapse) ev0.withColumn("event_type", lit("all")) else ev0)
      .localCheckpoint() // time the operator, not the scan
    val n = ev.count()

    def run(rowsPerBand: Long) = Analytics.rankFamily(ev, buckets = 4,
      bands = bands, rowsPerBand = rowsPerBand)

    val mono = run(Long.MaxValue) // effBands == 1 shortcut
    val banded = run(1L << 16)    // forces ceil(n/65536) bands (≤ `bands`)
    require(banded.exceptAll(mono).count() == 0 &&
      mono.exceptAll(banded).count() == 0, "banded != monolithic")

    def time(label: String, mk: => org.apache.spark.sql.DataFrame): Double = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[banding] $label: $secs%.2f s (n=$n, bands=$bands)")
      secs
    }
    val tm = time("monolithic", run(Long.MaxValue))
    val tb = time("banded    ", run(1L << 16))
    println(f"[banding] banded/monolithic = ${tb / tm}%.2f")
    spark.stop()
  }
}
