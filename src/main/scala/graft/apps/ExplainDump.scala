package graft.apps

import java.nio.file.{Files, Paths}

import graft.SparkEntry
import graft.core.GraftSession

/** Dump `.explain("formatted")` (the executed, post-AQE plan text as a
  * second section) for named queries to `<outDir>/<query>_<tag>.txt` —
  * the optimization-round evidence files under plans/r20/.
  *
  * Usage: ExplainDump <outDir> <tag> <q1,q2,...|ALL> [sfDir]
  * The query RUNS once (toRdd.count) so the executed plan carries AQE's
  * final shape (join strategy rewrites, coalesced reads), not the
  * initial guess. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <tag> <q1,q2,...|ALL> [sfDir]")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names =
      if (args(2) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    Files.createDirectories(outDir)
    val spark = GraftSession.build("graft-explaindump")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val df = fn(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.queryExecution.toRdd.count()
      val executed = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val txt =
        s"""== explain("formatted") — $name @ $dir ==
           |$formatted
           |== executed plan (post-AQE) ==
           |$executed""".stripMargin
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt)
      println(s"[explaindump] wrote ${name}_$tag.txt")
    }
    spark.stop()
  }
}
