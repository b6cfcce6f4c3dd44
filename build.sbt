ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkstreaming_210spark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Runner provenance for bench captures (r19 item 4): sf0.1 totals
// measure ~10% apart between `sbt runMain` and tools/run_main.sh (a
// launcher/heap effect, not drift) — both launchers stamp themselves so
// Bench can record which one produced a capture.
run / envVars += ("SPARK_GRAFT_RUNNER" -> "sbt")
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap default: SPARK_DRIVER_MEM wins; otherwise half of physical RAM,
// capped at 32g (the measured bench-host sweet spot) and floored at 2g.
// A pinned 32g on an 8-16 GB contributor machine defers ParallelGC past
// physical memory and lands in swap/OOM-kill instead of a GC cycle
// (r13 advisory). /proc/meminfo is Linux-only; elsewhere fall back to a
// conservative 8g.
val defaultHeapGb: Int = {
  val physGb =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines().find(_.startsWith("MemTotal"))
        .map(_.replaceAll("[^0-9]", "").toLong / 1048576L).getOrElse(0L).toInt
      finally src.close()
    } catch { case _: Throwable => 0 }
  if (physGb <= 0) 8 else math.max(2, math.min(32, physGb / 2))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
  // Throughput GC for a batch engine: G1 (the JDK 17 default) optimizes
  // pause times nobody here observes; ParallelGC measured 6-9% faster on
  // the full 156-query sf0.1 suite at every heap size tried (A/B in
  // round 13: 69.0->64.7s at 16g, 66.2->60.6s at 32g), and the larger
  // default heap is another ~4% (the old 8g default spent it on GC).
  "-XX:+UseParallelGC",
)
