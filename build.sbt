ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nicczdnscrawlerspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 20 g default: the full suite runs heavy crawl/streaming suites
  // concurrently in one JVM; 8 g is OOM-borderline there (and makes the
  // 32-thread benches GC-bound). The box has 125 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  // pre-commit + pre-touch the heap: the probe stage allocates tens of
  // GB/s at 32 threads, and lazy heap commit makes the FIRST high-thread
  // leg of any bench pay seconds of page-zeroing that read as a fake
  // scaling cliff (measured: first local[32] leg 31k dom/s, second 181k)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  "-XX:+AlwaysPreTouch",
  // throughput collector for the allocation-heavy probe stage: measured
  // steady-state crawl at local[32] is ~2.4x G1 (263k vs ~110k dom/s) —
  // the engine's hot path is pure young-gen churn with tiny live sets,
  // exactly ParallelGC's home game; no latency SLO exists here
  "-XX:+UseParallelGC",
) ++ sys.env.get("GRAFT_JVM_EXTRA").map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
