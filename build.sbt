ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "criis_source_extracts_for_omopspark"
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
// Forked mains write sbt's OWN stdout, not the logger pump: the driver
// parses Bench's JSON line from stdout, and the default LoggedOutput
// strategy prefixes every line with "[info] " (breaking JSON parsing).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // single-JVM local[N] driver+executor. 24g fits every surface here
  // (query suite at sf0.1, WAL generation, tests); bigger is WORSE: a 48g
  // -Xms-pinned heap measurably degraded the replay benchmarks (G1
  // spreads allocation over the whole heap — page-touch storms escalated
  // identical merge epochs 19s→60s within one run) and an idle 48g main
  // JVM starved the measurement children. Bench's measurement JVMs pin
  // their own 16g heaps (see Bench.replayOnce).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-Xms2g",
)
