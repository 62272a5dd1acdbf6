ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "legalchatbotvectordbexpspark"
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
// Pass the forked JVM's stdout/stderr through VERBATIM. The default
// LoggedOutput strategy prefixes every child line with "[info] ", which
// mangled graft.Bench's final summary JSON line for 8 straight rounds
// (the driver tails stdout and json-parses lines; "[info] {...}" never
// parses). StdoutOutput makes the bare line survive; Bench also writes
// bench_summary.json as a file-based fallback.
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
  // drainAll's ingestion ledger sums recentProgress; the default
  // 100-entry retention could evict early entries on a pathological
  // one-file-per-micro-batch listing. A system property reaches every
  // forked session at creation, before any query captures the conf.
  "-Dspark.sql.streaming.numRecentProgressUpdates=10000",
  // local[32] = driver-only: give the single JVM real headroom (the box
  // has 128 GiB; 8g caused GC-thrash variance under parallel stages)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
