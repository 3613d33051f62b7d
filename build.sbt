ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rsyslogspark"
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
// The perf driver parses the bench's FINAL stdout line as one raw JSON
// object. BENCH_r14/r15 carried parsed:null because every program line
// arrived behind sbt's "[info] " prefix and sbt's own "[success] Total
// time" line landed after the JSON. Stream forked run output straight
// to stdout (unprefixed) and drop the trailing success line so the last
// line of `sbt "runMain graft.Bench"` is the bench's own JSON.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by the command engine, not by another task — the
// unused-key lint can't see that (verified: the [success] line is gone)
Global / excludeLintKeys += showSuccess
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
  // 48g on the 128GiB bench host: the full 166-query suite plus the
  // 10x/100x/1000x scale sections in one local[32] JVM thrashed old-gen
  // at 8g (end-of-suite queries measured 20-50x fresh-JVM times) and at
  // 24g the r10 probe OOM'd inside sf10 dedup_ngram's bucket buffers
  // once preceding sections' retained heap narrowed the margin
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
