ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "icedbspark"
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
// Pass the forked JVM's stdout through unadorned (default LoggedOutput
// prefixes every line with [info]/[error], which breaks the driver's
// machine-parse of Bench's final JSON metric line), and drop sbt's own
// trailing "[success] Total time" line so the metric JSON printed by the
// forked main is the LAST stdout line of `sbt runMain graft.Bench`.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // 8g forced old-gen thrash once local[32] runs 32 concurrent tasks over
  // the bench's 6M-row builds — full-GC cpu then bills to whatever query
  // is being timed (measured: b11_topk 1.7s/10cpu alone vs 17.5s/177cpu
  // mid-bench). The host has 128 GiB; a real deployment sizes executor
  // heap to the task set the same way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
