ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "imagingdbspark"
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
// The bench contract is ONE parseable JSON line on stdout; sbt's default
// LoggedOutput strategy prefixes every forked-run line with "[info] ",
// which breaks json.loads for any consumer of `sbt "runMain graft.Bench"`.
// StdoutOutput passes the forked process's stdout/stderr through verbatim.
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
  // guide §5 sizing: local[32] runs 32 concurrent tasks inside this one
  // JVM, and spark.memory.fraction carves execution memory out of -Xmx;
  // 8g left ~150 MB execution memory per task slot and the bench spent
  // a measured 3x its task CPU time in GC/alloc stalls (img_payload_stats
  // stage: run=29.1s vs cpu=7.1s at 8g; 2.6s total at 24g vs 3.7s).
  // Parameterized for smaller boxes; 24g default sized to the 128 GiB
  // sandbox at ~0.75 GB per core like a production executor would be.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
