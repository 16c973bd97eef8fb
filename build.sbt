ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "honorsp1mapreducespark"
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
// The driver's bench harness tail-captures the last 2000 chars of sbt
// stdout and json-parses the LAST line. Two things broke that in every
// prior round: the forked run's stdout went through sbt's logger (an
// "[info] " prefix on the JSON line), and sbt appended its "[success]
// Total time..." epilogue after it. Inherit stdout raw and suppress the
// epilogue so a main's final println is genuinely final and unprefixed.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // default matches tools/run.sh (16g): the sbt-forked bench/verify JVM
  // previously ran at 8g while every run.sh invocation got 16g — at 269
  // bench queries with intra-query caches the smaller heap just adds GC
  // pressure on a 128 GiB box (r13 parity fix; SPARK_DRIVER_MEM still
  // overrides both)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
