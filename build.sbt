ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "relationextractionpipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// One shared SparkSession across suites (SparkTestBase) — parallel suite
// execution races ExtensionsSpec's clear-session/getOrCreate against the
// other suites' session lookups; Spark tests on one context must be serial.
Test / parallelExecution := false
run / fork := true
// Round-6 `parsed:null` fix: the default outputStrategy for a forked
// run is LoggedOutput — sbt pumps the child's stdout through its log
// appender and EVERY line (even raw FileDescriptor.out writes inside
// the child: graft.tools.RawProbe measured it) arrives as
// "[info] <line>", which is why the driver's JSON tail-parse of
// Bench's final line failed 5 rounds straight. StdoutOutput hands the
// child sbt's own stdout: Bench/Verify/Main lines arrive BARE.
run / outputStrategy := Some(StdoutOutput)
// ...and suppress the "[success] Total time: ..." epilogue sbt would
// otherwise print AFTER the final JSON line, so Bench's gate line is
// the literal last stdout line of the whole sbt invocation.
showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
