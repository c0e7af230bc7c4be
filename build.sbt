ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphdspark"
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
// Bare stdout for forked runs: the bench/verify drivers parse the JSON
// line from stdout, and sbt's default logger prefixes every line with
// "[info] ", which breaks line-oriented JSON parsing.
run / outputStrategy := Some(StdoutOutput)
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
  // local[32] shares one JVM between driver and all executor threads;
  // 54 bench queries' cached blocks + shuffle buffers at sf0.1 thrash
  // an 8g heap into GC stalls (observed: a 2s query degrading to 30s+
  // late in the suite). The image gives the JVM 128 GiB to work with.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)

// Test classes share one JVM, one SparkSession, JVM-global operator
// memos, AND several suites toggle global sysprops
// (graft.bloom.maxSingleBits, graft.cc.starRows, ...) around forced-
// regime tests. Running classes in parallel makes those windows race:
// observed as an intermittent PipelinePropsSpec NPE when a concurrent
// suite's bloom override flipped a property run into a half-configured
// regime. Suites are serialized; per-suite Spark jobs still use every
// core, so the wall cost is driver-side gaps only.
Test / parallelExecution := false
