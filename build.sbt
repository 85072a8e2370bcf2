ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoop_data_lakespark"
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
// r18 (verdict ask #7): the single-JVM suite crossed the ~20 min line;
// split it into a small parallel matrix of forked JVMs. Suites stay
// SEQUENTIAL within each JVM (the shared-SparkSession assumptions—
// listeners, clearCache, Staging slots—hold per JVM); cross-JVM state is
// disjoint (staging roots are pid-keyed, fixture reads are read-only).
// Each JVM hosts its own local[4] session; 4 × 4 threads fits the host.
val testMatrixJvms = 4
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  tests.zipWithIndex.groupBy(_._2 % testMatrixJvms).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"matrix-$i", ts.map(_._1), Tests.SubProcess(forkOpts))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testMatrixJvms))
// Pass the forked process's stdout through verbatim: Bench prints ONE
// machine-readable JSON line that downstream tooling parses; sbt's
// default logger would prefix it with "[info] " and break the parse.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
