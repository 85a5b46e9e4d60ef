ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduceframeworkingospark"
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
// The local-cluster bench mode (Bench's second phase) starts standalone
// workers in-process; their executor command builder resolves SPARK_HOME
// and the scala version from the process environment (spark-submit
// normally injects both; a bare forked JVM has neither).
run / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  "SPARK_SCALA_VERSION" -> "2.13")
Test / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  "SPARK_SCALA_VERSION" -> "2.13")
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
// StragglerSpec owns a standalone mini-cluster with speculation enabled —
// context confs are creation-time, and suites interleave within one test
// JVM, so it gets its own forked JVM. Groups run one at a time (sbt's
// default ForkedTestGroup limit is 1).
Test / testGrouping := {
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val (straggler, rest) = (Test / definedTests).value
    .partition(_.name.contains("StragglerSpec"))
  Seq(
    Tests.Group("straggler", straggler, Tests.SubProcess(opts)),
    Tests.Group("rest", rest, Tests.SubProcess(opts)),
  ).filter(_.tests.nonEmpty)
}
