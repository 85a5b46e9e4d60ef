package graft.mr

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Diagnostic main (not a test): runs the straggler scenario with INFO
  * scheduler logging to observe the speculation decision path. Run via
  * `sbt "Test/runMain graft.mr.StragglerProbe"`.
  */
object StragglerProbe {
  def main(args: Array[String]): Unit = {
    val workRoot = Files.createTempDirectory("graft-straggler-work")
    val (masterUrl, cluster) = org.apache.spark.deploy.GraftTestCluster.start(
      new org.apache.spark.SparkConf().set("spark.ui.enabled", "false"),
      coresPerWorker = 2, memMbPerWorker = 1024,
      workDirRoot = workRoot.toAbsolutePath.toString)
    val jdk17AddOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master(masterUrl)
      .appName("straggler-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "100ms")
      .config("spark.speculation.multiplier", "1.5")
      .config("spark.speculation.quantile", "0.5")
      .config("spark.speculation.efficiency.enabled", "false")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", jdk17AddOpens)
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    val mdir = Files.createTempDirectory("graft-straggler-markers").toAbsolutePath.toString
    spark.range(100).count()
    import spark.implicits._
    val t0 = System.nanoTime()
    val sum = spark.range(0, 1000, 1, 8).as[Long]
      .mapPartitions { it => StragglerSpec.stallIfFirstAttempt(mdir); it }
      .reduce(_ + _)
    println(s"PROBE sum=$sum sec=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
    cluster.stop()
  }
}
