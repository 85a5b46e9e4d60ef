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
    // the EXACT session the suite runs under — shared definition so the
    // probe never drifts from the setup it exists to debug
    val spark = StragglerSpec.speculationSession(masterUrl)
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
