package org.apache.spark.deploy

import org.apache.spark.SparkConf
import org.apache.spark.deploy.master.Master
import org.apache.spark.deploy.worker.Worker
import org.apache.spark.rpc.RpcEnv

/** Test-only bridge into the standalone deploy layer (the
  * [[org.apache.spark.sql.GraftBridge]] device, applied to `deploy`):
  * an in-process master plus two workers registered under DIFFERENT
  * host strings — "localhost" and "127.0.0.1", both loopback.
  *
  * Why not `local-cluster[2,...]`: its workers all register as the same
  * hostname, and the scheduler never places a speculative copy on a host
  * that already runs an attempt of the task
  * (TaskSetManager.dequeueTaskHelper → hasAttemptOnHost), so speculation
  * can mark tasks but never LAUNCH copies on one machine. Distinct host
  * strings make the placement rule satisfiable while everything still
  * runs on loopback — which is exactly the cluster shape StragglerSpec
  * needs to exercise the re-execution, not a scheduling quirk it
  * works around: on a real cluster the copy lands on another machine.
  */
object GraftTestCluster {

  /** Opaque handle — RpcEnv is private[spark], so callers outside the
    * spark package hold this instead. */
  final class Handle private[deploy] (private val envs: Seq[RpcEnv]) {
    def stop(): Unit = envs.foreach { e =>
      e.shutdown()
      e.awaitTermination()
    }
  }

  /** Starts master + 2 one-executor workers; returns (masterUrl, handle).
    * Call `handle.stop()` when done.
    */
  def start(conf: SparkConf, coresPerWorker: Int, memMbPerWorker: Int,
      workDirRoot: String): (String, Handle) = {
    // the tuple's second element is the WEB UI port; the RPC port the
    // workers and the driver must dial lives on the env's own address
    val (masterEnv, _, _) =
      Master.startRpcEnvAndEndpoint("localhost", 0, 0, conf)
    val masterUrl = s"spark://localhost:${masterEnv.address.port}"
    val workers = Seq("localhost", "127.0.0.1").zipWithIndex.map { case (h, i) =>
      val wd = new java.io.File(workDirRoot, s"worker-${i + 1}")
      wd.mkdirs()
      Worker.startRpcEnvAndEndpoint(h, 0, 0, coresPerWorker, memMbPerWorker,
        Array(masterUrl), wd.getAbsolutePath, Some(i + 1), conf, None)
    }
    (masterUrl, new Handle(masterEnv +: workers))
  }
}
