package graft.mr

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.KV
import graft.io.TextCorpus

/** E10's SECOND fault branch: tasks that STALL without dying.
  *
  * The reference's crash app has two failure modes — `os.Exit(1)` and a
  * random ≤10 s sleep (ref: mrapps/crash.go:25-31) — and the master's
  * 10 s timeout + re-issue sweep (ref: mr/master.go:200-214) exists for
  * the sleeper: a task that is merely SLOW is re-executed elsewhere and
  * the first finisher wins. [[FaultToleranceSpec]] covers the crash
  * branch; this suite covers the stall branch through Spark's equivalent
  * machinery — speculative execution: once a quantile of a stage's tasks
  * has finished, any task running past `multiplier × median` gets a copy
  * on a DIFFERENT executor, and the stage takes whichever attempt
  * finishes first.
  *
  * Speculation is structurally disabled under `local[N]`
  * (TaskSchedulerImpl.start gates the speculation scheduler on
  * `!isLocal`), so this suite runs a real 2-executor standalone cluster
  * — separate executor JVMs launched from /opt/spark, via
  * [[org.apache.spark.deploy.GraftTestCluster]], whose two workers
  * register under distinct host strings so the speculative-copy
  * placement rule (never on a host already running an attempt) is
  * satisfiable on one machine. The shared [[graft.SparkSpec]] session
  * is stopped first and rebuilds itself for later suites.
  *
  * Each test asserts three ways: the injected stall actually fired
  * (marker file written by the executor — executors no longer share the
  * driver JVM, so FaultToleranceSpec's static-counter proof cannot
  * work here), a speculative attempt was actually launched (driver-side
  * listener on `taskInfo.speculative`), and the job finished correct and
  * well under the stall duration — i.e. the result came from the
  * speculative copy, not from waiting out the sleep.
  */
class StragglerSpec extends AnyFunSuite with BeforeAndAfterAll {

  import scala.jdk.CollectionConverters._
  import java.nio.charset.StandardCharsets

  private var spark: SparkSession = _
  private var cluster: org.apache.spark.deploy.GraftTestCluster.Handle = _
  private var markerDir: Path = _
  private val StallMs = 15000L

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    markerDir = Files.createTempDirectory("graft-straggler-markers")
    val workRoot = Files.createTempDirectory("graft-straggler-work")
    val (masterUrl, handle) = org.apache.spark.deploy.GraftTestCluster.start(
      new org.apache.spark.SparkConf().set("spark.ui.enabled", "false"),
      coresPerWorker = 2, memMbPerWorker = 1024,
      workDirRoot = workRoot.toAbsolutePath.toString)
    cluster = handle
    spark = StragglerSpec.speculationSession(masterUrl)
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskStart(t: SparkListenerTaskStart): Unit =
        if (t.taskInfo.speculative) StragglerSpec.speculativeStarts.incrementAndGet()
    })
    // settle executor registration so test timings measure the job alone
    spark.range(100).count()
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (cluster != null) cluster.stop()
  }

  private def stallsFired: Long =
    Files.list(markerDir).iterator().asScala.count(_.getFileName.toString.startsWith("stall-"))

  test("a stalled task is speculatively re-executed; the job does not wait for it") {
    val before = StragglerSpec.speculativeStarts.get()
    val mdir = markerDir.toAbsolutePath.toString
    val s = spark // stable identifier for the implicits import
    import s.implicits._
    val t0 = System.nanoTime()
    val sum = spark.range(0, 1000, 1, 8).as[Long]
      .mapPartitions { it => StragglerSpec.stallIfFirstAttempt(mdir); it }
      .reduce(_ + _)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sum == 499500L)
    assert(stallsFired > 0, "stall injection never fired - test proves nothing")
    assert(StragglerSpec.speculativeStarts.get() > before,
      "no speculative task was launched")
    // the listener assertion above already proves the speculative copy
    // ran; the timing bound only needs to show we did not sit out the
    // full injected stall — full StallMs margin, not StallMs-3s, so a
    // loaded CI machine cannot flake an otherwise-correct run
    assert(sec < StallMs / 1000.0, f"job waited for the straggler: $sec%.1f s")
  }

  test("wordcount with a stalled reduce task still produces golden output, fast") {
    val before = StragglerSpec.speculativeStarts.get()
    val stallsBefore = stallsFired
    val mdir = markerDir.toAbsolutePath.toString
    val corpusDir = getClass.getClassLoader.getResource("corpus").getPath
    val files: Seq[(String, String)] =
      Files.list(Paths.get(corpusDir)).iterator().asScala.toSeq
        .sortBy(_.getFileName.toString)
        .map(p => (p.getFileName.toString,
          new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
    // the reduce slot is invoked once per KEY; the marker-file guard in
    // stallIfFirstAttempt collapses that to one stall per task attempt
    val stallingReduce = (key: String, values: Seq[String]) => {
      StragglerSpec.stallIfFirstAttempt(mdir)
      Apps.WordCount.reduce(key, values)
    }
    val t0 = System.nanoTime()
    val out = MapReduce.run(
      TextCorpus.read(spark, corpusDir), Apps.WordCount.map, stallingReduce)
      .collect().toSeq
    val sec = (System.nanoTime() - t0) / 1e9
    val oracle = Sequential.run(files, Apps.WordCount.map, Apps.WordCount.reduce)
    def lines(kvs: Seq[KV]): Seq[String] =
      kvs.map(kv => s"${kv.key} ${kv.value}").sorted
    assert(lines(out) == lines(oracle))
    assert(stallsFired > stallsBefore, "stall injection never fired - test proves nothing")
    assert(StragglerSpec.speculativeStarts.get() > before,
      "no speculative reduce task was launched")
    assert(sec < StallMs / 1000.0, f"job waited for the stalled reducer: $sec%.1f s")
  }
}

object StragglerSpec {
  /** Driver-side count of speculative attempts observed by the listener
    * (listener events are delivered in the driver JVM regardless of
    * where tasks run).
    */
  val speculativeStarts = new AtomicInteger(0)

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  /** The speculation-enabled session against a [[GraftTestCluster]]
    * master — ONE definition shared by the suite and the diagnostic
    * [[StragglerProbe]], so the probe can never silently observe a
    * different scheduler setup than the test it debugs.
    *
    * Notable confs: AQE partition coalescing OFF (the tiny test shuffle
    * would coalesce to one task, and single-task stages are never
    * speculated — TaskSetManager's numTasks == 1 guard); the efficiency
    * gate OFF (classic runtime-threshold speculation — data-rate
    * heuristics are irrelevant to a pure stall); executor JVMs get the
    * test classpath, the JDK17 opens build.sbt gives the forked test
    * JVM, and SPARK_SCALA_VERSION (a packaged distro has no
    * launcher/target build dir for the launcher to probe).
    */
  def speculationSession(masterUrl: String): SparkSession = SparkSession.builder()
    .master(masterUrl)
    .appName("graft-straggler-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.speculation", "true")
    .config("spark.speculation.interval", "100ms")
    .config("spark.speculation.multiplier", "1.5")
    .config("spark.speculation.quantile", "0.5")
    .config("spark.speculation.efficiency.enabled", "false")
    .config("spark.executor.extraClassPath", sys.props("java.class.path"))
    .config("spark.executor.extraJavaOptions", jdk17AddOpens)
    .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
    .config(graft.core.Tables.NanosAsLong, "true")
    .getOrCreate()

  /** Stall once per task attempt: the marker file doubles as the proof
    * the injection fired and (via createFile atomicity) as the
    * once-per-attempt guard. Attempt 0 only — the speculative copy (and
    * any retry) runs clean, like crash.go re-runs are a fresh coin flip.
    * Lives on the companion so task closures stay serializable (the
    * suite instance holds a non-serializable scalatest engine) and runs
    * IN THE EXECUTOR JVMS, which share this machine's filesystem.
    */
  def stallIfFirstAttempt(dir: String): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(dir, s"stall-${tc.taskAttemptId()}"))
        Thread.sleep(15000) // do not catch: the losing attempt is
                            // killed via interrupt when the copy wins
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => () // already stalled this attempt
      }
    }
  }
}
