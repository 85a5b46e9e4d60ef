package graft.mr

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext

import graft.SparkSpec
import graft.core.KV
import graft.io.TextCorpus

/** E10 fault-tolerance VERIFICATION — the honest analogue of the
  * reference's crash test (ref: main/test-mr.sh:160-203, injected by
  * mrapps/crash.go:20-32: workers randomly `os.Exit(1)` mid-task; the
  * master's 10 s timeout sweeper re-executes their tasks,
  * mr/master.go:200-214, and the job must still produce golden output).
  *
  * Spark's equivalent machinery is task re-execution up to
  * `spark.task.maxFailures` — enabled in the shared test session via
  * `local[4, 4]`. These tests inject deterministic failures into the map
  * and reduce closures via [[TaskContext.attemptNumber]] (attempt 0
  * throws → attempt 1 succeeds), assert via a same-JVM counter that the
  * failures really fired, and diff the completed output byte-exactly
  * against the no-failure [[Sequential]] oracle — E10 flips from
  * "delegated, claimed" to "delegated, verified".
  */
class FaultToleranceSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._
  import java.nio.charset.StandardCharsets
  import java.nio.file.{Files, Paths}

  private lazy val corpusDir = resource("corpus")

  private lazy val files: Seq[(String, String)] =
    Files.list(Paths.get(corpusDir)).iterator().asScala.toSeq
      .sortBy(_.getFileName.toString)
      .map(p => (p.getFileName.toString,
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))

  private def sortedLines(kvs: Seq[KV]): Seq[String] =
    kvs.map(kv => s"${kv.key} ${kv.value}").sorted

  private def oracleLines: Seq[String] =
    sortedLines(Sequential.run(files, Apps.WordCount.map, Apps.WordCount.reduce))

  test("map tasks that crash on first attempt are re-executed; output is golden") {
    FaultToleranceSpec.crashCount.set(0)
    // Every map task crashes on its first attempt — a harsher schedule
    // than crash.go's ~33% coin flip, and fully deterministic.
    val faultyMap = (file: String, contents: String) => {
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0) {
        FaultToleranceSpec.crashCount.incrementAndGet()
        throw new RuntimeException("injected map crash (mrapps/crash.go analogue)")
      }
      Apps.WordCount.map(file, contents)
    }
    val out = MapReduce.run(
      TextCorpus.read(spark, corpusDir), faultyMap, Apps.WordCount.reduce)
      .collect().toSeq
    assert(FaultToleranceSpec.crashCount.get() > 0, "fault injection never fired - test proves nothing")
    assert(sortedLines(out) == oracleLines)
  }

  test("reduce tasks that crash on first attempt are re-executed; output is golden") {
    FaultToleranceSpec.crashCount.set(0)
    val faultyReduce = (key: String, values: Seq[String]) => {
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0) {
        FaultToleranceSpec.crashCount.incrementAndGet()
        throw new RuntimeException("injected reduce crash")
      }
      Apps.WordCount.reduce(key, values)
    }
    val out = MapReduce.run(
      TextCorpus.read(spark, corpusDir), Apps.WordCount.map, faultyReduce)
      .collect().toSeq
    assert(FaultToleranceSpec.crashCount.get() > 0, "fault injection never fired - test proves nothing")
    assert(sortedLines(out) == oracleLines)
  }

  test("repeated crashes within the failure budget still complete") {
    FaultToleranceSpec.crashCount.set(0)
    // Two consecutive failed attempts per task (maxFailures = 4 allows 3).
    val faultyMap = (file: String, contents: String) => {
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() < 2) {
        FaultToleranceSpec.crashCount.incrementAndGet()
        throw new RuntimeException(s"injected crash, attempt ${tc.attemptNumber()}")
      }
      Apps.WordCount.map(file, contents)
    }
    val out = MapReduce.run(
      TextCorpus.read(spark, corpusDir), faultyMap, Apps.WordCount.reduce)
      .collect().toSeq
    assert(FaultToleranceSpec.crashCount.get() >= 2, "expected at least two injected failures")
    assert(sortedLines(out) == oracleLines)
  }

  test("crashes beyond the failure budget abort the job (late-report rejection analogue)") {
    // The reference rejects tasks that never finish inside the retry
    // budget by re-queueing forever; Spark's contract is to fail the job
    // after maxFailures attempts — assert that boundary is where we
    // think it is rather than silently infinite.
    val alwaysCrash: (String, String) => Seq[KV] = (_, _) =>
      throw new RuntimeException("injected permanent crash")
    val ex = intercept[org.apache.spark.SparkException] {
      MapReduce.run(TextCorpus.read(spark, corpusDir), alwaysCrash, Apps.WordCount.reduce)
        .collect()
    }
    assert(ex.getMessage.contains("injected permanent crash"))
  }
}

object FaultToleranceSpec {
  /** Same-JVM proof that injected failures actually fired: in local mode
    * executor threads share the driver JVM, so a static counter observes
    * increments from failed task attempts (whose accumulator updates
    * Spark would discard).
    */
  val crashCount = new AtomicInteger(0)
}
