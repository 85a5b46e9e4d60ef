package graft.mr

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}

import graft.SparkSpec
import graft.core.KV

/** Honest analogue of the reference's mtiming/rtiming parallelism probes
  * (mrapps/mtiming.go:19-62, mrapps/rtiming.go:17-60; asserted by
  * main/test-mr.sh:102-150): instead of marker files + kill(pid,0), a
  * SparkListener records the maximum number of simultaneously-running
  * tasks while a MapReduce job executes, and the test asserts real
  * overlap (≥ 2) — map side and reduce side both run parallel.
  */
class ParallelismSpec extends SparkSpec {

  test("map and reduce stages overlap at least 2 concurrent tasks") {
    import spark.implicits._
    val running = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onTaskStart(t: SparkListenerTaskStart): Unit = {
        val now = running.incrementAndGet()
        maxSeen.accumulateAndGet(now, math.max)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        running.decrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // enough synthetic docs, spread over 4 partitions, with a map
      // function slow enough that tasks genuinely overlap
      val input = spark.range(4000)
        .select($"id".cast("string"), $"id".cast("string"))
        .as[(String, String)]
        .repartition(4)
      val out = MapReduce.run(
        input,
        (k, v) => { Thread.sleep(0, 200); Seq(KV(s"k${k.toLong % 40}", v)) },
        (_, vs) => vs.size.toString)
      assert(out.count() == 40)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(maxSeen.get() >= 2, s"max concurrent tasks = ${maxSeen.get()}")
  }
}
