package graft.io

import java.nio.file.Files

import graft.SparkSpec

/** Co-located (shuffle-free) joins via bucketing: both sides written
  * bucketed+sorted on the join key join with NO Exchange on either side —
  * the pre-partitioning strategy for repeated large joins at 100 TB
  * (bucket count chosen once, amortized across every downstream join).
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_bucketing").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      (1 to 10000).map(i => (i.toLong % 500, s"left$i")).toDF("k", "l")
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$tmp/t1").saveAsTable("graft_b1")
      (1 to 3000).map(i => (i.toLong % 500, s"right$i")).toDF("k", "r")
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$tmp/t2").saveAsTable("graft_b2")

      val joined = spark.table("graft_b1").join(spark.table("graft_b2"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 10000L * 3000 / 500 / 500 * 500) // 20*6*500
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_b1")
      spark.sql("DROP TABLE IF EXISTS graft_b2")
    }
  }
}
