package graft.io

import java.nio.file.Files

import graft.SparkSpec

/** Sink round-trips: query results written as parquet / CSV / JSON / ORC read
  * back value-identical. (The reference's only sink is "key value" text
  * lines — covered by TextCorpus.writeLines in MapReduceSpec; these are
  * the structured sinks a pipeline materializes to.)
  */
class SinksSpec extends SparkSpec {

  test("parquet, csv, json and orc round-trip a query result") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_sinks").toString
    val df = graft.SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
    val expected = df.collect().map(_.toSeq.map(String.valueOf)).toSet

    df.write.mode("overwrite").parquet(s"$tmp/p")
    val fromParquet = spark.read.parquet(s"$tmp/p")
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(fromParquet == expected)

    df.write.mode("overwrite").option("header", "true").csv(s"$tmp/c")
    val fromCsv = spark.read.option("header", "true")
      .schema(df.schema).csv(s"$tmp/c")
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(fromCsv == expected)

    df.write.mode("overwrite").json(s"$tmp/j")
    val fromJson = spark.read.schema(df.schema).json(s"$tmp/j")
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(fromJson == expected)

    df.write.mode("overwrite").orc(s"$tmp/o")
    val fromOrc = spark.read.orc(s"$tmp/o")
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(fromOrc == expected)
  }
}
