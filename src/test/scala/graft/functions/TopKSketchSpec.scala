package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TopKSketchSpec extends SparkSpec {

  private def topkRows(df: org.apache.spark.sql.DataFrame, k: Int, cap: Int) =
    df.agg(TopKSketch.topkByCount(col("w"), k, cap).as("t"))
      .select(explode(col("t")).as("e")).select("e.word", "e.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("exact mode (capacity >= distinct) equals groupBy count across partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val words = (1 to 5000).map(_ => s"w${rnd.nextInt(200)}")
    val df = words.toDF("w").repartition(7)
    val got = topkRows(df, 10, 1024)
    val exp = df.groupBy($"w").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, c) => (-c, w) }.take(10).toSeq
    assert(got == exp)
  }

  test("approximate mode (tight capacity) still surfaces the dominant key") {
    import spark.implicits._
    // one key with 60% mass + a long tail wider than the capacity
    val words = Seq.fill(3000)("HOT") ++ (1 to 2000).map(i => s"tail$i")
    val df = scala.util.Random.shuffle(words).toDF("w").repartition(5)
    val got = topkRows(df, 1, 64)
    assert(got.head._1 == "HOT")
    // space-saving error bound: count off by at most n/capacity
    assert(math.abs(got.head._2 - 3000L) <= 5000 / 64 + 1)
  }

  test("null inputs are ignored") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("w")
    val got = topkRows(df, 2, 16)
    assert(got == Seq(("a", 2L), ("b", 1L)))
  }
}
