package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GroupedTopK must equal the window row_number formulation on skewed
  * multi-partition data, including tie-breaks, and stay bounded at k.
  */
class GroupedTopKSpec extends SparkSpec {

  test("bounded-heap grouped top-k equals the window formulation with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // duplicate values force tie-breaking by id
    val rows = (1 to 4000).map { i =>
      (s"g${rnd.nextInt(20)}", rnd.nextInt(50).toDouble, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(6)

    val viaAgg = df.groupBy($"g")
      .agg(GroupedTopK.groupedTopK($"v", $"id", 5).as("top"))
      .select($"g", posexplode($"top").as(Seq("r", "t")))
      .select($"g", ($"r" + 1).as("rank"), $"t.id", $"t.ord")
      .collect().map(_.toSeq).toSet

    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val viaWindow = df.withColumn("rank", row_number().over(w).cast("int"))
      .filter($"rank" <= 5)
      .select($"g", $"rank", $"id", $"v")
      .collect().map(_.toSeq).toSet

    assert(viaAgg == viaWindow)
  }

  test("groups smaller than k return all their rows in order") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", 3.0, 2L)).toDF("g", "v", "id")
    val got = df.groupBy($"g")
      .agg(GroupedTopK.groupedTopK($"v", $"id", 10).as("top"))
      .select(explode($"top").as("t")).select($"t.ord", $"t.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got == Seq((3.0, 2L), (1.0, 1L)))
  }
}
