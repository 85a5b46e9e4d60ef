package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FloatDot must be bit-identical to the interpreted left-fold
  * formulation (the oracle's summation order) and null-safe.
  */
class FloatDotSpec extends SparkSpec {

  test("native dot equals the higher-order-function left fold bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = aggregate(
      transform(sequence(lit(1), size($"a")),
        i => element_at($"a", i).cast("double") * element_at($"b", i).cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val out = df.select($"id",
      FloatDot.floatDot($"a", $"b").as("native"), hof.as("interp")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"row ${r.getLong(0)}")
    }
  }

  test("null arrays yield null") {
    import spark.implicits._
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(FloatDot.floatDot($"a", $"b").as("d"))
    assert(df.collect().head.isNullAt(0))
  }
}
