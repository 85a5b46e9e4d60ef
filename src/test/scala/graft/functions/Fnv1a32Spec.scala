package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FNV-1a 32-bit parity with Go's hash/fnv (ref: mr/worker.go:29-33),
  * checked against the published FNV test vectors, in both interpreted
  * (nullSafeEval) and codegen paths.
  */
class Fnv1a32Spec extends SparkSpec {

  // Published FNV-1a 32 vectors (Fowler/Noll/Vo), masked & 0x7fffffff
  // as the reference does.
  private val vectors = Seq(
    "" -> (0x811c9dc5L & 0x7fffffffL),
    "a" -> (0xe40c292cL & 0x7fffffffL),
    "foobar" -> (0xbf9cf968L & 0x7fffffffL))

  test("hash matches published FNV-1a vectors") {
    vectors.foreach { case (s, exp) =>
      assert(Fnv1a32.hash(s.getBytes("UTF-8")) == exp, s"for '$s'")
    }
  }

  test("expression evaluates through the Spark SQL engine (codegen path)") {
    import spark.implicits._
    val df = vectors.map(_._1).toDF("s")
      .select($"s", Fnv1a32.fnv1a32($"s").as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vectors.foreach { case (s, exp) => assert(got(s) == exp, s"for '$s'") }
  }

  test("null input yields null") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(Fnv1a32.fnv1a32($"s").as("h"))
    assert(df.collect().map(r => r.isNullAt(0)).toSeq == Seq(true, false))
  }
}
