package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must register the native functions into any session's
  * function registry (tested against a standalone registry — the same
  * path `withExtensions` / `spark.sql.extensions` runs at session build,
  * without disturbing the suite-shared SparkSession).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension registers fnv1a32 and the built expression evaluates") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    val registry = org.apache.spark.sql.GraftBridge
      .registerFunctions(ext, new SimpleFunctionRegistry)
    val fn = FunctionIdentifier("fnv1a32")
    assert(registry.functionExists(fn))
    val expr = registry.lookupFunction(fn, Seq(Literal("a")))
    assert(expr.eval(null) == (0xe40c292cL & 0x7fffffffL))
  }
}
