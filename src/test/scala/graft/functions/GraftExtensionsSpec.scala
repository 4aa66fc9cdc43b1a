package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** The config-driven integration point
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) must inject
  * every custom expression — this is how a real cluster deployment gets
  * the functions without calling `GraftFunctions.register` in code.
  * Tested against a standalone FunctionRegistry (the same path session
  * construction uses) so the shared test session's lifecycle is never
  * touched.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private val registry: FunctionRegistry = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftExtensionsTestAccess
      .registerFunctions(ext, FunctionRegistry.builtin.clone())
  }

  test("md5_long resolves and evaluates through the injected builder") {
    val e = registry.lookupFunction(FunctionIdentifier("md5_long"), Seq(Literal("abc")))
    // md5("abc") = 900150983cd24fb0..., first 15 hex digits as a long
    assert(e.eval(InternalRow.empty) == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("vec_dot resolves and evaluates through the injected builder") {
    val e = registry.lookupFunction(FunctionIdentifier("vec_dot"), Seq(
      Literal.create(Array(1.0, 2.0, 3.0)), Literal.create(Array(4.0, 5.0, 6.0))))
    assert(e.eval(InternalRow.empty) == 32.0)
  }

  test("winnow_fp resolves, consuming its literal k/w parameters") {
    val e = registry.lookupFunction(FunctionIdentifier("winnow_fp"), Seq(
      Literal("one two three four five six seven"), Literal(4), Literal(3)))
    val fps = e.eval(InternalRow.empty).asInstanceOf[ArrayData]
    assert(fps.numElements() > 0)
  }

  test("wrong arity is rejected by the injected builders") {
    intercept[IllegalArgumentException] {
      registry.lookupFunction(FunctionIdentifier("vec_dot"), Seq(Literal(1.0)))
    }
  }
}
