package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `run_stats(arr)` — run-length statistics of a string array's SORTED
  * order as one fused kernel: `struct(maxrun, dup)` where `maxrun` is
  * the longest run of equal elements (= the most frequent element's
  * count) and `dup` the number of elements whose value occurs ≥ 2 times
  * (every member of a run of length ≥ 2 counts).
  *
  * Replaces the t7/t14 spelling
  * `aggregate(array_sort(arr), named_struct(...), (a, x) -> ...)`:
  * Catalyst's higher-order functions evaluate their lambda
  * INTERPRETED, binding lambda variables and allocating a struct per
  * element — measured ~200 µs/doc on gate documents, the whole cost of
  * the t7 cell. This kernel sorts a UTF8String array (same binary
  * ordering as `array_sort` under the default UTF8_BINARY collation,
  * nulls LAST, null-safe equality — the `x <=> a.prev` semantics) and
  * takes one pass, all inside whole-stage codegen via a static call.
  * Bitwise-identical outputs; the DuckDB oracles are unchanged.
  */
case class RunStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("maxrun", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"run_stats needs array<string>, got $other")
    }

  override def prettyName: String = "run_stats"
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(arr: Any): Any =
    RunStatsKernel.eval(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.RunStatsKernel.eval($a)")

  override protected def withNewChildInternal(newChild: Expression): RunStats =
    copy(child = newChild)
}

object RunStatsKernel {
  /** Sort (binary order, nulls last) + one run-length pass. Equality is
    * null-safe, matching the `x <=> a.prev` fold it replaces; an empty
    * array yields (0, 0) exactly as the fold's initial state does.
    */
  def eval(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val a = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      a(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(a, (x: UTF8String, y: UTF8String) =>
      if (x eq y) 0
      else if (x == null) 1
      else if (y == null) -1
      else x.compareTo(y))
    var maxrun = 0L
    var dup = 0L
    var run = 0L
    i = 0
    while (i < n) {
      val same = i > 0 && (if (a(i) == null) a(i - 1) == null
                           else a(i - 1) != null && a(i).equals(a(i - 1)))
      run = if (same) run + 1 else 1
      if (run > maxrun) maxrun = run
      if (same) dup += (if (run == 2) 2L else 1L)
      i += 1
    }
    new GenericInternalRow(Array[Any](maxrun, dup))
  }
}
