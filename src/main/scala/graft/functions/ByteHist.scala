package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** `byte_hist(payload, dim)` — byte-class histogram of a binary column:
  * one `array<long>` of `dim` counts per row, bucket = (byte & 0xff) %
  * dim. The native kernel for the m3 decode-feature stub.
  *
  * The column-algebra spelling (hex the payload, regex-split into
  * per-byte rows, conv() each two-char string back to an int, hash-agg
  * the counts) materializes a 2-char string PLUS an exploded row per
  * payload BYTE and then shuffles |docs|·dim count partials. This
  * expression is one fused loop over the raw bytes — no hex round-trip,
  * no per-byte rows, no aggregate, no Exchange anywhere — and per-row
  * state is `dim` longs regardless of payload size, so GB-scale media
  * blobs stream through without the array-explosion hazard the frame
  * chunking existed to bound. At 100 TB of media the difference is the
  * scan being CPU-bound on a regex engine vs running at memory
  * bandwidth.
  */
case class ByteHist(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_hist"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_hist needs binary, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(ByteHistKernel.hist(input.asInstanceOf[Array[Byte]], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
            graft.functions.ByteHistKernel.hist($c, $dim));""")

  override protected def withNewChildInternal(newChild: Expression): ByteHist =
    copy(child = newChild)
}

object ByteHistKernel {
  def hist(bytes: Array[Byte], dim: Int): Array[Long] = {
    val h = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) { h((bytes(i) & 0xff) % dim) += 1; i += 1 }
    h
  }
}
