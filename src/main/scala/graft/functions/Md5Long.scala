package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_long(s)` — the portable 60-bit hash (`long(md5_hex[0:15])`,
  * see Portable.md5Long) computed directly from the digest bytes.
  *
  * The built-in spelling `conv(substring(md5(c),1,15),16,10)` renders a
  * 32-char hex string, substrings it, and string-parses it back — three
  * string materializations per row on the dedup/minhash hot path. This
  * expression reads the first 7.5 digest bytes as a number, which is by
  * construction the same value (first 15 hex digits big-endian), so the
  * DuckDB oracles keep hash-matching.
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long"

  override protected def nullSafeEval(input: Any): Any =
    Md5LongKernel.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5LongKernel.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

object Md5LongKernel {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5 as a long = first 7 bytes, plus the high
    * nibble of byte 8.
    */
  def hash(s: UTF8String): Long = hashBytes(s.getBytes)

  def hashBytes(bytes: Array[Byte]): Long = hashBytes(bytes, bytes.length)

  /** Prefix variant for callers that reuse a concat buffer (the
    * shingle generator) — digests `bytes[0, len)` without a copy.
    */
  def hashBytes(bytes: Array[Byte], len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, 0, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}
