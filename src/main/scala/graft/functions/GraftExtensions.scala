package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Standard integration point: enable the graft functions in ANY session
  * with `spark.sql.extensions=graft.functions.GraftExtensions` (e.g. on
  * spark-submit to a real cluster) — the config-driven twin of the
  * runtime `GraftFunctions.register` used when the driver owns the
  * session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("winnow_fp"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fp"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 3, "winnow_fp(text, k, w)")
        WinnowFingerprint(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      FunctionIdentifier("md5_long"),
      new ExpressionInfo(classOf[Md5Long].getName, "md5_long"),
      { exprs: Seq[Expression] => require(exprs.length == 1, "md5_long(s)"); Md5Long(exprs.head) }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      { exprs: Seq[Expression] => require(exprs.length == 2, "vec_dot(a, b)"); VecDot(exprs.head, exprs(1)) }))
  }
}
