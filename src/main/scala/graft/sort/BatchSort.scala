package graft.sort

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The reference's single relational operator: multi-column lexicographic
  * sort of one batch by ALL its columns, ascending, nulls-first, built two
  * ways behind a flag (reference `sort_batch`, `src/lib.rs:23-75`).
  *
  * Strategy mapping (SURVEY §2.1 #1-2):
  *  - [[Strategy.RowFormat]] — the reference's Arrow row-format
  *    (normalized-key) sort (`src/lib.rs:35-53`). Spark's native sort
  *    already IS this technique (`UnsafeRow` binary format +
  *    `UnsafeExternalRowSorter` with radix-sortable key prefixes), so this
  *    strategy is plain `sortWithinPartitions` and inherits whole-stage
  *    codegen, spill-awareness, and per-partition parallelism for free.
  *    At cluster scale a global sort would be `orderBy` (range-partitioned
  *    exchange + per-partition sort); the single-batch experiment keeps the
  *    reference's one-partition scope.
  *  - [[Strategy.DynComparator]] — the reference's per-column dynamic
  *    comparator chain (`lexsort_to_indices`, `src/lib.rs:33-34`): a
  *    schema-driven chained `Ordering[Row]` applied per partition. This is
  *    deliberately NOT codegen'd — it exists to reproduce the reference's
  *    A/B experiment, not as the production path.
  *
  * Both strategies must produce identical output (the property the
  * reference assumes but never checks — SURVEY §5); the differential suite
  * enforces it, including on nulls/NaN/±0.0 inputs the reference never
  * generates.
  */
object BatchSort {

  sealed trait Strategy
  object Strategy {
    /** Normalized-key sort = Spark native `SortExec`. */
    case object RowFormat extends Strategy
    /** Chained per-column comparator over `mapPartitions`. */
    case object DynComparator extends Strategy
  }

  /** Sort key = every schema column in schema order, ascending nulls-first
    * (reference `make_sort_exprs`, `src/lib.rs:78-87`; Arrow's
    * `SortOptions::default()` equals Spark's `asc` default — SURVEY §2.1 #4).
    */
  def sortExprs(schema: StructType): Seq[Column] =
    schema.fieldNames.toSeq.map(col(_).asc)

  def sortBatch(df: DataFrame, strategy: Strategy): DataFrame = strategy match {
    case Strategy.RowFormat =>
      df.sortWithinPartitions(sortExprs(df.schema): _*)
    case Strategy.DynComparator =>
      val ord = rowOrdering(df.schema)
      df.mapPartitions { it =>
        val arr = it.toArray
        java.util.Arrays.sort(arr, ord)
        arr.iterator
      }(Encoders.row(df.schema))
  }

  /** Chained comparator with Spark SQL ordering semantics per column:
    * nulls first; strings by unsigned UTF-8 byte comparison (Spark binary
    * collation — NOT Java's UTF-16 `String.compareTo`, which disagrees for
    * supplementary code points); doubles/floats with NaN greatest,
    * NaN == NaN, and -0.0 == 0.0 (Spark normalizes signed zeros).
    */
  // Primitive-signature comparator (a Function3 lambda would box the Int
  // index/result on every call — this chain IS the measured hot loop).
  private abstract class FieldCmp(val idx: Int) extends Serializable {
    def cmpNonNull(a: Row, b: Row): Int
    final def cmp(a: Row, b: Row): Int = {
      val an = a.isNullAt(idx); val bn = b.isNullAt(idx)
      if (an && bn) 0
      else if (an) -1 // nulls first (asc default in both Arrow and Spark)
      else if (bn) 1
      else cmpNonNull(a, b)
    }
  }

  def rowOrdering(schema: StructType): java.util.Comparator[Row] = {
    val fieldCmps: Array[FieldCmp] = schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case StringType => new FieldCmp(i) {
          def cmpNonNull(a: Row, b: Row) = compareUtf8(a.getString(idx), b.getString(idx))
        }
        case LongType => new FieldCmp(i) {
          def cmpNonNull(a: Row, b: Row) = java.lang.Long.compare(a.getLong(idx), b.getLong(idx))
        }
        case IntegerType => new FieldCmp(i) {
          def cmpNonNull(a: Row, b: Row) = java.lang.Integer.compare(a.getInt(idx), b.getInt(idx))
        }
        case ShortType => new FieldCmp(i) {
          def cmpNonNull(a: Row, b: Row) = java.lang.Short.compare(a.getShort(idx), b.getShort(idx))
        }
        case ByteType => new FieldCmp(i) {
          def cmpNonNull(a: Row, b: Row) = java.lang.Byte.compare(a.getByte(idx), b.getByte(idx))
        }
        case BooleanType => new FieldCmp(i) {
          def cmpNonNull(a: Row, b: Row) = java.lang.Boolean.compare(a.getBoolean(idx), b.getBoolean(idx))
        }
        case DoubleType => new FieldCmp(i) {
          def cmpNonNull(a: Row, b: Row) = compareDouble(a.getDouble(idx), b.getDouble(idx))
        }
        case FloatType => new FieldCmp(i) {
          def cmpNonNull(a: Row, b: Row) = compareDouble(a.getFloat(idx).toDouble, b.getFloat(idx).toDouble)
        }
        case TimestampType | TimestampNTZType | DateType => new FieldCmp(i) {
          def cmpNonNull(a: Row, b: Row) = nonNullCompare(a.get(idx), b.get(idx))
        }
        case other =>
          throw new IllegalArgumentException(s"unsupported sort column type $other")
      }
    }
    new java.util.Comparator[Row] with Serializable {
      override def compare(a: Row, b: Row): Int = {
        var i = 0
        while (i < fieldCmps.length) {
          val c = fieldCmps(i).cmp(a, b)
          if (c != 0) return c
          i += 1
        }
        0
      }
    }
  }

  /** Unicode code-point order == unsigned UTF-8 byte order (what Spark's
    * `UTF8String.compareTo` / binary collation does). Allocation-free:
    * walks code points instead of materializing UTF-8 byte arrays. NOT
    * UTF-16 `String.compareTo`, which misorders supplementary planes
    * against U+E000..U+FFFF.
    */
  def compareUtf8(a: String, b: String): Int = {
    val la = a.length; val lb = b.length
    var i = 0
    // fast path: identical UTF-16 prefixes need no code-point logic
    val minLen = math.min(la, lb)
    while (i < minLen && a.charAt(i) == b.charAt(i)) i += 1
    if (i == minLen) return Integer.compare(la, lb)
    val ca = Character.codePointAt(a, i)
    val cb = Character.codePointAt(b, i)
    // differing chars at i: if either is a high surrogate the code points
    // decide; otherwise the chars themselves are the code points
    Integer.compare(ca, cb)
  }

  /** Spark SQL double ordering: -0.0 == 0.0, NaN == NaN, NaN greatest. */
  def compareDouble(a: Double, b: Double): Int = {
    val an = java.lang.Double.isNaN(a); val bn = java.lang.Double.isNaN(b)
    if (an && bn) 0
    else if (an) 1
    else if (bn) -1
    else java.lang.Double.compare(if (a == 0.0d) 0.0d else a, if (b == 0.0d) 0.0d else b)
  }

  private def nonNullCompare(x: Any, y: Any): Int =
    x.asInstanceOf[Comparable[AnyRef]].compareTo(y.asInstanceOf[AnyRef])
}
