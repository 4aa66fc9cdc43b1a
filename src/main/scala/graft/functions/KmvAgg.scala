package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** `kmv_kth(h, k)` — the k-th smallest DISTINCT value of a long column,
  * as a native AGGREGATE function: a bottom-k (KMV) sketch computed in
  * ONE pass with map-side partial aggregation.
  *
  * This is the aggregate-function spelling of the sketch q65/e27 build
  * via `row_number()` windows / stateful processors, and the extension
  * surface this library had not yet exercised: a
  * [[TypedImperativeAggregate]] (planned as ObjectHashAggregate) whose
  * buffer is the sketch itself — a ≤k-element ordered set, constant
  * size per group whatever the corpus. `update` inserts only values
  * under the current k-th (O(log k)), `merge` IS the KMV merge (the
  * mergeable-summary property as the aggregate's combine), so the
  * shuffle carries at most k longs per (partition, group) partial —
  * the 100 TB shape: corpus work map-side, sketch-sized exchange.
  * Distinctness is inherent (set semantics), so no `distinct`
  * pre-shuffle is needed.
  *
  * Returns NULL for groups with fewer than k distinct values — q65's
  * drop rule, decided per-group at eval.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ImplicitCastInputTypes {

  require(k > 0, s"kmv_kth: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  // analysis-time typing: an int column widens via implicit cast, a
  // non-castable column (array, struct) fails with a typed analyzer
  // message — never a runtime ClassCastException in an executor
  // (ADVICE r10). ImplicitCastInputTypes would ALSO silently accept a
  // string column (string→long casts per ANSI store-assignment, turning
  // unparseable values into nulls the sketch just skips), so
  // checkInputDataTypes below rejects string-origin children explicitly:
  // a hash column is integral by contract, and a string arriving here is
  // a wiring mistake that must fail analysis, not estimate garbage
  // (ADVICE r11). Result type inferred: AbstractDataType is private[sql]
  // by Scala access.
  override def inputTypes = Seq(LongType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // the implicit-cast rule has already wrapped the child by the time
    // CheckAnalysis calls this, so unwrap casts to find the stored type
    @annotation.tailrec
    def origin(e: Expression): DataType = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => origin(c.child)
      case other => other.dataType
    }
    if (origin(child).isInstanceOf[org.apache.spark.sql.types.StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_kth expects an integral hash column, got a string input " +
          s"(${child.sql}): hash it to a long first (e.g. md5_long)")
    else super.checkInputDataTypes()
  }
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_kth"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    KmvSketchAgg.boundedInsert(buf, k, h)

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size() == k) buf.last().longValue() else null

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

object KmvSketchAgg {
  /** Bounded ordered-set insert — the KMV sketch's one mutation, shared
    * with the streaming processor ([[graft.streaming.DocStream.KmvProcessor]])
    * so the batch aggregate and the stateful fold cannot drift: O(log k)
    * per row, O(k) memory, whatever the input size.
    */
  def boundedInsert(buf: java.util.TreeSet[java.lang.Long], k: Int, h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      // strictly under the current kth: displaces it (a duplicate of an
      // existing min returns add=false and must NOT evict)
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }
}
