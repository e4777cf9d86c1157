package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.InterpretedOrdering
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Exact top-k rows per group as a BOUNDED aggregation buffer — the
  * scale-safe twin of `row_number().over(Window.partitionBy(g).orderBy(o))
  * .filter(rk <= k)`. The window shape sorts and materializes EVERY row of
  * every group on one task before discarding all but k; at a 100 TB table
  * with a handful of groups that is a straight single-task cliff (the
  * q48/q61 family, VERDICT r4). This aggregate keeps at most k rows per
  * group per partition (a size-k heap), combines map-side like any
  * hash-agg, and merges k-vs-k buffers at the reducer — the whole
  * per-group state is O(k) everywhere, so group count and group size are
  * both unbounded.
  *
  * Semantics: rows are ranked by the struct child's fields in order, field
  * i descending when `desc(i)`, ascending otherwise, nulls last on
  * ascending / first on descending (Spark's default null ordering — the
  * fixtures carry no null sort keys). Ties beyond the declared fields are
  * impossible when (as with any window-rank replacement) the caller
  * includes a tiebreak key, exactly as q16's `ORDER BY price DESC, key`
  * does. `eval` returns the k rows best-first, so `posexplode` yields the
  * 1-based rank directly.
  *
  * Buffer is a max-heap keyed "worst first": update compares an incoming
  * row against the current worst and copies it in only when it displaces;
  * serialization is length-prefixed UnsafeRow bytes.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    desc: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[UnsafeRow]] {

  require(k > 0, s"k must be positive, got $k")

  // child.dataType is only known after analysis — everything derived from
  // it must stay lazy, and the arity check belongs in checkInputDataTypes
  private lazy val structType = child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case st: StructType if st.length == desc.length =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case st: StructType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"one direction flag per struct field: ${desc.length} vs ${st.length}")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"BoundedTopK requires a struct child, got $other")
    }

  // best-first ordering: compare(a, b) < 0 when a outranks b
  private lazy val ord = new InterpretedOrdering(
    structType.fields.toSeq.zipWithIndex.map { case (f, i) =>
      SortOrder(BoundReference(i, f.dataType, f.nullable),
        if (desc(i)) Descending else Ascending)
    })

  private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): mutable.PriorityQueue[UnsafeRow] =
    // PriorityQueue dequeues the MAX under its ordering; with the
    // best-first ordering the max IS the worst-ranked row — what a full
    // buffer evicts.
    new mutable.PriorityQueue[UnsafeRow]()(ord.on(identity[UnsafeRow]))

  override def update(buf: mutable.PriorityQueue[UnsafeRow],
                      input: InternalRow): mutable.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.size < k) buf.enqueue(toUnsafe(row).copy())
      else if (ord.compare(row, buf.head) < 0) {
        buf.dequeue()
        buf.enqueue(toUnsafe(row).copy())
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[UnsafeRow],
                     other: mutable.PriorityQueue[UnsafeRow]): mutable.PriorityQueue[UnsafeRow] = {
    other.foreach { r =>
      if (buf.size < k) buf.enqueue(r)
      else if (ord.compare(r, buf.head) < 0) { buf.dequeue(); buf.enqueue(r) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[UnsafeRow]): Any =
    new GenericArrayData(buf.toArray.sorted(ord.on(identity[UnsafeRow]))
      .map(_.asInstanceOf[Any]))

  override def serialize(buf: mutable.PriorityQueue[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { r =>
      val b = r.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[UnsafeRow] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.getInt
      val row = new UnsafeRow(structType.length)
      val arr = new Array[Byte](len)
      in.get(arr)
      row.pointTo(arr, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren.head)
}

object BoundedTopK {
  /** `topK(struct(sortCol1, ..., payload...), k, desc)` — aggregate Column
    * returning the k best struct rows, best-first. `desc(i)` flips field i
    * to descending.
    */
  def topK(s: Column, k: Int, desc: Seq[Boolean]): Column =
    GraftColumnBridge.column(
      BoundedTopK(GraftColumnBridge.expression(s), k, desc)
        .toAggregateExpression())
}
