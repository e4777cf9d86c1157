package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a mergeable aggregation buffer —
  * the bounded-state prescreen for exact heavy-hitter queries. A plain
  * `groupBy(token).count` shuffles one row per DISTINCT token: at corpus
  * scale the vocabulary is unbounded (typos, OOV noise, URLs), so the
  * shuffle and the reducer hash tables grow with data, not with the
  * answer. This aggregate keeps at most `capacity` counters per partition
  * (classic Misra–Gries: hit increments, miss over a full buffer
  * decrements ALL counters — amortized O(1) per row), merges buffers by
  * count-sum + trim-to-capacity (the mergeable-summaries merge, which
  * preserves the error bound), and returns the surviving (term, est)
  * pairs best-first.
  *
  * Guarantee (standard MG): a term absent from the merged summary has
  * true count ≤ n/(capacity+1); a present term has
  * true − n/(capacity+1) ≤ est ≤ true. So with capacity > denom, the
  * summary provably contains EVERY term whose true count ≥ n/denom —
  * an exact recount of just the summary's terms is then a certified
  * complete heavy-hitters answer (queries.Signals.heavyTokens).
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"MisraGries requires a string child, got $other")
    }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity =>
          // eval may return a pointer into a reused row buffer — own it
          buf.update(key.clone(), 1L)
        case None =>
          // miss over a full buffer: the decrement-all step. Each such
          // step consumes capacity+1 count units (the arriving row plus
          // one per stored counter), which is where the n/(capacity+1)
          // bound comes from.
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.filterInPlace((_, c) => c > 0)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    // deserialized keys are already owned copies — safe to adopt
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from everyone and drop
      // non-positives: the offset trim that keeps merged summaries inside
      // the same error envelope (Agarwal et al., mergeable summaries)
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) =>
        new GenericInternalRow(Array[Any](t, c)).asInstanceOf[Any] }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.getInt
      val arr = new Array[Byte](len)
      in.get(arr)
      buf.update(UTF8String.fromBytes(arr), in.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** `sketch(termCol, capacity)` — aggregate Column returning the summary
    * as `array<struct<term,est>>`, highest estimate first.
    */
  def sketch(c: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      MisraGries(GraftColumnBridge.expression(c), capacity)
        .toAggregateExpression())

  /** Merge two already-evaluated summaries under the exact trim rule the
    * aggregate's `merge` uses (count-sum, then subtract the
    * (capacity+1)-th largest and drop non-positives). This is the
    * microbatch-state transition for incremental/streaming heavy hitters:
    * state is a ≤-capacity map, each arriving batch contributes its own
    * MG summary, and the merged state keeps the mergeable-summaries
    * guarantee — a term absent from the state has true count
    * ≤ n/(capacity+1) over everything ingested so far.
    */
  def mergeSummaries(a: Seq[(String, Long)], b: Seq[(String, Long)],
                     capacity: Int): Seq[(String, Long)] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val m = mutable.HashMap.empty[String, Long]
    (a.iterator ++ b.iterator).foreach { case (t, c) =>
      m.update(t, m.getOrElse(t, 0L) + c)
    }
    if (m.size > capacity) {
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      m.mapValuesInPlace((_, c) => c - cut)
      m.filterInPlace((_, c) => c > 0)
    }
    m.toSeq.sortBy { case (t, c) => (-c, t) }
  }
}
