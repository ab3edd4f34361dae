package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k as a typed imperative aggregate — the
  * shuffle-frugal alternative to a `row_number()` window for "top k
  * rows per key": a window shuffles and sorts EVERY row of the group;
  * this aggregate keeps a size-k heap per group, partial-aggregates
  * map-side, and ships at most k rows per key per map partition.
  * At 100 TB the difference is the whole fact table on the wire vs
  * k·|keys| rows (the same reason the global case uses
  * TakeOrderedAndProject).
  *
  * `child` must be a struct whose field 0 is a non-null DOUBLE score
  * and field 1 a non-null LONG tiebreaker; rows rank by (score DESC,
  * tie ASC) — a total order, so results are deterministic and
  * oracle-comparable against the window formulation. Rows with a null
  * struct or null score are skipped. Returns the k best structs, best
  * first.
  */
case class TopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  // checked post-analysis (child may be unresolved at construction):
  // a SQL user's top_k_rows(struct(name, id), 3) must die with a
  // readable analysis error, not a mid-task ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.length >= 2 &&
          s.fields(0).dataType == org.apache.spark.sql.types.DoubleType &&
          s.fields(1).dataType == org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "top_k_rows takes struct(score DOUBLE, tie BIGINT, payload...), " +
            s"got ${other.simpleString}")
    }

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val numFields = structType.length

  // PriorityQueue dequeues the Ordering-max; define "max" = WORST row
  // (lowest score, then highest tie) so the heap head is the eviction
  // candidate and every update is O(log k)
  private object WorstFirst extends Ordering[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = {
      val c = java.lang.Double.compare(b.getDouble(0), a.getDouble(0))
      if (c != 0) c else java.lang.Long.compare(a.getLong(1), b.getLong(1))
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(WorstFirst)

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // the compare inside offer runs BEFORE the by-name copy: once a
      // group's heap is warm almost every row is rejected, and
      // rejected rows never pay the defensive copy (comparing the
      // primitive score/tie slots is safe on the transient row)
      if (!row.isNullAt(0) && !row.isNullAt(1)) offer(buf, row, row.copy())
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    // merged-in rows are already owned copies — no re-copy needed
    other.foreach(row => offer(buf, row, row))
    buf
  }

  /** One copy of the eviction rule for both update and merge; `owned`
    * is by-name so acceptance alone pays any copy cost. */
  private def offer(buf: mutable.PriorityQueue[InternalRow],
      row: InternalRow, owned: => InternalRow): Unit =
    if (buf.size < k) buf.enqueue(owned)
    else if (WorstFirst.compare(buf.head, row) > 0) { // head worse than row
      buf.dequeue(); buf.enqueue(owned)
    }: Unit

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    // dequeueAll returns worst-first; reverse for best-first output
    new GenericArrayData(buf.clone().dequeueAll.reverse.toArray[Any])

  // one projection per operator instance, not one per serialized group
  // buffer: create() walks the codegen cache every call, and sort-based
  // fallback serializes EVERY group (r18)
  @transient private lazy val serializeProj = UnsafeProjection.create(structType)

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val proj = serializeProj
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(buf.size)
    buf.foreach { r =>
      val u = proj(r)
      d.writeInt(u.getSizeInBytes)
      d.write(u.getBytes)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val buf = createAggregationBuffer()
    val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = d.readInt()
    var i = 0
    while (i < n) {
      val len = d.readInt()
      val rowBytes = new Array[Byte](len)
      d.readFully(rowBytes)
      val row = new UnsafeRow(numFields)
      row.pointTo(rowBytes, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKRows =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "top_k_rows"
}

object TopKRows {
  /** `struct(score DOUBLE, tie LONG, payload...)` → array of the k
    * best structs, (score DESC, tie ASC), best first. */
  def topK(structCol: Column, k: Int): Column =
    Bridge.column(TopKRows(Bridge.expression(structCol), k).toAggregateExpression())
}
