package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries k-counter frequency summary as a mergeable typed
  * aggregate (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS'12): bounded state of at most k
  * (value, count) pairs per partition, combined associatively across
  * partitions — the candidate-generation half of EXACT two-pass heavy
  * hitters at scale (see [[graft.operators.HeavyHitters]]).
  *
  * Guarantee: every value with true frequency > n/(k+1) is present in
  * the final summary (each decrement retires k+1 stream items, so a
  * > n/(k+1) item cannot be fully retired). The summary's counts and
  * its EXTRA entries are stream-order-dependent — which is why the
  * exact operator recounts candidates in a second pass and the gate
  * pins only that deterministic final output, never the raw sketch.
  *
  * Values are strings (cast upstream); state is O(k) regardless of
  * input size, so a billion-row scan carries a 20-entry map per task.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  // checked post-analysis: at construction the child may be unresolved
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"misra_gries takes a STRING value, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k => buf.update(s.clone(), 1L)
        case None => decrementAll(buf, 1L) // miss with a full table
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (v, c) => buf.update(v, buf.getOrElse(v, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      // (the PODS'12 mergeable-summaries rule: result is a valid MG
      // summary of the concatenated stream)
      val m = buf.values.toArray.sortBy(-_).apply(k)
      decrementAll(buf, m)
    }
    buf
  }

  private def decrementAll(buf: mutable.HashMap[UTF8String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    buf.foreach { case (v, c) => if (c <= by) dead += v else buf.update(v, c - by) }
    dead.foreach(buf.remove)
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.map(_.asInstanceOf[Any]).toArray.sortBy(_.toString))

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(buf.size)
    buf.foreach { case (v, c) =>
      val b = v.getBytes
      d.writeInt(b.length); d.write(b); d.writeLong(c)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val buf = createAggregationBuffer()
    val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = d.readInt()
    var i = 0
    while (i < n) {
      val len = d.readInt()
      val b = new Array[Byte](len)
      d.readFully(b)
      buf.update(UTF8String.fromBytes(b), d.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** String column → array of candidate values (every value with
    * frequency > n/(k+1) guaranteed present; may contain extras). */
  def candidates(valueCol: Column, k: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(valueCol), k).toAggregateExpression())
}
