package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k aggregate: the k largest (ord, id) pairs per group,
  * ordered by (ord desc, id asc) — deterministic under ties.
  *
  * Spark has no native per-group top-k: the idiomatic
  * `row_number().over(partitionBy(g).orderBy(o)) <= k` sorts EVERY row of
  * every group. This aggregate keeps a bounded k-element heap per group
  * and participates in partial aggregation, so each map task ships at
  * most k entries per group — at 100 TB the shuffle is O(groups × k),
  * and nothing is ever fully sorted.
  */
case class GroupedTopK(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(ord, id)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ord.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"grouped_topk requires (DOUBLE ord, BIGINT id), got (${ord.dataType}, ${id.dataType})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  // rank ordering: smaller (−ord, id) = better. The queue's head is its
  // maximum, i.e. the WORST kept element — a better candidate evicts it
  // in O(log k).
  private def rankOrdering: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (o, i) => (-o, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(rankOrdering)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (rankOrdering.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null)
      offer(buf, (o.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (o, i) => (-o, i) }
    new GenericArrayData(sorted.map { case (o, i) => InternalRow(o, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (o, i) => out.writeDouble(o); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (1 to n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GroupedTopK =
    copy(ord = newChildren(0), id = newChildren(1))
  override def prettyName: String = "grouped_topk"
}

object GroupedTopK {
  /** Column API: top-k (ord, id) pairs per group, (ord desc, id asc). */
  def groupedTopK(ord: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      GroupedTopK(GraftBridge.expression(ord), GraftBridge.expression(id), k)
        .toAggregateExpression())
}
