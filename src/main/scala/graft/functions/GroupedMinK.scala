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

/** Grouped min-k aggregate: the k lexicographically SMALLEST (a, b)
  * pairs per group, ascending — [[GroupedTopK]]'s prefix-keeping twin.
  *
  * The positional capped-list build needs "each word's first P
  * postings by (doc_id, pos)". The window formulation
  * (`row_number().over(partitionBy(word).orderBy(doc_id, pos))`) puts
  * a word's ENTIRE posting list in one window partition — worst-task =
  * max-df, which at 100 TB is a stop word's billions of postings in a
  * single-task sort. This aggregate keeps a bounded k-element heap per
  * group and participates in partial aggregation (map-side combine +
  * sort-based fallback), so each map task ships at most k pairs per
  * group and no posting list is ever fully sorted — the same scale
  * device the BM25/QL impact builds run ([[GroupedTopK]]).
  */
case class GroupedMinK(
    a: Expression,
    b: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(a, b)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (a.dataType == LongType && b.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"grouped_min_k requires (BIGINT a, BIGINT b), got (${a.dataType}, ${b.dataType})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)

  // natural (a, b) ordering: the queue's head is its MAXIMUM — the
  // worst (largest) kept pair — so a smaller candidate evicts it in
  // O(log k).
  private def pairOrdering: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(pairOrdering)

  private def offer(buf: mutable.PriorityQueue[(Long, Long)], e: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (pairOrdering.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val av = a.eval(input)
    val bv = b.eval(input)
    if (av != null && bv != null)
      offer(buf, (av.asInstanceOf[Long], bv.asInstanceOf[Long]))
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[(Long, Long)],
      b2: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.toSeq.sorted(pairOrdering)
    new GenericArrayData(sorted.map { case (av, bv) => InternalRow(av, bv) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (av, bv) => out.writeLong(av); out.writeLong(bv) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (1 to n).foreach(_ => buf.enqueue((in.readLong(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupedMinK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupedMinK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GroupedMinK =
    copy(a = newChildren(0), b = newChildren(1))
  override def prettyName: String = "grouped_min_k"
}

object GroupedMinK {
  /** Column API: the k smallest (a, b) pairs per group, ascending. */
  def groupedMinK(a: Column, b: Column, k: Int): Column =
    GraftBridge.column(
      GroupedMinK(GraftBridge.expression(a), GraftBridge.expression(b), k)
        .toAggregateExpression())
}
