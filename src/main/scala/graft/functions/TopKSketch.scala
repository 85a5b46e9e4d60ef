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
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst aggregate: heavy-hitters / top-k-by-count sketch
  * (Misra-Gries "space-saving"), as a `TypedImperativeAggregate` — the
  * extension tier for stateful aggregations whose buffer is a data
  * structure rather than a fixed-width row (SURVEY §7.3; same shape as
  * Spark's own HLL++ / percentile_approx internals).
  *
  * Buffer = counter map bounded at `capacity` entries: on overflow every
  * counter is decremented by the evicted minimum (the classic ε-approx
  * guarantee: counts are exact when distinct keys ≤ capacity, and
  * otherwise off by at most n/capacity). Buffers merge by counter
  * addition + re-compaction, so Spark plans it with partial aggregation:
  * each map task ships one bounded sketch, never its raw keys — at
  * 100 TB the shuffle for a global top-k is capacity × tasks, not
  * O(distinct).
  *
  * `eval` emits the k largest as array<struct<word,cnt>> ordered by
  * (cnt desc, word asc) — deterministic in exact mode.
  */
case class TopKByCount(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0 && capacity >= k, "need k > 0 and capacity >= k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"topk_by_count requires a STRING argument, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("word", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], key: String, n: Long): Unit = {
    buf.get(key) match {
      case Some(c) => buf(key) = c + n
      case None =>
        if (buf.size < capacity) buf(key) = n
        else {
          // space-saving eviction: charge everyone the minimum count
          val minC = buf.valuesIterator.min
          val dec = math.min(minC, n)
          val dead = buf.iterator.filter(_._2 <= dec).map(_._1).toList
          buf.mapValuesInPlace((_, c) => c - dec)
          dead.foreach(buf.remove)
          if (n - dec > 0 && buf.size < capacity) buf(key) = n - dec
        }
    }
  }

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, n) => add(b1, key, n) }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (w, c) => (-c, w) }.take(k)
    new GenericArrayData(top.map { case (w, c) =>
      InternalRow(UTF8String.fromString(w), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (1 to n).foreach(_ => buf(in.readUTF()) = in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByCount =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByCount =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByCount =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_by_count"
}

object TopKSketch {
  /** Column API: top-k most frequent values of `c` (with counts). */
  def topkByCount(c: Column, k: Int, capacity: Int = 4096): Column =
    GraftBridge.column(
      TopKByCount(GraftBridge.expression(c), k, capacity).toAggregateExpression())
}
