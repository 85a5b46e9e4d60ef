package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** DataFrame access to Spark's built-in bloom-filter sketch expressions
  * (the machinery behind runtime filtering / InjectRuntimeFilter, not
  * exposed in `functions._`). Used to prefilter large probe sides
  * before an exact join: the bloom is a few hundred KB regardless of the
  * build side's row width, so at 100 TB it replaces a broadcast of the
  * full build-side key set with a fixed-size bitmap, and the exact join
  * that follows only processes might-contain rows.
  *
  * Exactness contract: a bloom admits false positives but never false
  * negatives, so `might_contain` prefilter + exact join ≡ exact join.
  */
object BloomSketch {

  /** Aggregate a LongType column (use `xxhash64(col)`) into a serialized
    * bloom filter (BinaryType). Consume via [[mightContain]] with the
    * result wrapped as a scalar subquery (`df.scalar()`), mirroring how
    * InjectRuntimeFilter plans it.
    */
  def bloomAgg(c: Column, estimatedItems: Long, numBits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(c),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe. `bloom` must be foldable or a scalar subquery
    * (BloomFilterMightContain's own analysis check); `value` must be the
    * same hash used at build time.
    */
  def mightContain(bloom: Column, value: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bloom), GraftBridge.expression(value)))
}
