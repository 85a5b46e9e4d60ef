package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers shared by the query modules — single source of truth
  * for the tokenizer and the portable md5-prefix hashes (both the Spark
  * side and every DuckDB oracle assume these exact definitions).
  */
private[graft] object QueryFns {

  /** Whitespace tokens, empties dropped. */
  def wsTokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** Portable 32-bit hash: first 8 hex digits of md5 as a long. */
  def tokHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Portable 48-bit hash: first 12 hex digits of md5 as a long. */
  def hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Modulus for commutative content checksums: 2^61 - 1 (Mersenne).
    * A plain BIGINT sum of 48-bit hashes silently wraps past ~2^15 rows
    * per group on Spark while DuckDB's HUGEINT sum doesn't — an
    * explicit modular sum (accumulate wide, reduce mod M) is the only
    * definition both engines agree on at every scale.
    */
  val ChecksumMod = 2305843009213693951L

  /** Order-independent modular checksum of a 48-bit hash column: sum in
    * DECIMAL(38,0) (exact to ~3.5e23 rows), reduce mod [[ChecksumMod]],
    * emit BIGINT. Oracle twin:
    * `CAST(sum(h) % 2305843009213693951 AS BIGINT)` (HUGEINT sum).
    */
  def checksumAgg(h: Column): Column =
    (sum(h.cast("decimal(38,0)")) % ChecksumMod).cast("long")
}
