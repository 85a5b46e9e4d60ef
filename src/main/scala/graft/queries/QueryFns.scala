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
}
