package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.mr.{Apps, MapReduce}

/** The reference's application operators (SURVEY §2.2) as queries over the
  * `documents` table (doc maps onto the reference's (filename, contents)
  * record shape; FIXTURES.md §5).
  *
  * Two formulations:
  *  - DataFrame (a1/a2/a4): declarative → Catalyst partial aggregation +
  *    whole-stage codegen; the scan reads only the needed columns.
  *  - typed engine (mr_wordcount): the actual [[graft.mr.MapReduce]] path,
  *    exercising the arbitrary-closure API (E2/E3/E6) end-to-end against
  *    the same DuckDB oracle as a1.
  */
object MrQueries {

  /** Split on non-letters — Spark side of the tokenizer parity pair
    * (Java `\p{L}` ≙ Go unicode.IsLetter ≙ RE2 `\pL` in the oracle).
    */
  private val NonLetter = "[^\\p{L}]+"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 word count (ref: mrapps/wc.go:21-44), DataFrame formulation.
    "a1_wordcount" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select(explode(split($"text", NonLetter)).as("word"))
        .filter(length($"word") > 0)
        .groupBy($"word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"word")
    },

    // A2 inverted index (ref: mrapps/indexer.go:20-39): per-doc distinct
    // words, postings sorted numerically by doc_id.
    "a2_inverted_index" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id", explode(split($"text", NonLetter)).as("word"))
        .filter(length($"word") > 0)
        .groupBy($"word")
        .agg(collect_set($"doc_id").as("ids"))
        .select(
          $"word",
          size($"ids").cast("long").as("n_docs"),
          array_join(transform(sort_array($"ids"), _.cast("string")), ",").as("docs"))
        .orderBy($"word")
    },

    // A3/A4 file stats (ref: mrapps/nocrash.go:26-47): 4 fixed KVs per
    // doc; reduce = sorted space-joined values.
    "a4_filestats" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .selectExpr(
          """stack(4,
            |  'a', source,
            |  'b', cast(length(source) as string),
            |  'c', cast(n_chars as string),
            |  'd', 'xyzzy') as (key, value)""".stripMargin)
        .groupBy($"key")
        .agg(concat_ws(" ", sort_array(collect_list($"value"))).as("value"))
        .orderBy($"key")
    },

    // E3 shuffle-routing parity: the reference's exact FNV-1a bucket
    // assignment (ihash(key) % NReduce, mr/worker.go:29-33, NReduce=10
    // per main/mrmaster.go:23) as a native codegen'd Catalyst expression,
    // over the ASCII word population of the corpus. The oracle re-derives
    // FNV-1a byte-by-byte in pure SQL.
    "e3_fnv_bucket" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.Fnv1a32.fnv1a32
      Tables(s, dir).documents
        .select(explode(split($"text", NonLetter)).as("word"))
        .filter(length($"word") > 0 && $"word".rlike("^[a-zA-Z]+$"))
        .select($"word", pmod(fnv1a32($"word"), lit(10)).as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_occurrences"), countDistinct($"word").as("n_words"))
        .orderBy($"bucket")
    },

    "mr_inverted_index" -> { (s, dir) => mrInvertedIndex(s, dir) },

    // The typed MapReduce engine itself (E2+E3+E5+E6), running the A1 app
    // closures over documents; same oracle as a1_wordcount modulo types.
    "mr_wordcount" -> { (s, dir) =>
      import s.implicits._
      val input = Tables(s, dir).documents
        .select($"doc_id".cast("string"), $"text")
        .as[(String, String)]
      MapReduce.run(input, Apps.WordCount.map, Apps.WordCount.reduce)
        .toDF("key", "value")
        .orderBy($"key")
    }
  )

  /** A2 through the typed engine — a second arbitrary-closure app in the
    * gate (map dedups per doc, reduce formats "<n> <docs-sorted>"; ref:
    * mrapps/indexer.go:20-39 with doc ids as the doc names).
    */
  private def mrInvertedIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val input = Tables(s, dir).documents
      .select($"doc_id".cast("string"), $"text")
      .as[(String, String)]
    MapReduce.run(input, Apps.InvertedIndex.map, Apps.InvertedIndex.reduce)
      .toDF("key", "value")
      .orderBy($"key")
  }

  def oracle: Map[String, String] = Map(
    "a1_wordcount" ->
      """SELECT word, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(text, '[^\pL]+')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,

    "a2_inverted_index" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split_regex(text, '[^\pL]+')) AS word
        |  FROM documents)
        |SELECT word, COUNT(*) AS n_docs,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS docs
        |FROM tok WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,

    "a4_filestats" ->
      """WITH kv AS (
        |  SELECT 'a' AS key, source AS value FROM documents
        |  UNION ALL SELECT 'b', CAST(length(source) AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'c', CAST(n_chars AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'd', 'xyzzy' FROM documents)
        |SELECT key, string_agg(value, ' ' ORDER BY value) AS value
        |FROM kv GROUP BY key ORDER BY key""".stripMargin,

    "mr_inverted_index" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split_regex(text, '[^\pL]+')) AS word
        |  FROM documents)
        |SELECT word AS key,
        |  CAST(COUNT(*) AS VARCHAR) || ' ' ||
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY CAST(doc_id AS VARCHAR)) AS value
        |FROM tok WHERE word <> '' GROUP BY word ORDER BY key""".stripMargin,

    "e3_fnv_bucket" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(text, '[^\pL]+')) AS word FROM documents),
        |f AS (
        |  SELECT word,
        |    list_reduce(
        |      list_prepend(2166136261::BIGINT,
        |        list_transform(range(1, length(word) + 1),
        |          i -> ascii(substr(word, i, 1))::BIGINT)),
        |      (h, b) -> (xor(h, b) * 16777619) % 4294967296) & 2147483647 AS fnv
        |  FROM w WHERE word <> '' AND regexp_matches(word, '^[a-zA-Z]+$'))
        |SELECT fnv % 10 AS bucket, count(*) AS n_occurrences,
        |       count(DISTINCT word) AS n_words
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "mr_wordcount" ->
      """SELECT word AS key, CAST(COUNT(*) AS VARCHAR) AS value FROM (
        |  SELECT unnest(string_split_regex(text, '[^\pL]+')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin
  )
}
