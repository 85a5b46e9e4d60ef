package graft.mr

import graft.core.KV

/** The reference's application operators (`mrapps/`), re-expressed as
  * (mapF, reduceF) pairs for the typed engine. DataFrame formulations of
  * the same apps (optimizable: partial agg, codegen) live in
  * [[graft.queries.MrQueries]].
  */
object Apps {

  /** Tokenize on non-letter boundaries — Go `unicode.IsLetter` parity
    * (ref: mrapps/wc.go:23-26). Case-sensitive, Unicode letter classes.
    */
  def tokenize(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) sb.appendAll(Character.toChars(cp))
      else if (sb.nonEmpty) { out += sb.result(); sb.clear() }
      i += Character.charCount(cp)
    }
    if (sb.nonEmpty) out += sb.result()
    out.result()
  }

  /** A1 wc (ref: mrapps/wc.go:21-44): emit (word,"1") per occurrence;
    * reduce = count of values, stringified.
    */
  object WordCount {
    def map(file: String, contents: String): Seq[KV] =
      tokenize(contents).map(w => KV(w, "1"))
    def reduce(key: String, values: Seq[String]): String =
      values.size.toString
  }

  /** A2 indexer (ref: mrapps/indexer.go:20-39): per-document distinct
    * words → (word, doc); reduce = "<count> doc1,doc2,..." with docs
    * sorted lexicographically.
    */
  object InvertedIndex {
    def map(file: String, contents: String): Seq[KV] =
      tokenize(contents).distinct.map(w => KV(w, file))
    def reduce(key: String, values: Seq[String]): String =
      s"${values.size} ${values.sorted.mkString(",")}"
  }

  /** A3/A4 crash/nocrash dataflow (ref: mrapps/nocrash.go:26-47, crash
    * behavior belongs to the harness, not the dataflow): four fixed KVs
    * per file; reduce = values sorted, space-joined.
    */
  object FileStats {
    def map(file: String, contents: String): Seq[KV] = Seq(
      KV("a", file),
      KV("b", file.length.toString),
      KV("c", contents.length.toString),
      KV("d", "xyzzy"))
    def reduce(key: String, values: Seq[String]): String =
      values.sorted.mkString(" ")
  }
}
