package graft.analysis

/** Corpus-side text analysis.
  *
  * The reference never ships its document tokenizer (the index was built by
  * an external course tool); the only normalization we can observe is the
  * query side: lowercase the whole string
  * (reference: yairs/util/PrefixQueryParser.scala:26) and drop tokens with
  * no letter-or-digit (reference: yairs/model/QueryTreeNode.scala:43-50).
  * Our corpus tokenizer therefore pins: lowercase + split on runs of
  * non-[a-z0-9]. ASCII class (not Unicode letters) keeps the definition
  * bit-identical to the `[^a-z0-9]+` regex used by the DuckDB oracle SQL.
  *
  * Stopwords are query-time only: the index keeps them (df/cf/doc lengths
  * include them — the reference avgdl of 1301 counts stopwords), and the
  * evaluator prunes stop leaves (reference:
  * yairs/retrieval/StructuredRetriever.scala:29-33).
  */
object Tokenizer {

  /** Lowercase + split on non-alphanumeric runs. Empty input → empty. */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Per-document term aggregation: token stream → (term → (tf, positions)).
    * Positions are 0-based token offsets within the field, ascending — the
    * invariant every positional operator relies on (reference:
    * yairs/retrieval/StructuredRetriever.scala:179-218 assumes sorted
    * positions). Done per document in one local pass, so the index build
    * shuffles per-(doc,term) rows, never per-token rows.
    */
  def termVector(tokens: Array[String]): Map[String, (Int, Array[Int])] =
    termVectorAll(Seq(tokens))

  /** termVector over the CONCATENATION of several token arrays, without
    * materializing the concatenated array. Positions run through the parts
    * with a running offset, so `termVectorAll(Seq(a, b)) ==
    * termVector(a ++ b)` exactly — the index build exploits that the
    * `default` field's token stream is the title stream followed by the
    * body stream ('\n' is a separator) and tokenizes each line group once.
    */
  def termVectorAll(parts: Seq[Array[String]]): Map[String, (Int, Array[Int])] = {
    val m = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Int]]
    var off = 0
    parts.foreach { tokens =>
      var i = 0
      while (i < tokens.length) {
        m.getOrElseUpdate(tokens(i),
          scala.collection.mutable.ArrayBuffer.empty[Int]) += (off + i)
        i += 1
      }
      off += tokens.length
    }
    m.map { case (t, ps) => (t, (ps.length, ps.toArray)) }.toMap
  }

  /** The reference 418-word stoplist (data file:
    * /root/reference/data/stoplist.txt), applied to query leaves only.
    */
  lazy val stopwords: Set[String] = {
    val in = getClass.getResourceAsStream("/stoplist.txt")
    require(in != null, "stoplist.txt resource missing")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toSet
    finally in.close()
  }

  def isStop(term: String): Boolean = stopwords.contains(term.trim)
}
