package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Tokenizer
import graft.sources.{HtmlText, WarcIndex}

/** Result serving: turn a top-k answer (docIds) into what a user
  * actually sees — url, stored document, and a keyword-in-context
  * snippet — WITHOUT rescanning the crawl.
  *
  * The reference stops at TREC run lines (docId + score); a usable
  * engine over a real crawl has to close the loop, and the pieces exist:
  * the index docmap maps docId → url, the CDX maps url → exact gzip
  * member, [[WarcIndex.fetchDocs]] point-reads just those members, and
  * [[HtmlText]] recovers the text the snippet is cut from. Cost shape at
  * scale: k fetched members per query (ranged reads grouped per WARC
  * file) — independent of corpus size.
  */
object Snippets {

  /** Keyword-in-context snippet: the `width`-token window containing the
    * most DISTINCT query terms; ties break to the earliest window, so
    * the result is deterministic. Two-pointer sweep — O(tokens), not
    * O(tokens × width). Terms are matched after the same normalization
    * the index applies ([[Tokenizer.tokenize]]).
    */
  def snippet(text: String, terms: Set[String], width: Int = 30): String = {
    val toks = Tokenizer.tokenize(text)
    if (toks.isEmpty) return ""
    if (toks.length <= width) return toks.mkString(" ")
    val want = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    var distinct = 0
    var bestStart = 0
    var bestDistinct = -1
    var i = 0
    while (i < toks.length) {
      val in = toks(i)
      if (want.contains(in)) {
        val c = counts.getOrElse(in, 0)
        if (c == 0) distinct += 1
        counts.update(in, c + 1)
      }
      if (i >= width) {
        val out = toks(i - width)
        if (want.contains(out)) {
          val c = counts(out) - 1
          counts.update(out, c)
          if (c == 0) distinct -= 1
        }
      }
      if (i >= width - 1 && distinct > bestDistinct) {
        bestDistinct = distinct
        bestStart = i - (width - 1)
      }
      i += 1
    }
    toks.slice(bestStart, bestStart + width).mkString(" ")
  }

  /** Serve a top-k result set: join docIds to urls through the index
    * docmap, point-fetch the stored records through the CDX, extract,
    * and snippet. Returns `(docId, url, snippet, n_bytes)` — one row per
    * result that the crawl still holds.
    *
    * Plan shape: `results` is top-k-per-query (tiny) so it broadcasts
    * into the docmap join; `fetchDocs` broadcasts the url set into the
    * CDX join and reads only the k members. Nothing in this path scales
    * with corpus size except the two broadcast-probe scans, both
    * column-pruned.
    */
  def serve(results: DataFrame, docmap: DataFrame, cdx: DataFrame,
            terms: Seq[String], width: Int = 30): DataFrame = {
    val termSet = terms.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val snip = udf((html: Array[Byte]) =>
      snippet(HtmlText.extract(html), termSet, width))
    val withUrl = docmap.select("docId", "url")
      .join(broadcast(results.select("docId")), "docId")
    WarcIndex.fetchDocs(cdx, withUrl.select("url"))
      .join(broadcast(withUrl), "url")
      .select(col("docId"), col("url"), snip(col("html")).as("snippet"),
        length(col("html")).cast("long").as("n_bytes"))
  }
}
