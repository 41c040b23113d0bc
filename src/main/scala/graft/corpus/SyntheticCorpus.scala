package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Page

/** Deterministic synthetic Common-Crawl-style webtext (FIXTURES.md §1):
  * rows of exactly the input_hint shape (url, warc_ts, html, text, lang).
  * Seeded by row index only — no RNG state, no wall clock — so any slice
  * regenerates identically on any executor (resume / retry safe).
  *
  * Token distribution is Zipf(s = 1.1) over a 10,000-word vocabulary, so
  * head-term skew is real and the index build's salting path is exercised.
  * ~5% of tokens come from the reference stoplist. Known docs carry planted
  * phrases ("obama family tree", "french lick resort") adjacent and at
  * gaps 1–6 for countable #NEAR/#UW expectations.
  */
object SyntheticCorpus {

  val VocabSize = 10000
  private val ZipfS = 1.1

  /** splitmix64 — deterministic 64-bit mix. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def uniform(seed: Long): Double =
    ((mix(seed) >>> 11).toDouble) / (1L << 53).toDouble

  /** Zipf CDF over ranks 1..VocabSize (computed once per JVM). */
  private lazy val zipfCdf: Array[Double] = {
    val w = Array.tabulate(VocabSize)(i => 1.0 / math.pow(i + 1, ZipfS))
    val total = w.sum
    val cdf = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(VocabSize - 1) = 1.0
    cdf
  }

  /** Stopwords injected into ~5% of token draws (reference stoplist, so
    * query-time stop pruning has something to prune).
    */
  private lazy val stopArr: Array[String] =
    graft.analysis.Tokenizer.stopwords.toArray.sorted

  /** Vocabulary word of rank r (0-based): head ranks get short names like
    * real head terms. Pure letters+digits so the tokenizer round-trips.
    */
  def word(rank: Int): String = s"w$rank"

  private def sampleToken(docIdx: Long, tokenIdx: Int): String = {
    val h = mix(docIdx * 1000003L + tokenIdx)
    if ((h & 1023) < 51) { // ~5% stopwords
      stopArr(((h >>> 10) % stopArr.length).toInt.abs)
    } else {
      val u = uniform(h)
      val i = java.util.Arrays.binarySearch(zipfCdf, u)
      val rank = if (i >= 0) i else -i - 1
      word(math.min(rank, VocabSize - 1))
    }
  }

  private val phrase1 = Array("obama", "family", "tree")
  private val phrase2 = Array("french", "lick", "resort")

  /** Body token stream of one document: 50–2000 Zipf tokens plus planted
    * phrases. Every 7th doc gets "obama family tree" adjacent at offset 11;
    * every 11th doc gets "french lick resort" with gap g = docIdx%6+1
    * between words (filler tokens in between) at offset 23.
    */
  def bodyTokens(docIdx: Long): Array[String] = {
    val len = 50 + (mix(docIdx * 7919L + 1).abs % 1951L).toInt
    val toks = Array.tabulate(len)(i => sampleToken(docIdx, i))
    if (docIdx % 7 == 0 && len > 14) {
      var i = 0
      while (i < 3) { toks(11 + i) = phrase1(i); i += 1 }
    }
    if (docIdx % 11 == 0 && len > 40) {
      val gap = (docIdx % 6).toInt + 1
      var i = 0
      while (i < 3) { toks(23 + i * (gap + 1)) = phrase2(i); i += 1 }
    }
    toks
  }

  def titleTokens(docIdx: Long): Array[String] =
    Array.tabulate(3 + (mix(docIdx + 42).abs % 6L).toInt)(i =>
      sampleToken(docIdx * 31L + 7, 100000 + i))

  def lang(docIdx: Long): String =
    if ((mix(docIdx + 99).abs % 100L) < 95) "en" else "de"

  def url(docIdx: Long): String =
    f"https://example.org/${lang(docIdx)}/$docIdx%08d"

  /** The fixed HTML template — extractText must invert it byte-exactly. */
  def htmlOf(title: String, body: String): Array[Byte] =
    s"<html><head><title>$title</title></head><body>$body</body></html>"
      .getBytes("UTF-8")

  def textOf(title: String, body: String): String = title + "\n" + body

  private val Epoch = 1767225600000L // 2026-01-01T00:00:00Z

  def page(docIdx: Long): Page = {
    val title = titleTokens(docIdx).mkString(" ")
    val body = bodyTokens(docIdx).mkString(" ")
    Page(url(docIdx), new java.sql.Timestamp(Epoch + docIdx * 1000L),
      htmlOf(title, body), textOf(title, body), lang(docIdx))
  }

  /** Distributed generator: numDocs pages, `slices` input partitions. */
  def pages(spark: SparkSession, numDocs: Long,
            slices: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, numDocs, 1, slices).map(i => page(i))
  }

  /** html → text extraction; MUST be byte-identical to the `text` column
    * (the per-row invariant of BASELINE.json input_hint, tested).
    */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, "UTF-8")
    val t0 = s.indexOf("<title>")
    val t1 = s.indexOf("</title>", t0)
    val b0 = s.indexOf("<body>", t1)
    val b1 = s.lastIndexOf("</body>")
    require(t0 >= 0 && t1 > t0 && b0 > 0 && b1 > b0, "malformed page html")
    textOf(s.substring(t0 + 7, t1), s.substring(b0 + 6, b1))
  }
}
