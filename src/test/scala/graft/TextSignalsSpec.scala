package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops._

/** Pins the semantics of the round-5b text-signal operators: TF-IDF
  * keyword extraction, unigram LM cross-entropy, and PII redaction —
  * tiny hand-computed corpora so the expected numbers are derivable on
  * paper, independent of the DuckDB gate.
  */
class TextSignalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tfidf: rare term outranks common term, rank boundary respects k") {
    // 4 docs; "zebra" appears only in doc 0 (df=1), "the" in all (df=4)
    val docs = Seq(
      (0L, "the zebra the the"),
      (1L, "the cat"),
      (2L, "the cat dog"),
      (3L, "the dog")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> (r.getString(1), r.getDouble(2)))
      .toMap
    // doc 0: zebra tf=1 df=1 → 1*ln(5/2)=0.916291; the tf=3 df=4 → 3*ln(5/5)=0
    assert(out((0L, 1L))._1 == "zebra")
    assert(math.abs(out((0L, 1L))._2 - math.log(5.0 / 2.0)) < 1e-6)
    assert(out((0L, 2L))._1 == "the" && out((0L, 2L))._2 == 0.0)
    // k=2 respected: no rank 3 anywhere
    assert(!out.keys.exists(_._2 > 2L))
    // tie on equal (tf, df): doc 2's cat and dog both tf=1 df=2 → term asc
    assert(out((2L, 1L))._1 == "cat" && out((2L, 2L))._1 == "dog")
  }

  test("lm cross-entropy: uniform corpus scores ln(V); rare-token doc scores higher") {
    // 2 docs over a 2-token corpus with p(a)=3/4, p(b)=1/4
    val docs = Seq((0L, "a a a"), (1L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.lmCrossEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0L)._1 == 3L)
    assert(math.abs(out(0L)._2 - -math.log(0.75)) < 1e-6) // 0.287682
    assert(math.abs(out(1L)._2 - -math.log(0.25)) < 1e-6) // 1.386294
    assert(out(1L)._2 > out(0L)._2) // rare-token doc is higher-entropy
  }

  test("pii redact: counts and placeholders, non-PII text untouched") {
    val docs = Seq(
      (0L, "mail me at jo.doe+x@web-archive.org or 10.1.2.3 / 555-123-4567"),
      (1L, "no pii here, just 12 plain words and a 1.2 version number"),
      (2L, "two mails a@b.io c@d.net one ip 192.168.0.1")).toDF("doc_id", "text")
    val out = Pii.redact(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)),
        r.getString(4))).toMap
    assert(out(0L)._1 == ((1L, 1L, 1L)))
    assert(out(1L)._1 == ((0L, 0L, 0L)))
    assert(out(2L)._1 == ((2L, 1L, 0L)))
    // doc 1 is untouched: hash equals md5 of the original text
    val plain = docs.filter(col("doc_id") === 1)
      .select(md5(col("text"))).head.getString(0)
    assert(out(1L)._2 == plain)
    // doc 0's redaction yields the expected placeholder text
    val red = docs.filter(col("doc_id") === 0)
      .select(Pii.redactedCol(col("text"))).head.getString(0)
    assert(red == "mail me at <EMAIL> or <IP> / <PHONE>")
  }

  test("pii patterns avoid cross-matching: phone is not an ip, ip not a phone") {
    val docs = Seq((0L, "ip 1.2.3.4 phone 555-123-4567")).toDF("doc_id", "text")
    val r = Pii.redact(docs).head
    assert(r.getLong(1) == 0L && r.getLong(2) == 1L && r.getLong(3) == 1L)
  }

  test("gopher filter: each rule fires on a targeted row, first-failure order") {
    val stop = "the of and a to in is it" // 8 stopwords
    val good = (s"$stop word quick brown fox jumps over lazy dog near " +
      s"river bank stones $stop glass tree cloud stone maple iron") // 34 toks
    val docs = Seq(
      (0L, good),                                      // ok
      (1L, "short doc only five tokens here"),         // n_tokens_low
      (2L, good.replaceAll("\\w+", "x" * 22)),         // mean_tok_len 22 > 10 (still 34 toks)
      (3L, (1 to 40).map(i => s"zq$i").mkString(" ")), // stop_ratio = 0
      (4L, Seq.fill(20)("dup line").mkString("\n") + "\n" + good), // dup_line_frac
      (5L, s"$stop " + Seq.fill(30)("spam gram").mkString(" "))    // top_2gram_frac
    ).toDF("doc_id", "text")
      .union(Seq((6L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = TextAnalysis.gopherFilter(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(out(0L) == ((true, "ok")))
    assert(out(1L) == ((false, "n_tokens_low")))
    assert(out(2L)._2 == "mean_tok_len")
    assert(out(3L) == ((false, "stop_ratio")))
    assert(out(4L) == ((false, "dup_line_frac")))
    assert(out(5L) == ((false, "top_2gram_frac")))
    // null text must be DROPPED: every signal is null, and a null
    // comparison silently skips every threshold rule
    assert(out(6L) == ((false, "no_text")))
  }

  test("url normalization: fragment, trailing slash, host case; path case kept") {
    val urls = Seq(
      (0L, "https://Site7.COM/p/12#sec2", "x"),
      (1L, "https://site7.com/p/12/", "x"),
      (2L, "HTTPS://SITE7.com/p/12", "x"),
      (3L, "https://site7.com/P/12", "x"), // path case differs -> distinct
      (4L, "https://other.net/p/12", "x")).toDF("doc_id", "url", "text")
    val norm = urls.select(WebOps.normalizeUrl(col("url"))).collect()
      .map(_.getString(0))
    // host edge shapes the derived gate urls never produce: port and
    // userinfo stripped by parse_url; URI-invalid underscore host rescued
    // by the regex fallback instead of merging into a null bucket
    val hosts = Seq((0L, "https://a.com:8080/x"), (1L, "https://u:p@b.org/y"),
      (2L, "https://my_site.com/z")).toDF("doc_id", "url")
      .select(WebOps.hostOf(col("url"))).collect().map(_.getString(0))
    assert(hosts.toSeq == Seq("a.com", "b.org", "my_site.com"))
    assert(norm(0) == "https://site7.com/p/12")
    assert(norm(1) == "https://site7.com/p/12")
    assert(norm(2) == "https://site7.com/p/12")
    assert(norm(3) == "https://site7.com/P/12") // RFC 3986: path case-sensitive
    val groups = WebOps.urlDedup(urls).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(groups("https://site7.com/p/12") == ((0L, 3L)))
    assert(groups.size == 3)
    val stats = WebOps.domainStats(urls).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(stats("site7.com") == ((4L, 2L))) // 4 docs, 2 distinct urls
    assert(stats("other.net") == ((1L, 1L)))
  }

  test("pii email detection is case-insensitive without lowercasing the text") {
    val docs = Seq((0L, "Write John.Doe@Gmail.COM or MIXED@Example.org today"))
      .toDF("doc_id", "text")
    val r = Pii.redact(docs).head
    assert(r.getLong(1) == 2L)
    val red = docs.select(Pii.redactedCol(col("text"))).head.getString(0)
    assert(red == "Write <EMAIL> or <EMAIL> today") // case preserved around
  }
}
