package graft

import java.io.FileOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.SyntheticCorpus
import graft.index.{BuildConf, IndexStore}
import graft.query.{BM25, Engine, QOp, QueryParser, Snippets}
import graft.sources.{WarcIndex, WarcSource}

/** Result serving end-to-end: the SAME corpus goes into the inverted
  * index (as a pages table) and into WARC files (as the stored crawl);
  * a BM25 search's top-k is then served — docId → url via the docmap,
  * url → gzip member via the CDX, point-fetch, extract, snippet — and
  * every served row must trace back to the right stored document.
  */
class SnippetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val N = 80
  lazy val pages = (0L until N.toLong).map(SyntheticCorpus.page)

  lazy val (idxDir, warcDir) = {
    val w = java.nio.file.Files.createTempDirectory("snip-warc").toString
    for ((slice, name) <- Seq(
           (pages.take(N / 2), "a.warc.gz"), (pages.drop(N / 2), "b.warc.gz"))) {
      val gz = new FileOutputStream(s"$w/$name")
      WarcSource.write(slice.iterator, gz, gzip = true)
      gz.close()
    }
    val i = java.nio.file.Files.createTempDirectory("snip-idx").toString
    import spark.implicits._
    IndexStore.build(pages.toDF(), i, BuildConf(
      numSlices = 1, numBuckets = 4, termBuckets = 8,
      shufflePartitions = 4, langFilter = None))
    (i, w)
  }

  test("snippet picks the window with the most distinct terms, earliest tie") {
    val text = "a b c d e f g h target1 x target2 y z a b c d e f g"
    val s = Snippets.snippet(text, Set("target1", "target2"), width = 5)
    assert(s.split(' ').toSet.intersect(Set("target1", "target2")).size == 2)
    // earliest tie: no terms at all → the first window
    assert(Snippets.snippet("w1 w2 w3 w4 w5 w6", Set("absent"), 3) == "w1 w2 w3")
    // short text returns everything
    assert(Snippets.snippet("only two", Set("x"), 30) == "only two")
    assert(Snippets.snippet("", Set("x")) == "")
  }

  test("serve: top-k BM25 results come back with url + on-topic snippet") {
    val idx = IndexStore.open(spark, idxDir, 8)
    val cdx = WarcIndex.buildCdx(WarcIndex.entries(spark, s"$warcDir/*.warc.gz"))
    // query terms drawn from the synthetic vocabulary
    val qTerms = pages.head.text.split("[^a-z0-9]+").filter(_.nonEmpty)
      .distinct.take(3).toSeq
    val engine = new Engine(idx, BM25())
    val results = engine.search(qTerms.mkString(" "), 5,
      new QueryParser(defaultOp = QOp.SUM))
    val served = Snippets.serve(results, idx.docmapDf, cdx, qTerms).collect()
    assert(served.length == results.count())
    val byUrl = pages.map(p => p.url -> p).toMap
    served.foreach { r =>
      val url = r.getString(1)
      val snip = r.getString(2)
      assert(snip.nonEmpty, url)
      // every snippet token exists in THAT document's extracted text
      val docToks = graft.sources.HtmlText.extract(byUrl(url).html)
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSet
      snip.split(' ').foreach(t => assert(docToks.contains(t), s"$url: $t"))
      assert(r.getLong(3) == byUrl(url).html.length.toLong)
    }
    // the top-ranked document's snippet contains at least one query term
    val topDocId = results.orderBy("rank").select("docId").first().getLong(0)
    val topUrl = idx.docmapDf
      .filter(org.apache.spark.sql.functions.col("docId") === topDocId)
      .select("url").first().getString(0)
    val topSnip = served.find(_.getString(1) == topUrl).get.getString(2)
    assert(topSnip.split(' ').exists(qTerms.contains(_)), topSnip)
  }
}
