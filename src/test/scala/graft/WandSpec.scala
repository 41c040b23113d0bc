package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.SyntheticCorpus
import graft.index._
import graft.query._

/** WAND must be rank- and score-identical to the exact union+groupBy path
  * (safe-up-to-ties is not enough: ties resolve by docId desc in both).
  */
class WandSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val outDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-wand").toString
    val pages = SyntheticCorpus.pages(spark, 600, 8).toDF()
    IndexStore.build(pages, dir,
      BuildConf(numSlices = 2, numBuckets = 4,
        termBuckets = 16, shufflePartitions = 8))
    dir
  }
  lazy val idx: ParquetIndex = IndexStore.open(spark, outDir, 16)

  val queries = Seq(
    Seq("obama", "family", "tree"),
    Seq("w0", "w1"),              // head terms, negative idf
    Seq("french", "lick", "resort", "w5"),
    Seq("w2"),                    // single term — many exact ties
    Seq("w100", "w200", "w300"),
    Seq("zzz", "obama"))          // missing term

  def exactTopK(terms: Seq[String], k: Int): List[(Long, Long)] = {
    val e = new Engine(idx, BM25())
    val parser = new QueryParser(defaultOp = QOp.SUM)
    e.search(terms.mkString(" "), k, parser).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Long]("docId"),
        math.round(r.getAs[Double]("score") * 1e9))).toList
  }

  def wandTopK(terms: Seq[String], k: Int, ranges: Int): List[(Long, Long)] =
    Wand.bm25TopK(spark, idx, terms, "default", k, BM25(), ranges).collect()
      .map(r => (r.getAs[Long]("docId"),
        math.round(r.getAs[Double]("score") * 1e9))).toList

  test("WAND top-10 identical to exact path (multi-range)") {
    queries.foreach { q =>
      assert(wandTopK(q, 10, 4) == exactTopK(q, 10), s"query $q")
    }
  }

  test("WAND top-50 identical to exact path (single range)") {
    queries.foreach { q =>
      assert(wandTopK(q, 50, 1) == exactTopK(q, 50), s"query $q")
    }
  }

  test("WAND k larger than result set") {
    val q = Seq("obama")
    assert(wandTopK(q, 100000, 8) == exactTopK(q, 100000))
  }

  test("eligibleBag admits flat bags (duplicates + stop terms included)") {
    val p = new QueryParser(defaultOp = QOp.SUM)
    assert(Wand.eligibleBag(p.parse("obama family tree"))
      == Some(List("obama", "family", "tree")))
    assert(Wand.eligibleBag(p.parse("obama")) == Some(List("obama")))
    // duplicates stay in the bag: bm25TopK scores them with multiplicity
    assert(Wand.eligibleBag(p.parse("w1 w1 w1"))
      == Some(List("w1", "w1", "w1")))
    // stop terms are dropped exactly like the exact path's F1 pruning
    assert(Wand.eligibleBag(p.parse("the obama")) == Some(List("obama")))
    // an ALL-stop bag has no WAND terms → exact path (empty result)
    assert(Wand.eligibleBag(p.parse("the about all")).isEmpty)
    // field restriction and nested operators have no WAND semantics
    assert(Wand.eligibleBag(p.parse("obama+title family")).isEmpty)
    assert(Wand.eligibleBag(p.parse("#sum(obama #and(a b))")).isEmpty)
    assert(Wand.eligibleBag(p.parse("#near/2(obama family)")).isEmpty)
  }

  test("duplicate terms score with multiplicity, rank-identical to exact") {
    // exact path: #SUM over k copies adds the term's score k times; WAND
    // folds k into the idf. doubling is exact in FP (score*2 == s+s), so
    // top-k agrees bit-for-bit at 1e-9 here
    Seq(Seq("obama", "obama"), Seq("w1", "w1", "obama"),
        Seq("family", "family", "family", "tree")).foreach { q =>
      assert(wandTopK(q, 10, 4) == exactTopK(q, 10), s"query $q")
    }
  }

  test("stop-term bags stay on the WAND path, rank-identical to exact") {
    val p = new QueryParser(defaultOp = QOp.SUM)
    val bag = Wand.eligibleBag(p.parse("the obama family")).get
    assert(bag == List("obama", "family"))
    assert(wandTopK(bag, 10, 4) == exactTopK(Seq("the", "obama", "family"), 10))
  }
}
