package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Tokenizer
import graft.corpus.SyntheticCorpus
import graft.index.{FieldDoc, IndexBuilder}
import graft.oracle.RefOracle
import graft.query._

/** RM3 pseudo-relevance feedback: expansion-term hygiene and
  * rank-identity of the full two-pass chain against the single-threaded
  * reference-semantics oracle evaluating the equivalent #WEIGHT query.
  */
class FeedbackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val NumDocs = 200
  val query = "obama family tree" // planted in the synthetic vocabulary

  lazy val fieldDocTriples: Seq[(Long, String, String)] =
    (0L until NumDocs).map { i =>
      (i, "default", SyntheticCorpus.page(i).text)
    }

  lazy val index: graft.index.DfIndex = {
    import spark.implicits._
    IndexBuilder.inMemory(IndexBuilder.buildPostings(spark.createDataset(
      fieldDocTriples.map { case (i, f, t) => FieldDoc(i, f, t) })))
  }

  lazy val docsDf = {
    import spark.implicits._
    fieldDocTriples.map { case (i, _, t) => (i, t) }.toDF("doc_id", "text")
  }

  val parser = new QueryParser(defaultOp = QOp.AND)
  lazy val engine = new Engine(index, Indri())

  test("expansion terms: top-by-count, no stopwords, no query terms") {
    val fbIds = engine.search(query, 5, parser).collect()
      .map(_.getAs[Long]("docId")).toSeq
    val exp = Feedback.expansionTerms(docsDf, fbIds,
      query.split(' ').toSet, 5)
    assert(exp.size == 5)
    assert(exp.forall(t => !Tokenizer.isStop(t)), s"stopword leaked: $exp")
    assert(exp.forall(t => !query.split(' ').contains(t)),
      s"query term leaked: $exp")
    // replay the selection exactly on the driver
    val fbSet = fbIds.toSet
    val counts = fieldDocTriples.filter(d => fbSet.contains(d._1))
      .flatMap(d => Tokenizer.tokenize(d._3))
      .filterNot(t => Tokenizer.isStop(t) || query.split(' ').contains(t))
      .groupBy(identity).map { case (t, xs) => (t, xs.size) }
    val expected = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(5).map(_._1)
    assert(exp == expected, s"got $exp expected $expected")
  }

  test("rm3Search is rank-identical to the oracle on the expanded query") {
    val fbIds = engine.search(query, 5, parser).collect()
      .map(_.getAs[Long]("docId")).toSeq
    val exp = Feedback.expansionTerms(docsDf, fbIds,
      query.split(' ').toSet, 5)
    val origs = query.split(' ').toSeq
    val ow = 0.6 / origs.length
    val ew = (1.0 - 0.6) / exp.length
    // the equivalent textual #WEIGHT query for the reference oracle
    // (Double.toString round-trips, and the oracle parser's weight
    // normalization only perturbs scores at ~1e-16 — inside tolerance)
    val weighted = "#weight(" +
      (origs.map(t => s"$ow $t") ++ exp.map(t => s"$ew $t")).mkString(" ") +
      ")"
    val refIdx = RefOracle.buildIndex(fieldDocTriples)
    val oracle = new RefOracle(refIdx, RefOracle.collStats(refIdx), Indri())
    val expected = oracle.search(weighted, 20, parser)
    val got = Feedback.rm3Search(engine, parser, docsDf, query, 20)
      .collect().sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Long]("docId"), r.getAs[Double]("score"))).toList
    assert(got.length == expected.length)
    got.zip(expected).zipWithIndex.foreach {
      case (((gd, gs), (ed, es)), i) =>
        assert(gd == ed, s"rank ${i + 1}: docId $gd vs oracle $ed")
        assert(math.abs(gs - es) < 1e-9,
          s"rank ${i + 1}: score $gs vs oracle $es")
    }
  }
}
