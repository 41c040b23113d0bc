package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.SyntheticCorpus
import graft.index.{FieldDoc, IndexBuilder}
import graft.oracle.RefOracle
import graft.query._
import graft.model.TrecResult

/** S4 TREC run sink: format and content pinned to the reference
  * (trecLikeResult.scala:10-16, RetrieverRunner.scala:64-83).
  */
class TrecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val triples = (0L until 120L).map { i =>
    (i, "default", SyntheticCorpus.page(i).text)
  }

  lazy val index = {
    import spark.implicits._
    IndexBuilder.inMemory(IndexBuilder.buildPostings(
      spark.createDataset(triples.map { case (i, f, t) => FieldDoc(i, f, t) })))
  }

  test("TREC line format: qid\\tQ0\\tdocid\\trank\\t%.6f\\trunid") {
    val r = TrecResult("7", 123L, 4, 1.23456789, "myrun")
    assert(r.formatted == "7\tQ0\t123\t4\t1.234568\tmyrun")
    assert(TrecResult.header == "QueryID\tQ0\tDocID\tRank\tScore\tRunID")
  }

  test("searchAll produces oracle-identical runs over a query set") {
    val parser = new QueryParser(defaultOp = QOp.SUM)
    val engine = new Engine(index, BM25())
    val oracle = new RefOracle(RefOracle.buildIndex(triples),
      RefOracle.collStats(RefOracle.buildIndex(triples)), BM25())
    val queries = Seq("1" -> "obama family tree", "2" -> "w0 w3",
      "3" -> "#near/2(obama family)")
    val got = engine.searchAll(queries, 10, parser, "r1")
    val expected = queries.flatMap { case (qid, q) =>
      oracle.search(q, 10, parser).zipWithIndex.map { case ((d, s), i) =>
        TrecResult(qid, d, i + 1, s, "r1")
      }
    }
    assert(got.map(_.formatted) == expected.map(_.formatted))
    // concurrent submission must be result- and order-identical
    val gotPar = engine.searchAll(queries, 10, parser, "r1", parallelism = 3)
    assert(gotPar.map(_.formatted) == expected.map(_.formatted))
  }

  test("query file line parsing (qid:query)") {
    assert(QueryParser.parseQueryLine("12:obama family tree") ==
      ("12", "obama family tree"))
    assert(QueryParser.parseQueryLine("3:#and(a b)") == ("3", "#and(a b)"))
  }
}
