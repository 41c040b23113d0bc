package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.GraftConfig
import graft.query._

/** Pins GraftConfig to the reference Configuration's semantics
  * (Configuration.scala:15-98) on reference-shaped properties content
  * (conf/bm25.properties, conf/indri.properties, conf/boolean.properties).
  */
class ConfigSpec extends AnyFunSuite {

  // reference conf/bm25.properties shape, including its literal tabs
  val bm25Props = s"""
yairs.query.path = data/exp2/queries.txt
yairs.output.path = data/exp2/sample-output
yairs.stoplist.path = data/stoplist.txt
yairs.inv.basename = data/exp2/inv/
yairs.retriever.name = bm25
yairs.run.id= results-bm-25bow
yairs.run.results.num=100
yaris.operator.default = #SUM
yairs.field.default = default
yairs.bm25.k1 = 1.2
yairs.bm25.b = 0.75
yairs.document.count = 890630
yairs.document.average.size${"\t"}= 1301
yairs.vocabulary.size =${"\t"}4073034
yairs.word.count = 1158815080
"""

  test("bm25 properties round trip") {
    val c = GraftConfig.fromString(bm25Props)
    assert(c.model == BM25(1.2, 0.75))
    assert(c.getDefaultOperator() == QOp.SUM)
    assert(c.numResults == 100)
    assert(c.runId == "results-bm-25bow")
    val cs = c.collStats.get
    assert(cs.docCount == 890630L && cs.avgDocLen == 1301.0 &&
      cs.vocabSize == 4073034L && cs.wordCount == 1158815080L)
  }

  test("indri properties with the reference's misspelled keys") {
    val c = GraftConfig.fromString("""
yairs.retriever.name = indri
yairs.indri.lamba = 0.4
yairs.indri.mu = 2500
yairs.indri.query.piror = wordBased
yaris.operator.default = #AND
""")
    assert(c.model == Indri(0.4, 2500.0, wordBasedPrior = true))
    assert(c.getDefaultOperator() == QOp.AND)
    val d = GraftConfig.fromString(
      "yairs.retriever.name = indri\nyairs.indri.lamba = 0.4\n" +
        "yairs.indri.mu = 2500\nyairs.indri.query.piror = documentBased\n")
    assert(d.model == Indri(0.4, 2500.0, wordBasedPrior = false))
  }

  test("boolean properties: getBoolean defaults true, string equality") {
    val c = GraftConfig.fromString(
      "yairs.retriever.name = boolean\nyaris.operator.default = #OR\n")
    assert(c.model == Bool(ranked = true)) // yairs.ranked absent -> true
    val d = GraftConfig.fromString(
      "yairs.retriever.name = boolean\nyairs.ranked = false\n")
    assert(d.model == Bool(ranked = false))
    // reference quirk: anything other than literal "true" is false
    val e = GraftConfig.fromString(
      "yairs.retriever.name = boolean\nyairs.ranked = TRUE\n")
    assert(e.model == Bool(ranked = false))
  }

  test("default-operator validation rejects other operators") {
    val c = GraftConfig.fromString("yaris.operator.default = #NEAR\n")
    intercept[IllegalArgumentException](c.getDefaultOperator())
    val missing = GraftConfig.fromString("")
    intercept[IllegalArgumentException](missing.getDefaultOperator())
  }

  test(".dir keys get a trailing slash; missing keys throw") {
    val c = GraftConfig.fromString("yairs.something.dir = /tmp/x\n")
    assert(c.get("yairs.something.dir") == "/tmp/x/")
    intercept[IllegalArgumentException](c.get("yairs.absent"))
  }
}
