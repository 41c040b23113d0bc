package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query._

/** Structural goldens for the parser, derived from the 21 embedded test
  * queries of the reference (yairs/io/BooleanQueryReader.scala:41-103) and
  * the reference query files. Expected shapes follow the reference parser's
  * actual behavior — including the childless-operator quirk for
  * space-separated nested operators (see QueryParser scaladoc).
  */
class ParserSpec extends AnyFunSuite {
  val p = new QueryParser(defaultField = "default", defaultOp = QOp.OR)

  def leafTerms(n: QNode): List[String] = n match {
    case QLeaf(t, _, _)         => List(t)
    case QInner(_, _, kids, _)  => kids.flatMap(leafTerms)
  }

  test("bare multi-term gets default operator") {
    val n = p.parse("obama family tree").asInstanceOf[QInner]
    assert(n.op == QOp.OR)
    assert(leafTerms(n) == List("obama", "family", "tree"))
  }

  test("#AND with nested bracketed group (case 1: #OR (#AND (viva la vida) coldplay))") {
    // space after #and → childless AND node quirk
    val n = p.parse("#OR (#AND (viva la vida) coldplay)").asInstanceOf[QInner]
    assert(n.op == QOp.OR)
    assert(n.children.length == 3)
    val and = n.children.head.asInstanceOf[QInner]
    assert(and.op == QOp.AND && and.children.isEmpty) // the quirk
    assert(leafTerms(n.children(1)) == List("viva", "la", "vida"))
    assert(leafTerms(n.children(2)) == List("coldplay"))
  }

  test("#AND without space binds its group (#AND(viva la vida))") {
    val n = p.parse("#AND(viva la vida)").asInstanceOf[QInner]
    assert(n.op == QOp.AND)
    assert(leafTerms(n) == List("viva", "la", "vida"))
  }

  test("case 8: #NEAR/1 arizona states — top-level near with space works") {
    val n = p.parse("#NEAR/1 arizona states").asInstanceOf[QInner]
    assert(n.op == QOp.NEAR && n.prox == 1)
    assert(leafTerms(n) == List("arizona", "states"))
  }

  test("case 9: field suffixes") {
    val n = p.parse("arizona+title states+title").asInstanceOf[QInner]
    val leaves = n.children.map(_.asInstanceOf[QLeaf])
    assert(leaves.map(_.term) == List("arizona", "states"))
    assert(leaves.forall(_.field == "title"))
  }

  test("case 10: #NEAR/4 (poker tournaments) — top-level strips brackets") {
    val n = p.parse("#NEAR/4 (poker tournaments)").asInstanceOf[QInner]
    assert(n.op == QOp.NEAR && n.prox == 4)
    assert(leafTerms(n) == List("poker", "tournaments"))
  }

  test("case 13: #WEIGHT normalizes weights") {
    val n = p.parse("#WEIGHT(0.5 texas 0.4 hotel 0.1 convention )")
      .asInstanceOf[QInner]
    assert(n.op == QOp.WEIGHT)
    assert(math.abs(n.weights.sum - 1.0) < 1e-12)
    assert(n.weights == List(0.5, 0.4, 0.1))
    assert(leafTerms(n) == List("texas", "hotel", "convention"))
  }

  test("case 14: #UW/2( border texas )") {
    val n = p.parse("#UW/2( border texas )").asInstanceOf[QInner]
    assert(n.op == QOp.UW && n.prox == 2)
    assert(leafTerms(n) == List("border", "texas"))
  }

  test("case 15: #AND( #NEAR/2( south africa ) fish ) — no space before (") {
    val n = p.parse("#AND( #NEAR/2( south africa ) fish )").asInstanceOf[QInner]
    assert(n.op == QOp.AND && n.children.length == 2)
    val near = n.children.head.asInstanceOf[QInner]
    assert(near.op == QOp.NEAR && near.prox == 2)
    assert(leafTerms(near) == List("south", "africa"))
    assert(leafTerms(n.children(1)) == List("fish"))
  }

  test("case 17: nested #weight with fields") {
    val n = p.parse("#AND(#weight( 0.02598525 joints+anchor 0.002068559 joints+url 0.935296093 joints+body 0.036650099 joints+title ) )")
      .asInstanceOf[QInner]
    assert(n.op == QOp.AND && n.children.length == 1)
    val w = n.children.head.asInstanceOf[QInner]
    assert(w.op == QOp.WEIGHT && w.children.length == 4)
    assert(w.children.map(_.asInstanceOf[QLeaf].field) ==
      List("anchor", "url", "body", "title"))
    assert(math.abs(w.weights.sum - 1.0) < 1e-12)
  }

  test("SDM query shape (sdm.txt:1)") {
    val n = p.parse("#weight( 0.8 #and( obama family tree ) 0.1 #and( #near/3( family tree )  #near/3( obama family ) ) 0.1 #and( #uw/6( family tree )  #uw/6( obama family ) ) )")
      .asInstanceOf[QInner]
    assert(n.op == QOp.WEIGHT && n.children.length == 3)
    assert(n.weights.map(w => math.rint(w * 10) / 10) == List(0.8, 0.1, 0.1))
    val a = n.children(0).asInstanceOf[QInner]
    assert(a.op == QOp.AND && leafTerms(a) == List("obama", "family", "tree"))
    val b = n.children(1).asInstanceOf[QInner]
    assert(b.children.map(_.asInstanceOf[QInner].op).forall(_ == QOp.NEAR))
    val c = n.children(2).asInstanceOf[QInner]
    assert(c.children.map(_.asInstanceOf[QInner].op).forall(_ == QOp.UW))
  }

  test("hyphen splits at depth 0 (query-file style)") {
    val n = p.parse("french-lick resort").asInstanceOf[QInner]
    assert(leafTerms(n) == List("french", "lick", "resort"))
  }

  test("stopword flag on leaves") {
    val n = p.parse("the obama").asInstanceOf[QInner]
    val leaves = n.children.map(_.asInstanceOf[QLeaf])
    assert(leaves.map(_.isStop) == List(true, false))
  }

  test("punct-only tokens dropped") {
    val n = p.parse("obama ,, tree").asInstanceOf[QInner]
    assert(leafTerms(n) == List("obama", "tree"))
  }

  test("query line split") {
    assert(QueryParser.parseQueryLine("12:some query") == ("12", "some query"))
  }
}
