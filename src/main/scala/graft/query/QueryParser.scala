package graft.query

import graft.analysis.Tokenizer

/** Structured-query AST + parser.
  *
  * Grammar and behavior pin the reference parser exactly (reference:
  * yairs/util/PrefixQueryParser.scala:25-93 and
  * yairs/model/QueryTreeNode.scala:12-62), including its quirks, because
  * the committed reference run files were produced through them:
  *
  *  - the whole query is lowercased first (PrefixQueryParser.scala:26);
  *  - splitting is bracket-depth-aware on space AND hyphen
  *    (PrefixQueryParser.scala:63);
  *  - the split-time `isOperator` guard compares against UPPERCASE operator
  *    spellings after the lowercase pass, so it never fires — an operator
  *    token followed by a space at depth 0 (e.g. `#NEAR/2 (a b)` nested
  *    inside another operator) is split off alone and becomes a childless
  *    operator node that evaluates to the empty list. We reproduce this:
  *    reference outputs for `queries_structured.txt` depend on it;
  *  - tokens with no letter-or-digit are dropped (QueryTreeNode.scala:43-50);
  *  - `#WEIGHT` pairs up (weight, operand) via grouped(2) and normalizes
  *    weights to sum 1 (QueryTreeNode.scala:17-23);
  *  - a leaf `term+field` routes to that field; extra '+' parts are ignored
  *    beyond a 2-way split (QueryTreeNode.scala:53-60);
  *  - a single-part sub-expression starting with '#' is re-parsed and
  *    wrapped as an only child (QueryTreeNode.scala:37-40);
  *  - outer-bracket stripping is recursive and textual
  *    (PrefixQueryParser.scala:86-93).
  */
object QOp extends Enumeration {
  val AND, OR, SUM, WEIGHT, NEAR, UW = Value
}

sealed trait QNode {
  def isStopLeaf: Boolean = this match {
    case QLeaf(_, _, s) => s
    case _              => false
  }
}

/** Query term leaf; `field` already resolved against the default field. */
case class QLeaf(term: String, field: String, isStop: Boolean) extends QNode

/** Inner operator node. `prox` is k for NEAR/UW (1 otherwise, mirroring
  * QueryTreeNode.scala:14). `weights` non-null only for WEIGHT (normalized).
  */
case class QInner(op: QOp.Value, prox: Int, children: List[QNode],
                  weights: List[Double]) extends QNode

class QueryParser(defaultField: String = "default",
                  defaultOp: QOp.Value = QOp.SUM,
                  isStop: String => Boolean = Tokenizer.isStop) {

  private val nearRe = """^(#near/(\d+))(.*)$""".r
  private val uwRe = """^(#uw/(\d+))(.*)$""".r

  def parse(raw: String): QNode = {
    val str = raw.trim.toLowerCase(java.util.Locale.ROOT)
    if (str.startsWith("#or")) {
      mkNode(QOp.OR, 0, stripOuterBrackets(str.stripPrefix("#or")))
    } else if (str.startsWith("#and")) {
      mkNode(QOp.AND, 0, stripOuterBrackets(str.stripPrefix("#and")))
    } else if (str.startsWith("#near")) {
      str match {
        case nearRe(_, k, suffix) =>
          mkNode(QOp.NEAR, k.toInt, stripOuterBrackets(suffix))
        case _ => throw new IllegalArgumentException(s"bad #near query: $str")
      }
    } else if (str.startsWith("#sum")) {
      mkNode(QOp.SUM, 0, stripOuterBrackets(str.stripPrefix("#sum")))
    } else if (str.startsWith("#weight")) {
      mkNode(QOp.WEIGHT, 0, stripOuterBrackets(str.stripPrefix("#weight")))
    } else if (str.startsWith("#uw")) {
      str match {
        case uwRe(_, k, suffix) =>
          mkNode(QOp.UW, k.toInt, stripOuterBrackets(suffix))
        case _ => throw new IllegalArgumentException(s"bad #uw query: $str")
      }
    } else {
      mkNode(defaultOp, 0, stripOuterBrackets(str))
    }
  }

  private def mkNode(op: QOp.Value, overhead: Int, sub: String): QNode = {
    val queryString = sub.trim
    val prox = if (op == QOp.NEAR || op == QOp.UW) overhead else 1

    if (op == QOp.WEIGHT) {
      val parts = split(queryString).filterNot(containsNoLetterOrDigit)
        .grouped(2).toList
      val rawWeights = parts.map(g => g(0).toDouble)
      val sum = rawWeights.sum
      val weights = rawWeights.map(_ / sum)
      val children = parts.map(g => parse(g(1)))
      QInner(op, prox, children, weights)
    } else {
      val parts = split(queryString).filterNot(containsNoLetterOrDigit)
      if (parts.length == 1) {
        if (queryString.startsWith("#")) {
          QInner(op, prox, List(parse(queryString)), null)
        } else {
          val pieces = queryString.split('+')
          val (term, field) =
            if (pieces.length == 2) (pieces(0), pieces(1))
            else (pieces(0), defaultField)
          QLeaf(term, field, isStop(term))
        }
      } else {
        QInner(op, prox, parts.map(parse), null)
      }
    }
  }

  /** Bracket-depth-aware split on space and hyphen. The `isSplitGuard`
    * check mirrors the reference's dead `isOperator` guard (see scaladoc).
    */
  private[query] def split(sub: String): List[String] = {
    val buf = new java.lang.StringBuilder
    var depth = 0
    val out = scala.collection.mutable.ListBuffer.empty[String]
    sub.foreach { c =>
      if (c == '(') depth += 1
      if (c == ')') {
        depth -= 1
        if (depth < 0) throw new IllegalArgumentException(
          s"unbalanced brackets in: $sub")
      }
      if ((c == ' ' || c == '-') && depth == 0 &&
          !isUppercaseOperator(buf.toString.trim)) {
        out += buf.toString
        buf.setLength(0)
      } else buf.append(c)
    }
    out += buf.toString
    out.toList
  }

  /** Dead-by-construction guard (input is lowercased before split): kept
    * for fidelity with PrefixQueryParser.scala:76-85.
    */
  private def isUppercaseOperator(s: String): Boolean =
    s == "#AND" || s == "#OR" || """^#NEAR/\d+$""".r.findFirstIn(s).isDefined

  private def containsNoLetterOrDigit(s: String): Boolean =
    !s.exists(_.isLetterOrDigit)

  @annotation.tailrec
  private def stripOuterBrackets(str: String): String = {
    val t = str.trim
    if (t.startsWith("(") && t.endsWith(")"))
      stripOuterBrackets(t.stripPrefix("(").stripSuffix(")"))
    else t
  }
}

object QueryParser {
  /** Query files are `qid:query` per line, split on the FIRST ':' only
    * (reference: yairs/io/BooleanQueryReader.scala:17 uses split(":") and
    * takes fields(0), fields(1) — a second ':' in the query would be
    * truncated there; queries never contain ':' in practice, and we take
    * the remainder to be robust).
    */
  def parseQueryLine(line: String): (String, String) = {
    val i = line.indexOf(':')
    require(i > 0, s"bad query line: $line")
    (line.substring(0, i), line.substring(i + 1))
  }
}
