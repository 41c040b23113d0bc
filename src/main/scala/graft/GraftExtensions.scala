package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension injection point for the engine's native Catalyst
  * expressions, so a plain spark-submit can enable them declaratively:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * after which `near_matches`, `uw_matches` and `splitmix64` resolve in
  * SQL and `expr(...)` without any imperative registration call. The
  * imperative registrars (PositionalExpressions.register,
  * HashExpressions.register) remain for in-process callers that own the
  * session; both routes bind the same expression classes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("near_matches"),
      info("near_matches",
        "near_matches(pos1, pos2, k) - greedy ordered-window positional match"),
      (exprs: Seq[Expression]) =>
        graft.query.expressions.NearMatchesExpr(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("uw_matches"),
      info("uw_matches",
        "uw_matches(lists, k) - unordered-window positional match count"),
      (exprs: Seq[Expression]) =>
        graft.query.expressions.UwMatchesExpr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("splitmix64"),
      info("splitmix64",
        "splitmix64(x) - splitmix64 finalizer (wraparound 64-bit mixer)"),
      (exprs: Seq[Expression]) =>
        graft.functions.Splitmix64Expr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("cosine_f"),
      info("cosine_f",
        "cosine_f(a, b) - cosine similarity of two float vectors (double)"),
      (exprs: Seq[Expression]) =>
        graft.functions.CosineFExpr(exprs(0), exprs(1))))
  }
}
