package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analysis.Tokenizer

/** Pseudo-relevance feedback (RM3-style query expansion) — a retrieval
  * capability the reference lacks but its Indri model family is built
  * for (relevance models are the canonical LM feedback method: Lavrenko
  * & Croft 2001; RM3 interpolation: Abdul-Jaleel et al., UMass TREC
  * 2004).
  *
  * Two-pass retrieval:
  *   1. run the original query, take the top `fbDocs` documents;
  *   2. pick the `fbTerms` most frequent non-stopword, non-query terms
  *      of those documents (feedback term frequency — the deterministic
  *      integer-weight variant of the relevance model: RM1 with uniform
  *      document prior and ML term estimates, so the SELECTION is exact
  *      integer arithmetic an oracle can replay bit-for-bit; the
  *      interpolation weights below are where the real-valued mixing
  *      happens, as in RM3);
  *   3. re-run an expanded #WEIGHT query: each original term carries
  *      weight alpha/|orig|, each expansion term (1-alpha)/|exp|.
  *
  * Scale shape: pass 1 is a normal top-k query; pass 2 re-tokenizes ONLY
  * the `fbDocs` feedback documents from the forward (documents) table —
  * a point read by doc id, never a scan of the term-partitioned index
  * (reading "all terms of doc d" from an inverted index is the wrong
  * access path at any scale); pass 3 is a normal weighted query with
  * |orig| + |exp| leaves. Driver state is `fbTerms` strings.
  */
object Feedback {

  /** Expansion terms: the `fbTerms` highest-total-tf terms of the
    * feedback documents' default field, excluding stopwords and the
    * original query's terms. Ties break term-ascending; counts are
    * integers, so the cut is deterministic.
    *
    * @param docs   forward table with (doc_id, text) — text tokenizes to
    *               the index's default field (graft.analysis.Tokenizer)
    * @param fbIds  the feedback document ids (pass-1 top-k)
    */
  def expansionTerms(docs: DataFrame, fbIds: Seq[Long],
                     origTerms: Set[String], fbTerms: Int): Seq[String] = {
    val stop = Tokenizer.stopwords
    docs.filter(col("doc_id").isin(fbIds: _*))
      .select(explode(graft.ops.TextAnalysis.tokensCol(col("text")))
        .as("term"))
      .filter(!col("term").isin(stop.toSeq: _*) &&
        !col("term").isin(origTerms.toSeq: _*))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(fbTerms)
      .collect().map(_.getString(0)).toSeq
  }

  /** The expanded #WEIGHT node: original terms at alpha/|orig| each,
    * expansion terms at (1-alpha)/|exp| each. Weights are attached
    * directly to the AST (no query-string round-trip), so both engines
    * compute them with the same two IEEE operations.
    */
  def expandedNode(origTerms: Seq[String], expTerms: Seq[String],
                   alpha: Double, field: String = "default"): QInner = {
    require(origTerms.nonEmpty && expTerms.nonEmpty,
      "need at least one original and one expansion term")
    val ow = alpha / origTerms.length
    val ew = (1.0 - alpha) / expTerms.length
    QInner(QOp.WEIGHT, 1,
      (origTerms ++ expTerms)
        .map(t => QLeaf(t, field, Tokenizer.isStop(t))).toList,
      (origTerms.map(_ => ow) ++ expTerms.map(_ => ew)).toList)
  }

  /** Full RM3 chain: original query → top-`fbDocs` feedback set →
    * expansion terms from the forward table → expanded #WEIGHT query →
    * final top-`k` ranking (T1 order).
    */
  def rm3Search(engine: Engine, parser: QueryParser, docs: DataFrame,
                queryStr: String, k: Int, fbDocs: Int = 5,
                fbTerms: Int = 5, alpha: Double = 0.6): DataFrame = {
    val root = parser.parse(queryStr)
    val origTerms = engine.collectLeaves(root).map(_._1)
    val fbIds = engine.searchNode(root, fbDocs).collect()
      .map(_.getAs[Long]("docId")).toSeq
    val exp =
      if (fbIds.isEmpty) Nil
      else expansionTerms(docs, fbIds, origTerms.toSet, fbTerms)
    // conventional RM3 degradation: no feedback docs, or no eligible
    // expansion terms (all stopwords / query terms) → the original query
    // stands; expandedNode's non-empty require stays an internal invariant
    if (exp.isEmpty) engine.searchNode(root, k)
    else engine.searchNode(expandedNode(origTerms.distinct, exp, alpha), k)
  }
}
