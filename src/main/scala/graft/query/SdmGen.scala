package graft.query

/** Sequential-dependence-model query expansion — the rebuild of the
  * reference's offline generator tooling (reference:
  * data/exp2/sdm_mr/sdmrgen.java:9-55; sample output sdm.txt:1): a
  * bag-of-words query becomes
  *   #weight( w1 #and( terms ) w2 #and( #near/1( bigrams ) )
  *            w3 #and( #uw/8( bigrams ) ) )
  * Stopwords are dropped BEFORE pairing (the reference generators work on
  * the stopped query), and operators are emitted with no space before '('
  * — the exact spelling the parser's split quirk requires (see
  * QueryParser scaladoc).
  */
object SdmGen {
  def expand(bow: String, w: (Double, Double, Double) = (0.8, 0.1, 0.1),
             nearK: Int = 3, uwK: Int = 6,
             isStop: String => Boolean = graft.analysis.Tokenizer.isStop): String = {
    val terms = graft.analysis.Tokenizer.tokenize(bow).filterNot(isStop)
    require(terms.nonEmpty, s"no non-stop terms in: $bow")
    if (terms.length == 1) return s"#and( ${terms.head} )"
    val bigrams = terms.sliding(2).map(p => (p(0), p(1))).toSeq
    val unigram = s"#and( ${terms.mkString(" ")} )"
    val near = bigrams.map { case (a, b) => s"#near/$nearK( $a $b )" }
      .mkString("#and( ", "  ", " )")
    val uw = bigrams.map { case (a, b) => s"#uw/$uwK( $a $b )" }
      .mkString("#and( ", "  ", " )")
    s"#weight( ${w._1} $unigram ${w._2} $near ${w._3} $uw )"
  }

  /** Mixture-of-representations per-field expansion (reference:
    * data/exp2/sdm_mr/mrgen.java shape — each term becomes a #weight over
    * its field variants).
    */
  def mixtureOfFields(bow: String,
                      fieldWeights: Seq[(String, Double)],
                      isStop: String => Boolean = graft.analysis.Tokenizer.isStop): String = {
    val terms = graft.analysis.Tokenizer.tokenize(bow).filterNot(isStop)
    require(terms.nonEmpty, s"no non-stop terms in: $bow")
    val perTerm = terms.map { t =>
      fieldWeights.map { case (f, w) => s"$w $t+$f" }
        .mkString("#weight( ", " ", " )")
    }
    s"#and( ${perTerm.mkString(" ")} )"
  }
}
