package graft.query

/** Sequential-dependence-model query expansion — the rebuild of the
  * reference's offline generator tooling, pinned BYTE-FOR-BYTE against
  * its committed 30-query outputs (GoldensSpec reads them directly):
  *
  *  - [[expand]] mirrors the SD branch of the public Metzler–Croft
  *    formulation script the reference ran (reference:
  *    data/exp2/sdm_mr/dm.pl:92-130, committed output sdm.txt): a
  *    bag-of-words query becomes
  *      #weight( w1 #and( terms ) w2 #and( #near/k( bigrams ) )
  *               w3 #and( #uw/k( bigrams ) ) )
  *    Stopwords are dropped BEFORE pairing (dm.pl hardcodes the stopped
  *    queries; we derive them from the raw queries.txt), single-term
  *    queries collapse to `#and( t )` (dm.pl:110-112), and bigrams are
  *    emitted LAST PAIR FIRST — dm.pl's sd loop walks the subset
  *    bitmask from the low bits up (i = 3, then i ← 2i−1), which visits
  *    contiguous pairs right-to-left. Operators are spelled with no
  *    space before '(' and consecutive window terms separated by TWO
  *    spaces (trailing+leading space in dm.pl's string appends) — the
  *    exact bytes the parser's split quirk requires.
  *
  *  - [[mixtureOfFields]] mirrors mrgen (reference:
  *    data/exp2/sdm_mr/mrgen.java:24-40, committed output mr.txt — the
  *    anchor=0.1/url=0/body=0/title=0.9 config): each word of the RAW
  *    query (stopwords KEPT — mrgen does no stopping) becomes a
  *    `#weight( w1 t+f1 w2 t+f2 … )` over its field variants, wrapped
  *    in `#AND(…)` with mrgen's exact spacing.
  */
object SdmGen {
  def expand(bow: String, w: (Double, Double, Double) = (0.8, 0.1, 0.1),
             nearK: Int = 3, uwK: Int = 6,
             isStop: String => Boolean = graft.analysis.Tokenizer.isStop): String = {
    val terms = graft.analysis.Tokenizer.tokenize(bow).filterNot(isStop)
    require(terms.nonEmpty, s"no non-stop terms in: $bow")
    if (terms.length == 1) return s"#and( ${terms.head} )"
    // dm.pl's sd bitmask walk emits contiguous pairs right-to-left
    val bigrams = terms.sliding(2).map(p => (p(0), p(1))).toSeq.reverse
    val unigram = s"#and( ${terms.mkString(" ")} )"
    val near = bigrams.map { case (a, b) => s"#near/$nearK( $a $b )" }
      .mkString("#and( ", "  ", " )")
    val uw = bigrams.map { case (a, b) => s"#uw/$uwK( $a $b )" }
      .mkString("#and( ", "  ", " )")
    s"#weight( ${w._1} $unigram ${w._2} $near ${w._3} $uw )"
  }

  def mixtureOfFields(bow: String,
                      fieldWeights: Seq[(String, Double)]): String = {
    val words = graft.analysis.Tokenizer.tokenize(bow)
    require(words.nonEmpty, s"no terms in: $bow")
    val perWord = words.map { t =>
      fieldWeights.map { case (f, wt) => s"$wt $t+$f " }
        .mkString("#weight( ", "", ") ")
    }
    s"#AND(${perWord.mkString})"
  }
}
