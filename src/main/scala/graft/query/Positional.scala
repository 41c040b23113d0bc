package graft.query

/** Positional match kernels for #NEAR/k and #UW/k. Pure functions over
  * position arrays, exposed to Spark as UDFs (promotion to codegen'd
  * Catalyst Expressions is a profile-driven follow-up; these run once per
  * joined docId row, on arrays already in memory).
  *
  * Both reproduce the reference's greedy advance rules exactly — the match
  * COUNT depends on them, and the count is the virtual term's tf.
  */
object Positional extends Serializable {

  /** Ordered window: positions pairs (p1, p2) with 0 <= p2 - p1 <= k,
    * advancing BOTH iterators on a match ("forward all the points"),
    * advancing the smaller otherwise (reference:
    * yairs/retrieval/StructuredRetriever.scala:179-218). Returns the
    * matched RIGHT-hand positions — chaining near(near(a,b),c) relies on
    * that (StructuredRetriever.scala:147).
    */
  def nearMatches(pos1: Seq[Int], pos2: Seq[Int], k: Int): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    var j = 0
    while (i < pos1.length && j < pos2.length) {
      val p1 = pos1(i)
      val p2 = pos2(j)
      if (p2 >= p1) {
        if (p2 - p1 <= k) { out += p2; i += 1; j += 1 }
        else i += 1
      } else j += 1
    }
    out.toSeq
  }

  /** Unordered window over n position lists: a match when
    * max(pos) - min(pos) <= k (NOT window-width max+1-min — the reference
    * deliberately uses the plain difference,
    * yairs/retrieval/MultimergeSturcturedRetriever.scala:224-232);
    * on a match advance ALL pointers, otherwise advance every pointer
    * sitting at the minimum (MultimergeSturcturedRetriever.scala:173-218).
    * Returns the number of matches (the virtual term's tf in this doc).
    */
  def uwMatches(positionsLists: Seq[Seq[Int]], k: Int): Int = {
    val nLists = positionsLists.length
    if (nLists == 0) return 0
    val idx = new Array[Int](nLists)
    var matches = 0
    var live = positionsLists.forall(_.nonEmpty)
    while (live) {
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var i = 0
      while (i < nLists) {
        val p = positionsLists(i)(idx(i))
        if (p < mn) mn = p
        if (p > mx) mx = p
        i += 1
      }
      if (mx - mn <= k) {
        matches += 1
        i = 0
        while (i < nLists) { idx(i) += 1; i += 1 }
      } else {
        i = 0
        while (i < nLists) {
          if (positionsLists(i)(idx(i)) == mn) idx(i) += 1
          i += 1
        }
      }
      i = 0
      while (i < nLists && live) {
        if (idx(i) >= positionsLists(i).length) live = false
        i += 1
      }
    }
    matches
  }
}
