package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real byte-pair-encoding behind the [[TextAnalysis.bpeTokenCount]]
  * pre-token seam: learn merges from the corpus, encode documents with
  * them. The pipeline shape is the scale-honest one:
  *
  *  - '''Counting is distributed''': pre-tokens (the GPT-2-style regex,
  *    [[TextAnalysis.BpePattern]]) are counted with a map-side-combined
  *    `groupBy` — one shuffle of (pretoken, count) partials, never rows.
  *  - '''Learning is driver-side on a bounded table''' — the classic
  *    iterative merge loop runs over the top-`vocabCap` pre-token
  *    frequency table (the same driver-trains-on-a-bounded-sample shape
  *    as the IVF coarse quantizer in [[Similarity]]). The vocab table of
  *    a web corpus is heavy-tailed; a 2^17 cap keeps the loop exact at
  *    gate scale and loses only singleton-tail mass at 100 TB.
  *  - '''Encoding is a shuffle-free scan''': merge ranks broadcast with
  *    the closure, applied per partition with a pretoken→length memo
  *    (Zipf head makes the hit rate ≈1), summed per row — no explode, no
  *    shuffle, no driver round-trip.
  *
  * Exact semantics (mirrored token-for-token by the generated DuckDB
  * oracle in [[graft.gate.BpeSql]], which replays the SAME training as
  * unrolled SQL and is hash-compared by the driver gate):
  *
  *  - symbols are Unicode CODE POINTS (DuckDB's `substring`/`length`
  *    are code-point based; `String.codePoints` matches);
  *  - each round counts every adjacent symbol pair, overlaps included,
  *    weighted by pre-token frequency; the winner is
  *    (count desc, left asc, right asc) with strings compared by code
  *    point (= DuckDB's binary collation on UTF-8);
  *  - a merge is applied to every vocab word greedily leftmost,
  *    non-overlapping ("oooo" + (o,o) → [oo, oo]);
  *  - encoding applies the learned merges in ascending rank order with
  *    the same greedy pass — for in-vocab words this reproduces the
  *    training rewrite exactly, and it extends deterministically to
  *    words outside a capped vocab.
  */
object Bpe {

  case class Merge(rank: Int, lhs: String, rhs: String)

  /** Code-point lexicographic compare — equals DuckDB's binary UTF-8
    * collation even for astral-plane symbols, where UTF-16
    * `String.compareTo` would order surrogate blocks wrongly.
    */
  private[graft] def cpCompare(a: String, b: String): Int = {
    val ai = a.codePoints.iterator; val bi = b.codePoints.iterator
    while (ai.hasNext && bi.hasNext) {
      val c = Integer.compare(ai.next(), bi.next())
      if (c != 0) return c
    }
    java.lang.Boolean.compare(ai.hasNext, bi.hasNext)
  }

  private def toSymbols(w: String): Vector[String] =
    w.codePoints.toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /** One greedy leftmost non-overlapping application of (a,b)→ab. */
  private[graft] def applyMerge(syms: Vector[String], a: String,
                              b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Pre-token frequency table: (pretoken, freq) over the whole corpus.
    * Map-side combine does the heavy lifting; the shuffle carries only
    * distinct-pretoken partials.
    */
  def pretokenCounts(docs: DataFrame): DataFrame =
    TextAnalysis.explodeNN(TextAnalysis.fanOut(docs), Seq.empty,
        regexp_extract_all(lower(col("text")), lit(TextAnalysis.BpePattern),
          lit(0)), "pt")
      .groupBy("pt").agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` merges from the corpus (driver loop over the
    * bounded top-`vocabCap` vocab table — see object doc). Deterministic:
    * the collected vocab is ordered (freq desc, pretoken asc) before the
    * cap, and every tie in the loop is broken by code-point order.
    */
  def learn(docs: DataFrame, numMerges: Int,
            vocabCap: Int = 1 << 17): Seq[Merge] = {
    val ord = new Ordering[String] {
      def compare(a: String, b: String): Int = cpCompare(a, b)
    }
    val vocabRows = pretokenCounts(docs)
      .orderBy(col("freq").desc, col("pt"))
      .limit(vocabCap)
      .collect()
    var vocab: Vector[(Vector[String], Long)] =
      vocabRows.toVector.map(r => (toSymbols(r.getString(0)), r.getLong(1)))

    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.minBy { case ((x, y), c) => (-c, x, y) }(
          Ordering.Tuple3(Ordering.Long, ord, ord))
        merges += Merge(rank, a, b)
        vocab = vocab.map { case (syms, f) => (applyMerge(syms, a, b), f) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Encode one word: merges in ascending rank order, each applied with
    * the same greedy pass as training — reproducing the training rewrite
    * for in-vocab words.
    */
  def encodeWord(word: String, merges: Seq[Merge]): Vector[String] = {
    var syms = toSymbols(word)
    merges.foreach { m =>
      if (syms.length > 1) syms = applyMerge(syms, m.lhs, m.rhs)
    }
    syms
  }

  /** The learned merge table as a DataFrame (merge_rank, lhs, rhs). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.lhs, m.rhs))
      .toDF("merge_rank", "lhs", "rhs")
  }

  /** Per-document REAL BPE token count under `merges`: pre-tokenize,
    * encode each pre-token, sum symbol counts. Shuffle-free — one scan
    * with a per-partition pretoken→length memo; empty documents keep a 0
    * row (the oracle left-joins the documents table the same way).
    */
  def encodedTokenCount(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.toVector
    TextAnalysis.fanOut(docs).select(col("doc_id").cast("long"),
        regexp_extract_all(lower(col("text")), lit(TextAnalysis.BpePattern),
          lit(0)).as("pts"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { case (id, pts) =>
          var n = 0L
          pts.foreach { pt =>
            n += memo.getOrElseUpdate(pt, encodeWord(pt, ms).length.toLong)
          }
          (id, n)
        }
      }
      .toDF("doc_id", "n_bpe_real")
  }
}
