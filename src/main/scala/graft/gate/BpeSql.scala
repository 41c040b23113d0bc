package graft.gate

import graft.ops.TextAnalysis

/** Generated DuckDB oracle for the real-BPE gates ([[graft.ops.Bpe]]).
  *
  * The oracle is fully independent of the Spark implementation: it
  * replays the ENTIRE training — pre-token counting, `NumMerges` rounds
  * of (count adjacent pairs weighted by frequency → pick the
  * (count desc, lhs asc, rhs asc) winner → greedy leftmost
  * non-overlapping rewrite of every vocab word) — as statically unrolled
  * SQL, then derives the per-document encoded token counts from the
  * trained vocab. Nothing learned on the Spark side leaks into the SQL;
  * a training bug on either side breaks the hash.
  *
  * Representation trick: a vocab word's symbol sequence is carried as a
  * single string with each symbol individually wrapped,
  * `chr(30) sym chr(31)` concatenated — so the adjacent pair (a,b) is
  * the exact substring `⟨a⟩⟨b⟩`, and DuckDB's left-to-right
  * non-overlapping `replace(w, '⟨a⟩⟨b⟩', '⟨ab⟩')` IS the greedy leftmost
  * merge pass ("oooo" + (o,o) → [oo,oo], matching
  * [[graft.ops.Bpe.applyMerge]]). Sound because the corpus text contains
  * no U+001E/U+001F (ASCII synthetic webtext; checked in BpeSpec).
  *
  * Tie-breaking matches exactly: DuckDB compares VARCHARs bytewise on
  * UTF-8, which equals code-point order ([[graft.ops.Bpe.cpCompare]]).
  * If a round has no pairs left (every word is one symbol), its `b_k`
  * CTE is empty and the LEFT JOIN leaves the vocab unchanged — the same
  * early-stop the Spark loop takes.
  */
object BpeSql {

  /** Merge-table size for the gates — enough rounds for multi-level
    * merges (merged symbols re-merging) on the 61-pretoken synthetic
    * vocab while keeping the unrolled oracle compact.
    */
  val NumMerges = 24

  private val pat = TextAnalysis.BpePattern.replace("'", "''")

  /** Symbol list of a wrapped word string `w`. */
  private def syms(w: String) =
    s"string_split(substr($w, 2, len($w) - 2), chr(31)||chr(30))"

  /** The shared training chain: tok, v0, then (p_k, b_k, v_k) per round.
    * Every chain CTE is `AS MATERIALIZED`: each v_k is referenced twice
    * by round k+1, so DuckDB's default CTE inlining would expand the
    * chain into 2^NumMerges copies of the base scan.
    */
  private def trainingCtes: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH tok AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$pat')) AS pt
  FROM documents),
v0 AS MATERIALIZED (
  SELECT pt, count(*)::BIGINT AS freq,
         chr(30) || array_to_string(string_split(pt, ''), chr(31)||chr(30)) || chr(31) AS w
  FROM tok GROUP BY pt)"""
    for (k <- 1 to NumMerges) {
      val prev = s"v${k - 1}"
      sb ++= s""",
p$k AS MATERIALIZED (
  SELECT s[i] AS lhs, s[i + 1] AS rhs, sum(freq) AS c
  FROM (SELECT freq, ${syms("w")} AS s, unnest(range(1, len(s))) AS i
        FROM $prev)
  GROUP BY 1, 2),
b$k AS MATERIALIZED (SELECT lhs, rhs FROM p$k ORDER BY c DESC, lhs, rhs LIMIT 1),
v$k AS MATERIALIZED (
  SELECT pt, freq,
         CASE WHEN b.lhs IS NULL THEN v.w
              ELSE replace(v.w, chr(30)||b.lhs||chr(31)||chr(30)||b.rhs||chr(31),
                                chr(30)||b.lhs||b.rhs||chr(31)) END AS w
  FROM $prev v LEFT JOIN b$k b ON TRUE)"""
    }
    sb.result()
  }

  /** Oracle for q_op_bpe_merges: the full learned merge table. */
  def mergesSql: String = {
    val rows = (1 to NumMerges)
      .map(k => s"SELECT ${k - 1}::INT AS merge_rank, lhs, rhs FROM b$k")
      .mkString("\n  UNION ALL ")
    s"""$trainingCtes
SELECT * FROM (
  $rows)"""
  }

  /** Oracle for q_op_bpe_encode: per-document encoded token count under
    * the trained vocab (every corpus pretoken is in-vocab by
    * construction, so the trained rewrite IS the encoding — the same
    * identity [[graft.ops.Bpe.encodeWord]] reproduces). Empty documents
    * keep a 0 row via the LEFT JOIN.
    */
  def encodeSql: String =
    s"""$trainingCtes,
lenv AS (SELECT pt, len(${syms("w")})::BIGINT AS n FROM v$NumMerges)
SELECT d.doc_id, coalesce(sum(l.n), 0)::BIGINT AS n_bpe_real
FROM documents d
LEFT JOIN (SELECT t.doc_id, lenv.n FROM tok t JOIN lenv USING (pt)) l
  ON d.doc_id = l.doc_id
GROUP BY d.doc_id"""
}
