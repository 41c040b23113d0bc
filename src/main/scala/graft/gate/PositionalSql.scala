package graft.gate

/** DuckDB oracle SQL for the positional operators: the greedy NEAR /
  * UW kernels (sequential two/三-pointer loops — reference:
  * yairs/retrieval/StructuredRetriever.scala:179-218 and
  * MultimergeSturcturedRetriever.scala:173-232) expressed as RECURSIVE
  * CTEs: one state row per document per step, all documents advancing in
  * lockstep; the terminal state per doc is the row with the maximum
  * pointer sum (pointers strictly increase every step).
  */
object PositionalSql {

  /** Token/position prelude over the documents table; tokenization must
    * match graft.analysis.Tokenizer bit-for-bit (positions are 0-based
    * offsets over the FILTERED token stream).
    */
  val prelude: String = """lt AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
  FROM documents
),
ptok AS (SELECT doc_id, unnest(toks) AS term, unnest(range(0, len(toks))) AS pos FROM lt),
dlen AS (SELECT doc_id, len(toks)::INT AS dl FROM lt),
stats AS (SELECT count(*)::DOUBLE AS n, sum(len(toks))::DOUBLE / count(*) AS avgdl,
                 sum(len(toks))::DOUBLE AS wc FROM lt)"""

  /** Sorted position lists of the given terms: pl(doc_id, term, pos). */
  def posLists(terms: Seq[String]): String = {
    val inlist = terms.map(t => s"'$t'").mkString(", ")
    s"""pl AS (
  SELECT doc_id, term, list(pos ORDER BY pos) AS pos
  FROM ptok WHERE term IN ($inlist) GROUP BY 1, 2
)"""
  }

  /** Greedy ordered-window match of two position lists: if the right head
    * is ≥ the left head and within k, match and advance both; else advance
    * whichever head is behind. Defines `{pfx}m(doc_id, tf)`.
    */
  def nearCtes(t1: String, t2: String, k: Int, pfx: String): String =
    s"""${pfx}pairs AS (
  SELECT a.doc_id, a.pos AS p1, b.pos AS p2
  FROM pl a JOIN pl b USING (doc_id)
  WHERE a.term = '$t1' AND b.term = '$t2'),
${pfx}step AS (
  SELECT doc_id, p1, p2, len(p1)::INT AS n1, len(p2)::INT AS n2,
         0 AS i, 0 AS j, 0 AS cnt
  FROM ${pfx}pairs
  UNION ALL
  SELECT doc_id, p1, p2, n1, n2,
    CASE WHEN y >= x THEN i + 1 ELSE i END,
    CASE WHEN y < x OR y - x <= $k THEN j + 1 ELSE j END,
    CASE WHEN y >= x AND y - x <= $k THEN cnt + 1 ELSE cnt END
  FROM (SELECT doc_id, p1, p2, n1, n2, i, j, cnt, p1[i + 1] AS x, p2[j + 1] AS y
        FROM ${pfx}step WHERE i < n1 AND j < n2) st
),
${pfx}m AS (
  SELECT doc_id, max_by(cnt, i + j)::INT AS tf
  FROM ${pfx}step GROUP BY doc_id HAVING max_by(cnt, i + j) > 0
)"""

  /** Unordered-window greedy kernel over 2 lists: if max-min ≤ k all
    * pointers advance (match); else every pointer at the minimum advances.
    */
  def uw2Ctes(t1: String, t2: String, k: Int, pfx: String): String =
    s"""${pfx}pairs AS (
  SELECT a.doc_id, a.pos AS p1, b.pos AS p2
  FROM pl a JOIN pl b USING (doc_id)
  WHERE a.term = '$t1' AND b.term = '$t2'),
${pfx}step AS (
  SELECT doc_id, p1, p2, len(p1)::INT AS n1, len(p2)::INT AS n2,
         0 AS i, 0 AS j, 0 AS cnt
  FROM ${pfx}pairs
  UNION ALL
  SELECT doc_id, p1, p2, n1, n2,
    CASE WHEN mx - mn <= $k OR x = mn THEN i + 1 ELSE i END,
    CASE WHEN mx - mn <= $k OR y = mn THEN j + 1 ELSE j END,
    CASE WHEN mx - mn <= $k THEN cnt + 1 ELSE cnt END
  FROM (SELECT *, least(x, y) AS mn, greatest(x, y) AS mx
        FROM (SELECT doc_id, p1, p2, n1, n2, i, j, cnt, p1[i + 1] AS x, p2[j + 1] AS y
              FROM ${pfx}step WHERE i < n1 AND j < n2) s0) st
),
${pfx}m AS (
  SELECT doc_id, max_by(cnt, i + j)::INT AS tf
  FROM ${pfx}step GROUP BY doc_id HAVING max_by(cnt, i + j) > 0
)"""

  /** Unordered-window greedy kernel over 3 lists. */
  def uw3Ctes(t1: String, t2: String, t3: String, k: Int,
              pfx: String): String =
    s"""${pfx}pairs AS (
  SELECT a.doc_id, a.pos AS p1, b.pos AS p2, c.pos AS p3
  FROM pl a JOIN pl b USING (doc_id) JOIN pl c USING (doc_id)
  WHERE a.term = '$t1' AND b.term = '$t2' AND c.term = '$t3'),
${pfx}step AS (
  SELECT doc_id, p1, p2, p3, len(p1)::INT AS n1, len(p2)::INT AS n2, len(p3)::INT AS n3,
         0 AS i1, 0 AS i2, 0 AS i3, 0 AS cnt
  FROM ${pfx}pairs
  UNION ALL
  SELECT doc_id, p1, p2, p3, n1, n2, n3,
    CASE WHEN mx - mn <= $k OR x1 = mn THEN i1 + 1 ELSE i1 END,
    CASE WHEN mx - mn <= $k OR x2 = mn THEN i2 + 1 ELSE i2 END,
    CASE WHEN mx - mn <= $k OR x3 = mn THEN i3 + 1 ELSE i3 END,
    CASE WHEN mx - mn <= $k THEN cnt + 1 ELSE cnt END
  FROM (SELECT *, least(x1, x2, x3) AS mn, greatest(x1, x2, x3) AS mx
        FROM (SELECT doc_id, p1, p2, p3, n1, n2, n3, i1, i2, i3, cnt,
                     p1[i1 + 1] AS x1, p2[i2 + 1] AS x2, p3[i3 + 1] AS x3
              FROM ${pfx}step WHERE i1 < n1 AND i2 < n2 AND i3 < n3) s0) st
),
${pfx}m AS (
  SELECT doc_id, max_by(cnt, i1 + i2 + i3)::INT AS tf
  FROM ${pfx}step GROUP BY doc_id HAVING max_by(cnt, i1 + i2 + i3) > 0
)"""

  /** Indri two-level smoothing (wordBased prior; W rides in stats.wc). */
  def indri(tf: String, dl: String, cf: String): String =
    s"log10(0.4 * ($tf + 2500.0 * (($cf) / s.wc)) / (($dl) + 2500.0) + 0.6 * (($cf) / s.wc))"

  /** Oracle for q_ir_near: #near/2(key value) under BM25, with the
    * two-pass virtual-term rescore (df from the matched set).
    */
  def nearOracle(t1: String, t2: String, k: Int): String =
    s"""WITH RECURSIVE $prelude,
${posLists(Seq(t1, t2))},
${nearCtes(t1, t2, k, "nr")},
vstat AS (SELECT count(*)::DOUBLE AS dfv FROM nrm)
SELECT m.doc_id AS doc_id, m.tf,
       round(log10((s.n - v.dfv + 0.5) / (v.dfv + 0.5)) * m.tf /
             (m.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)), 6) AS score
FROM nrm m JOIN dlen d USING (doc_id) CROSS JOIN stats s CROSS JOIN vstat v"""

  /** Oracle for q_ir_uw: #uw/4(a b c) under Indri (cf from matches). */
  def uwOracle(t1: String, t2: String, t3: String, k: Int): String =
    s"""WITH RECURSIVE $prelude,
${posLists(Seq(t1, t2, t3))},
${uw3Ctes(t1, t2, t3, k, "uw")},
vstat AS (SELECT sum(tf)::DOUBLE AS cfv FROM uwm)
SELECT m.doc_id AS doc_id, m.tf,
       round(${indri("m.tf", "d.dl", "v.cfv")}, 6) AS score
FROM uwm m JOIN dlen d USING (doc_id) CROSS JOIN stats s CROSS JOIN vstat v"""

  /** Oracle for q_ir_sdm:
    * #weight(0.8 #and(t1 t2) 0.1 #and(#near/1(t1 t2)) 0.1 #and(#uw/8(t1 t2)))
    * under Indri. Candidates = docs containing either term (a superset of
    * both positional match sets). The union-with-defaults merge is written
    * as Σ wᵢ·(present ? sᵢ : dᵢ); virtual-node quirks reproduced: a NEAR
    * with zero matches defaults to log10(0) → Integer.MIN_VALUE, a UW with
    * zero matches is the EMPTY list with default 0 (uwEmptyRule).
    */
  def sdmOracle(t1: String, t2: String): String =
    s"""WITH RECURSIVE $prelude,
${posLists(Seq(t1, t2))},
tstat AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM (
  SELECT doc_id, term, count(*)::INT AS tf FROM ptok WHERE term IN ('$t1', '$t2') GROUP BY 1, 2
) GROUP BY 1),
post AS (SELECT doc_id, term, count(*)::INT AS tf FROM ptok WHERE term IN ('$t1', '$t2') GROUP BY 1, 2),
${nearCtes(t1, t2, 1, "nr")},
${uw2Ctes(t1, t2, 8, "uw")},
nrstat AS (SELECT coalesce(sum(tf), 0)::DOUBLE AS cfv FROM nrm),
uwstat AS (SELECT coalesce(sum(tf), 0)::DOUBLE AS cfv FROM uwm),
cand AS (SELECT DISTINCT doc_id FROM post),
qt AS (SELECT term, cf FROM tstat),
c1 AS (
  SELECT c.doc_id,
         sum(CASE WHEN p.tf IS NULL THEN ${indri("0.0", "s.avgdl", "q.cf")}
             ELSE ${indri("p.tf", "d.dl", "q.cf")} END) AS s1
  FROM cand c CROSS JOIN qt q CROSS JOIN stats s
  LEFT JOIN post p ON p.doc_id = c.doc_id AND p.term = q.term
  JOIN dlen d ON d.doc_id = c.doc_id
  GROUP BY 1)
SELECT c.doc_id AS doc_id,
  round(0.8 * c.s1
    + 0.1 * (CASE WHEN nm.tf IS NOT NULL THEN ${indri("nm.tf", "d.dl", "nv.cfv")}
             WHEN nv.cfv = 0 THEN -2147483648.0
             ELSE ${indri("0.0", "s.avgdl", "nv.cfv")} END)
    + 0.1 * (CASE WHEN uv.cfv = 0 THEN 0.0
             WHEN um.tf IS NOT NULL THEN ${indri("um.tf", "d.dl", "uv.cfv")}
             ELSE ${indri("0.0", "s.avgdl", "uv.cfv")} END), 6) AS score
FROM c1 c
JOIN dlen d USING (doc_id)
LEFT JOIN nrm nm USING (doc_id)
LEFT JOIN uwm um USING (doc_id)
CROSS JOIN stats s CROSS JOIN nrstat nv CROSS JOIN uwstat uv"""
}
