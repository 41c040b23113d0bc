package graft.gate

/** DuckDB SQL generation for the signature-based oracle queries.
  *
  * The driver runs each oracle as ONE SQL statement (no CREATE MACRO
  * available), so the deterministic 64-bit hash shared with the Spark ops
  * (splitmix64 finalizer — graft.corpus.SyntheticCorpus.mix — and the
  * FNV-seeded char fold — graft.ops.Dedup.hash64) is expanded textually
  * into unsigned-64 HUGEINT arithmetic: values live in [0, 2^64), XOR and
  * logical shifts via UBIGINT casts, wraparound multiply by a constant via
  * `a*b mod 2^64 = a*bLo + (a*bHi mod 2^32)*2^32`.
  *
  * Two expansion shapes, because textual macros duplicate their argument:
  *  - [[mix64]]: one (large) scalar expression — fine where the argument
  *    is a cheap column/lambda reference and row counts are small.
  *  - [[mixStages]]: a chain of SELECT stages binding each mix step to a
  *    column — used on the hot path (per-(shingle, hashIndex) rows) where
  *    the one-expression form measured ~6× slower.
  */
object DuckSql {
  private val M64 = "18446744073709551616" // 2^64
  private val B32 = "4294967296"           // 2^32

  /** Clamp a HUGEINT expression into [0, 2^64) (DuckDB % follows the
    * dividend's sign, hence the add-then-re-mod).
    */
  def u64(x: String): String = s"((($x) % $M64 + $M64) % $M64)"

  def x64(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  def shr(x: String, n: Int): String =
    s"CAST((CAST(($x) AS UBIGINT) >> $n) AS HUGEINT)"

  /** (a * b) mod 2^64 for CONSTANT b; references `a` twice. */
  def mul64c(a: String, b: BigInt): String = {
    val bLo = b & 0xFFFFFFFFL
    val bHi = b >> 32
    u64(s"($a) * $bLo + ((($a) * $bHi) % $B32) * $B32")
  }

  private val C1 = BigInt("BF58476D1CE4E5B9", 16)
  private val C2 = BigInt("94D049BB133111EB", 16)

  def mixa(x: String): String = u64(s"${u64(x)} + 11400714819323198485")
  def mixb(x: String): String = mul64c(x64(x, shr(x, 30)), C1)
  def mixc(x: String): String = mul64c(x64(x, shr(x, 27)), C2)

  /** splitmix64 finalizer (== SyntheticCorpus.mix) as one expression. */
  def mix64(x: String): String = {
    val m3 = mixc(mixb(mixa(x)))
    x64(m3, shr(m3, 31))
  }

  /** Unsigned [0,2^64) → signed BIGINT two's-complement view. */
  def sgn64(x: String): String =
    s"CAST(CASE WHEN ($x) >= 9223372036854775808 THEN ($x) - $M64 ELSE ($x) END AS BIGINT)"

  private val FNV = "14695981039346656037" // 0xCBF29CE484222325

  /** Dedup.hash64: h = seed ^ FNV, then h = mix(h ^ codeUnit) per char.
    * ASCII-only inputs here, so ascii() == the UTF-16 code unit.
    */
  def hash64(s: String, seed: String): String = {
    val init = x64(u64(seed), FNV)
    val body = mix64(x64("h", "c"))
    s"list_reduce(list_prepend($init, " +
      s"list_transform(str_split($s, ''), c -> CAST(ascii(c) AS HUGEINT))), " +
      s"(h, c) -> $body)"
  }

  /** Wrap `srcSql` (must select keepCols + column `inCol`) in a chain of
    * SELECT stages that compute mix64(inCol) one step per stage, ending
    * with keepCols + `outCol`. Each stage references the previous value a
    * bounded number of times, so evaluation cost stays linear.
    */
  def mixStages(srcSql: String, keepCols: Seq[String], inCol: String,
                outCol: String): String = {
    val k = keepCols.mkString(", ")
    var s = srcSql
    s = s"SELECT $k, ${mixa(inCol)} AS g1 FROM ($s)"
    s = s"SELECT $k, ${x64("g1", shr("g1", 30))} AS g2 FROM ($s)"
    s = s"SELECT $k, ${mul64c("g2", C1)} AS g3 FROM ($s)"
    s = s"SELECT $k, ${x64("g3", shr("g3", 27))} AS g4 FROM ($s)"
    s = s"SELECT $k, ${mul64c("g4", C2)} AS g5 FROM ($s)"
    s"SELECT $k, ${x64("g5", shr("g5", 31))} AS $outCol FROM ($s)"
  }

  // ------------------------------------------------------------ oracles

  /** Oracle for Dedup.minhashLsh over the documents table. */
  def minhashLshOracle(w: Int, numHashes: Int, bands: Int,
                       threshold: Double): String = {
    val rows = numHashes / bands
    val hb = hash64("shingle", "0")
    val seed = mix64(u64("i + 1"))
    val inner = mixStages(
      s"SELECT doc_id, i, ${x64("hb", "seedi")} AS x0 FROM shh CROSS JOIN seeds",
      Seq("doc_id", "i"), "x0", "m")
    s"""WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(toks) < $w THEN array_to_string(toks, ' ')
              ELSE array_to_string(toks[i:i+${w - 1}], ' ') END AS shingle
  FROM (SELECT doc_id, toks,
               unnest(CASE WHEN len(toks) < $w THEN [1] ELSE range(1, len(toks) - ${w - 2}) END) AS i
        FROM base)),
shd AS (SELECT shingle, $hb AS hb FROM (SELECT DISTINCT shingle FROM sh)),
shh AS (SELECT doc_id, hb FROM sh JOIN shd USING (shingle)),
seeds AS (SELECT i, $seed AS seedi FROM range(0, $numHashes) AS r(i)),
sigv AS (SELECT doc_id, i, min(${sgn64("m")}) AS s FROM ($inner) GROUP BY 1, 2),
sig AS (SELECT doc_id, list(s ORDER BY i) AS sig FROM sigv GROUP BY 1),
band AS (
  SELECT doc_id, b, sig[b * $rows + 1 : b * $rows + $rows] AS bucket
  FROM sig, range(0, $bands) AS r(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM band a JOIN band b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
est AS (
  SELECT id_a, id_b,
         round(list_sum(list_transform(range(1, ${numHashes + 1}),
               i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / $numHashes.0, 6) AS est_jaccard
  FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= $threshold"""
  }

  /** Oracle for Dedup.simhashPairs over the documents table. Banded
    * candidate generation on the Spark side is recall-complete, so the
    * oracle is simply ALL pairs with Hamming ≤ maxHamming.
    */
  def simhashOracle(maxHamming: Int): String = {
    val h = hash64("term", "7")
    s"""WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term
        FROM documents)
  GROUP BY 1, 2
),
th AS (SELECT doc_id, tf, $h AS h FROM tf),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN CAST((CAST(h AS UBIGINT) >> b) AS HUGEINT) % 2 = 1 THEN tf ELSE -tf END) AS acc
  FROM th, range(0, 64) AS r(b) GROUP BY 1, 2
),
sig AS (
  SELECT doc_id, sum(CASE WHEN acc > 0 THEN CAST(1 AS HUGEINT) << b ELSE 0 END)::HUGEINT AS sh
  FROM bits GROUP BY 1
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(CAST(a.sh AS UBIGINT), CAST(b.sh AS UBIGINT)))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(CAST(a.sh AS UBIGINT), CAST(b.sh AS UBIGINT))) <= $maxHamming"""
  }

  /** Shared CTE block reproducing Similarity.lshBuckets: hyperplane
    * coefficients pinned by (seed, table, bit, dim); the dot product is an
    * ascending-index left fold, bit-identical to the Spark UDF's loop.
    * Defines CTEs `planes`, `plist`, `dots`, `buck(vec_id, t, bucket)`.
    */
  def lshBucketsCte(nBits: Int, nTables: Int = 4, seed: Long = 5L): String = {
    val hsrc = u64(s"${seed * 1000003L} + (t * 64 + b) * 131 + i")
    val coef =
      s"(CAST(${shr(mix64(hsrc), 11)} AS DOUBLE) / 9007199254740992.0) * 2.0 - 1.0"
    s"""planes AS (
  SELECT t, b, i, $coef AS coef
  FROM range(0, $nTables) AS rt(t), range(0, $nBits) AS rb(b),
       (SELECT unnest(range(0, (SELECT max(len(embedding)) FROM embeddings))) AS i) AS ri
),
plist AS (SELECT t, b, list(coef ORDER BY i) AS cs FROM planes GROUP BY 1, 2),
dots AS (
  SELECT e.vec_id, p.t, p.b,
         list_reduce(list_prepend(0.0, list_transform(range(1, len(e.embedding) + 1),
           i -> CAST(e.embedding[i] AS DOUBLE) * p.cs[i])), (a, x) -> a + x) AS dot
  FROM embeddings e CROSS JOIN plist p
),
buck AS (
  SELECT vec_id, t, sum(CASE WHEN dot >= 0 THEN 1 << b ELSE 0 END)::INT AS bucket
  FROM dots GROUP BY 1, 2
)"""
  }

  /** Oracle for Similarity.lshTopK over the embeddings table. */
  def annLshOracle(queryIds: Seq[Long], k: Int, nBits: Int,
                   nTables: Int = 4, seed: Long = 5L): String = {
    val qs = queryIds.mkString(", ")
    s"""WITH ${lshBucketsCte(nBits, nTables, seed)},
qb AS (SELECT vec_id AS query_id, t, bucket FROM buck WHERE vec_id IN ($qs)),
cand AS (
  SELECT DISTINCT q.query_id, v.vec_id AS neighbor_id
  FROM buck v JOIN qb q ON v.t = q.t AND v.bucket = q.bucket AND v.vec_id <> q.query_id
),
pr AS (
  SELECT c.query_id, c.neighbor_id,
         unnest(q.embedding)::DOUBLE AS x, unnest(v.embedding)::DOUBLE AS y
  FROM cand c JOIN embeddings q ON q.vec_id = c.query_id
              JOIN embeddings v ON v.vec_id = c.neighbor_id),
cs AS (
  SELECT query_id, neighbor_id,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS c
  FROM pr GROUP BY 1, 2)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, round(c, 6) AS cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rank
  FROM cs)
WHERE rank <= $k"""
  }

  /** The unrolled deterministic-k-means WITH-body prefix shared by the
    * IVF ANN and SemDeDup oracles: training sample (vec_id < trainN),
    * init = first nCentroids sample vectors by vec_id, one CTE chain per
    * Lloyd iteration (empty clusters keep their centroid), then `dall`
    * (every vector's distance to every final centroid) and `assign`
    * (argmin cell per vector, ties to the lowest cidx) — the exact SQL
    * replay of Similarity.trainIvfCentroids + nearestCentroid.
    */
  private def kmeansAssignCtes(nCentroids: Int, iters: Int,
                               trainN: Long): String = {
    def distCte(name: String, vecsCte: String, centsCte: String) =
      s"""$name AS (
  SELECT t.vec_id, c.cidx,
         list_sum(list_transform(range(1, len(t.embedding) + 1),
           i -> (CAST(t.embedding[i] AS DOUBLE) - c.c[i]) * (CAST(t.embedding[i] AS DOUBLE) - c.c[i]))) AS dist
  FROM $vecsCte t CROSS JOIN $centsCte c)"""
    val iterCtes = (1 to iters).map { n =>
      val prev = s"c${n - 1}"
      s"""${distCte(s"d$n", "tr", prev)},
a$n AS (SELECT vec_id, cidx FROM (
  SELECT vec_id, cidx, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cidx ASC) AS rn
  FROM d$n) WHERE rn = 1),
m$n AS (
  SELECT a.cidx, unnest(range(0, len(t.embedding))) AS i,
         unnest(list_transform(t.embedding, x -> CAST(x AS DOUBLE))) AS x
  FROM a$n a JOIN tr t USING (vec_id)),
ml$n AS (SELECT cidx, i, avg(x) AS mv FROM m$n GROUP BY 1, 2),
mc$n AS (SELECT cidx, list(mv ORDER BY i) AS c FROM ml$n GROUP BY 1),
c$n AS (SELECT p.cidx AS cidx, coalesce(mc$n.c, p.c) AS c
        FROM $prev p LEFT JOIN mc$n USING (cidx))"""
    }.mkString(",\n")
    s"""tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $trainN),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
  FROM tr QUALIFY row_number() OVER (ORDER BY vec_id) <= $nCentroids
),
$iterCtes,
${distCte("dall", "embeddings", s"c$iters")},
assign AS (SELECT vec_id, cidx FROM (
  SELECT vec_id, cidx, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cidx ASC) AS rn
  FROM dall) WHERE rn = 1)"""
  }

  /** Oracle for Similarity.ivfTopK: the deterministic k-means replay
    * ([[kmeansAssignCtes]]), then nProbe probing + exact-cosine ranking
    * among same-cell candidates.
    */
  def annIvfOracle(queryIds: Seq[Long], k: Int, nCentroids: Int,
                   nProbe: Int, iters: Int, trainN: Long): String = {
    val qs = queryIds.mkString(", ")
    s"""WITH ${kmeansAssignCtes(nCentroids, iters, trainN)},
qprobe AS (SELECT vec_id AS query_id, cidx FROM (
  SELECT vec_id, cidx, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cidx ASC) AS rn
  FROM dall WHERE vec_id IN ($qs)) WHERE rn <= $nProbe),
cand AS (
  SELECT DISTINCT q.query_id, v.vec_id AS neighbor_id
  FROM assign v JOIN qprobe q ON v.cidx = q.cidx AND v.vec_id <> q.query_id),
pr AS (
  SELECT c.query_id, c.neighbor_id,
         unnest(q.embedding)::DOUBLE AS x, unnest(v.embedding)::DOUBLE AS y
  FROM cand c JOIN embeddings q ON q.vec_id = c.query_id
              JOIN embeddings v ON v.vec_id = c.neighbor_id),
cs AS (
  SELECT query_id, neighbor_id,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS c
  FROM pr GROUP BY 1, 2)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, round(c, 6) AS cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rank
  FROM cs)
WHERE rank <= $k"""
  }

  /** Oracle for Similarity.semDedup: the same deterministic k-means
    * replay ([[kmeansAssignCtes]]), then every same-cell pair's exact
    * cosine; a vector is dropped iff SOME lower-id vector in its cell is
    * ≥ threshold similar (raw compare, like the engine). keep = NOT
    * dropped.
    */
  def semDedupOracle(threshold: Double, nCentroids: Int, iters: Int,
                     trainN: Long): String =
    s"""WITH ${kmeansAssignCtes(nCentroids, iters, trainN)},
pe AS (SELECT a.cidx, a.vec_id, e.embedding
       FROM assign a JOIN embeddings e USING (vec_id)),
pr AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         unnest(x.embedding)::DOUBLE AS xa, unnest(y.embedding)::DOUBLE AS yb
  FROM pe x JOIN pe y ON x.cidx = y.cidx AND x.vec_id < y.vec_id),
cs AS (
  SELECT id_a, id_b,
         sum(xa * yb) / (sqrt(sum(xa * xa)) * sqrt(sum(yb * yb))) AS c
  FROM pr GROUP BY 1, 2),
drops AS (SELECT DISTINCT id_b FROM cs WHERE c >= $threshold)
SELECT a.vec_id, a.cidx, (d.id_b IS NULL) AS keep
FROM assign a LEFT JOIN drops d ON a.vec_id = d.id_b"""

  /** Oracle for Similarity.embeddingDups(useLsh = true). */
  def embedDupsLshOracle(threshold: Double, nBits: Int,
                         nTables: Int = 4, seed: Long = 5L): String =
    s"""WITH ${lshBucketsCte(nBits, nTables, seed)},
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buck a JOIN buck b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pr AS (
  SELECT c.id_a, c.id_b,
         unnest(ea.embedding)::DOUBLE AS x, unnest(eb.embedding)::DOUBLE AS y
  FROM cand c JOIN embeddings ea ON ea.vec_id = c.id_a
              JOIN embeddings eb ON eb.vec_id = c.id_b),
cs AS (
  SELECT id_a, id_b,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS c
  FROM pr GROUP BY 1, 2)
SELECT id_a, id_b, round(c, 6) AS cosine FROM cs WHERE c >= $threshold"""
}
