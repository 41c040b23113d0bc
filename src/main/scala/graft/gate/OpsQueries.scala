package graft.gate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver-gate queries for the training-data pipeline operators:
  * deduplication (exact / n-gram Jaccard / MinHash-LSH / SimHash /
  * embedding-cosine), similarity search (brute-force + LSH ANN), text
  * analysis (token count / quality / language-ID / fingerprint), and the
  * multimodal binary plumbing. SQL oracles wherever DuckDB can express the
  * semantics; signature-based ops (MinHash/SimHash/LSH) are rows-only here
  * and pinned by ScalaTest properties instead.
  */
object OpsQueries {

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
  private def emb(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  /** The tokenization/filter prelude shared by text-analysis oracles. */
  private val tokPrelude =
    """WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks, text
  FROM documents
)"""

  /** DuckDB list literal of the reference stoplist (quotes SQL-escaped —
    * the list contains "doesn't").
    */
  private lazy val stopList: String =
    graft.analysis.Tokenizer.stopwords.toSeq.sorted
      .map(w => "'" + w.replace("'", "''") + "'").mkString("[", ",", "]")

  val all: Seq[GateQuery] = Seq(

    // --- text analysis ---------------------------------------------------
    GateQuery("q_op_token_count",
      (s, d) => TextAnalysis.tokenCount(docs(s, d)),
      Some(s"""$tokPrelude
SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM base""")),

    GateQuery("q_op_quality",
      (s, d) => TextAnalysis.qualityScore(docs(s, d)),
      Some(s"""$tokPrelude
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
         (SELECT sum(len(t)) FROM unnest(toks) AS u(t))::DOUBLE / len(toks) END, 6)
         AS mean_tok_len,
       round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
         len(list_filter(toks, t -> list_contains($stopList, t)))::DOUBLE / len(toks) END, 6)
         AS stop_ratio,
       round(CASE WHEN len(text) = 0 THEN 0.0 ELSE
         len(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))::DOUBLE / len(text) END, 6)
         AS alnum_ratio
FROM base""")),

    GateQuery("q_op_langid",
      (s, d) => TextAnalysis.langId(docs(s, d)),
      Some(s"""$tokPrelude,
sr AS (
  SELECT doc_id, CASE WHEN len(toks) = 0 THEN 0.0 ELSE
    len(list_filter(toks, t -> list_contains($stopList, t)))::DOUBLE / len(toks) END AS r
  FROM base)
SELECT doc_id, round(r, 6) AS stop_ratio,
       CASE WHEN r >= 0.04 THEN 'en' ELSE 'other' END AS lang_pred
FROM sr""")),

    GateQuery("q_op_fingerprint",
      (s, d) => TextAnalysis.fingerprint(docs(s, d), w = 5),
      Some(s"""$tokPrelude
SELECT doc_id,
       CASE WHEN len(toks) < 5 THEN md5(array_to_string(toks, ' '))
       ELSE (SELECT min(md5(array_to_string(toks[i:i+4], ' ')))
             FROM unnest(range(1, len(toks) - 3)) AS r(i)) END AS fingerprint
FROM base""")),

    // --- deduplication ---------------------------------------------------
    GateQuery("q_op_dedup_exact",
      (s, d) => Dedup.exact(docs(s, d)),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
       count(*) AS n_docs
FROM documents GROUP BY 1""")),

    GateQuery("q_op_ngram_jaccard",
      (s, d) => Dedup.ngramJaccard(docs(s, d), w = 3, threshold = 0.5),
      Some(s"""$tokPrelude,
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
              ELSE array_to_string(toks[i:i+2], ' ') END AS shingle
  FROM (
    SELECT doc_id, toks,
           unnest(CASE WHEN len(toks) < 3 THEN [1]
                  ELSE range(1, len(toks) - 1) END) AS i
    FROM base)),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5""")),

    GateQuery("q_op_minhash_lsh",
      (s, d) => Dedup.minhashLsh(docs(s, d), w = 3, numHashes = 32,
        bands = 8, threshold = 0.3),
      Some(DuckSql.minhashLshOracle(w = 3, numHashes = 32, bands = 8,
        threshold = 0.3))),

    GateQuery("q_op_simhash",
      (s, d) => Dedup.simhashPairs(docs(s, d), maxHamming = 8),
      Some(DuckSql.simhashOracle(maxHamming = 8))),

    // Scale path gated (LSH bucket collisions, never an all-pairs join);
    // the exact all-pairs variant stays the recall reference in OpsSpec.
    GateQuery("q_op_embed_dups",
      (s, d) => Similarity.embeddingDups(emb(s, d), threshold = 0.35,
        useLsh = true, nBits = 8),
      Some(DuckSql.embedDupsLshOracle(threshold = 0.35, nBits = 8))),

    // --- similarity search ------------------------------------------------
    GateQuery("q_op_ann_brute",
      (s, d) => Similarity.bruteTopK(emb(s, d), Seq(0L, 1L, 2L, 3L, 4L), 10),
      Some("""WITH pr AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         unnest(q.embedding)::DOUBLE AS x, unnest(v.embedding)::DOUBLE AS y
  FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
  WHERE q.vec_id IN (0, 1, 2, 3, 4)),
cs AS (
  SELECT query_id, neighbor_id,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS c
  FROM pr GROUP BY 1, 2)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, round(c, 6) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, neighbor_id ASC) AS rank
  FROM cs)
WHERE rank <= 10""")),

    GateQuery("q_op_ann_lsh",
      (s, d) => Similarity.lshTopK(emb(s, d), Seq(0L, 1L, 2L, 3L, 4L), 10,
        nBits = 6),
      Some(DuckSql.annLshOracle(Seq(0L, 1L, 2L, 3L, 4L), 10, nBits = 6))),

    // IVF: k-means coarse cells (driver-trained on a bounded sample),
    // distributed assignment, nProbe-cell candidate scan.
    GateQuery("q_op_ann_ivf",
      (s, d) => Similarity.ivfTopK(emb(s, d), Seq(0L, 1L, 2L, 3L, 4L), 10,
        nCentroids = 8, nProbe = 2, iters = 2, trainN = 256L),
      Some(DuckSql.annIvfOracle(Seq(0L, 1L, 2L, 3L, 4L), 10, nCentroids = 8,
        nProbe = 2, iters = 2, trainN = 256L))),

    // --- multimodal binary plumbing ---------------------------------------
    GateQuery("q_op_mm_meta",
      (s, d) => {
        val media = docs(s, d).select(col("doc_id"),
          col("text").cast("binary").as("payload"))
        Multimodal.extract(media, featDim = 8).toDF()
          .select("doc_id", "n_bytes", "width", "height", "channels")
      },
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       64 + octet_length(encode(text)) % 577 AS width,
       64 + (octet_length(encode(text)) // 7) % 449 AS height,
       1 + octet_length(encode(text)) % 3 AS channels
FROM documents""")),

    GateQuery("q_op_mm_frames",
      (s, d) => {
        val media = docs(s, d).select(col("doc_id"),
          col("text").cast("binary").as("payload"))
        Multimodal.frameSample(media, stride = 64, maxFrames = 16)
      },
      Some("""SELECT doc_id, f AS frame_idx,
       ascii(substring(text, f * 64 + 1, 1)) AS frame_byte
FROM documents, range(0, 16) AS r(f)
WHERE f < octet_length(encode(text)) // 64"""))
  )
}
