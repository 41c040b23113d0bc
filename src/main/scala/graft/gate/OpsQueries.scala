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

  /** Deterministic derived url column for the WebOps gates (the fixture
    * has no url): groups of 4 consecutive doc_ids share one canonical
    * URL; within a group the raw strings differ by fragment (`#s2`),
    * trailing slash, or host CASE — the noise url normalization exists
    * to remove. Mirrored 1:1 by [[urlCte]].
    */
  private def withUrls(d: DataFrame): DataFrame = {
    val pathId = (col("doc_id") / lit(4)).cast("long")
    val tld = when(pathId % 3 === 0, ".com")
      .when(pathId % 3 === 1, ".org").otherwise(".net")
    val host0 = concat(lit("site"), pathId % 37, tld)
    val host = when(col("doc_id") % 4 === 3, upper(host0)).otherwise(host0)
    val suffix = when(col("doc_id") % 4 === 1, lit("#s2"))
      .when(col("doc_id") % 4 === 2, lit("/")).otherwise(lit(""))
    d.withColumn("url",
      concat(lit("https://"), host, lit("/p/"), pathId, suffix))
  }

  private val urlCte =
    """u AS (
  SELECT doc_id, text,
         'https://' ||
         (CASE WHEN doc_id % 4 = 3 THEN upper(h) ELSE h END) ||
         '/p/' || (doc_id // 4) ||
         (CASE WHEN doc_id % 4 = 1 THEN '#s2'
               WHEN doc_id % 4 = 2 THEN '/' ELSE '' END) AS url
  FROM (SELECT doc_id, text,
               'site' || ((doc_id // 4) % 37) ||
               (CASE WHEN (doc_id // 4) % 3 = 0 THEN '.com'
                     WHEN (doc_id // 4) % 3 = 1 THEN '.org'
                     ELSE '.net' END) AS h
        FROM documents))"""

  /** The tokenization/filter prelude shared by text-analysis oracles. */
  private val tokPrelude =
    """WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks, text
  FROM documents
)"""

  /** Shared CTE chain for the n-gram Jaccard oracles (shingles, sizes,
    * pair intersections) — appended after `tokPrelude`.
    */
  private val jaccardCtes =
    """sh AS (
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
  GROUP BY 1, 2)"""

  /** DuckDB list literal of the reference stoplist (quotes SQL-escaped —
    * the list contains "doesn't").
    */
  private lazy val stopList: String =
    graft.analysis.Tokenizer.stopwords.toSeq.sorted
      .map(w => "'" + w.replace("'", "''") + "'").mkString("[", ",", "]")

  /** Repetition-signal CTE chain (lines, 2-grams, per-doc gram mode) —
    * appended after `tokPrelude`; shared by q_op_quality_rep and the
    * gopher-filter oracle so the two gates pin ONE SQL formulation.
    */
  private val repCtes =
    """ln AS (SELECT doc_id, str_split(text, chr(10)) AS ls FROM base),
g AS (
  SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS gram
  FROM (SELECT doc_id, toks,
               unnest(CASE WHEN len(toks) < 2 THEN []
                      ELSE range(1, len(toks)) END) AS i
        FROM base)),
gm AS (
  SELECT doc_id, max(c) AS mx, sum(c) AS ng
  FROM (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
  GROUP BY 1)"""

  /** The four scalar quality-signal columns over `base` — shared by
    * q_op_quality and the gopher-filter oracle (same reason as repCtes).
    */
  private lazy val sigSelectCols =
    s"""len(toks)::BIGINT AS n_tokens,
       round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
         (SELECT sum(len(t)) FROM unnest(toks) AS u(t))::DOUBLE / len(toks) END, 6)
         AS mean_tok_len,
       round(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
         len(list_filter(toks, t -> list_contains($stopList, t)))::DOUBLE / len(toks) END, 6)
         AS stop_ratio,
       round(CASE WHEN len(text) = 0 THEN 0.0 ELSE
         len(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))::DOUBLE / len(text) END, 6)
         AS alnum_ratio"""

  /** DuckDB expression mirroring WebOps.normalizeUrl over expression `c`
    * — ONE definition used by every URL gate, so a normalization change
    * cannot leave a stale SQL copy behind.
    */
  private def urlNormSql(c: String): String = {
    val x = "regexp_replace(regexp_replace(" + c + ", '#.*$', ''), '/$', '')"
    val head = "regexp_extract(" + x + ", '^[^/]*//[^/?#]*')"
    s"lower($head) || substr($x, length($head) + 1)"
  }

  val all: Seq[GateQuery] = Seq(

    // --- sampling / data mixing -----------------------------------------
    // Deterministic stratified Bernoulli: keep iff the top-53-bit uniform
    // of mix64(doc_id ^ seed) is below the stratum's rate. The oracle
    // expands the same splitmix64 finalizer in HUGEINT SQL (mixStages),
    // so both engines draw the SAME uniform per row — the sample is
    // byte-reproducible, unlike partitioning-dependent DataFrame.sample.
    GateQuery("q_op_sample_stratified",
      (s, d) => Sampling.stratifiedSample(docs(s, d), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 1.0), defaultRate = 0.25, seed = 42L)
        .select("doc_id", "lang"),
      Some {
        import DuckSql._
        val src = s"SELECT doc_id, lang, ${x64("doc_id", "42")} AS hs FROM documents"
        val mixed = mixStages(src, Seq("doc_id", "lang"), "hs", "m")
        s"""SELECT doc_id, lang FROM ($mixed)
WHERE CAST(${shr("m", 11)} AS DOUBLE) / 9007199254740992.0 <
      CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 1.0 ELSE 0.25 END"""
      }),

    // Mixture weighting with repetition: weight w => floor(w) copies plus
    // one more iff the row's uniform < frac(w) (expected multiplicity
    // exactly w; w > 1 upsamples by repetition — epoch mixing — and the
    // copy index lets downstream shuffles spread replicas).
    GateQuery("q_op_sample_mixture",
      (s, d) => Sampling.mixtureSample(docs(s, d), "doc_id", "source",
        Map("src0" -> 2.5, "src1" -> 0.0, "src2" -> 0.3),
        defaultWeight = 1.0, seed = 7L)
        .select("doc_id", "source", "copy"),
      Some {
        import DuckSql._
        val src = s"SELECT doc_id, source, ${x64("doc_id", "7")} AS hs FROM documents"
        val mixed = mixStages(src, Seq("doc_id", "source"), "hs", "m")
        s"""SELECT doc_id, source, CAST(unnest(range(copies)) AS INT) AS copy FROM (
  SELECT doc_id, source,
         CAST(floor(w) AS BIGINT) +
           (CASE WHEN CAST(${shr("m", 11)} AS DOUBLE) / 9007199254740992.0
                      < w - floor(w) THEN 1 ELSE 0 END) AS copies
  FROM (SELECT doc_id, source, m,
               CASE WHEN source = 'src0' THEN 2.5
                    WHEN source = 'src1' THEN 0.0
                    WHEN source = 'src2' THEN 0.3
                    ELSE 1.0 END AS w
        FROM ($mixed)))"""
      }),

    // Deterministic global shuffle order: dense positions in
    // mix64(doc_id ^ seed) order — the training-order randomization step,
    // reproducible across partitionings (unlike orderBy(rand())). Spark
    // sorts the hash in the unsigned domain (sign bit flipped) to match
    // the oracle's HUGEINT ordering.
    GateQuery("q_op_shuffle_order",
      (s, d) => Sampling.shuffleOrder(docs(s, d), "doc_id", seed = 99L)
        .select("doc_id", "shuffle_pos"),
      Some {
        import DuckSql._
        val src = s"SELECT doc_id, ${x64("doc_id", "99")} AS hs FROM documents"
        val mixed = mixStages(src, Seq("doc_id"), "hs", "m")
        s"""SELECT doc_id,
       row_number() OVER (ORDER BY m, doc_id) - 1 AS shuffle_pos
FROM ($mixed)"""
      }),

    // Context packing: per-shard concatenation in doc_id order, chunked
    // at 512 tokens — each doc mapped to the (bin, offset) of its first
    // token. Sequential only within a shard (window partitioned by
    // source), so shards pack in parallel at any scale.
    GateQuery("q_op_pack_contexts",
      (s, d) => Packing.packContexts(docs(s, d), tokensPerBin = 512),
      Some("""WITH t AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '')) AS n_tokens
  FROM documents),
c AS (
  -- CAST: DuckDB's windowed sum(BIGINT) yields HUGEINT, which the
  -- comparison harness renders as float64; BIGINT keeps bin/offset
  -- integral end-to-end (values are identical either way).
  SELECT doc_id, source AS shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
           AS BIGINT) - n_tokens AS start
  FROM t)
SELECT doc_id, shard, n_tokens,
       CAST(start // 512 AS BIGINT) AS bin,
       CAST(start % 512 AS BIGINT) AS offset
FROM c""")),

    // Gopher-style repetition quality signals: duplicate-line fraction +
    // most-frequent-2-gram fraction. Spark computes the 2-gram mode as a
    // per-row sorted-array fold (no shuffle); the oracle via explode +
    // group-by, two independent routes to the same mode count.
    GateQuery("q_op_quality_rep",
      (s, d) => TextAnalysis.repetitionSignals(docs(s, d)),
      Some(s"""$tokPrelude,
$repCtes
SELECT ln.doc_id,
       round((len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls), 6)
         AS dup_line_frac,
       round(coalesce(mx::DOUBLE / ng, 0), 6) AS top_2gram_frac
FROM ln LEFT JOIN gm USING (doc_id)""")),

    // --- text analysis ---------------------------------------------------
    GateQuery("q_op_token_count",
      (s, d) => TextAnalysis.tokenCount(docs(s, d)),
      Some(s"""$tokPrelude
SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM base""")),

    GateQuery("q_op_token_bpe",
      (s, d) => TextAnalysis.bpeTokenCount(docs(s, d)),
      Some(s"""SELECT doc_id,
       len(regexp_extract_all(lower(text), '${TextAnalysis.BpePattern.replace("'", "''")}'))::BIGINT AS n_bpe_tokens
FROM documents""")),

    // Real BPE (graft.ops.Bpe): the merge table and the per-doc encoded
    // counts, each against BpeSql's fully-independent unrolled training
    // replay — see BpeSql's scaladoc for the faithfulness argument.
    GateQuery("q_op_bpe_merges",
      (s, d) => Bpe.mergesDf(s, Bpe.learn(docs(s, d), BpeSql.NumMerges)),
      Some(BpeSql.mergesSql)),

    GateQuery("q_op_bpe_encode",
      (s, d) => Bpe.encodedTokenCount(docs(s, d),
        Bpe.learn(docs(s, d), BpeSql.NumMerges)),
      Some(BpeSql.encodeSql)),

    GateQuery("q_op_quality",
      (s, d) => TextAnalysis.qualityScore(docs(s, d)),
      Some(s"""$tokPrelude
SELECT doc_id,
       $sigSelectCols
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

    GateQuery("q_op_langid_ngram",
      (s, d) => TextAnalysis.langIdNgram(docs(s, d)),
      Some {
        val profs = TextAnalysis.langTrigrams
        def lit(prof: Seq[String]) =
          prof.map(t => "'" + t.replace("'", "''") + "'")
            .mkString("[", ",", "]")
        val scoreCols = profs.map { case (l, p) =>
          s"""CASE WHEN len(tg) = 0 THEN 0.0
            ELSE len(list_filter(tg, t -> list_contains(${lit(p)}, t)))::DOUBLE / len(tg) END AS s_$l"""
        }.mkString(",\n       ")
        val langs = profs.map(_._1) // asc: first max wins
        val pred = langs.init.zipWithIndex.map { case (l, i) =>
          val rest = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
          s"WHEN $rest THEN '$l'"
        }.mkString("\n            ")
        s"""$tokPrelude,
pad AS (SELECT doc_id, ' ' || array_to_string(toks, ' ') || ' ' AS s FROM base),
tgs AS (SELECT doc_id, list_transform(range(1, greatest(len(s) - 2, 0) + 1),
                                      i -> s[i:i+2]) AS tg FROM pad),
sc AS (SELECT doc_id, len(tg) AS n,
       $scoreCols
FROM tgs)
SELECT doc_id,
       CASE WHEN n = 0 THEN 'unknown'
            $pred
            ELSE '${langs.last}' END AS lang_pred,
       round(greatest(${langs.map(l => s"s_$l").mkString(", ")}), 6) AS score
FROM sc"""
      }),

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
$jaccardCtes
SELECT id_a, id_b,
       round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5""")),

    // Near-dup PAIRS collapsed into duplicate CLUSTERS: distributed
    // connected components (min-label propagation) on the Spark side; the
    // oracle is the ground-truth transitive closure as a recursive CTE
    // over the same jaccard pair set. keep_id = component min.
    GateQuery("q_op_dedup_clusters",
      (s, d) => Dedup.duplicateClusters(
        Dedup.ngramJaccard(docs(s, d), w = 3, threshold = 0.5)
          .select("id_a", "id_b")),
      Some(s"""${tokPrelude.replaceFirst("WITH", "WITH RECURSIVE")},
$jaccardCtes,
prs AS (
  SELECT id_a, id_b
  FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
  WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION ALL SELECT id_b AS src, id_a AS dst FROM prs),
reach AS (
  SELECT DISTINCT src AS id, src AS r FROM edges
  UNION
  SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
SELECT id AS doc_id, min(r) AS keep_id FROM reach GROUP BY 1""")),

    // Corpus-level top-k n-grams (boilerplate/contamination census):
    // explode → map-side-combined groupBy → TakeOrdered on the TOTAL
    // order (count desc, gram asc) so the k boundary is deterministic.
    GateQuery("q_op_ngram_topk",
      (s, d) => TextAnalysis.ngramTopK(docs(s, d), n = 2, k = 50),
      Some(s"""$tokPrelude,
g AS (
  SELECT array_to_string(toks[i:i+1], ' ') AS gram
  FROM (SELECT toks, unnest(CASE WHEN len(toks) < 2 THEN []
                       ELSE range(1, len(toks)) END) AS i FROM base))
SELECT gram, count(*) AS n_occurrences
FROM g GROUP BY 1
ORDER BY n_occurrences DESC, gram ASC
LIMIT 50""")),

    // PMI collocations: the statistically-associated bigrams (phrase
    // mining / tokenizer-merge candidates). Arithmetic shape mirrored
    // exactly (same division order) so 6dp values are bit-reproducible;
    // ordered by RAW pmi with gram tie-break (total order at the k cut).
    GateQuery("q_op_collocations",
      (s, d) => TextAnalysis.collocations(docs(s, d), minCount = 5, k = 50),
      Some(s"""$tokPrelude,
uni AS (SELECT w, count(*) AS cu
        FROM (SELECT unnest(toks) AS w FROM base) GROUP BY 1),
big AS (SELECT w1, w2, count(*) AS cab FROM (
          SELECT toks[i] AS w1, toks[i+1] AS w2
          FROM (SELECT toks, unnest(CASE WHEN len(toks) < 2 THEN []
                               ELSE range(1, len(toks)) END) AS i FROM base))
        GROUP BY 1, 2),
n1 AS (SELECT sum(cu)::DOUBLE AS s1 FROM uni),
n2 AS (SELECT sum(cab)::DOUBLE AS s2 FROM big),
j AS (
  SELECT w1 || ' ' || w2 AS gram, cab,
         ln((cab::DOUBLE / s2) /
            ((ua.cu::DOUBLE / s1) * (ub.cu::DOUBLE / s1))) AS pmiraw
  FROM big JOIN uni ua ON ua.w = w1 JOIN uni ub ON ub.w = w2, n1, n2
  WHERE cab >= 5)
SELECT gram, cab AS n_occurrences, round(pmiraw, 6) AS pmi
FROM j ORDER BY pmiraw DESC, gram ASC LIMIT 50""")),

    // Per-doc top-5 TF-IDF keywords. Rank boundary is deterministic
    // cross-engine: tied raw scores (equal (tf, df), or ANY df = N term
    // — those score exactly 0.0 whatever their tf) are bit-identical
    // doubles in both engines (same smoothed formula, same division
    // order), and the term-ASC tiebreak totalizes the order.
    GateQuery("q_op_tfidf_keywords",
      (s, d) => TextAnalysis.tfidfKeywords(docs(s, d), k = 5),
      Some(s"""$tokPrelude,
tfc AS (SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM base) GROUP BY 1, 2),
dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
tot AS (SELECT count(*) AS n_docs FROM documents),
sc AS (
  SELECT doc_id, term,
         tf * ln((n_docs + 1.0) / (df + 1.0)) AS raw
  FROM tfc JOIN dfc USING (term), tot)
SELECT doc_id, term, round(raw, 6) AS tfidf, rank FROM (
  SELECT doc_id, term, raw,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY raw DESC, term ASC) AS rank
  FROM sc) WHERE rank <= 5""")),

    // Unigram cross-entropy vs the corpus's own LM (KenLM-quality-filter
    // stand-in). Both sides accumulate contributions by an explicit left
    // fold in term-ASC order (sort_array+aggregate / list(ORDER BY)+
    // list_reduce) so the rounded double is bit-reproducible — a plain
    // SUM would be partitioning-dependent.
    GateQuery("q_op_lm_xent",
      (s, d) => TextAnalysis.lmCrossEntropy(docs(s, d)),
      Some(s"""$tokPrelude,
tfc AS (SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM base) GROUP BY 1, 2),
cw AS (SELECT term, sum(tf) AS cw FROM tfc GROUP BY 1),
tot AS (SELECT sum(cw) AS t_total FROM cw),
ct AS (
  SELECT doc_id, term, tf,
         tf * -ln(cw::DOUBLE / t_total) AS contrib
  FROM tfc JOIN cw USING (term), tot)
SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
       round(list_reduce(list_prepend(0.0, list(contrib ORDER BY term)),
                         (a, x) -> a + x) / sum(tf), 6) AS xent_nats
FROM ct GROUP BY doc_id""")),

    // Gopher/C4-style keep/drop decision: the composite filter gate a
    // pipeline runs after scoring. Signals are the SAME rounded 6dp
    // expressions the q_op_quality / q_op_quality_rep gates pin, so the
    // threshold comparisons see identical doubles in both engines;
    // fail_reason is the first failed rule in fixed order.
    GateQuery("q_op_gopher_filter",
      (s, d) => TextAnalysis.gopherFilter(docs(s, d)),
      Some(s"""$tokPrelude,
$repCtes,
sig AS (
  SELECT b.doc_id, b.text,
         $sigSelectCols,
         round((len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls), 6)
           AS dup_line_frac,
         round(coalesce(mx::DOUBLE / ng, 0), 6) AS top_2gram_frac
  FROM base b JOIN ln USING (doc_id) LEFT JOIN gm USING (doc_id))
SELECT doc_id, fail_reason = 'ok' AS keep, fail_reason FROM (
  SELECT doc_id,
    CASE WHEN text IS NULL THEN 'no_text'
         WHEN n_tokens < 30 THEN 'n_tokens_low'
         WHEN n_tokens > 100000 THEN 'n_tokens_high'
         WHEN mean_tok_len < 3.0 OR mean_tok_len > 10.0 THEN 'mean_tok_len'
         WHEN stop_ratio < 0.02 THEN 'stop_ratio'
         WHEN alnum_ratio < 0.5 THEN 'alnum_ratio'
         WHEN dup_line_frac > 0.3 THEN 'dup_line_frac'
         WHEN top_2gram_frac > 0.2 THEN 'top_2gram_frac'
         ELSE 'ok' END AS fail_reason
  FROM sig)""")),

    // PII scrub: detection counts + md5 witness of the redacted text.
    // The fixture is PII-free word salad, so both sides append the SAME
    // deterministic doc_id-derived email/IP/phone decorations (the
    // derived-column pattern the multimodal gates use) — the operator
    // itself runs only on the text column it is given.
    GateQuery("q_op_pii_redact",
      (s, d) => Pii.redact(
        docs(s, d).withColumn("text2", concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"),
              lit("@example.com now"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" from 10."), col("doc_id") % 256, lit(".0."),
              col("doc_id") % 250 + 1)).otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit(" call 555-867-5309")).otherwise(lit("")))),
        textCol = "text2"),
      Some(s"""WITH p AS (
  SELECT doc_id, text ||
    CASE WHEN doc_id % 7 = 0
         THEN ' contact user' || doc_id || '@example.com now' ELSE '' END ||
    CASE WHEN doc_id % 11 = 0
         THEN ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 250 + 1)
         ELSE '' END ||
    CASE WHEN doc_id % 13 = 0 THEN ' call 555-867-5309' ELSE '' END AS t
  FROM documents)
SELECT doc_id,
  len(regexp_extract_all(t, '${Pii.EmailRe.replace("'", "''")}')) AS n_emails,
  len(regexp_extract_all(t, '${Pii.Ipv4Re.replace("'", "''")}')) AS n_ips,
  len(regexp_extract_all(t, '${Pii.PhoneRe.replace("'", "''")}')) AS n_phones,
  md5(regexp_replace(regexp_replace(regexp_replace(t,
        '${Pii.EmailRe.replace("'", "''")}', '<EMAIL>', 'g'),
        '${Pii.Ipv4Re.replace("'", "''")}', '<IP>', 'g'),
        '${Pii.PhoneRe.replace("'", "''")}', '<PHONE>', 'g')) AS clean_hash
FROM p""")),

    // URL-exact dedup + per-domain stats over a deterministic derived
    // url column (the fixture has none): groups of 4 consecutive doc_ids
    // share a canonical URL but differ in fragment / trailing slash /
    // host case, so the gate exercises normalization, not just grouping.
    GateQuery("q_op_url_dedup",
      (s, d) => WebOps.urlDedup(withUrls(docs(s, d))),
      Some(s"""WITH $urlCte,
nn AS (SELECT doc_id, ${urlNormSql("url")} AS url_norm FROM u)
SELECT url_norm, min(doc_id) AS keep_id, count(*) AS n_docs
FROM nn GROUP BY 1""")),

    GateQuery("q_op_domain_stats",
      (s, d) => WebOps.domainStats(withUrls(docs(s, d))),
      Some(s"""WITH $urlCte,
t AS (
  SELECT lower(regexp_extract(url, '//([^/?#]+)', 1)) AS host,
         ${urlNormSql("url")} AS url_norm,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> ''))::BIGINT AS nt
  FROM u)
SELECT host, count(*) AS n_docs, sum(nt)::BIGINT AS n_tokens,
       count(DISTINCT url_norm) AS n_urls
FROM t GROUP BY 1""")),

    // Benchmark decontamination: corpus docs sharing any 3-gram with a
    // benchmark doc (here: doc_id < 25 as the stand-in eval set), with
    // overlap counts; benchmark gram set broadcasts at scale.
    GateQuery("q_op_decontaminate",
      (s, d) => Dedup.decontaminate(docs(s, d),
        docs(s, d).filter(col("doc_id") < 25), w = 3),
      Some(s"""$tokPrelude,
cs AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
              ELSE array_to_string(toks[i:i+2], ' ') END AS shingle
  FROM (SELECT doc_id, toks,
               unnest(CASE WHEN len(toks) < 3 THEN [1]
                      ELSE range(1, len(toks) - 1) END) AS i
        FROM base)),
bs AS (SELECT doc_id AS bench_id, shingle FROM cs WHERE doc_id < 25)
SELECT c.doc_id,
       count(DISTINCT c.shingle) AS n_shared_grams,
       count(DISTINCT b.bench_id) AS n_bench_docs
FROM cs c JOIN bs b USING (shingle)
WHERE c.doc_id <> b.bench_id
GROUP BY 1""")),

    // Exact-substring dedup: pairs sharing any ≥20-token VERBATIM span,
    // with the longest shared span length — window-digest bucketing +
    // per-diagonal gaps-and-islands (Dedup.substringDup scaladoc); the
    // oracle mirrors the window/run construction in SQL.
    GateQuery("q_op_dedup_substring",
      (s, d) => Dedup.substringDup(docs(s, d), minTokens = 20,
        maxWindowDf = 1000L),
      Some(s"""$tokPrelude,
w AS (
  SELECT doc_id, i::BIGINT - 1 AS pos,
         md5(array_to_string(toks[i:i+19], ' ')) AS win
  FROM (SELECT doc_id, toks,
               unnest(CASE WHEN len(toks) < 20 THEN []
                      ELSE range(1, len(toks) - 18) END) AS i FROM base)),
hot AS (SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) > 1000),
kept AS (SELECT * FROM w WHERE win NOT IN (SELECT win FROM hot)),
m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, b.pos AS pb
      FROM kept a JOIN kept b ON a.win = b.win AND a.doc_id < b.doc_id),
runs AS (SELECT id_a, id_b, pa, pa - pb AS diag,
                pa - row_number() OVER (PARTITION BY id_a, id_b, pa - pb
                                        ORDER BY pa) AS grp
         FROM m),
spans AS (SELECT id_a, id_b, count(*) AS len
          FROM runs GROUP BY id_a, id_b, diag, grp)
SELECT id_a, id_b, sum(len)::BIGINT AS n_shared_windows,
       (max(len) + 19)::BIGINT AS max_span_tokens
FROM spans GROUP BY 1, 2""")),

    GateQuery("q_op_minhash_lsh",
      (s, d) => Dedup.minhashLsh(docs(s, d), w = 3, numHashes = 32,
        bands = 8, threshold = 0.3),
      Some(DuckSql.minhashLshOracle(w = 3, numHashes = 32, bands = 8,
        threshold = 0.3))),

    // Radius-8 with Manku-style block combinations: 12 blocks, key = any
    // 4 of them (C(12,4)=495 tables, ≥2^20 bucket values per table) — the
    // r3 pigeonhole banding at this radius had only ~2^7 buckets/band and
    // degenerated toward all-pairs at scale. The oracle is the exact
    // all-pairs Hamming ground truth, so green = recall-complete.
    GateQuery("q_op_simhash",
      (s, d) => Dedup.simhashPairs(docs(s, d), maxHamming = 8),
      Some(DuckSql.simhashOracle(maxHamming = 8))),

    // Scale path gated (LSH bucket collisions, never an all-pairs join);
    // the exact all-pairs variant stays the recall reference in OpsSpec.
    GateQuery("q_op_embed_dups",
      (s, d) => Similarity.embeddingDups(emb(s, d), threshold = 0.35,
        useLsh = true, nBits = 8),
      Some(DuckSql.embedDupsLshOracle(threshold = 0.35, nBits = 8))),

    // SemDeDup: k-means cells (the IVF coarse quantizer) + intra-cell
    // cosine keep-lowest-id — semantic dedup without global all-pairs.
    // Oracle replays the same deterministic Lloyd iterations unrolled in
    // SQL, then the same raw-threshold pair test within cells.
    GateQuery("q_op_semdedup",
      (s, d) => Similarity.semDedup(emb(s, d), threshold = 0.35,
        nCentroids = 8, iters = 2, trainN = 256L),
      Some(DuckSql.semDedupOracle(threshold = 0.35, nCentroids = 8,
        iters = 2, trainN = 256L))),

    // Int8 embedding quantization: the gate projects per-vector scalar
    // checksums instead of the raw int8 array (the driver's
    // column-sorted value hash is defined over scalars): min/max pin the
    // range, the L1 pins magnitudes, and the 1-based index-weighted sum
    // pins element ORDER — any single-element divergence shifts it.
    GateQuery("q_op_embed_quantize",
      (s, d) => {
        val q = Similarity.quantizeInt8(emb(s, d))
        q.select(col("vec_id"), col("scale"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"),
          aggregate(transform(col("q"), x => abs(x).cast("long")),
            lit(0L), (acc, x) => acc + x).as("q_l1"),
          aggregate(zip_with(col("q"),
              sequence(lit(1L), size(col("q")).cast("long")),
              (x, i) => x.cast("long") * i),
            lit(0L), (acc, x) => acc + x).as("q_ichk"))
      },
      Some("""WITH s AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
           AS scaleraw, embedding
  FROM embeddings),
qv AS (
  SELECT vec_id, round(scaleraw, 9) AS scale,
         list_transform(embedding, x ->
           CASE WHEN scaleraw = 0 THEN 0
                ELSE CAST(floor(x::DOUBLE / scaleraw + 0.5) AS INT) END) AS q
  FROM s),
e AS (
  SELECT vec_id, scale, unnest(q) AS v, generate_subscripts(q, 1) AS i
  FROM qv)
SELECT vec_id, any_value(scale) AS scale,
       min(v) AS q_min, max(v) AS q_max,
       sum(abs(v))::BIGINT AS q_l1,
       sum(i::BIGINT * v)::BIGINT AS q_ichk
FROM e GROUP BY vec_id""")),

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

    // IVF with an INT8 candidate scan + float rerank of the top rerank·k.
    // Gated against the SAME exact-cosine IVF oracle as q_op_ann_ivf:
    // a green hash certifies the quantized prefilter lost nothing from
    // the true top-k (the recall contract of the q8 path).
    GateQuery("q_op_ann_ivf_q8",
      (s, d) => Similarity.ivfTopKQ8(emb(s, d), Seq(0L, 1L, 2L, 3L, 4L), 10,
        nCentroids = 8, nProbe = 2, iters = 2, trainN = 256L, rerank = 4),
      Some(DuckSql.annIvfOracle(Seq(0L, 1L, 2L, 3L, 4L), 10, nCentroids = 8,
        nProbe = 2, iters = 2, trainN = 256L))),

    // --- event-stream shapes (batch-equivalent of the streaming ops) ------
    // Tumbling 1-hour windows per event type — the batch semantics of a
    // watermarked streaming window aggregation (same groupBy(window(...))
    // plan under readStream).
    GateQuery("q_op_events_window",
      (s, d) => s.read.parquet(s"$d/events.parquet")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 6).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value")),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2""")),

    // Gap-based sessionization (30-min inactivity): per-user lag + running
    // session counter — the batch equivalent of session windows /
    // mapGroupsWithState.
    GateQuery("q_op_events_sessionize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        s.read.parquet(s"$d/events.parquet")
          .withColumn("gap",
            unix_timestamp(col("ts")) - unix_timestamp(
              lag("ts", 1).over(byUser)))
          .withColumn("newsess",
            when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
          .withColumn("session_idx", sum("newsess").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            (unix_timestamp(max("ts")) - unix_timestamp(min("ts")))
              .as("duration_sec"))
      },
      Some("""WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
              THEN 1 ELSE 0 END AS newsess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
se AS (
  SELECT user_id, ts,
         sum(newsess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       count(*) AS n_events,
       floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT AS duration_sec
FROM se GROUP BY 1, 2""")),

    // Per-user AS-OF join (click → most recent prior purchase): the
    // Spark side is the union + running-last window composition (one
    // shuffle, linear); the oracle is DuckDB's NATIVE ASOF JOIN, so the
    // gate certifies the composition against a real as-of engine.
    GateQuery("q_op_events_asof",
      (s, d) => EventOps.asofJoin(
        s.read.parquet(s"$d/events.parquet"), "click", "purchase"),
      // The right side is pre-deduped to the max-event_id row per
      // (user_id, ts): with duplicate timestamps DuckDB's ASOF tie choice
      // is unspecified, while the Spark running-last over (ts, kind,
      // event_id) deterministically keeps the greatest event_id — the
      // dedup pins the oracle to that same row without changing which
      // timestamp matches.
      Some("""SELECT l.event_id, l.user_id, r.event_id AS matched_event_id,
       round(r.value, 6) AS matched_value,
       floor(epoch(l.ts))::BIGINT - floor(epoch(r.ts))::BIGINT AS lag_sec
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF JOIN (SELECT user_id, ts,
                  arg_max(event_id, event_id) AS event_id,
                  arg_max(value, event_id) AS value
           FROM events WHERE event_type = 'purchase'
           GROUP BY user_id, ts) r
  ON l.user_id = r.user_id AND l.ts >= r.ts""")),

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
WHERE f < octet_length(encode(text)) // 64""")),

    // --- crawl-source plumbing ---------------------------------------------
    // WARC round-trip + HTML extraction — this gate IS the input_hint's
    // per-row invariant (extracted text byte-identical per url): documents
    // become HTML pages (text entity-encoded, wrapped in doctype / script /
    // style / comment boilerplate the extractor must drop), written as
    // per-record-gzip WARC files (one per partition; every 3rd record uses
    // chunked transfer-encoding to exercise the de-chunker), then parsed
    // back by WarcSource and extracted by HtmlText. The driver hash-compares
    // (url, text) against the documents table directly, so any drift in the
    // writer, the record parser, the de-chunker, or the extractor is a hash
    // mismatch. The only driver-side collect is the 4 written file paths.
    GateQuery("q_src_warc_text",
      (s, d) => {
        import s.implicits._
        val base = warcFixture(s, d)
        val rows = graft.sources.WarcSource.read(s, s"$base/*.warc.gz")
          .as[graft.sources.WarcSource.WarcRow]
        graft.sources.WarcSource
          .toPages(rows, graft.sources.HtmlText.extract)
          .select(col("url"), col("text"))
      },
      Some(s"""WITH $urlCte
SELECT url, text FROM u""")),

    // CDX random access over the same files: index the gzip members
    // (exact compressed offset/length per record), range-sort into a CDX,
    // then fetch a deterministic url subset with grouped point reads and
    // extract — certifying entries → buildCdx → fetchDocs → HtmlText
    // against the source table without ever rescanning the "crawl".
    GateQuery("q_src_warc_fetch",
      (s, d) => {
        import s.implicits._
        val base = warcFixture(s, d)
        val cdx = graft.sources.WarcIndex.buildCdx(
          graft.sources.WarcIndex.entries(s, s"$base/*.warc.gz"))
        val want = withUrls(docs(s, d))
          .filter(col("doc_id") % 7 === 0).select("url")
        graft.sources.WarcIndex.fetchDocs(cdx, want)
          .select(col("url"),
            udf((h: Array[Byte]) => graft.sources.HtmlText.extract(h))
              .apply(col("html")).as("text"))
      },
      Some(s"""WITH $urlCte
SELECT url, text FROM u
WHERE doc_id % 7 = 0"""))
  )

  /** Write the documents table as Common-Crawl-layout WARC files (one
    * `.warc.gz` per partition: warcinfo head member, then one gzip member
    * per response; every 3rd response chunked) — once per JVM per sfDir,
    * shared by the q_src_warc_* gates. Pages wrap the text in
    * entity-encoded HTML boilerplate that [[graft.sources.HtmlText]]
    * must strip back to the byte-identical text column.
    */
  private val warcDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def warcFixture(s: SparkSession, d: String): String =
    warcDirs.getOrElseUpdate(d, {
      import s.implicits._
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft-gate-warc-" + math.abs(d.hashCode))
      dir.mkdirs()
      val base = dir.getAbsolutePath
      withUrls(docs(s, d))
        .select(col("doc_id"), col("url"), col("text"))
        .repartition(4, col("doc_id"))
        .as[(Long, String, String)]
        .mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val pages = it.map { case (id, url, text) =>
            val html =
              ("<!DOCTYPE html>\n<html><head>" +
               "<script>var t = \"<p>1 < 2\";</script>" +
               "<style>p { color: red }</style></head><body>\n" +
               "<!-- boilerplate nav -->\n<p>" +
               text.replace(" ", "&#32;") +
               "</p>\n</body></html>")
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            graft.model.Page(url,
              new java.sql.Timestamp((1700000000L + id) * 1000L),
              html, text, "en")
          }
          val f = new java.io.File(base, f"part-$pid%05d.warc.gz")
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(f), 1 << 16)
          try {
            // leading warcinfo record as its own gzip member (the real
            // Common Crawl layout); readers must skip or index past it
            val b = new java.io.ByteArrayOutputStream()
            val gz = new java.util.zip.GZIPOutputStream(b)
            gz.write(graft.sources.WarcSource.warcinfoRecord()); gz.close()
            out.write(b.toByteArray)
            graft.sources.WarcSource.write(pages, out,
              gzip = true, chunkedEvery = 3)
          } finally out.close()
          Iterator.single(f.getAbsolutePath)
        }.collect()
      base
    })
}
