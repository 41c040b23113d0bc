package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Tokenizer
import graft.model._

/** One (docId, field, text) unit to index. A document contributes one row
  * per field (default/title/body/url — reference field layout:
  * yairs/io/FileUtils.scala:38-49).
  */
case class FieldDoc(docId: Long, field: String, text: String)

/** Builds the inverted index the reference consumes but never builds
  * (its `.inv` files came from an external course indexer — see SURVEY.md
  * §1.2 for the contract: per-(term,field) postings sorted by docId with
  * (tf, docLength, positions), plus df, cf and collection stats).
  *
  * Spark shape: one `flatMap` turns each document into per-(term,field)
  * posting rows — term aggregation happens locally inside the document, so
  * the only shuffles downstream are the per-term groupBys for stats and
  * segment building. No token-level rows ever hit the wire.
  */
object IndexBuilder {

  /** Tokenize + aggregate per document. Output columns:
    * term, field, docId, tf, dl, positions.
    */
  def buildPostings(docs: Dataset[FieldDoc]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { fd =>
      val tokens = Tokenizer.tokenize(fd.text)
      val dl = tokens.length
      Tokenizer.termVector(tokens).iterator.map { case (t, (tf, pos)) =>
        PostingRow(t, fd.field, fd.docId, tf, dl, pos)
      }
    }.toDF()
  }

  /** Like buildPostings but with positions pre-encoded as a varint binary
    * `rec` column ((count, deltas) — Codec.encodePositions): the segment
    * sort/encode stage then only concatenates bytes instead of
    * re-materializing and re-encoding 10⁸⁺ position arrays. Columns:
    * term, field, docId, tf, dl, rec.
    */
  def buildPostingsEncoded(docs: Dataset[FieldDoc]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { fd =>
      val tokens = Tokenizer.tokenize(fd.text)
      val dl = tokens.length
      Tokenizer.termVector(tokens).iterator.map { case (t, (tf, pos)) =>
        (t, fd.field, fd.docId, tf, dl, Codec.encodePositions(pos))
      }
    }.toDF("term", "field", "docId", "tf", "dl", "rec")
  }

  /** The reference's four-field document layout (yairs/io/FileUtils
    * .scala:38-49): default = full extracted text, title = first line,
    * body = rest, url = the page url.
    */
  def fieldsOf(text: String, url: String): Seq[(String, String)] = {
    val nl = text.indexOf('\n')
    val (title, body) =
      if (nl >= 0) (text.substring(0, nl), text.substring(nl + 1))
      else (text, "")
    Seq(("default", text), ("title", title), ("body", body), ("url", url))
  }

  /** Map-side segment build — the scale path of the index pipeline.
    *
    * Input MUST be docId-contiguous per partition run (pages sorted by
    * docId within each parquet file; Spark may pack several files into one
    * scan partition, so a docId regression simply cuts a new mini-segment
    * — runs from different files cover disjoint docId ranges and the merge
    * reorders them by firstDocId).
    *
    * Each task tokenizes its pages and VByte-encodes one mini-segment per
    * (field, term, docId-range bucket) directly — postings never exist as
    * individual rows, so the downstream merge shuffles ~|vocab|·|tasks|
    * pre-encoded rows instead of one row per posting (10²–10³× fewer at
    * web scale). Buckets are docId ranges of `rangeSize` docs: a head term
    * (Zipf skew) is split across buckets, so no reduce task ever sees more
    * than ~rangeSize postings of one term, and concatenating buckets in
    * bucket order keeps docId order for free.
    *
    * Per-field doc lengths ride along as sentinel rows (term = "", one per
    * (field, run): blob = standard encoding of (docId, tf=docLength)) so
    * docstats needs no second tokenize pass.
    */
  def miniSegments(pagesWithId: DataFrame, rangeSize: Long): Dataset[SegmentRow] = {
    import pagesWithId.sparkSession.implicits._
    pagesWithId.select("docId", "text", "url").as[(Long, String, String)]
      .mapPartitions { it =>
        val rows = scala.collection.mutable.ArrayBuffer.empty[SegmentRow]
        final class Acc(term: String, field: String) {
          private var bucket = -1L
          private var last = -1L
          private var enc: Codec.SegmentEncoder = null
          def flush(): Unit = if (enc != null) {
            val s = enc.finish()
            rows += SegmentRow(term, field, bucket.toInt, s.n, s.firstDocId,
              s.lastDocId, s.cf, s.blob, s.blockFirst, s.blockOff,
              s.blockMaxTf, s.blockMinDl, s.blockN)
            enc = null
          }
          def add(docId: Long, tf: Int, dl: Int, rec: Array[Byte]): Unit = {
            val b = docId / rangeSize
            if (enc == null || b != bucket || docId <= last) {
              flush(); enc = new Codec.SegmentEncoder; bucket = b
            }
            enc.add(docId, tf, dl, rec)
            last = docId
          }
        }
        // Hot-loop layout (this stage is ~60% of build wall and memory-
        // bandwidth-bound — every allocation counts at 10^12 docs):
        //  - one Acc map PER FIELD with plain String keys (no tuple alloc
        //    or double hash per (term, field) lookup),
        //  - per-doc term vectors as primitive-int position buffers (a
        //    generic ArrayBuffer[Int] would box all ~10^3 positions/doc),
        //  - the default field derived by MERGING the title and body
        //    vectors (positions concatenate with an offset) instead of
        //    re-walking — each token is hashed once, not twice.
        final class PosBuf {
          var a = new Array[Int](4)
          var n = 0
          def add(v: Int): Unit = {
            if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
            a(n) = v; n += 1
          }
        }
        val fieldNames = Array("default", "title", "body", "url")
        val accs = Array.fill(4)(new java.util.HashMap[String, Acc])
        val lenAccs = Array.tabulate(4)(f => new Acc("", fieldNames(f)))
        def acc(f: Int, term: String): Acc = {
          var a = accs(f).get(term)
          if (a == null) { a = new Acc(term, fieldNames(f)); accs(f).put(term, a) }
          a
        }
        val emptyRec = Codec.encodePositions(Array.emptyIntArray)

        def vector(tokens: Array[String]): java.util.LinkedHashMap[String, PosBuf] = {
          val m = new java.util.LinkedHashMap[String, PosBuf]
          var i = 0
          while (i < tokens.length) {
            var b = m.get(tokens(i))
            if (b == null) { b = new PosBuf; m.put(tokens(i), b) }
            b.add(i); i += 1
          }
          m
        }
        def emit(f: Int, docId: Long, dl: Int,
                 m: java.util.LinkedHashMap[String, PosBuf]): Unit = {
          lenAccs(f).add(docId, 0, dl, emptyRec) // doclen sentinel (in dl)
          val eit = m.entrySet().iterator()
          while (eit.hasNext) {
            val e = eit.next()
            val b = e.getValue
            acc(f, e.getKey).add(docId, b.n, dl,
              Codec.encodePositions(b.a, b.n))
          }
        }

        it.foreach { case (docId, text, url) =>
          // default = title tokens ++ body tokens ('\n' separates)
          val nl = text.indexOf('\n')
          val (title, body) =
            if (nl >= 0) (text.substring(0, nl), text.substring(nl + 1))
            else (text, "")
          val tToks = Tokenizer.tokenize(title)
          val bToks = Tokenizer.tokenize(body)
          val uToks = Tokenizer.tokenize(url)
          val tv = vector(tToks)
          val bv = vector(bToks)
          val dl = tToks.length + bToks.length

          // default field: title vector, then body-only terms; shared terms
          // get title positions ++ (body positions + |title|)
          lenAccs(0).add(docId, 0, dl, emptyRec)
          val tit = tv.entrySet().iterator()
          while (tit.hasNext) {
            val e = tit.next()
            val b1 = e.getValue
            val b2 = bv.get(e.getKey)
            val rec =
              if (b2 == null) Codec.encodePositions(b1.a, b1.n)
              else Codec.encodePositionsMerged(b1.a, b1.n, b2.a, b2.n, tToks.length)
            acc(0, e.getKey).add(docId, b1.n + (if (b2 == null) 0 else b2.n), dl, rec)
          }
          val bit = bv.entrySet().iterator()
          while (bit.hasNext) {
            val e = bit.next()
            if (!tv.containsKey(e.getKey)) {
              val b = e.getValue
              acc(0, e.getKey).add(docId, b.n, dl,
                Codec.encodePositionsMerged(Array.emptyIntArray, 0, b.a, b.n, tToks.length))
            }
          }
          emit(1, docId, tToks.length, tv)
          emit(2, docId, bToks.length, bv)
          emit(3, docId, uToks.length, vector(uToks))
        }
        accs.foreach { m =>
          val vit = m.values().iterator()
          while (vit.hasNext) vit.next().flush()
        }
        lenAccs.foreach(_.flush())
        // deterministic emission order (resume reproducibility)
        rows.sortBy(r => (r.field, r.term, r.bucket, r.firstDocId)).iterator
      }
  }

  /** Per-(term,field) document and collection frequencies. */
  def termStats(postings: DataFrame): DataFrame =
    postings.groupBy("term", "field")
      .agg(count(lit(1)).as("df"), sum("tf").cast("long").as("cf"))

  /** Collection stats over one field (the reference reads the analogous
    * numbers from conf/bm25.properties:38-41; we compute them).
    */
  def collStats(postings: DataFrame, field: String = "default"): CollStats = {
    val p = postings.filter(col("field") === field)
    val row = p.agg(
      countDistinct("docId").as("docCount"),
      countDistinct("term").as("vocabSize"),
      sum("tf").cast("long").as("wordCount")).collect()(0)
    val docCount = row.getLong(0)
    val wordCount = row.getLong(2)
    CollStats(
      docCount = docCount,
      avgDocLen = if (docCount == 0) 0.0 else wordCount.toDouble / docCount,
      vocabSize = row.getLong(1),
      wordCount = wordCount)
  }

  /** In-memory index over a postings DataFrame: caches postings, collects
    * term stats lazily with a driver-side memo (query terms are few).
    */
  def inMemory(postings: DataFrame, field: String = "default"): DfIndex = {
    val cached = postings.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ts = termStats(cached)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    new DfIndex(cached, ts, collStats(cached, field))
  }
}

/** Query-side view of an index: postings point-lookups plus stats. */
trait SearchIndex {
  /** Warm the stat cache for a batch of (term, field) pairs in one pass
    * (default: no-op; ParquetIndex overrides with a single pruned scan so
    * an n-term query costs one stats job, not n).
    */
  def prefetchStats(pairs: Seq[(String, String)]): Unit = ()

  /** Postings of (term, field): columns docId:long, tf:int, dl:int,
    * positions:array<int>. A missing term yields an empty frame, not an
    * error (reference: yairs/model/InvertedList.scala:156-159).
    */
  def postings(term: String, field: String): DataFrame

  /** (df, cf) of a (term, field); (0, 0) when absent. */
  def termStat(term: String, field: String): (Long, Long)

  /** Collection stats of the scoring (default) field. */
  def collStats: CollStats
}

/** SearchIndex over in-memory cached DataFrames. */
class DfIndex(val postingsDf: DataFrame, val termStatsDf: DataFrame,
              val collStats: CollStats) extends SearchIndex {
  private val statCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), (Long, Long)]

  /** One stats job for the whole query's leaf set (instead of one collect
    * per leaf — an SDM query references each term ~3×).
    */
  override def prefetchStats(pairs: Seq[(String, String)]): Unit = {
    val missing = pairs.distinct.filterNot(statCache.contains)
    if (missing.isEmpty) return
    val cond = missing.map { case (t, f) =>
      col("term") === t && col("field") === f }.reduce(_ || _)
    val found = termStatsDf.filter(cond)
      .select("term", "field", "df", "cf").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    missing.foreach(p => statCache.put(p, found.getOrElse(p, (0L, 0L))))
  }

  def postings(term: String, field: String): DataFrame =
    postingsDf.filter(col("term") === term && col("field") === field)
      .select("docId", "tf", "dl", "positions")

  def termStat(term: String, field: String): (Long, Long) =
    statCache.getOrElseUpdate((term, field), {
      val rows = termStatsDf
        .filter(col("term") === term && col("field") === field)
        .select("df", "cf").collect()
      if (rows.isEmpty) (0L, 0L) else (rows(0).getLong(0), rows(0).getLong(1))
    })
}
