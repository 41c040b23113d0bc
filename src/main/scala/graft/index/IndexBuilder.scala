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
