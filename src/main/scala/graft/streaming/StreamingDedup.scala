package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the ingest-time twin of
  * `graft.ops.Dedup.exact` (reference has no streaming surface; this is
  * part of the beyond-brief training-data pipeline): an incoming crawl
  * passes through a first-seen filter keyed by content hash, so each
  * distinct content is admitted exactly once no matter how many times or
  * in how many micro-batches it re-arrives.
  *
  * State is one entry per distinct hash — the inherent cost of GLOBAL
  * streaming dedup. It shuffles by hash (`groupByKey`), so state shards
  * across executors and scales horizontally; deployments with re-crawl
  * windows can bound it further by TTL-ing state, which trades
  * exactness for a bounded store.
  */
object StreamingDedup {

  case class Doc(doc_id: Long, text: String)
  case class Keep(content_hash: String, keep_id: Long)

  /** Lowercase-hex MD5, identical to Spark SQL's `md5()` so streaming
    * output joins/compares directly against the batch `Dedup.exact`
    * `content_hash` column.
    */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Emits exactly one `Keep` row per distinct content: the minimum
    * doc_id within the micro-batch where the content first arrives;
    * every later duplicate (same batch or any later one) is suppressed.
    * When arrival order follows doc_id (an ingest log), the kept set
    * equals batch `Dedup.exact`'s min-doc_id keeps exactly.
    */
  def firstSeen(docs: Dataset[Doc]): Dataset[Keep] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // hash map-side and shuffle only (hash, doc_id): the state shuffle
    // must move a few bytes of metadata per row, not the document text it
    // would immediately discard (guide: shuffle keys and metadata instead
    // of payloads) — at crawl scale the text column IS the corpus
    docs.map(d => (md5Hex(d.text), d.doc_id))
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: String, it: Iterator[(String, Long)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val keep = it.map(_._2).min
            state.update(keep)
            Iterator(Keep(hash, keep))
          }
      }
  }
}
