package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context packing — the step that turns a cleaned corpus into
  * fixed-size training windows: documents are concatenated in a
  * deterministic order and chunked at exactly `tokensPerBin` tokens
  * (documents may span a boundary, the standard pretraining layout).
  * Each doc is assigned the bin where its FIRST token lands plus its
  * token offset inside that bin, so a writer can materialize windows
  * by grouping on (shard, bin).
  *
  * Packing is sequential by nature; it scales by being sequential only
  * WITHIN a shard (here: the `source` column) — the cumulative sum is a
  * window function partitioned by shard, so shards pack in parallel and
  * a 100 TB corpus with enough shards never funnels through one task.
  */
object Packing {

  /** @return (doc_id, shard, n_tokens, bin, offset) — bin/offset of the
    * doc's first token under per-shard concatenation in doc_id order.
    */
  def packContexts(docs: DataFrame, tokensPerBin: Int,
                   shardCol: String = "source"): DataFrame = {
    // exact token count must match the tokenizer: lower, split on
    // non-[a-z0-9] runs, drop empty strings
    val nTokens = size(filter(
      split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col(shardCol).as("shard"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("start", col("cum") - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("start") / tokensPerBin).cast("long").as("bin"),
        (col("start") % tokensPerBin).as("offset"))
  }
}
