package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Dedup

/** Streaming MinHash near-duplicate detection — the ingest-time twin of
  * `graft.ops.Dedup.minhashLsh` (beyond-brief pipeline op; the reference
  * has no streaming surface): as documents arrive, every near-duplicate
  * pair (estimated Jaccard ≥ threshold) between the new document and any
  * previously ingested one is emitted, across micro-batch boundaries.
  * After ingesting a corpus in any arrival order, the emitted set equals
  * the batch `minhashLsh` pairs exactly (StreamingMinhashSpec).
  *
  * Shape: each document fans out to its `bands` LSH band buckets; state
  * keys by (band, bucket slice) and holds the (doc_id, signature) list of
  * that bucket — so TOTAL state is exactly `bands` rows per ingested
  * signature (bounded by signature count, sharded by bucket key across
  * executors), and candidate comparison only ever touches same-bucket
  * signatures, never the corpus.
  *
  * Exactly-once pair emission WITHOUT a second stateful dedup stage: a
  * colliding pair would surface in every band whose slices match, so the
  * bucket that owns the emission is the FIRST band where the two
  * signatures collide — recomputable locally from the two signatures,
  * which the state already holds. Re-delivery of an already-ingested
  * doc_id is idempotent (its signature is already in state; it is not
  * appended or re-paired).
  */
object StreamingMinhash {

  case class Doc(doc_id: Long, text: String)
  case class Pair(id_a: Long, id_b: Long, est_jaccard: Double)

  /** Near-duplicate pairs of the stream so far. Parameters and semantics
    * match `Dedup.minhashLsh(docs, w, numHashes, bands, threshold)`:
    * estimate = matching signature positions / numHashes, rounded to 6
    * decimals BEFORE the threshold test (the batch op filters on the
    * rounded column), id_a < id_b.
    */
  def nearDupPairs(docs: Dataset[Doc], w: Int = 3, numHashes: Int = 32,
                   bands: Int = 8,
                   threshold: Double = 0.5): Dataset[Pair] = {
    val rows = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._

    def bandSlice(sig: Seq[Long], b: Int): Seq[Long] =
      sig.slice(b * rows, (b + 1) * rows)

    docs
      .flatMap { d =>
        val sig = Dedup.minhashSigLocal(d.text, w, numHashes).toSeq
        (0 until bands).map(b => (b, bandSlice(sig, b), d.doc_id, sig))
      }
      .groupByKey { case (b, bucket, _, _) => (b, bucket) }
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Seq[Long]),
         it: Iterator[(Int, Seq[Long], Long, Seq[Long])],
         state: GroupState[Vector[(Long, Seq[Long])]]) =>
          val band = key._1
          val out = Vector.newBuilder[Pair]
          // doc_id order within the batch group: emission becomes
          // arrival-order-invariant (the pair fires when its second
          // member arrives, whichever that is)
          val arrivals = it.map(t => (t._3, t._4)).toVector
            .sortBy(_._1).distinctBy(_._1)
          var seen = state.getOption.getOrElse(Vector.empty)
          arrivals.foreach { case (id, sig) =>
            if (!seen.exists(_._1 == id)) {
              seen.foreach { case (pid, psig) =>
                // this bucket owns the pair iff no earlier band collides
                val firstBand = (0 until bands).find(b2 =>
                  bandSlice(sig, b2) == bandSlice(psig, b2))
                if (firstBand.contains(band)) {
                  val matches = sig.iterator.zip(psig.iterator)
                    .count { case (x, y) => x == y }
                  val est = BigDecimal(matches.toDouble / numHashes)
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                  if (est >= threshold)
                    out += Pair(math.min(id, pid), math.max(id, pid), est)
                }
              }
              seen :+= ((id, sig))
            }
          }
          state.update(seen)
          out.result().iterator
      }
  }
}
