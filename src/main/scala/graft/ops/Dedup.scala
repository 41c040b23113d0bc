package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.corpus.SyntheticCorpus.mix

/** Deduplication operators for training-data pipelines. Every variant is
  * built on shuffle patterns that survive 100 TB:
  *
  *  - exact: one groupBy on a content hash (map-side partial agg).
  *  - n-gram Jaccard: inverted shingle join (pairs only materialize for
  *    docs sharing a shingle — never a cross join), with a df-cap on
  *    shingles so stop-shingles cannot quadratically explode a reducer
  *    (the same head-skew defense as the index salting).
  *  - MinHash/LSH: fixed-width signatures then a band-bucket join — the
  *    candidate set is linear in collisions, not quadratic in corpus.
  *  - SimHash: 64-bit signature, banded by 16-bit quarters for Hamming ≤ 3
  *    candidate generation.
  *  - embedding cosine: bucketed by random-hyperplane LSH before pairing.
  */
object Dedup {

  private def toksCol: Column = TextAnalysis.tokensCol(col("text"))

  /** Exact duplicate groups by md5(text): one row per duplicated content
    * hash with the kept (minimum) doc_id and group size.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))

  /** Distinct w-token shingles per doc (the base of Jaccard and MinHash). */
  def shingles(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), toksCol.as("toks"))
      .select(col("doc_id"),
        explode(when(size(col("toks")) < w,
          array(concat_ws(" ", col("toks"))))
          .otherwise(array_distinct(transform(
            sequence(lit(0), size(col("toks")) - w),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(w))))))).as("shingle"))

  /** Near-duplicate pairs by exact n-gram Jaccard ≥ threshold.
    * Inverted join on shingle → per-pair intersection counts → sizes
    * joined in → Jaccard. `maxShingleDf` drops ubiquitous shingles before
    * pairing (skew defense; at web scale a header boilerplate shingle
    * would otherwise pair everything with everything).
    */
  def ngramJaccard(docs: DataFrame, w: Int = 3, threshold: Double = 0.8,
                   maxShingleDf: Long = 1000000L): DataFrame = {
    val sh = shingles(docs, w)
    val capped = sh.withColumn("sdf",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("shingle")))
      .filter(col("sdf") <= maxShingleDf).drop("sdf")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = capped.as("a").join(capped.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Deterministic 64-bit hash of a string (shared by MinHash/SimHash and
    * their tests; NOT Spark's xxhash64 — this one is pinned by our code so
    * signatures are stable across engines and releases).
    */
  def hash64(s: String, seed: Long): Long = {
    var h = seed ^ 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) { h = mix(h ^ s.charAt(i).toLong); i += 1 }
    h
  }

  /** MinHash signatures: sig(i) = min over shingles of mix(hash ^ seed_i).
    * Computed per-doc in one pass over the shingle set (UDF over the
    * collected shingle array — arrays are per-doc bounded).
    */
  def minhashSignatures(docs: DataFrame, w: Int = 3,
                        numHashes: Int = 32): DataFrame = {
    val sigUdf = udf { (shs: Seq[String]) =>
      val base = shs.map(s => hash64(s, 0L)).toArray
      Array.tabulate(numHashes) { i =>
        val seed = mix(i.toLong + 1)
        var m = Long.MaxValue
        var j = 0
        while (j < base.length) {
          val v = mix(base(j) ^ seed)
          if (v < m) m = v
          j += 1
        }
        m
      }
    }
    shingles(docs, w).groupBy("doc_id")
      .agg(collect_list("shingle").as("shs"))
      .select(col("doc_id"), sigUdf(col("shs")).as("sig"))
  }

  /** MinHash+LSH candidate pairs: signatures banded (rows = numHashes /
    * bands per band); docs sharing any band bucket become candidates; the
    * estimated Jaccard = fraction of matching signature positions.
    * Candidates with estimate ≥ threshold survive.
    */
  def minhashLsh(docs: DataFrame, w: Int = 3, numHashes: Int = 32,
                 bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSignatures(docs, w, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * lit(rows) + 1, lit(rows)))))
      .select(col("doc_id"), col("pos").as("band"),
        col("col").cast("string").as("bucket"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val est = udf { (s1: Seq[Long], s2: Seq[Long]) =>
      s1.zip(s2).count { case (x, y) => x == y }.toDouble / s1.length
    }
    cand
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard", round(est(col("sig_a"), col("sig_b")), 6))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 64-bit SimHash over tf-weighted token hashes. */
  def simhash(docs: DataFrame): DataFrame = {
    val simUdf = udf { (toks: Seq[String]) =>
      val acc = new Array[Long](64)
      toks.foreach { t =>
        val h = hash64(t, 7L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    docs.select(col("doc_id"), toksCol.as("toks"))
      .select(col("doc_id"), simUdf(col("toks")).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, candidates
    * via 16-bit quarter bands (any pair within Hamming 3 shares a quarter).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sh.select(col("doc_id"), col("simhash"), posexplode(
      expr("transform(sequence(0, 3), q -> (simhash >> (q * 16)) & 65535)")))
      .select(col("doc_id"), col("simhash"), col("pos").as("band"), col("col").as("bucket"))
    val ham = udf { (a: Long, b: Long) => java.lang.Long.bitCount(a ^ b) }
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        ham(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
