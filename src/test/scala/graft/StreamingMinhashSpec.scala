package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Dedup
import graft.streaming.StreamingMinhash
import graft.streaming.StreamingMinhash.{Doc, Pair}

/** Streaming MinHash near-dup detection == batch `Dedup.minhashLsh` on
  * the same corpus, regardless of arrival order or micro-batch split;
  * re-delivery is idempotent; state is bounded by `bands` rows per
  * ingested signature.
  */
class StreamingMinhashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val W = 3; val NumHashes = 32; val Bands = 8; val Threshold = 0.3

  /** Small real-text corpus with planted exact + near duplicates (the
    * raw synthetic table has no dups), same planting as OpsSpec.
    */
  lazy val corpus: Seq[Doc] = {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 40)
    val exactDup = base.filter(col("doc_id") < 5)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val nearDup = base.filter(col("doc_id") >= 5 && col("doc_id") < 10)
      .select((col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" tail extra token")).as("text"))
    base.union(exactDup).union(nearDup).collect()
      .map(r => Doc(r.getLong(0), r.getString(1))).toSeq
  }

  def batchPairs: Set[(Long, Long, Double)] = {
    import spark.implicits._
    val df = spark.createDataset(corpus).toDF("doc_id", "text")
    Dedup.minhashLsh(df, W, NumHashes, Bands, Threshold).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  def runStream(batches: Seq[Seq[Doc]], name: String): Set[(Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Doc]
    val q = StreamingMinhash.nearDupPairs(
        source.toDS(), W, NumHashes, Bands, Threshold)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => source.addData(b); q.processAllAvailable() }
      // state bound: exactly `bands` rows per distinct ingested doc
      val nDocs = batches.flatten.map(_.doc_id).distinct.size
      val stateRows = q.lastProgress.stateOperators.asScala
        .map(_.numRowsTotal).sum
      assert(stateRows <= Bands.toLong * nDocs,
        s"state $stateRows exceeds bands*docs = ${Bands * nDocs}")
      spark.table(name).as[Pair].collect()
        .map(p => (p.id_a, p.id_b, p.est_jaccard)).toSet
    } finally q.stop()
  }

  implicit class ArrOps[T](a: Array[T]) { def asScala: Seq[T] = a.toSeq }

  test("local signature kernel == batch minhashSignatures per doc") {
    import spark.implicits._
    val df = spark.createDataset(corpus).toDF("doc_id", "text")
    val batch = Dedup.minhashSignatures(df, W, NumHashes).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    corpus.foreach { d =>
      assert(Dedup.minhashSigLocal(d.text, W, NumHashes).toSeq == batch(d.doc_id),
        s"signature drift for doc ${d.doc_id}")
    }
  }

  test("streaming pairs across micro-batches == batch minhashLsh") {
    val thirds = corpus.grouped((corpus.size + 2) / 3).toSeq
    val got = runStream(thirds, "smh_ordered")
    assert(got == batchPairs, s"streaming $got vs batch $batchPairs")
    // the planted near-dup pairs are actually present (non-vacuous)
    assert(got.exists { case (a, b, _) => b - a == 20000L })
    assert(got.exists { case (a, b, e) => b - a == 10000L && e == 1.0 })
  }

  test("arrival order does not change the emitted pair set") {
    val rng = new scala.util.Random(7)
    val shuffled = rng.shuffle(corpus)
    val got = runStream(shuffled.grouped((corpus.size + 3) / 4).toSeq,
      "smh_shuffled")
    assert(got == batchPairs)
  }

  test("re-delivery of an ingested batch emits nothing new (idempotent)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val halves = corpus.grouped((corpus.size + 1) / 2).toSeq
    val source = MemoryStream[Doc]
    val q = StreamingMinhash.nearDupPairs(
        source.toDS(), W, NumHashes, Bands, Threshold)
      .writeStream.format("memory").queryName("smh_replay")
      .outputMode("append").start()
    try {
      halves.foreach { b => source.addData(b); q.processAllAvailable() }
      val after = spark.table("smh_replay").count()
      source.addData(halves.head) // checkpoint-replay simulation
      q.processAllAvailable()
      assert(spark.table("smh_replay").count() == after, "replay emitted rows")
      val all = spark.table("smh_replay").as[Pair].collect()
      assert(all.length == all.map(p => (p.id_a, p.id_b)).distinct.length,
        "a pair was emitted more than once")
      assert(all.map(p => (p.id_a, p.id_b, p.est_jaccard)).toSet == batchPairs)
    } finally q.stop()
  }
}
