package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.corpus.SyntheticCorpus
import graft.index.{BuildConf, IndexStore}
import graft.model.Page
import graft.query._
import graft.streaming.StreamingIndexer

/** Structured-Streaming ingestion: per-batch committed slices, idempotent
  * replay, seal → queryable store equivalent to the batch build.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val NumDocs = 240L
  val conf = BuildConf(numSlices = 2, numBuckets = 4,
    termBuckets = 16, shufflePartitions = 4)

  lazy val outDir: String = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val source = MemoryStream[Page]
    val q = StreamingIndexer.ingest(source.toDF(), dir, conf)
    // three micro-batches of 80 pages each
    (0 until 3).foreach { b =>
      source.addData((b * 80L until (b + 1) * 80L).map(SyntheticCorpus.page))
      q.processAllAvailable()
    }
    q.stop()
    StreamingIndexer.seal(spark, dir, conf)
    dir
  }

  lazy val batchDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-batchref").toString
    IndexStore.build(SyntheticCorpus.pages(spark, NumDocs, 4).toDF(), dir, conf)
    dir
  }

  test("each micro-batch commits a slice + docmap shard with counters") {
    outDir
    (0 until 3).foreach { b =>
      val m = IndexStore.readManifest(outDir, s"minisegs-batch-$b")
      assert(m.isDefined, s"batch $b manifest")
      assert(m.get.contains("\"docs\"") && m.get.contains("\"docIdBase\""))
    }
  }

  test("sealed streaming store has identical stats to the batch build") {
    val sIdx = IndexStore.open(spark, outDir, 16)
    val bIdx = IndexStore.open(spark, batchDir, 16)
    assert(sIdx.collStats == bIdx.collStats)
    Seq("obama", "w0", "w123").foreach { t =>
      assert(sIdx.termStat(t, "default") == bIdx.termStat(t, "default"), t)
    }
  }

  test("query over sealed streaming store matches batch build (by url)") {
    val sIdx = IndexStore.open(spark, outDir, 16)
    val bIdx = IndexStore.open(spark, batchDir, 16)
    val parser = new QueryParser(defaultOp = QOp.SUM)
    def topUrls(dir: String, idx: graft.index.ParquetIndex): Seq[(String, Long)] = {
      val e = new Engine(idx, BM25())
      val hits = e.search("obama family tree", 10, parser)
        .select(col("docId")).collect().map(_.getLong(0))
      val urls = spark.read.parquet(s"$dir/docstats")
        .filter(col("docId").isin(hits.toSeq: _*))
        .select("docId", "url").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      hits.map(d => (urls(d), 0L)).toSeq
    }
    // docIds differ (arrival order vs url order) but the retrieved DOCUMENT
    // set must match; scores are docId-independent so the multiset of
    // retrieved urls is identical (ties may reorder within equal scores)
    assert(topUrls(outDir, sIdx).map(_._1).toSet ==
      topUrls(batchDir, bIdx).map(_._1).toSet)
  }

  test("replayed batch is skipped (idempotent recovery)") {
    outDir
    val before = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$outDir/_manifests/minisegs-batch-1.json"))
    import spark.implicits._
    // simulate checkpoint replay of batch 1 with the same data
    val replay = (80L until 160L).map(SyntheticCorpus.page).toDF()
    StreamingIndexer.processBatch(replay, 1L, outDir, conf)
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$outDir/_manifests/minisegs-batch-1.json")) == before)
    // high-water mark unchanged: no docIds leaked
    val hwm = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/_manifests/docid-hwm")).trim.toLong
    assert(hwm == spark.read.parquet(s"$outDir/docmap").count())
  }
}
