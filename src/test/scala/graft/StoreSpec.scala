package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.SyntheticCorpus
import graft.index._
import graft.query._
import java.nio.file.{Files, Paths}

/** Persistent store: build → read-back equivalence with the in-memory
  * index, checkpoint/resume semantics, and manifest counters.
  */
class StoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val NumDocs = 400L
  lazy val outDir: String = {
    val dir = Files.createTempDirectory("graft-store").toString
    val pages = SyntheticCorpus.pages(spark, NumDocs, 8).toDF()
    IndexStore.build(pages, dir,
      BuildConf(numSlices = 4, numBuckets = 4,
        termBuckets = 16, shufflePartitions = 8))
    dir
  }
  lazy val pIndex: ParquetIndex = IndexStore.open(spark, outDir, 16)

  /** In-memory index over the same (lang=en) pages for cross-checking
    * (docmap doubles as the id-carrying corpus copy).
    */
  lazy val memIndex: DfIndex = {
    val docmap = spark.read.parquet(s"$outDir/docmap")
    IndexBuilder.inMemory(
      IndexBuilder.buildPostings(IndexStore.fieldDocs(docmap)))
  }

  test("stats match in-memory build") {
    assert(pIndex.collStats == memIndex.collStats)
    Seq(("w0", "default"), ("obama", "default"), ("w123", "title"),
      ("zzz", "default")).foreach { case (t, f) =>
      assert(pIndex.termStat(t, f) == memIndex.termStat(t, f), s"($t,$f)")
    }
  }

  test("decoded postings match in-memory postings (incl. salted heavy terms)") {
    Seq("w0", "w1", "obama", "w777").foreach { t =>
      val a = pIndex.postings(t, "default")
        .orderBy("docId").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getSeq[Int](3).toList))
      val b = memIndex.postings(t, "default")
        .orderBy("docId").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getSeq[Int](3).toList))
      assert(a.length == b.length, s"term $t: ${a.length} vs ${b.length}")
      a.zip(b).foreach { case (x, y) => assert(x == y, s"term $t") }
    }
  }

  test("heavy terms are salted into multiple segments") {
    val segs = pIndex.segmentsOf("w0", "default").collect()
    assert(segs.length > 1, "w0 should be df-heavy and range-bucketed")
    // buckets are docId ranges: non-overlapping and ordered
    val ranges = segs.map(r => (r.getAs[Long]("firstDocId"),
      r.getAs[Long]("lastDocId"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, l1), (f2, _)) => assert(l1 < f2)
      case _ =>
    }
  }

  test("query over ParquetIndex matches query over in-memory index") {
    val parser = new QueryParser(defaultOp = QOp.SUM)
    val eP = new Engine(pIndex, BM25())
    val eM = new Engine(memIndex, BM25())
    Seq("obama family tree", "w0 w1", "#near/2(obama family)").foreach { q =>
      val a = eP.search(q, 20, parser).collect()
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toList
      val b = eM.search(q, 20, parser).collect()
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toList
      assert(a == b, s"'$q'")
    }
  }

  test("manifests carry counters and all stages commit") {
    val stages = Seq("docmap", "termstats", "segments", "docstats",
      "collstats") ++ (0 until 4).map(i => s"minisegs-slice-$i")
    stages.foreach(s => assert(IndexStore.isCommitted(outDir, s), s))
    val m = IndexStore.readManifest(outDir, "minisegs-slice-0").get
    assert(m.contains("\"postings\"") && m.contains("\"docs\"") &&
      m.contains("\"tokens\""))
    val seg = IndexStore.readManifest(outDir, "segments").get
    assert(seg.contains("\"bytes\"") && seg.contains("\"postings\""))
    // slice doc counters sum to the docmap count (exact, from sentinels)
    val sliceDocs = (0 until 4).map(i =>
      IndexStore.manifestCounter(outDir, s"minisegs-slice-$i", "docs")).sum
    assert(sliceDocs == IndexStore.manifestCounter(outDir, "docmap", "docs"))
  }

  test("resume skips committed slices and reproduces identical output") {
    outDir // force build
    // wipe one slice's manifest + output: rebuild must redo ONLY that work
    val victim = s"$outDir/_manifests/minisegs-slice-2.json"
    val before = Files.getLastModifiedTime(
      Paths.get(s"$outDir/_manifests/minisegs-slice-1.json"))
    val sliceCountBefore = spark.read
      .parquet(s"$outDir/minisegs/slice=2").count()
    Files.delete(Paths.get(victim))
    val pages = SyntheticCorpus.pages(spark, NumDocs, 8).toDF()
    IndexStore.build(pages, outDir,
      BuildConf(numSlices = 4, numBuckets = 4,
        termBuckets = 16, shufflePartitions = 8))
    // untouched slice not recomputed (manifest mtime unchanged)
    assert(Files.getLastModifiedTime(
      Paths.get(s"$outDir/_manifests/minisegs-slice-1.json")) == before)
    // recomputed slice identical (deterministic)
    assert(spark.read.parquet(s"$outDir/minisegs/slice=2").count() ==
      sliceCountBefore)
    assert(IndexStore.isCommitted(outDir, "minisegs-slice-2"))
  }

  test("fused single-slice build produces an identical store") {
    // numSlices = 1 takes the fused path (no minisegs table; doclen
    // sentinels ride into the segments table); every derived table and
    // query result must match the staged build bit-for-bit
    val dir = Files.createTempDirectory("graft-fused").toString
    val pages = SyntheticCorpus.pages(spark, NumDocs, 8).toDF()
    IndexStore.build(pages, dir,
      BuildConf(numSlices = 1, numBuckets = 4,
        termBuckets = 16, shufflePartitions = 8))
    assert(!Files.exists(Paths.get(dir, "minisegs")), "fused build wrote minisegs")
    val fused = IndexStore.open(spark, dir, 16)
    assert(fused.collStats == pIndex.collStats)
    Seq(("w0", "default"), ("obama", "default"), ("w123", "title"),
      ("zzz", "default")).foreach { case (t, f) =>
      assert(fused.termStat(t, f) == pIndex.termStat(t, f), s"($t,$f)")
      val a = fused.postings(t, f).orderBy("docId")
        .collect().map(_.toString).toSeq
      val b = pIndex.postings(t, f).orderBy("docId")
        .collect().map(_.toString).toSeq
      assert(a == b, s"postings diverge for ($t,$f)")
    }
    // sentinel rows never leak into query reads
    assert(fused.segmentsOf("", "default").count() == 0 ||
      fused.postings("w0", "default").filter(col("tf") <= 0).count() == 0)
    val parser = new QueryParser(defaultOp = QOp.SUM)
    val qa = new Engine(fused, BM25()).search("obama family w3", 10, parser)
      .collect().map(_.toString).toSeq
    val qb = new Engine(pIndex, BM25()).search("obama family w3", 10, parser)
      .collect().map(_.toString).toSeq
    assert(qa == qb)
  }

  test("mergeStores of two url-split half stores answers identically to the full build") {
    outDir // force the full build (the comparison target)
    val conf = BuildConf(numSlices = 2, numBuckets = 4,
      termBuckets = 16, shufflePartitions = 8)
    val base = Files.createTempDirectory("graft-merge").toString
    val pages = SyntheticCorpus.pages(spark, NumDocs, 8).toDF()
    // split by url order (all A urls < all B urls): the merged store's
    // dense docId assignment then equals the full build's, so every table
    // must agree with pIndex, not just query results
    val urls = pages.select("url").orderBy("url").collect().map(_.getString(0))
    val median = urls(urls.length / 2)
    IndexStore.build(pages.filter(col("url") < median), s"$base/a", conf)
    IndexStore.build(pages.filter(col("url") >= median), s"$base/b", conf)
    IndexStore.mergeStores(spark, s"$base/a", s"$base/b", s"$base/ab", conf)
    val merged = IndexStore.open(spark, s"$base/ab", 16)

    assert(merged.collStats == pIndex.collStats)
    Seq(("w0", "default"), ("obama", "default"), ("w123", "title"),
      ("zzz", "default")).foreach { case (t, f) =>
      assert(merged.termStat(t, f) == pIndex.termStat(t, f), s"($t,$f)")
    }
    // decoded postings bit-identical, including the rebased B half and
    // position runs (rebaseBlob must not disturb anything but the header)
    Seq("w0", "w1", "obama", "w777").foreach { t =>
      val a = merged.postings(t, "default").orderBy("docId")
        .collect().map(_.toString).toSeq
      val b = pIndex.postings(t, "default").orderBy("docId")
        .collect().map(_.toString).toSeq
      assert(a == b, s"postings diverge for $t")
    }
    val parser = new QueryParser(defaultOp = QOp.SUM)
    Seq("obama family tree", "#near/2(obama family)").foreach { q =>
      val a = new Engine(merged, BM25()).search(q, 20, parser)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toList
      val b = new Engine(pIndex, BM25()).search(q, 20, parser)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toList
      assert(a == b, s"'$q'")
    }
    // WAND over the merged store: exercises the rebased block metadata
    // (blockFirst/blockOff drive decodeBlock skips)
    val wa = graft.query.Wand.bm25TopK(spark, merged,
      Seq("obama", "family", "w3"), "default", 10)
      .orderBy(col("score").desc, col("docId").desc)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toList
    val wb = graft.query.Wand.bm25TopK(spark, pIndex,
      Seq("obama", "family", "w3"), "default", 10)
      .orderBy(col("score").desc, col("docId").desc)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toList
    assert(wa == wb)
    // merged doc count = sum of halves = full build's; re-merge is a no-op
    assert(IndexStore.manifestCounter(s"$base/ab", "docmap", "docs") ==
      IndexStore.manifestCounter(outDir, "docmap", "docs"))
    val mtime = Files.getLastModifiedTime(
      Paths.get(s"$base/ab/_manifests/segments.json"))
    IndexStore.mergeStores(spark, s"$base/a", s"$base/b", s"$base/ab", conf)
    assert(Files.getLastModifiedTime(
      Paths.get(s"$base/ab/_manifests/segments.json")) == mtime)
  }

  test("deleteDocs keeps stable ids and matches a fresh build of the survivors") {
    outDir // force the full build (the delete source)
    val base = Files.createTempDirectory("graft-del").toString
    val fullMap = spark.read.parquet(s"$outDir/docmap").select("url", "docId")
    val delUrls = fullMap.filter(col("docId") % 5 === 2).select("url")
    IndexStore.deleteDocs(spark, outDir, s"$base/del", delUrls,
      BuildConf(termBuckets = 16))
    val del = IndexStore.open(spark, s"$base/del", 16)

    // survivor docIds are STABLE: the deleted store's docmap is exactly
    // the full docmap minus the deleted urls, ids included
    val a = spark.read.parquet(s"$base/del/docmap").select("url", "docId")
      .orderBy("docId").collect().map(_.toString).toSeq
    val b = fullMap.join(delUrls, Seq("url"), "left_anti")
      .orderBy("docId").collect().map(_.toString).toSeq
    assert(a == b)

    // semantic target: a FRESH build over the survivor pages (dense
    // re-assigned ids — compare through each store's own url mapping)
    val pages = SyntheticCorpus.pages(spark, NumDocs, 8).toDF()
    IndexStore.build(pages.join(delUrls, Seq("url"), "left_anti"),
      s"$base/fresh", BuildConf(numSlices = 1, numBuckets = 4,
        termBuckets = 16, shufflePartitions = 8))
    val fresh = IndexStore.open(spark, s"$base/fresh", 16)
    assert(del.collStats == fresh.collStats)
    Seq(("w0", "default"), ("obama", "default"), ("w123", "title"),
      ("zzz", "default")).foreach { case (t, f) =>
      assert(del.termStat(t, f) == fresh.termStat(t, f), s"($t,$f)")
    }
    def byUrl(idx: ParquetIndex, storeDir: String, t: String) =
      idx.postings(t, "default")
        .join(spark.read.parquet(s"$storeDir/docmap").select("url", "docId"),
          "docId")
        .select("url", "tf", "dl", "positions").orderBy("url")
        .collect().map(_.toString).toSeq
    Seq("w0", "w1", "obama", "w777").foreach { t =>
      assert(byUrl(del, s"$base/del", t) == byUrl(fresh, s"$base/fresh", t),
        s"postings diverge for $t")
    }
    val parser = new QueryParser(defaultOp = QOp.SUM)
    def topUrls(idx: ParquetIndex, storeDir: String) =
      new Engine(idx, BM25()).search("obama family w3", 15, parser)
        .join(spark.read.parquet(s"$storeDir/docmap").select("url", "docId"),
          "docId")
        .collect().map(r => (r.getAs[String]("url"),
          math.round(r.getAs[Double]("score") * 1e9)))
        .sortBy(_._1).toList
    assert(topUrls(del, s"$base/del") == topUrls(fresh, s"$base/fresh"))
    // repeat is a manifest no-op
    val mtime = Files.getLastModifiedTime(
      Paths.get(s"$base/del/_manifests/segments.json"))
    IndexStore.deleteDocs(spark, outDir, s"$base/del", delUrls,
      BuildConf(termBuckets = 16))
    assert(Files.getLastModifiedTime(
      Paths.get(s"$base/del/_manifests/segments.json")) == mtime)
  }
}
