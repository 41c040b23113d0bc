package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Persistent index layout + staged, resumable build.
  *
  * Layout (Parquet tables in an Iceberg-style directory scheme — no Iceberg
  * runtime jar ships in this sandbox, so snapshot/lineage is our own
  * `_manifests/` JSON protocol behind this seam; see SURVEY.md §7):
  *
  *   out/
  *     docmap/                  (url, docId)  — dense docIds by url order
  *     postings/slice=i/        (term, field, docId, tf, dl, positions)
  *     termstats/               (term, field, df, cf)
  *     segments/field=f/tb=h/   (term, bucket, df, cf, n, firstDocId,
  *                               lastDocId, blob, blockFirst, blockOff,
  *                               blockMaxTf, blockMinDl)
  *     docstats/                (docId, url, len_default, len_title, …)
  *     collstats.json           per-field collection stats
  *     _manifests/<stage>.json  committed stages with counters
  *
  * Resume: every stage (and every postings slice) commits a manifest entry
  * AFTER its output is fully written; `build` skips committed work, so an
  * interrupted build restarts without recomputing finished slices and the
  * final index is identical (deterministic input + deterministic stages).
  *
  * Scale levers (north rule): postings never exist as token-level rows
  * (per-doc local aggregation in one flatMap); heavy terms (df >
  * heavyTermDf) are salted into docId-range buckets so no single segment
  * row exceeds ~rangeSize postings — head-term skew (Zipf) cannot create a
  * straggler reducer, and range bucketing keeps concatenated buckets
  * docId-sorted for free. Point lookups prune on (field, tb) partition
  * directories, tb = xxhash64(term) mod termBuckets.
  */
case class BuildConf(
    numSlices: Int = 8,
    heavyTermDf: Long = 100000L,
    numBuckets: Int = 32,
    termBuckets: Int = 64,
    langFilter: Option[String] = Some("en"),
    shufflePartitions: Int = 32)

object IndexStore {

  // ------------------------------------------------------------- manifests

  private def manifestDir(out: String) = s"$out/_manifests"

  def isCommitted(out: String, stage: String): Boolean =
    Files.exists(Paths.get(manifestDir(out), s"$stage.json"))

  def commit(out: String, stage: String, counters: Map[String, Long]): Unit = {
    Files.createDirectories(Paths.get(manifestDir(out)))
    val json = counters.map { case (k, v) => s""""$k": $v""" }
      .mkString("{", ", ", s""", "stage": "$stage", "committedAtMs": ${System.currentTimeMillis()}}""")
    val tmp = Paths.get(manifestDir(out), s".$stage.json.tmp")
    Files.writeString(tmp, json)
    // rename = atomic commit point
    Files.move(tmp, Paths.get(manifestDir(out), s"$stage.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  def readManifest(out: String, stage: String): Option[String] = {
    val p = Paths.get(manifestDir(out), s"$stage.json")
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  // ---------------------------------------------------------------- stages

  /** Dense docId assignment by global url order without a single-partition
    * sort: range-repartition by url, sort within partitions, then add
    * per-partition offsets (partition counts collected to the driver —
    * one long per partition).
    */
  def assignDocIds(pages: DataFrame, partitions: Int,
                   offset: Long = 0L): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    // cache the url projection: repartitionByRange samples its input, so
    // an uncached plan would scan (or regenerate) the corpus twice
    val urls = pages.select("url")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = urls.repartitionByRange(partitions, col("url"))
      .sortWithinPartitions("url")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.select(org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      .groupBy("pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](partitions)
    var acc = offset
    (0 until partitions).foreach { p =>
      offsets(p) = acc; acc += counts.getOrElse(p, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val withIds = sorted.as[String].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.get().partitionId()
      var i = bc.value(pid)
      it.map { url => val r = (url, i); i += 1; r }
    }.toDF("url", "docId")
    withIds
  }

  /** Pages (+docId) → per-field FieldDocs. Fields mirror the reference
    * layout (default/title/body/url — yairs/io/FileUtils.scala:38-49);
    * `default` is the full extracted text.
    */
  def fieldDocs(pagesWithId: DataFrame): Dataset[FieldDoc] = {
    val spark = pagesWithId.sparkSession
    import spark.implicits._
    pagesWithId.select(col("docId"), col("text"), col("url"))
      .as[(Long, String, String)]
      .flatMap { case (id, text, url) =>
        val nl = text.indexOf('\n')
        val (title, body) =
          if (nl >= 0) (text.substring(0, nl), text.substring(nl + 1))
          else (text, "")
        Seq(
          FieldDoc(id, "default", text),
          FieldDoc(id, "title", title),
          FieldDoc(id, "body", body),
          FieldDoc(id, "url", url))
      }
  }

  /** Full build. Each stage is skipped when already committed. */
  def build(pages: DataFrame, out: String,
            conf: BuildConf = BuildConf()): Unit = {
    val spark = pages.sparkSession
    Files.createDirectories(Paths.get(out))
    val tStart = System.nanoTime()
    var tLast = tStart
    def mark(stage: String): Unit = {
      val now = System.nanoTime()
      if (sys.env.contains("GRAFT_BUILD_TIMING"))
        println(f"[build] $stage%-24s ${(now - tLast) / 1e9}%7.2fs  (total ${(now - tStart) / 1e9}%7.2fs)")
      tLast = now
    }

    val filtered = conf.langFilter
      .map(l => pages.filter(col("lang") === l)).getOrElse(pages)

    // stage 0: docmap ----------------------------------------------------
    if (!isCommitted(out, "docmap")) {
      val ids = assignDocIds(filtered, conf.shufflePartitions)
      ids.write.mode(SaveMode.Overwrite).parquet(s"$out/docmap")
      val n = spark.read.parquet(s"$out/docmap").count()
      commit(out, "docmap", Map("docs" -> n))
    }
    mark("docmap")
    val docmap = spark.read.parquet(s"$out/docmap")

    // stage 1: postings, one resumable slice at a time -------------------
    val sliceExpr = pmod(xxhash64(col("url")), lit(conf.numSlices))
    (0 until conf.numSlices).foreach { i =>
      val stage = s"postings-slice-$i"
      if (!isCommitted(out, stage)) {
        val slicePages = filtered.filter(sliceExpr === i)
          .join(docmap, "url")
        // counters ride the write itself (Observation = zero extra pass)
        val obs = org.apache.spark.sql.Observation(s"slice-$i")
        IndexBuilder.buildPostingsEncoded(fieldDocs(slicePages))
          .observe(obs,
            count(lit(1)).as("postings"),
            sum(col("tf")).cast("long").as("tokens"),
            approx_count_distinct(col("docId")).as("docsApprox"))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$out/postings/slice=$i")
        val m = obs.get
        commit(out, stage, Map(
          "postings" -> m("postings").asInstanceOf[Long],
          "tokens" -> m("tokens").asInstanceOf[Long],
          "docsApprox" -> m("docsApprox").asInstanceOf[Long]))
      }
      mark(stage)
    }
    derivedStages(spark, out, conf, mark)
  }

  /** Stages 2-4 (termstats, segments, docstats, collstats) over whatever
    * postings slices exist — shared by the batch build and the streaming
    * indexer's seal. Each stage still commits/skips via the manifest.
    */
  def derivedStages(spark: SparkSession, out: String, conf: BuildConf,
                    mark: String => Unit = _ => ()): Unit = {
    val postings = spark.read.parquet(s"$out/postings")
    val docmap = spark.read.parquet(s"$out/docmap").select("url", "docId")

    // stage 2: termstats (partitioned by tb so point lookups prune) -------
    if (!isCommitted(out, "termstats")) {
      IndexBuilder.termStats(postings)
        .withColumn("tb", pmod(xxhash64(col("term")), lit(conf.termBuckets)))
        .repartition(col("tb"))
        .write.mode(SaveMode.Overwrite).partitionBy("tb")
        .parquet(s"$out/termstats")
      commit(out, "termstats",
        Map("terms" -> spark.read.parquet(s"$out/termstats").count()))
    }
    mark("termstats")
    val termstats = spark.read.parquet(s"$out/termstats")

    // stage 3: segments (delta+VByte, salted for heavy terms) -------------
    if (!isCommitted(out, "segments")) {
      val totalDocs = docmap.count()
      val rangeSize = math.max(1L, (totalDocs + conf.numBuckets - 1) / conf.numBuckets)
      // heavy (term, field) pairs are few (vocab head) — fold them into a
      // codegen'd InSet test; no typed deserialization on the 10⁸-row path
      val heavyKeys = termstats.filter(col("df") > conf.heavyTermDf)
        .select("term", "field").collect()
        .map(r => r.getString(0) + "\u0000" + r.getString(1)).toSeq
      val bucketCol =
        if (heavyKeys.isEmpty) lit(-1)
        else when(concat_ws("\u0000", col("term"), col("field"))
          .isin(heavyKeys: _*),
          (col("docId") / rangeSize).cast("int")).otherwise(lit(-1))

      import spark.implicits._
      val segRows = postings
        .withColumn("bucket", bucketCol)
        .repartition(conf.shufflePartitions, col("term"), col("field"), col("bucket"))
        .sortWithinPartitions("term", "field", "bucket", "docId")
        .select("term", "field", "bucket", "docId", "tf", "dl", "rec")
        .as[(String, String, Int, Long, Int, Int, Array[Byte])]
        .mapPartitions { (it: Iterator[(String, String, Int, Long, Int, Int, Array[Byte])]) =>
          // streaming run-length grouping over the partition-sorted stream;
          // positions arrive pre-encoded (rec) — pure byte concatenation
          new Iterator[SegmentRow] {
            private val in = it.buffered
            def hasNext: Boolean = in.hasNext
            def next(): SegmentRow = {
              val (term, field, bucket, _, _, _, _) = in.head
              val enc = new Codec.SegmentEncoder
              while (in.hasNext && {
                val h = in.head
                h._1 == term && h._2 == field && h._3 == bucket
              }) {
                val (_, _, _, docId, tf, dl, rec) = in.next()
                enc.add(docId, tf, dl, rec)
              }
              val seg = enc.finish()
              SegmentRow(term, field, bucket, seg.n, seg.firstDocId,
                seg.lastDocId, seg.cf, seg.blob, seg.blockFirst,
                seg.blockOff, seg.blockMaxTf, seg.blockMinDl)
            }
          }
        }.toDF()

      // second (cheap) shuffle moves ENCODED rows so each (field, tb)
      // directory is written by exactly one task — a direct partitionBy
      // write from the encode tasks would open |field|x|tb| writers per
      // task and shatter the store into thousands of tiny files
      val obs = org.apache.spark.sql.Observation("segments")
      segRows
        .withColumn("tb", pmod(xxhash64(col("term")), lit(conf.termBuckets)))
        .repartition(col("field"), col("tb"))
        .observe(obs,
          count(lit(1)).as("segments"),
          sum(length(col("blob"))).cast("long").as("bytes"),
          sum(col("n")).cast("long").as("postings"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("field", "tb")
        .parquet(s"$out/segments")
      val m = obs.get
      commit(out, "segments", Map(
        "segments" -> m("segments").asInstanceOf[Long],
        "bytes" -> m("bytes").asInstanceOf[Long],
        "postings" -> m("postings").asInstanceOf[Long],
        "rangeSize" -> rangeSize, "heavyTerms" -> heavyKeys.size.toLong))
    }
    mark("segments")

    // stage 4: docstats + collstats ---------------------------------------
    if (!isCommitted(out, "docstats")) {
      val lens = postings.groupBy("docId").agg(
          max(when(col("field") === "default", col("dl"))).as("len_default"),
          max(when(col("field") === "title", col("dl"))).as("len_title"),
          max(when(col("field") === "body", col("dl"))).as("len_body"),
          max(when(col("field") === "url", col("dl"))).as("len_url"))
        .na.fill(0)
      lens.join(docmap, "docId")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/docstats")
      commit(out, "docstats",
        Map("docs" -> spark.read.parquet(s"$out/docstats").count()))
    }
    mark("docstats")

    if (!isCommitted(out, "collstats")) {
      // derived from the already-built small tables — no postings rescan
      val ds = spark.read.parquet(s"$out/docstats")
      val docCounts = Seq("default", "title", "body", "url").map { f =>
        f -> ds.filter(col(s"len_$f") > 0).count()
      }.toMap
      val perField = termstats.groupBy("field").agg(
        count(lit(1)).as("vocabSize"),
        sum("cf").cast("long").as("wordCount"))
      val rows = perField.collect().map { r =>
        val field = r.getString(0)
        val dc = docCounts(field)
        val vocab = r.getLong(1)
        val wc = r.getLong(2)
        s"""  "$field": {"docCount": $dc, "vocabSize": $vocab, "wordCount": $wc, "avgDocLen": ${if (dc == 0) 0.0 else wc.toDouble / dc}}"""
      }
      Files.writeString(Paths.get(out, "collstats.json"),
        rows.mkString("{\n", ",\n", "\n}"))
      commit(out, "collstats", Map("fields" -> rows.length.toLong))
    }
    mark("collstats")
  }

  // ----------------------------------------------------------------- reader

  def open(spark: SparkSession, dir: String,
           termBuckets: Int = 64): ParquetIndex =
    new ParquetIndex(spark, dir, termBuckets)
}

/** One encoded posting segment of a (term, field, bucket). */
case class SegmentRow(term: String, field: String, bucket: Int, n: Int,
                      firstDocId: Long, lastDocId: Long, segCf: Long,
                      blob: Array[Byte], blockFirst: Array[Long],
                      blockOff: Array[Int], blockMaxTf: Array[Int],
                      blockMinDl: Array[Int])

/** SearchIndex over the persistent store: point lookups prune on
  * (field, tb) directories, then decode segment blobs to posting rows.
  */
class ParquetIndex(spark: SparkSession, dir: String, termBuckets: Int)
    extends SearchIndex {

  private lazy val termstatsDf = spark.read.parquet(s"$dir/termstats")
  /** Stores written before the tb partition column existed stay readable. */
  private lazy val termstatsHasTb = termstatsDf.columns.contains("tb")
  lazy val segmentsDf: DataFrame = spark.read.parquet(s"$dir/segments")

  private val statCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), (Long, Long)]

  lazy val collStats: CollStats = {
    val json = Files.readString(Paths.get(dir, "collstats.json"))
    // tiny fixed-shape JSON; parse the "default" object fields
    def field(name: String, obj: String): String = {
      val m = (s""""$name":\\s*([-0-9.eE]+)""").r.findFirstMatchIn(obj)
      m.map(_.group(1)).getOrElse("0")
    }
    val defObj = ("\"default\":\\s*\\{([^}]*)}").r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
    CollStats(
      docCount = field("docCount", defObj).toDouble.toLong,
      avgDocLen = field("avgDocLen", defObj).toDouble,
      vocabSize = field("vocabSize", defObj).toDouble.toLong,
      wordCount = field("wordCount", defObj).toDouble.toLong)
  }

  /** term bucket — the writer's pmod(xxhash64(term), termBuckets),
    * computed by evaluating the SAME Catalyst expression driver-side (no
    * Spark job per lookup).
    */
  def tbOf(term: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Pmod, XxHash64}
    Pmod(XxHash64(Seq(Literal(term)), 42L), Literal(termBuckets.toLong))
      .eval(null).asInstanceOf[Long]
  }

  def segmentsOf(term: String, field: String): DataFrame =
    segmentsDf.filter(col("field") === field && col("tb") === tbOf(term) &&
      col("term") === term)

  def postings(term: String, field: String): DataFrame = {
    import spark.implicits._
    segmentsOf(term, field)
      .select("bucket", "n", "blob").as[(Int, Int, Array[Byte])]
      .flatMap { case (_, n, blob) => Codec.decode(blob, n) }
      .toDF("docId", "tf", "dl", "positions")
  }

  def termStat(term: String, field: String): (Long, Long) =
    statCache.getOrElseUpdate((term, field), {
      val pruned = if (termstatsHasTb)
        termstatsDf.filter(col("tb") === tbOf(term)) else termstatsDf
      val rows = pruned
        .filter(col("term") === term && col("field") === field)
        .select("df", "cf").collect()
      if (rows.isEmpty) (0L, 0L) else (rows(0).getLong(0), rows(0).getLong(1))
    })

  /** One pruned scan resolves every (term, field) of a query. */
  override def prefetchStats(pairs: Seq[(String, String)]): Unit = {
    val missing = pairs.distinct.filterNot(statCache.contains)
    if (missing.isEmpty) return
    val tbs = missing.map(p => tbOf(p._1)).distinct
    val terms = missing.map(_._1).distinct
    val fields = missing.map(_._2).distinct
    val pruned = if (termstatsHasTb)
      termstatsDf.filter(col("tb").isin(tbs: _*)) else termstatsDf
    val rows = pruned
      .filter(col("term").isin(terms: _*) && col("field").isin(fields: _*))
      .select("term", "field", "df", "cf").collect()
    val found = rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3))).toMap
    missing.foreach(p => statCache.put(p, found.getOrElse(p, (0L, 0L))))
  }
}
