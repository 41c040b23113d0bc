package graft

import java.io.FileOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.SyntheticCorpus
import graft.sources.WarcSource

/** The V2 `format("warc")` connector: rows match [[WarcSource.read]],
  * required-column pruning reaches the scan (pruned ReadSchema in the
  * plan; metadata-only scans run the parser's skip-payload path), and
  * the short name resolves through the service registry.
  */
class WarcDataSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val N = 40
  lazy val pages = (0L until N.toLong).map(SyntheticCorpus.page)

  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("warcv2-spec").toString
    for ((slice, name) <- Seq(
           (pages.take(N / 2), "a.warc.gz"), (pages.drop(N / 2), "b.warc.gz"))) {
      val gz = new FileOutputStream(s"$d/$name")
      val gzInfo = new java.util.zip.GZIPOutputStream(gz)
      gzInfo.write(WarcSource.warcinfoRecord()); gzInfo.finish()
      WarcSource.write(slice.iterator, gz, gzip = true, chunkedEvery = 5)
      gz.close()
    }
    d
  }

  test("format(\"warc\") resolves and matches WarcSource.read") {
    val v2 = spark.read.format("warc").load(s"$dir/*.warc.gz")
    assert(v2.schema.fieldNames.toSeq ==
      Seq("url", "warc_ts", "html", "http_status", "mime", "warc_file"))
    val got = v2.collect().map(r =>
      (r.getString(0), r.getTimestamp(1),
       java.util.Arrays.hashCode(r.getAs[Array[Byte]](2)), r.getInt(3))).toSet
    val ref = WarcSource.read(spark, s"$dir/*.warc.gz").collect().map(r =>
      (r.getString(0), r.getTimestamp(1),
       java.util.Arrays.hashCode(r.getAs[Array[Byte]](2)), r.getInt(3))).toSet
    assert(got.size == N)
    assert(got == ref)
  }

  test("column pruning reaches the scan: ReadSchema drops html") {
    val q = spark.read.format("warc").load(s"$dir/*.warc.gz")
      .select("url", "warc_ts")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("url"), plan)
    assert(!plan.contains("html"), plan)
    // and the pruned scan still yields every record with intact metadata
    val rows = q.collect()
    assert(rows.length == N)
    val byUrl = rows.map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    pages.foreach(p => assert(byUrl(p.url) == p.warc_ts, p.url))
  }

  test("metadata-only aggregate over the crawl (the inventory scan shape)") {
    import spark.implicits._
    val n = spark.read.format("warc").load(s"$dir/*.warc.gz")
      .groupBy("warc_file").count().as[(String, Long)].collect().toMap
    assert(n.values.sum == N)
    assert(n.size == 2)
  }

  test("loading a directory path lists its files") {
    val v2 = spark.read.format("warc").load(dir)
    assert(v2.count() == N)
  }

  test("readStream ingests files exactly once as they arrive") {
    val root = java.nio.file.Files.createTempDirectory("warcv2-stream")
    val data = root.resolve("data"); java.nio.file.Files.createDirectory(data)
    def writeFile(name: String, slice: Seq[graft.model.Page]): Unit = {
      val gz = new FileOutputStream(s"$data/$name")
      WarcSource.write(slice.iterator, gz, gzip = true)
      gz.close()
    }
    writeFile("a.warc.gz", pages.take(10))
    val q = spark.readStream.format("warc").load(data.toString)
      .select("url", "warc_file")
      .writeStream.format("memory").queryName("warc_stream_spec")
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_stream_spec").count() == 10)
      // a new file arrives: ONLY its records join the stream
      writeFile("b.warc.gz", pages.slice(10, 16))
      q.processAllAvailable()
      val rows = spark.table("warc_stream_spec").collect()
      assert(rows.length == 16)
      assert(rows.map(_.getString(0)).distinct.length == 16) // no re-reads
    } finally q.stop()
  }

  test("predicates evaluate above the scan without loss") {
    val some = spark.read.format("warc").load(s"$dir/*.warc.gz")
      .filter(org.apache.spark.sql.functions.col("http_status") === 200)
    assert(some.count() == N)
  }
}
