package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.{InvFormat, InvIndex, IndexBuilder, FieldDoc}
import graft.query._

/** Round-trips the reference `.inv` text format: dump lists from the
  * in-memory index, reopen them through InvIndex, and check the BM25
  * ranking is identical — i.e. a reference-built index tree is queryable
  * by this engine as-is.
  */
class InvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val dfIndex = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("docId"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => FieldDoc(id, "default", t) }
    IndexBuilder.inMemory(IndexBuilder.buildPostings(docs))
  }

  def dumpTerms(base: String, terms: Seq[String]): Unit =
    terms.foreach { t =>
      val (df, cf) = dfIndex.termStat(t, "default")
      if (df > 0)
        InvFormat.dump(dfIndex.postings(t, "default"), df, cf, base, t, "default")
    }

  test("dump + reopen: BM25 ranking identical through the .inv tree") {
    val base = java.nio.file.Files.createTempDirectory("inv-rt").toString
    val terms = Seq("key", "value", "spark")
    dumpTerms(base, terms)
    val inv = new InvIndex(spark, base, dfIndex.collStats)
    terms.foreach { t =>
      assert(inv.termStat(t, "default") == dfIndex.termStat(t, "default"))
    }
    val parser = new QueryParser(defaultOp = QOp.SUM)
    def run(e: Engine, q: String) = e.search(q, 15, parser).collect()
      .map(r => (r.getAs[Long]("docId"), r.getAs[Int]("rank"),
        math.rint(r.getAs[Double]("score") * 1e9) / 1e9)).toSeq
    assert(run(new Engine(inv, BM25()), "key value spark")
      == run(new Engine(dfIndex, BM25()), "key value spark"))
    // positions survive the text round trip: positional query identical
    assert(run(new Engine(inv, BM25()), "#near/2(key value)")
      == run(new Engine(dfIndex, BM25()), "#near/2(key value)"))
  }

  test("missing list is empty, not an error") {
    val base = java.nio.file.Files.createTempDirectory("inv-missing").toString
    val inv = new InvIndex(spark, base, dfIndex.collStats)
    assert(inv.termStat("absent", "default") == (0L, 0L))
    assert(inv.postings("absent", "default").count() == 0)
  }

  test("4-part header tolerated (reference hw2 fallback) + field layout") {
    val (t, s, cf, ttc, df) = InvFormat.parseHeader("word 12 12 7")
    assert((t, s, cf, ttc, df) == ("word", "word", 12L, 12L, 7L))
    assert(InvFormat.fileOf("/x", "w", "default") == "/x/default/w.inv")
    assert(InvFormat.fileOf("/x", "w", "title") == "/x/title/w.title.inv")
    assert(InvFormat.fileOf("/x/", "w", "title", hw2Layout = false)
      == "/x_title/w.title.inv")
    assert(InvFormat.fileOf("/x/", "w", "default", hw2Layout = false)
      == "/x/w.inv")
  }
}
