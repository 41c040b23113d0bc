package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def table = {
    import spark.implicits._
    (0L until 4000L).map(i => (i, if (i % 4 == 0) "en" else "xx"))
      .toDF("doc_id", "lang")
  }

  test("stratified sample is deterministic and partitioning-invariant") {
    val a = Sampling.stratifiedSample(table, "doc_id", "lang",
      Map("en" -> 0.5), 0.2, seed = 9L).select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Sampling.stratifiedSample(table.repartition(13), "doc_id", "lang",
      Map("en" -> 0.5), 0.2, seed = 9L).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    // different seed draws a different sample
    val c = Sampling.stratifiedSample(table, "doc_id", "lang",
      Map("en" -> 0.5), 0.2, seed = 10L).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(!a.sameElements(c))
  }

  test("stratified rates hold within binomial tolerance; 0 and 1 are exact") {
    val kept = Sampling.stratifiedSample(table, "doc_id", "lang",
      Map("en" -> 1.0, "xx" -> 0.25), 0.0, seed = 3L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") == 1000) // rate 1.0 keeps every row
    assert(math.abs(kept("xx") - 750.0) < 120) // 3000 * 0.25, ~4 sigma
    val none = Sampling.stratifiedSample(table, "doc_id", "lang",
      Map.empty, 0.0, seed = 3L).count()
    assert(none == 0)
  }

  test("mixture weights: integer weights exact, fractional in expectation") {
    val out = Sampling.mixtureSample(table, "doc_id", "lang",
      Map("en" -> 2.0, "xx" -> 0.5), 1.0, seed = 5L)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 2000) // exactly 2 copies each
    assert(math.abs(byLang("xx") - 1500.0) < 130)
    // copy indices are dense 0..c-1 per doc
    val copies = out.filter(col("lang") === "en").groupBy("doc_id")
      .agg(collect_list("copy").as("cs")).collect()
    assert(copies.forall(_.getSeq[Int](1).sorted == Seq(0, 1)))
    // weight 0 drops the stratum entirely
    val zero = Sampling.mixtureSample(table, "doc_id", "lang",
      Map("en" -> 0.0), 0.0, seed = 5L).count()
    assert(zero == 0)
  }

  test("shuffleOrder: dense permutation, partition-invariant, seed-sensitive") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = Sampling.shuffleOrder(df, "doc_id", seed = 1L)
      .select("doc_id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dense permutation of 0..n-1
    assert(a.values.toSeq.sorted == (0L until 1000L))
    // identical no matter how the input is partitioned (rand() is not)
    val b = Sampling.shuffleOrder(df.repartition(7), "doc_id", seed = 1L)
      .select("doc_id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // a different seed is a different permutation
    val c = Sampling.shuffleOrder(df, "doc_id", seed = 2L)
      .select("doc_id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a != c)
    // and it is not the identity order
    assert(a.exists { case (id, pos) => id != pos })
  }
}
