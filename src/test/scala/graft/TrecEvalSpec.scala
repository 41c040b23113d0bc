package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TrecEval

/** trec_eval metric definitions pinned on a hand-computed example (the
  * metric set of the reference's committed `.res.txt` result files).
  */
class TrecEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("per-query metrics match hand computation (incl. bpref and interpolation)") {
    import spark.implicits._
    // q1: R=3 relevant (docs 1,2,3), N=2 judged nonrelevant (10,11)
    val qrels = Seq(
      ("q1", 1L, 1), ("q1", 2L, 1), ("q1", 3L, 1),
      ("q1", 10L, 0), ("q1", 11L, 0),
      ("q2", 1L, 1)).toDF("qid", "doc_id", "rel")
    // retrieved: rel, judged-nonrel, unjudged, rel, judged-nonrel, unjudged
    val run = Seq(
      ("q1", 1L, 1), ("q1", 10L, 2), ("q1", 4L, 3),
      ("q1", 2L, 4), ("q1", 11L, 5), ("q1", 5L, 6),
      ("q2", 7L, 1), ("q2", 1L, 2)).toDF("qid", "doc_id", "rank")
      .withColumn("score", org.apache.spark.sql.functions.lit(1.0))

    val m = TrecEval.evaluate(run, qrels).collect()
      .map(r => r.getAs[String]("qid") -> r).toMap

    val q1 = m("q1")
    assert(q1.getAs[Long]("num_ret") == 6)
    assert(q1.getAs[Long]("num_rel") == 3)
    assert(q1.getAs[Long]("num_rel_ret") == 2)
    // AP = (P@1 + P@4) / R = (1 + 0.5) / 3
    assert(math.abs(q1.getAs[Double]("map") - 0.5) < 1e-12)
    // top R=3 holds 1 relevant
    assert(math.abs(q1.getAs[Double]("r_prec") - 1.0 / 3) < 1e-12)
    assert(q1.getAs[Double]("recip_rank") == 1.0)
    // bpref: doc1 sees 0 nonrel above -> 1; doc2 sees 1 of min(R,N)=2 ->
    // 0.5; sum/R = 1.5/3
    assert(math.abs(q1.getAs[Double]("bpref") - 0.5) < 1e-12)
    // recall hits 1/3 at rank 1, 2/3 at rank 4; never 0.7+
    assert(q1.getAs[Double]("ircl_prn_000") == 1.0)
    assert(q1.getAs[Double]("ircl_prn_030") == 1.0)
    assert(q1.getAs[Double]("ircl_prn_040") == 0.5)
    assert(q1.getAs[Double]("ircl_prn_060") == 0.5)
    assert(q1.getAs[Double]("ircl_prn_070") == 0.0)
    assert(q1.getAs[Double]("ircl_prn_100") == 0.0)
    assert(math.abs(q1.getAs[Double]("p5") - 0.4) < 1e-12)
    assert(math.abs(q1.getAs[Double]("p10") - 0.2) < 1e-12)

    // q2: R=1, relevant found at rank 2, no judged nonrel (N=0) ->
    // bpref term defaults to 1 per trec_eval (bound 0 guard)
    val q2 = m("q2")
    assert(q2.getAs[Long]("num_rel") == 1)
    assert(math.abs(q2.getAs[Double]("map") - 0.5) < 1e-12)
    assert(math.abs(q2.getAs[Double]("recip_rank") - 0.5) < 1e-12)
    assert(math.abs(q2.getAs[Double]("bpref") - 1.0) < 1e-12)
    assert(q2.getAs[Double]("ircl_prn_100") == 0.5)
  }

  test("query with zero relevant judgments yields zero metrics, not NaN") {
    import spark.implicits._
    val qrels = Seq(("q1", 10L, 0)).toDF("qid", "doc_id", "rel")
    val run = Seq(("q1", 4L, 1), ("q1", 10L, 2)).toDF("qid", "doc_id", "rank")
      .withColumn("score", org.apache.spark.sql.functions.lit(1.0))
    val r = TrecEval.evaluate(run, qrels).collect()(0)
    assert(r.getAs[Long]("num_ret") == 2 && r.getAs[Long]("num_rel") == 0)
    Seq("map", "r_prec", "bpref", "recip_rank", "ircl_prn_000", "p5")
      .foreach(c => assert(r.getAs[Double](c) == 0.0, c))
  }
}
