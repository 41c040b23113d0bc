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

  test("formatRes emits the committed .res.txt layout byte-for-byte") {
    import spark.implicits._
    // a 2-query fixture small enough to verify by hand; the expected
    // literal pins the reference result-file layout
    // (data/exp1/results/boolean_ranked_and.res.txt): metric naming
    // (R-prec, ircl_prn.0.10, P5), `metric qid<TAB>value`, 4dp doubles,
    // numeric qid order, num_q/gm_ap only in the `all` block
    val qrels = Seq(
      ("2", 1L, 1), ("2", 2L, 1),
      ("10", 5L, 1), ("10", 6L, 0)).toDF("qid", "doc_id", "rel")
    val run = Seq(
      ("2", 1L, 1), ("2", 3L, 2), ("2", 2L, 3),
      ("10", 6L, 1), ("10", 5L, 2)).toDF("qid", "doc_id", "rank")
      .withColumn("score", org.apache.spark.sql.functions.lit(1.0))
    val res = TrecEval.formatRes(TrecEval.evaluate(run, qrels))
    // q2: AP=(1+2/3)/2=0.8333, R-prec=1/2, bpref=1 (N=0 guard),
    //     recall .5@1 → iprn 0.00-0.50 = 1.0; recall 1@3 → prec 2/3
    // q10: rel at rank 2 under one judged nonrel: AP=1/2/1=0.5,
    //     bpref=1-min(1,1)/1=0, iprn all .5, P5=1/5
    val expected =
      """num_ret 2	3
num_rel 2	2
num_rel_ret 2	2
map 2	0.8333
R-prec 2	0.5000
bpref 2	1.0000
recip_rank 2	1.0000
ircl_prn.0.00 2	1.0000
ircl_prn.0.10 2	1.0000
ircl_prn.0.20 2	1.0000
ircl_prn.0.30 2	1.0000
ircl_prn.0.40 2	1.0000
ircl_prn.0.50 2	1.0000
ircl_prn.0.60 2	0.6667
ircl_prn.0.70 2	0.6667
ircl_prn.0.80 2	0.6667
ircl_prn.0.90 2	0.6667
ircl_prn.1.00 2	0.6667
P5 2	0.4000
P10 2	0.2000
P15 2	0.1333
P20 2	0.1000
P30 2	0.0667
P100 2	0.0200
P200 2	0.0100
P500 2	0.0040
P1000 2	0.0020
num_ret 10	2
num_rel 10	1
num_rel_ret 10	1
map 10	0.5000
R-prec 10	0.0000
bpref 10	0.0000
recip_rank 10	0.5000
ircl_prn.0.00 10	0.5000
ircl_prn.0.10 10	0.5000
ircl_prn.0.20 10	0.5000
ircl_prn.0.30 10	0.5000
ircl_prn.0.40 10	0.5000
ircl_prn.0.50 10	0.5000
ircl_prn.0.60 10	0.5000
ircl_prn.0.70 10	0.5000
ircl_prn.0.80 10	0.5000
ircl_prn.0.90 10	0.5000
ircl_prn.1.00 10	0.5000
P5 10	0.2000
P10 10	0.1000
P15 10	0.0667
P20 10	0.0500
P30 10	0.0333
P100 10	0.0100
P200 10	0.0050
P500 10	0.0020
P1000 10	0.0010
num_q all	2
num_ret all	5
num_rel all	3
num_rel_ret all	3
map all	0.6667
gm_ap all	0.6455
R-prec all	0.2500
bpref all	0.5000
recip_rank all	0.7500
ircl_prn.0.00 all	0.7500
ircl_prn.0.10 all	0.7500
ircl_prn.0.20 all	0.7500
ircl_prn.0.30 all	0.7500
ircl_prn.0.40 all	0.7500
ircl_prn.0.50 all	0.7500
ircl_prn.0.60 all	0.5833
ircl_prn.0.70 all	0.5833
ircl_prn.0.80 all	0.5833
ircl_prn.0.90 all	0.5833
ircl_prn.1.00 all	0.5833
P5 all	0.3000
P10 all	0.1500
P15 all	0.1000
P20 all	0.0750
P30 all	0.0500
P100 all	0.0150
P200 all	0.0075
P500 all	0.0030
P1000 all	0.0015
""".stripMargin
    assert(res == expected, {
      val a = res.linesIterator.toSeq; val b = expected.linesIterator.toSeq
      a.zipAll(b, "<missing>", "<missing>").filter(p => p._1 != p._2)
        .take(5).mkString("first diffs: ", " | ", "")
    })
  }

  test("gm_ap floors zero-AP queries at trec_eval's 1e-5, not -inf") {
    import spark.implicits._
    val qrels = Seq(("1", 1L, 1), ("2", 9L, 1)).toDF("qid", "doc_id", "rel")
    val run = Seq(("1", 1L, 1), ("2", 3L, 1)).toDF("qid", "doc_id", "rank")
      .withColumn("score", org.apache.spark.sql.functions.lit(1.0))
    val s = TrecEval.summarize(TrecEval.evaluate(run, qrels)).collect()(0)
    // APs are 1.0 and 0.0 → gm = sqrt(1.0 * 1e-5)
    assert(math.abs(s.getAs[Double]("gm_ap") - math.sqrt(1e-5)) < 1e-12)
    assert(s.getAs[Long]("num_q") == 2)
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
