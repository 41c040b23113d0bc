package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native trec_eval: per-query retrieval metrics over a run file
  * joined with relevance judgments — the evaluation step of the
  * reference's own workflow (the `.res.txt` files under
  * `data/exp1/results` and `data/exp2/results` are trec_eval outputs over
  * run files: num_ret/num_rel/num_rel_ret, map, R-prec, bpref,
  * recip_rank, ircl_prn.0.00–1.00, P5–P1000). The reference shipped no
  * evaluator (yairs/model/result.scala is an empty class); this one
  * reproduces trec_eval's standard definitions so a run can be scored
  * without leaving Spark:
  *
  *  - precision@k uses the FULL ranking (unjudged retrieved docs count
  *    as nonrelevant),
  *  - AP sums precision at each relevant retrieved rank / num_rel
  *    (total relevant from the qrels, retrieved or not),
  *  - bpref considers JUDGED retrieved docs only: for each relevant
  *    retrieved r, 1 - min(#judged-nonrelevant above r, min(R,N)) /
  *    min(R, N), averaged over R = num_rel; N = judged nonrelevant,
  *  - ircl_prn.X = max precision at any retrieved rank with
  *    recall >= X (interpolated),
  *  - queries appear even with num_rel = 0 (metrics 0) — callers can
  *    filter to match trec_eval's average-over-judged-queries behavior.
  *
  * Everything is window/aggregate Catalyst ops partitioned by qid — no
  * driver-side loops, scales to millions of queries x top-k rows.
  */
object TrecEval {

  val RecallLevels: Seq[Double] = (0 to 10).map(_ / 10.0)
  val PrecisionCuts: Seq[Int] = Seq(5, 10, 15, 20, 30, 100, 200, 500, 1000)

  /** @param run   columns (qid, doc_id, rank, score) — rank 1-based,
    *              dense, ascending by descending score within qid
    * @param qrels columns (qid, doc_id, rel) — rel > 0 relevant, rel = 0
    *              judged nonrelevant; unlisted docs are unjudged
    * @return one row per qid present in the run, metric columns as above
    */
  def evaluate(run: DataFrame, qrels: DataFrame): DataFrame = {
    val judged = qrels.select(col("qid"), col("doc_id"),
      (col("rel") > 0).cast("int").as("isrel"))

    // per-query totals from the QRELS (independent of retrieval)
    val totals = judged.groupBy("qid").agg(
      sum("isrel").as("num_rel"),
      sum(lit(1) - col("isrel")).as("num_nonrel_judged"))

    val j = run.select("qid", "doc_id", "rank")
      .join(judged, Seq("qid", "doc_id"), "left")
      .join(totals, Seq("qid"), "left")
      .withColumn("num_rel", coalesce(col("num_rel"), lit(0L)))
      .withColumn("num_nonrel_judged",
        coalesce(col("num_nonrel_judged"), lit(0L)))
      .withColumn("rel", coalesce(col("isrel"), lit(0)))
      .withColumn("judged", col("isrel").isNotNull.cast("int"))

    val w = Window.partitionBy("qid").orderBy("rank")
    val ranked = j
      .withColumn("cum_rel", sum("rel").over(w))
      .withColumn("cum_nonrel_judged",
        sum(col("judged") * (lit(1) - col("rel"))).over(w))
      .withColumn("prec", col("cum_rel").cast("double") / col("rank"))
      .withColumn("recall",
        when(col("num_rel") > 0,
          col("cum_rel").cast("double") / col("num_rel")).otherwise(lit(0.0)))
      // bpref term for a relevant retrieved doc: nonrel-judged ABOVE it
      // (cum includes self only for nonrel rows, so cum at a rel row IS
      // the count above it)
      .withColumn("bpref_term",
        when(col("rel") === 1 && col("num_rel") > 0, {
          val bound = least(col("num_rel"), col("num_nonrel_judged"))
          when(bound > 0,
            lit(1.0) - least(col("cum_nonrel_judged"), bound) / bound)
            .otherwise(lit(1.0))
        }))

    val iprn: Seq[Column] = RecallLevels.map { lv =>
      max(when(col("recall") >= lv - 1e-12, col("prec")))
        .as(f"ircl_prn_${(lv * 100).round}%03d")
    }
    val pAt: Seq[Column] = PrecisionCuts.map { k =>
      (sum(when(col("rank") <= k, col("rel"))) / k.toDouble).as(s"p$k")
    }

    val aggs: Seq[Column] = Seq(
      count(lit(1)).as("num_ret"),
      first("num_rel").as("num_rel"),
      sum("rel").as("num_rel_ret"),
      when(first("num_rel") > 0,
        coalesce(sum(when(col("rel") === 1, col("prec"))), lit(0.0)) /
          first("num_rel")).otherwise(lit(0.0)).as("map"),
      // R-prec: relevant in top R / R, R = num_rel
      when(first("num_rel") > 0,
        coalesce(sum(when(col("rank") <= col("num_rel"), col("rel"))),
          lit(0L)).cast("double") / first("num_rel"))
        .otherwise(lit(0.0)).as("r_prec"),
      when(first("num_rel") > 0,
        coalesce(sum("bpref_term"), lit(0.0)) / first("num_rel"))
        .otherwise(lit(0.0)).as("bpref"),
      coalesce(max(when(col("rel") === 1, lit(1.0) / col("rank"))),
        lit(0.0)).as("recip_rank")) ++ iprn ++ pAt

    ranked.groupBy("qid").agg(aggs.head, aggs.tail: _*)
      // interpolated precision at unreached recall levels is 0
      .na.fill(0.0, RecallLevels.map(lv => f"ircl_prn_${(lv * 100).round}%03d"))
  }

  private def iprnCols: Seq[String] =
    RecallLevels.map(lv => f"ircl_prn_${(lv * 100).round}%03d")
  private def meanCols: Seq[String] =
    Seq("map", "r_prec", "bpref", "recip_rank") ++ iprnCols ++
      PrecisionCuts.map(k => s"p$k")

  /** The `all` summary row of a trec_eval report over [[evaluate]]'s
    * per-query output: counts sum, rate metrics average arithmetically
    * over queries, and `gm_ap` is the geometric mean of per-query AP with
    * trec_eval's MIN_GEO_MEAN floor of 1e-5 (m_gm_map.c) so zero-AP
    * queries contribute a floor term instead of -inf.
    */
  def summarize(perQuery: DataFrame): DataFrame = {
    val aggs: Seq[Column] = Seq(
      count(lit(1)).as("num_q"),
      sum("num_ret").as("num_ret"),
      sum("num_rel").as("num_rel"),
      sum("num_rel_ret").as("num_rel_ret")) ++
      Seq(avg("map").as("map"),
        exp(avg(log(greatest(col("map"), lit(1e-5))))).as("gm_ap")) ++
      meanCols.drop(1).map(c => avg(c).as(c))
    perQuery.agg(aggs.head, aggs.tail: _*)
  }

  /** Render per-query metrics plus the `all` block in the committed
    * `.res.txt` layout of the reference's result files
    * (data/exp1/results/boolean_ranked_and.res.txt): one
    * `metric qid<TAB>value` line per metric, doubles at 4dp, queries in
    * numeric qid order, `num_q`/`gm_ap` only in the trailing `all` block.
    * Driver-side by design — this is the human-readable REPORT sink (a
    * run's worth of metric lines), not a data path; the distributed
    * artifacts are [[evaluate]]/[[summarize]] DataFrames.
    */
  def formatRes(perQuery: DataFrame): String = {
    val names = Map("r_prec" -> "R-prec") ++
      iprnCols.map(c => c ->
        s"ircl_prn.${c.drop("ircl_prn_".length).toInt / 100}.${c.takeRight(2)}") ++
      PrecisionCuts.map(k => s"p$k" -> s"P$k")
    def fmt(r: org.apache.spark.sql.Row, c: String, qid: String): String = {
      val v = r.get(r.fieldIndex(c)) match {
        case d: Double => f"$d%.4f"
        case x => x.toString
      }
      s"${names.getOrElse(c, c)} $qid\t$v"
    }
    val perQCols = Seq("num_ret", "num_rel", "num_rel_ret") ++ meanCols
    val rows = perQuery.collect().sortBy { r =>
      val q = r.getAs[String]("qid")
      (q.toLongOption.getOrElse(Long.MaxValue), q)
    }
    val perQ = rows.flatMap(r =>
      perQCols.map(c => fmt(r, c, r.getAs[String]("qid"))))
    val allRow = summarize(perQuery).collect()(0)
    val allCols = Seq("num_q", "num_ret", "num_rel", "num_rel_ret", "map",
      "gm_ap") ++ meanCols.drop(1)
    (perQ ++ allCols.map(c => fmt(allRow, c, "all"))).mkString("", "\n", "\n")
  }
}
