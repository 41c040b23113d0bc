package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc local profiling main: isolates one lineage (unigram count, the
  * text-gate trio, the query path) so a wall number can be attributed to a
  * stage instead of a whole gate. Not part of the driver contract; used to
  * separate code regressions from host-noise troughs before trusting a
  * bench reading.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      graft.ops.OpScratch.release()
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mode = sys.env.getOrElse("PROBE_MODE", "full")
    mode match {
      case "uni" =>
        // just tokenize + explode + count unigrams
        val t = docs.select(graft.ops.TextAnalysis.tokensCol(col("text")).as("toks"))
        time("uni-count") {
          t.select(explode_outer(col("toks")).as("w")).filter(col("w").isNotNull)
            .groupBy("w").agg(count(lit(1))).count()
        }
      case "join" =>
        val t = docs.select(graft.ops.TextAnalysis.tokensCol(col("text")).as("toks"))
        val uni = t.select(explode_outer(col("toks")).as("w")).filter(col("w").isNotNull)
          .groupBy("w").agg(count(lit(1)).as("cu"))
        time("uni+selfjoin") {
          uni.join(uni.select(col("w").as("w2"), col("cu").as("c2")),
            col("w") === col("w2")).count()
        }
      case "trio" =>
        for (round <- 1 to 2;
             g <- Seq("q_op_collocations", "q_op_decontaminate", "q_op_ngram_topk"))
          time(s"$g r$round") { graft.SparkEntry.queries(g)(spark, sfDir).count() }
      case "query" =>
        val idx = graft.gate.StoreCache.documentsStore(spark, sfDir)
        val parser = new graft.query.QueryParser(defaultOp = graft.query.QOp.SUM)
        val engine = new graft.query.Engine(idx, graft.query.BM25())
        val qs = Seq("obama family tree", "french lick resort", "w0 w12 w7") ++
          (0 until 27).map(i => s"w${i * 3} w${i * 7 + 1} w${(i * 131) % 2000}")
        engine.search(qs.head, 10, parser).collect() // warm
        val times = qs.map { q =>
          val t0 = System.nanoTime()
          engine.search(q, 10, parser).collect()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE exact p50 ${times.sorted.apply(times.length / 2)}%.3f s; " +
          f"mean ${times.sum / times.length}%.3f")
        graft.query.Wand.bm25TopK(spark, idx, Seq("obama", "family"), "default", 10).collect()
        val wt = qs.map { q =>
          val t0 = System.nanoTime()
          graft.query.Wand.bm25TopK(spark, idx, q.split(' ').toSeq, "default", 10).collect()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE wand p50 ${wt.sorted.apply(wt.length / 2)}%.3f s; mean ${wt.sum / wt.length}%.3f")
        for (p <- Seq(1, 4, 8)) {
          val t0 = System.nanoTime()
          engine.searchAll(qs.zipWithIndex.map { case (q, i) => (i.toString, q) },
            100, parser, "probe", parallelism = p)
          println(f"PROBE trec30 wall (par=$p) ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      case "gate" =>
        // dump one gate's result for an ad-hoc oracle diff:
        // PROBE_GATE=<name> PROBE_OUT=<dir>
        val g = sys.env("PROBE_GATE")
        val out = sys.env.getOrElse("PROBE_OUT", "/tmp/probe_gate")
        graft.SparkEntry.queries(g)(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$out/$g")
        graft.SparkEntry.oracleSql.get(g).foreach { sql =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$out/$g.oracle.sql"), sql)
        }
        println(s"PROBE wrote $out/$g")
      case _ =>
        time("collocations-full") {
          graft.SparkEntry.queries("q_op_collocations")(spark, sfDir).count()
        }
    }
    spark.stop()
  }
}
