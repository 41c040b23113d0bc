package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.SyntheticCorpus
import graft.index.{FieldDoc, IndexBuilder, InvFormat}
import graft.oracle.RefOracle
import graft.query._
import graft.model.TrecResult
import java.nio.file.{Files, Paths}

/** Closes the reference-goldens loop that is closable in this sandbox: the
  * reference's own course index blobs are absent
  * (/root/reference/.MISSING_LARGE_BLOBS), so instead of replaying its
  * committed run files we replay its PIPELINE SHAPE — exp1
  * (data/exp1/sample-output/): a `.inv` text tree + a reference-style
  * properties file + a `qid:query` file in, a TREC run file out — with BOTH
  * engines reading the SAME dumped tree:
  *
  *  - the Spark engine through QueryMain --conf (InvIndex + config-injected
  *    collection stats, the reference's own pattern), and
  *  - the single-threaded reference-semantics oracle through a line-level
  *    `.inv` parser of the same files,
  *
  * then byte-compares the run files across all three models and a
  * 30-query structured set (shapes of data/exp1/queries_structured.txt).
  */
class GoldensSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val NumDocs = 150L
  lazy val triples: Seq[(Long, String, String)] =
    (0L until NumDocs).map(i => (i, "default", SyntheticCorpus.page(i).text))

  lazy val dfIndex = {
    import spark.implicits._
    IndexBuilder.inMemory(IndexBuilder.buildPostings(
      spark.createDataset(triples.map { case (i, f, t) => FieldDoc(i, f, t) })))
  }

  // 30 structured queries, 10 legal per model (reference legality: #OR is
  // Boolean-only, #WEIGHT is Indri-only — MultimergeSturctured…:250-252,
  // BM25Retriever.scala:65-67)
  def numbered(qs: Seq[String]): Seq[(String, String)] =
    qs.zipWithIndex.map { case (q, i) => ((i + 1).toString, q) }

  val bm25Queries: Seq[(String, String)] = numbered(Seq(
    "obama family tree", "w0 w1 w2", "#sum(w3 w4)", "#near/2(obama family)",
    "#uw/8(family tree)", "#sum(w5 #near/1(obama family))", "w7 w8 w9 w10",
    "#sum(w11 w12 w13)", "#near/4(french lick)", "#sum(the w14)"))
  val boolQueries: Seq[(String, String)] = numbered(Seq(
    "#and(w0 w1)", "#or(w2 w3)", "#and(obama family)", "#or(w4 #and(w5 w6))",
    "#and(w7 #or(w8 w9))", "#near/2(obama family)", "#near/3(french lick)",
    "#and(the w10)", "#or(w11 w12 w13)", "#and(w14 w15 w16)"))
  // (#UW is NOT in the boolean set: the reference's Boolean retriever has
  // no unordered window — BooleanRetriever.scala:205-210 — and the engine
  // rejects it loudly, which GoldensSpec would otherwise trip on.)
  // (#near/2 not /1 for "french lick": the corpus plants the phrase at
  // gaps ≥ 2, so /1 matches NOTHING and the empty virtual term's Indri
  // default is Integer.MIN_VALUE — at magnitude 2^31 a double's ulp is
  // ~5e-7, i.e. the 6th printed decimal, so the %.6f output becomes
  // summation-order-sensitive and byte-comparison meaningless.)
  val indriQueries: Seq[(String, String)] = numbered(Seq(
    "#and(w0 w1)", "#weight(0.7 w2 0.3 w3)", "#and(obama family tree)",
    "#weight(0.5 #and(w4 w5) 0.5 w6)", "#near/3(obama family)",
    "#uw/10(family tree)", "#and(w7 #near/2(french lick))",
    "#weight(0.2 w8 0.8 #uw/4(obama family))", "#and(the w9)", "w10 w11"))

  def leafTerms(qs: Seq[(String, String)], parser: QueryParser): Set[String] = {
    def leaves(n: QNode): Seq[String] = n match {
      case QLeaf(t, _, _)        => Seq(t)
      case QInner(_, _, kids, _) => kids.flatMap(leaves)
    }
    qs.flatMap { case (_, q) => leaves(parser.parse(q)) }.toSet
  }

  /** Dump every query term's list (real stats) into a .inv tree. */
  def dumpTree(terms: Set[String]): String = {
    val base = Files.createTempDirectory("goldens-inv").toString
    terms.toSeq.sorted.foreach { t =>
      val (df, cf) = dfIndex.termStat(t, "default")
      if (df > 0)
        InvFormat.dump(dfIndex.postings(t, "default"), df, cf, base, t, "default")
    }
    base
  }

  /** Oracle-side reader of the SAME tree: line-level .inv parse →
    * RefOracle.TermIndex (independent of InvIndex's Spark textFile path).
    */
  def loadTree(base: String, terms: Set[String]): RefOracle.TermIndex =
    terms.flatMap { t =>
      val p = Paths.get(InvFormat.fileOf(base, t, "default"))
      if (!Files.exists(p)) None
      else {
        val lines = scala.io.Source.fromFile(p.toFile).getLines().toList
        val ps = lines.tail.filter(_.nonEmpty).map { line =>
          val parts = line.trim.split(" ")
          RefOracle.OPosting(parts(0).toLong, parts(1).toInt, parts(2).toInt,
            parts.drop(3).map(_.toInt).toList, 0.0)
        }
        Some((t, "default") -> ps)
      }
    }.toMap

  test("exp1 pipeline on a dumped .inv tree: 3 models × 10 structured queries, TREC byte-identity") {
    val coll = dfIndex.collStats
    val work = Files.createTempDirectory("goldens-run")
    val outDir = Files.createDirectories(work.resolve("output")).toString

    // one reference-style properties file per model (the exp1 config shape;
    // misspelled keys are the reference's own — Configuration.scala,
    // PrefixQueryParser.scala:18)
    def propsFor(name: String, defaultOp: String, queryFile: String,
                 base: String, runId: String): String = {
      val modelKeys = name match {
        case "bm25" => "yairs.bm25.k1 = 1.2\nyairs.bm25.b = 0.75\n"
        case "boolean" => "yairs.ranked = true\n"
        case "indri" =>
          "yairs.indri.lamba = 0.4\nyairs.indri.mu = 2500\nyairs.indri.query.piror = wordBased\n"
      }
      val content =
        s"""yairs.retriever.name = $name
${modelKeys}yaris.operator.default = $defaultOp
yairs.field.default = default
yairs.run.results.num = 100
yairs.run.id = $runId
yairs.query.path = $queryFile
yairs.output.path = $outDir
yairs.inv.basename = $base
yairs.document.count = ${coll.docCount}
yairs.document.average.size = ${coll.avgDocLen}
yairs.vocabulary.size = ${coll.vocabSize}
yairs.word.count = ${coll.wordCount}
"""
      val p = work.resolve(s"$name.properties")
      Files.writeString(p, content)
      p.toString
    }

    val cases = Seq(
      ("bm25", "#SUM", bm25Queries, BM25(): Model),
      ("boolean", "#OR", boolQueries, Bool(ranked = true): Model),
      ("indri", "#AND", indriQueries, Indri(): Model))

    cases.foreach { case (name, defaultOp, queries, model) =>
      val parser = new QueryParser(defaultOp = QOp.withName(defaultOp.stripPrefix("#")))
      val terms = leafTerms(queries, parser)
      val tree = dumpTree(terms)

      // engine side: the FULL QueryMain --conf pipeline (query file in,
      // TREC run file out) over the tree
      val queryFile = work.resolve(s"queries_$name.txt")
      Files.writeString(queryFile,
        queries.map { case (qid, q) => s"$qid:$q" }.mkString("", "\n", "\n"))
      val runId = s"${name}run"
      graft.run.QueryMain.run(spark,
        Array("-", "--conf", propsFor(name, defaultOp, queryFile.toString, tree, runId)))
      val got = Files.readString(Paths.get(outDir, runId))

      // oracle side: reference semantics over the SAME tree files, same
      // config-injected stats, formatted through the same TREC writer
      val oracle = new RefOracle(loadTree(tree, terms), coll, model)
      val expected = (TrecResult.header +: queries.flatMap { case (qid, q) =>
        oracle.search(q, 100, parser).zipWithIndex.map { case ((d, s), i) =>
          TrecResult(qid, d, i + 1, s, runId).formatted
        }
      }).mkString("", "\n", "\n")

      assert(got == expected, s"model $name run file diverged")
    }
  }
}
