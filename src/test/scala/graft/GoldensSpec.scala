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

  def leafPairs(qs: Seq[(String, String)], parser: QueryParser): Set[(String, String)] = {
    def leaves(n: QNode): Seq[(String, String)] = n match {
      case QLeaf(t, f, _)        => Seq((t, f))
      case QInner(_, _, kids, _) => kids.flatMap(leaves)
    }
    qs.flatMap { case (_, q) => leaves(parser.parse(q)) }.toSet
  }

  def leafTerms(qs: Seq[(String, String)], parser: QueryParser): Set[String] =
    leafPairs(qs, parser).map(_._1)

  /** Dump every query (term, field) list (real stats) into a .inv tree. */
  def dumpTree(pairs: Set[(String, String)],
               idx: graft.index.SearchIndex): String = {
    val base = Files.createTempDirectory("goldens-inv").toString
    pairs.toSeq.sorted.foreach { case (t, f) =>
      val (df, cf) = idx.termStat(t, f)
      if (df > 0)
        InvFormat.dump(idx.postings(t, f), df, cf, base, t, f)
    }
    base
  }

  /** Oracle-side reader of the SAME tree: line-level .inv parse →
    * RefOracle.TermIndex (independent of InvIndex's Spark textFile path).
    */
  def loadTree(base: String, pairs: Set[(String, String)]): RefOracle.TermIndex =
    pairs.flatMap { case (t, f) =>
      val p = Paths.get(InvFormat.fileOf(base, t, f))
      if (!Files.exists(p)) None
      else {
        val lines = scala.io.Source.fromFile(p.toFile).getLines().toList
        val ps = lines.tail.filter(_.nonEmpty).map { line =>
          val parts = line.trim.split(" ")
          RefOracle.OPosting(parts(0).toLong, parts(1).toInt, parts(2).toInt,
            parts.drop(3).map(_.toInt).toList, 0.0)
        }
        Some((t, f) -> ps)
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
      val terms = leafPairs(queries, parser)
      val tree = dumpTree(terms, dfIndex)

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

  // --- exp2: the reference's SDM / mixture-of-representations experiment --

  val exp2Dir = Paths.get("/root/reference/data/exp2")

  def refLines(rel: String): Seq[String] =
    scala.io.Source.fromFile(exp2Dir.resolve(rel).toFile)
      .getLines().filter(_.nonEmpty).toSeq

  /** The mr.txt config: anchor 0.1, url 0, body 0, title 0.9 (the
    * committed mr_1009 weight set — mrgen.java's a/b arrays at that run).
    */
  val mrFieldWeights: Seq[(String, Double)] =
    Seq("anchor" -> 0.1, "url" -> 0.0, "body" -> 0.0, "title" -> 0.9)

  test("exp2 generators reproduce the reference's committed 30-query SDM and MR sets byte-for-byte") {
    assume(Files.exists(exp2Dir))
    val raw = refLines("queries.txt").map { l =>
      val i = l.indexOf(':'); (l.take(i), l.drop(i + 1))
    }
    assert(raw.length == 30)
    val sdmGold = refLines("sdm_mr/sdm.txt")
    raw.zip(sdmGold).foreach { case ((qid, q), gold) =>
      assert(s"$qid: ${SdmGen.expand(q)}" == gold,
        s"sdm line for qid $qid diverged from data/exp2/sdm_mr/sdm.txt")
    }
    val mrGold = refLines("sdm_mr/mr.txt")
    raw.zip(mrGold).foreach { case ((qid, q), gold) =>
      assert(s"$qid:${SdmGen.mixtureOfFields(q, mrFieldWeights)}" == gold,
        s"mr line for qid $qid diverged from data/exp2/sdm_mr/mr.txt")
    }
  }

  test("exp2 pipeline replay: 30 SDM + 30 MR queries through a dumped multi-field tree, Indri TREC byte-identity") {
    assume(Files.exists(exp2Dir))
    import spark.implicits._
    val raw = refLines("queries.txt").map { l =>
      val i = l.indexOf(':'); (l.take(i), l.drop(i + 1))
    }
    // Fixture with guaranteed coverage: every raw query text is planted
    // verbatim into 5 docs PER FIELD (coprime-shifted assignment), so
    // every SDM bigram co-occurs adjacently somewhere and no positional
    // leaf is collection-empty — the Integer.MIN_VALUE virtual default
    // (whose 2^31 magnitude makes %.6f summation-order-sensitive; see
    // the exp1 #near/2 comment) never enters a score.
    val q = raw.map(_._2)
    val fieldDocs: Seq[FieldDoc] = (0L until NumDocs).flatMap { i =>
      val j = i.toInt
      Seq(
        FieldDoc(i, "default", s"${SyntheticCorpus.page(i).text} ${q(j % 30)}"),
        FieldDoc(i, "body", s"${SyntheticCorpus.page(i).text} ${q(j % 30)}"),
        FieldDoc(i, "title", q((j + 7) % 30)),
        FieldDoc(i, "anchor", q((j + 1) % 30)),
        FieldDoc(i, "url", q((j + 13) % 30)))
    }
    val idx = IndexBuilder.inMemory(
      IndexBuilder.buildPostings(spark.createDataset(fieldDocs)))
    val coll = idx.collStats

    val sdmQueries = raw.map { case (qid, t) => (qid, SdmGen.expand(t)) }
    val mrQueries = raw.map { case (qid, t) =>
      (qid, SdmGen.mixtureOfFields(t, mrFieldWeights)) }
    val parser = new QueryParser(defaultOp = QOp.AND)
    val work = Files.createTempDirectory("goldens-exp2")
    val outDir = Files.createDirectories(work.resolve("output")).toString

    Seq(("sdm", sdmQueries), ("mr", mrQueries)).foreach { case (name, queries) =>
      val tree = dumpTree(leafPairs(queries, parser), idx)
      val queryFile = work.resolve(s"queries_$name.txt")
      Files.writeString(queryFile,
        queries.map { case (qid, qq) => s"$qid:$qq" }.mkString("", "\n", "\n"))
      val runId = s"exp2-$name"
      val props = work.resolve(s"$name.properties")
      Files.writeString(props,
        s"""yairs.retriever.name = indri
yairs.indri.lamba = 0.4
yairs.indri.mu = 2500
yairs.indri.query.piror = wordBased
yaris.operator.default = #AND
yairs.field.default = default
yairs.run.results.num = 100
yairs.run.id = $runId
yairs.query.path = $queryFile
yairs.output.path = $outDir
yairs.inv.basename = $tree
yairs.document.count = ${coll.docCount}
yairs.document.average.size = ${coll.avgDocLen}
yairs.vocabulary.size = ${coll.vocabSize}
yairs.word.count = ${coll.wordCount}
""")
      graft.run.QueryMain.run(spark, Array("-", "--conf", props.toString))
      val got = Files.readString(Paths.get(outDir, runId))

      val oracle = new RefOracle(
        loadTree(tree, leafPairs(queries, parser)), coll, Indri())
      val expected = (TrecResult.header +: queries.flatMap { case (qid, qq) =>
        oracle.search(qq, 100, parser).zipWithIndex.map { case ((d, s), i) =>
          TrecResult(qid, d, i + 1, s, runId).formatted
        }
      }).mkString("", "\n", "\n")
      assert(got == expected, s"exp2 $name run file diverged")
    }
  }
}
