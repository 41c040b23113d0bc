package graft.util

import java.util.Properties
import graft.query._
import graft.model.CollStats

/** Typed properties configuration — the rebuild of the reference's
  * Configuration (reference: core/src/main/scala/yairs/util/
  * Configuration.scala:15-98), honoring its keys and quirks verbatim:
  *
  *  - keys ending `.dir` get a trailing '/' appended (Configuration
  *    .scala:45-49),
  *  - getBoolean defaults to true and is string-equality with "true"
  *    (Configuration.scala:56-59),
  *  - the default-operator key is the reference's misspelled
  *    `yaris.operator.default`, validated against {#AND, #OR, #SUM}
  *    (Configuration.scala:82-97; PrefixQueryParser.scala:18),
  *  - the Indri parameter keys are the reference's misspelled
  *    `yairs.indri.lamba` and `yairs.indri.query.piror`
  *    (conf/indri.properties:24-28, IndriRetriever.scala).
  */
class GraftConfig(private val props: Properties) {

  def getOrElse(key: String, defaultValue: String): String =
    props.getProperty(key, defaultValue)

  /** Required key; `.dir` keys get a trailing slash (reference quirk). */
  def get(key: String): String = {
    var value = getOrElse(key, null)
    if (value == null)
      throw new IllegalArgumentException(s"$key not specified in configuration")
    if (key.endsWith(".dir") && !value.endsWith("/")) value += "/"
    value
  }

  def getBoolean(key: String): Boolean = getOrElse(key, "true") == "true"

  def getInt(key: String): Int =
    try get(key).toInt
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"The property value of $key is not Int") }

  def getDouble(key: String): Double =
    try get(key).toDouble
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"The property value of $key is not Double") }

  /** #AND / #OR / #SUM, anything else rejected (Configuration.scala:82-97). */
  def getDefaultOperator(key: String = "yaris.operator.default"): QOp.Value =
    get(key) match {
      case "#AND" => QOp.AND
      case "#OR"  => QOp.OR
      case "#SUM" => QOp.SUM
      case other => throw new IllegalArgumentException(
        s"The key [$key] can only take values #AND, #OR, #SUM; got $other")
    }

  // ------------------------------------------------- typed composite views

  def retrieverName: String = getOrElse("yairs.retriever.name", "bm25")

  /** Retrieval model from `yairs.retriever.name` + its parameter keys. */
  def model: Model = retrieverName match {
    case "boolean" => Bool(ranked = getBoolean("yairs.ranked"))
    case "indri" => Indri(
      lambda = getDouble("yairs.indri.lamba"), // reference's key spelling
      mu = getDouble("yairs.indri.mu"),
      wordBasedPrior =
        getOrElse("yairs.indri.query.piror", "wordBased") == "wordBased")
    case _ => BM25(
      k1 = getDouble("yairs.bm25.k1"),
      b = getDouble("yairs.bm25.b"))
  }

  def parser: QueryParser =
    new QueryParser(defaultOp = getDefaultOperator(),
      defaultField = getOrElse("yairs.field.default", "default"))

  def numResults: Int = getInt("yairs.run.results.num")
  def runId: String = get("yairs.run.id")
  def queryPath: String = get("yairs.query.path")
  def outputPath: String = get("yairs.output.path")
  def invBasename: String = get("yairs.inv.basename")

  /** Config-injected collection stats (the reference never computes them;
    * conf/bm25.properties:38-41). None when the keys are absent — then the
    * index's own computed stats apply.
    */
  def collStats: Option[CollStats] =
    if (props.getProperty("yairs.document.count") == null) None
    else Some(CollStats(
      docCount = getInt("yairs.document.count").toLong,
      avgDocLen = getDouble("yairs.document.average.size"),
      vocabSize = getInt("yairs.vocabulary.size").toLong,
      wordCount = getDouble("yairs.word.count").toLong))
}

object GraftConfig {
  def load(path: String): GraftConfig = {
    val props = new Properties()
    val in = new java.io.FileInputStream(path)
    try props.load(in) finally in.close()
    new GraftConfig(props)
  }

  def fromString(content: String): GraftConfig = {
    val props = new Properties()
    props.load(new java.io.StringReader(content))
    new GraftConfig(props)
  }
}
