package graft.streaming

import graft.analysis.{Analyzer, StopWords}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Percolation — reverse search (Elasticsearch's percolator, Lucene
  * Monitor/"Luwak"): standing queries are registered once, DOCUMENTS flow
  * through, and each document emits the queries it satisfies — the
  * alerting / routing / saved-search shape.
  *
  * Spark re-expression: the standing queries are analyzed ONCE (with the
  * same analyzer as the index build, so percolation and retrieval can
  * never disagree on a term) into a term→queries candidate map that is
  * BROADCAST — queries are the small side by definition: thousands of
  * alert rules vs an unbounded document stream. Each incoming document is
  * analyzed in a per-partition pass and counts, per candidate query, how
  * many of the query's distinct MUST terms it contains: a query matches
  * when ALL of them appear and no NOT term does (Lucene's ReqExcl shape).
  * Per-doc cost is O(|doc terms| · avg queries per term) — the term-keyed
  * candidate map is exactly Lucene Monitor's presearcher pruning; a doc
  * sharing no term with any query touches nothing.
  *
  * The operator is a STATELESS mapPartitions, so the very same function
  * serves the batch table and a Structured Streaming source — the
  * streaming twin is spec-pinned ≡ the batch twin (PercolatorSpec), and
  * at 100 TB it parallelizes embarrassingly: no shuffle, no state store,
  * broadcast size ∝ queries. */
object Percolator {

  /** One standing query: every analyzed `must` term required, any
    * analyzed `not` term excluding (empty = none). A query whose `must`
    * analyzes to nothing matches no documents (same contract as
    * conjunctive retrieval on an empty query). */
  final case class Query(qid: String, must: String, not: String = "")

  /** Percolate `docs` (columns `idCol`, `textCol`) against the standing
    * queries; emits (qid, doc_id) per match. Works identically on batch
    * and streaming DataFrames. */
  def percolate(spark: SparkSession, docs: DataFrame, queries: Seq[Query],
                idCol: String = "doc_id", textCol: String = "text",
                language: String = "en"): DataFrame = {
    import spark.implicits._
    val stop = StopWords.forLang(language)
    val analyzedQ = queries.map { q =>
      val must = Analyzer.termFreqs(Analyzer.tokenize(q.must, stop, Analyzer.Identity)).keySet
      val not = Analyzer.termFreqs(Analyzer.tokenize(q.not, stop, Analyzer.Identity)).keySet
      (q.qid, must, not)
    }.filter(_._2.nonEmpty) // empty must ⇒ unmatchable, drop up front
    val mustSize: Map[String, Int] =
      analyzedQ.map { case (qid, m, _) => qid -> m.size }.toMap
    def invert(sel: ((String, Set[String], Set[String])) => Set[String]) =
      analyzedQ.flatMap(q => sel(q).map(_ -> q._1))
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toArray }
    val byMust = spark.sparkContext.broadcast(invert(_._2))
    val byNot = spark.sparkContext.broadcast(invert(_._3))
    val sizes = spark.sparkContext.broadcast(mustSize)
    val lang = language

    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val pa = new graft.analysis.PartitionAnalyzer(
          StopWords.forLang(lang), Analyzer.Identity)
        it.flatMap { case (id, text) =>
          val (_, terms, _) = pa.analyze(text) // distinct terms of the doc
          val cnt = new java.util.HashMap[String, Integer]()
          val excluded = new java.util.HashSet[String]()
          var i = 0
          while (i < terms.length) {
            val t = terms(i)
            byMust.value.get(t).foreach(_.foreach(q =>
              cnt.merge(q, 1, (a, b) => a + b)))
            byNot.value.get(t).foreach(_.foreach(excluded.add))
            i += 1
          }
          import scala.jdk.CollectionConverters._
          cnt.entrySet().iterator().asScala.collect {
            case e if e.getValue == sizes.value(e.getKey) &&
              !excluded.contains(e.getKey) => (e.getKey, id)
          }
        }
      }.toDF("qid", "doc_id")
  }
}
