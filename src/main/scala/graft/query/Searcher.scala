package graft.query

import graft.analysis.{Analyzer, StopWords}
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Query executor over a built index (SURVEY.md §3 entry points 1-2).
  *
  * Two equivalent paths, both returning (conv_id, turn_idx, docId, score):
  *
  *  - `topK` — the scale path: broadcast the analyzed query + its global
  *    df slice (a handful of rows — never the df table itself), prune the
  *    postings scan to the query terms (predicate pushed to Parquet), run
  *    the block-max WAND kernel per shard (bounded heap), then merge the
  *    ≤ shards·k candidates with a distributed TakeOrdered. Shuffle-free
  *    except the final tiny top-k merge.
  *
  *  - `topKExhaustive` / `scoreAll` — the relational twin: explode analyzed
  *    docs, broadcast-hash-join query terms, aggregate the codegen'd BM25
  *    expression. Used for correctness cross-checks and full score dumps
  *    (≅ reference ScoreAsync, which yields every doc).
  */
object Searcher {
  /** Doc metadata view: a pruned-column read of analyzed/ (no separate doc
    * table is materialized — Parquet scans only these columns). */
  def docMeta(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/analyzed")
      .select(col("shard"), col("docId"), col("conv_id"), col("turn_idx"), col("len"))
}

final class Searcher(spark: SparkSession, indexDir: String,
                     params: Bm25.Params = Bm25.RefDefaults,
                     language: String = "en",
                     cacheTables: Boolean = false) {
  import spark.implicits._

  /** Hot-index mode: pin the (small) per-query tables in executor memory.
    * Off by default — a 10^12-doc index must not be blanket-persisted;
    * the serving tier decides what stays hot. */
  private def maybeCache(df: DataFrame): DataFrame =
    if (cacheTables) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else df

  private val postingsDF = maybeCache(spark.read.parquet(s"$indexDir/postings"))
  private val lensDF = maybeCache(spark.read.parquet(s"$indexDir/doclens"))
  private val dfDF = maybeCache(spark.read.parquet(s"$indexDir/df"))
  private val docMetaDF = maybeCache(Searcher.docMeta(spark, indexDir))

  private val statsRow = spark.read.parquet(s"$indexDir/stats").head()
  val n: Long = statsRow.getAs[Long]("n")
  val avgdl: Double = statsRow.getAs[Double]("avgdl")

  def analyzeQuery(query: String): Map[String, Int] =
    Analyzer.termFreqs(Analyzer.tokenize(query, StopWords.forLang(language)))

  /** Global df for the query's terms only: a pushed-down scan of the df
    * table returning ≤ |query| rows. */
  def dfSlice(terms: Seq[String]): Map[String, Long] =
    if (terms.isEmpty) Map.empty
    else dfDF
      .where(col("term").isin(terms: _*))
      .as[TermStat].collect().map(t => t.term -> t.df).toMap

  /** WAND top-k. Deterministic order: score desc, docId asc. */
  def topK(query: String, k: Int, exhaustiveKernel: Boolean = false): DataFrame = {
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return emptyHits()
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return emptyHits()
    val terms = qtf.keys.toSeq.sorted
    val p = params
    val (nn, ad) = (n, avgdl)
    val useExhaustive = exhaustiveKernel

    val postings = postingsDF
      .where(col("term").isin(terms: _*)).as[Posting]
    val lens = lensDF.as[ShardLens]

    val perShard = postings.groupByKey(_.shard)
      .cogroup(lens.groupByKey(_.shard)) { (shard, ps, ls) =>
        val lensArr = ls.toSeq.headOption
          .map(sl => graft.codec.VByte.decodeInts(sl.lensBlob, sl.count))
          .getOrElse(Array.empty[Int])
        val inputs = ps.map(po => Wand.TermInput(po, qtf(po.term), dfm.getOrElse(po.term, 0L))).toSeq
        val scored =
          if (useExhaustive) Wand.topKExhaustive(inputs, lensArr, nn, ad, k, p, Ids.RankMask)
          else Wand.topK(inputs, lensArr, nn, ad, k, p, Ids.RankMask)
        scored.iterator.map(s => (s.docId, s.score))
      }.toDF("docId", "score")

    val top = perShard.orderBy(desc("score"), asc("docId")).limit(k)
    // hits are ≤ k rows — broadcast them against the doc map
    docMetaDF
      .join(broadcast(top), "docId")
      .select($"conv_id", $"turn_idx", $"docId", $"score")
      .orderBy(desc("score"), asc("docId"))
  }

  /** Batched multi-query top-k: ONE pass over the index answers every
    * query — the at-scale shape (the reference scores query-by-query; a
    * 10^12-doc engine amortizes the scan/shuffle across the query batch).
    * Returns (qid, conv_id, turn_idx, docId, score), k rows per query,
    * ordered (qid, score desc, docId). */
  def topKBatch(queries: Map[String, String], k: Int): DataFrame = {
    val qterms: Map[String, Map[String, Int]] =
      queries.map { case (qid, q) => qid -> analyzeQuery(q) }
    val allTerms = qterms.values.flatMap(_.keys).toSeq.distinct.sorted
    if (allTerms.isEmpty) return emptyBatchHits()
    val dfm = dfSlice(allTerms)
    val p = params
    val (nn, ad) = (n, avgdl)

    val postings = postingsDF.where(col("term").isin(allTerms: _*)).as[Posting]
    val lens = lensDF.as[ShardLens]
    val perShard = postings.groupByKey(_.shard)
      .cogroup(lens.groupByKey(_.shard)) { (_, ps, ls) =>
        val lensArr = ls.toSeq.headOption
          .map(sl => graft.codec.VByte.decodeInts(sl.lensBlob, sl.count))
          .getOrElse(Array.empty[Int])
        val byTerm = ps.map(po => po.term -> po).toMap
        qterms.iterator.flatMap { case (qid, qtf) =>
          val inputs = qtf.toSeq.collect {
            case (t, f) if byTerm.contains(t) =>
              Wand.TermInput(byTerm(t), f, dfm.getOrElse(t, 0L))
          }
          Wand.topK(inputs, lensArr, nn, ad, k, p, Ids.RankMask)
            .iterator.map(s => (qid, s.docId, s.score))
        }
      }.toDF("qid", "docId", "score")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("score"), asc("docId"))
    val top = perShard
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
    docMetaDF
      .join(broadcast(top), "docId")
      .select($"qid", $"conv_id", $"turn_idx", $"docId", $"score")
      .orderBy(asc("qid"), desc("score"), asc("docId"))
  }

  private def emptyBatchHits(): DataFrame =
    Seq.empty[(String, String, Int, Long, Double)]
      .toDF("qid", "conv_id", "turn_idx", "docId", "score")

  /** Score every doc with ≥1 overlapping term (relational path); when
    * `keepZeros`, emit every doc (zero-score included) like the
    * reference's ScoreAsync stream. */
  def scoreAll(query: String, keepZeros: Boolean = false): DataFrame = {
    val qtf = analyzeQuery(query)
    val docs = docMetaDF
    if (qtf.isEmpty) {
      return docs.select($"conv_id", $"turn_idx", $"docId", lit(0.0).as("score"))
    }
    val qdf = qtf.toSeq.toDF("term", "qtf")
    val dfTable = dfDF
      .where(col("term").isin(qtf.keys.toSeq: _*))
    val analyzed = spark.read.parquet(s"$indexDir/analyzed")
    val exploded = analyzed
      .select($"docId", $"conv_id", $"turn_idx", $"len",
        explode(arrays_zip($"terms", $"tfs")).as("tt"))
      .select($"docId", $"conv_id", $"turn_idx", $"len",
        $"tt.terms".as("term"), $"tt.tfs".as("tf"))
    val scored = exploded
      .join(broadcast(qdf), "term")
      .join(broadcast(dfTable), "term")
      .withColumn("part", Bm25.scoreCol($"tf", $"qtf", $"df", $"len", lit(n), lit(avgdl), params))
      .groupBy($"docId", $"conv_id", $"turn_idx")
      .agg(sum($"part").as("score"))
    if (!keepZeros) scored
    else docs.join(scored.select($"docId", $"score"), Seq("docId"), "left")
      .select($"conv_id", $"turn_idx", $"docId", coalesce($"score", lit(0.0)).as("score"))
  }

  /** Relational top-k (TakeOrderedAndProject). */
  def topKExhaustive(query: String, k: Int): DataFrame =
    scoreAll(query).filter($"score" > 0.0)
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .select($"conv_id", $"turn_idx", $"docId", $"score")

  private def emptyHits(): DataFrame =
    Seq.empty[(String, Int, Long, Double)].toDF("conv_id", "turn_idx", "docId", "score")
}
