package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's fixed two-stage convenience pipeline
  * (BM25ThenLMRankerPipeline.cs:13-28: pins the stage list to
  * [BM25Reranker, LMRanker] with config passthrough), re-expressed as a
  * Cascade over [index-free BM25 two-pass, LM stage]. BM25 cuts the
  * candidate set to cfg.topK, the model stage only ever sees those
  * survivors (the model is never the first cut — the whole point of the
  * cascade at scale), and cfg.topM rows come out. */
object Bm25ThenLm {

  def run(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
          query: String, scorer: (String, String) => Double,
          cfg: Cascade.Config = Cascade.Config(),
          params: Bm25.Params = Bm25.RefDefaults,
          language: String = "en"): DataFrame = {
    val bm25: DataFrame => DataFrame = cands => {
      val scored = TwoPass.scoreTwoPass(spark, cands, idCol, textCol, query, params, language)
        .withColumnRenamed("score", "bm25")
      // every candidate gets a score (no-overlap docs score 0, like the
      // reference's OR-mode scorer that yields every doc)
      cands.join(scored, Seq(idCol), "left")
        .withColumn("score", coalesce(col("bm25"), lit(0.0))).drop("bm25")
    }
    val lm: DataFrame => DataFrame = prev =>
      prev.drop("score").join(LmStage.score(prev, idCol, textCol, query, scorer), idCol)
    Cascade.run(docs, Seq(bm25, lm), cfg, idCol)
  }
}
