package graft.query

import graft.analysis.{Analyzer, StopWords}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Index-free scoring paths over an arbitrary document DataFrame — the
  * engine form of the reference's streaming entry points:
  *
  *  - `scoreTwoPass` ≅ ScoreWithTwoPassAsync (BM25Reranker.cs:170-210):
  *    pass 1 analyzes every doc once (persisted) and aggregates df/N/avgdl;
  *    pass 2 scores against those stats. No prebuilt index required.
  *  - The caller names the id and text columns — the engine form of the
  *    reference's typed-record text-property lambda (O8,
  *    BM25Reranker.cs:128-147): a column name instead of an expression
  *    tree, zero-cost under Catalyst.
  *
  * Scale note: the analyzed pass is persisted MEMORY_AND_DISK between the
  * two passes (the distributed analog of the reference's processedDocs
  * list); both aggregations are partial-agg hash aggregates.
  */
object TwoPass {

  /** Score every doc with ≥1 overlapping term: (idCol, score). */
  def scoreTwoPass(spark: SparkSession, docs: DataFrame, idCol: String,
                   textCol: String, query: String,
                   params: Bm25.Params = Bm25.RefDefaults,
                   language: String = "en"): DataFrame = {
    val lang = language
    val analyzeUdf = udf((text: String) => Analyzer.analyze(text, StopWords.forLang(lang)))
    val analyzed = docs
      .select(col(idCol).as("docid"), analyzeUdf(col(textCol)).as("tok"))
      .select(col("docid"), col("tok._1").as("len"),
        col("tok._2").as("terms"), col("tok._3").as("tfs"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val qtf = Analyzer.termFreqs(Analyzer.tokenize(query, StopWords.forLang(language)))
    if (qtf.isEmpty) {
      return analyzed.select(col("docid").as(idCol), lit(0.0).as("score"))
    }
    // pass 1: global stats — kept as a 1-ROW FRAME broadcast into the
    // scoring plan (crossJoin) instead of a driver .head(): the whole
    // two-pass pipeline then runs as ONE Spark job when the caller acts on
    // it, with the persisted analyzed pass shared by all three subtrees
    // (stats, df, score) — two fewer driver round-trips per call, same
    // arithmetic (the stats values are identical doubles either way)
    val statsDf = analyzed.agg(count(lit(1)).cast("long").as("n"),
      avg(col("len")).cast("double").as("avgdl"))
    import spark.implicits._
    val qdf = qtf.toSeq.toDF("term", "qtf")
    val dfTable = analyzed.select(explode(col("terms")).as("term"))
      .where(col("term").isin(qtf.keys.toSeq: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
    // pass 2: score
    analyzed
      .select(col("docid"), col("len"),
        explode(arrays_zip(col("terms"), col("tfs"))).as("tt"))
      .select(col("docid"), col("len"), col("tt.terms").as("term"), col("tt.tfs").as("tf"))
      .join(broadcast(qdf), "term")
      .join(broadcast(dfTable), "term")
      .crossJoin(broadcast(statsDf))
      .withColumn("part",
        Bm25.scoreCol(col("tf"), col("qtf"), col("df"), col("len"), col("n"), col("avgdl"), params))
      .groupBy(col("docid"))
      .agg(sum(col("part")).as("score"))
      .select(col("docid").as(idCol), col("score"))
  }
}
