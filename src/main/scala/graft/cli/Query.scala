package graft.cli

import graft.query.{Bm25, Searcher}
import org.apache.spark.sql.SparkSession

/** spark-submit entry point: top-k query against a built index.
  *
  * Usage: Query <indexDir> <query> [k] [--exhaustive] [--k1 1.2]
  *              [--sim bm25|dirichlet|tfidf] [--mu 2000]
  *
  * `--sim` picks the similarity (the pluggable-similarity seam): BM25
  * (default, block-max WAND), Dirichlet query-likelihood
  * ([[graft.query.LmDirichlet]], `--mu` sets the smoothing mass), or
  * classic TF-IDF ([[graft.query.ClassicTfIdf]]).
  */
object Query {
  def main(args: Array[String]): Unit = {
    val indexDir = args(0)
    val query = args(1)
    val k = args.lift(2).filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(10)
    val exhaustive = args.contains("--exhaustive")
    val k1 = args.sliding(2).collectFirst { case Array("--k1", v) => v.toDouble }.getOrElse(1.5)
    val sim = args.sliding(2).collectFirst { case Array("--sim", v) => v }.getOrElse("bm25")
    val mu = args.sliding(2).collectFirst { case Array("--mu", v) => v.toDouble }
      .getOrElse(graft.query.LmDirichlet.DefaultMu)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-query")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = new Searcher(spark, indexDir, Bm25.Params(k1 = k1))
    val t0 = System.nanoTime()
    val hits = (sim match {
      case "dirichlet" => s.topKDirichlet(query, mu, k)
      case "tfidf"     => s.topKTfIdf(query, k)
      case "bm25"      => s.topK(query, k, exhaustiveKernel = exhaustive)
      case other => sys.error(s"unknown --sim '$other' (bm25|dirichlet|tfidf)")
    }).collect()
    val ms = (System.nanoTime() - t0) / 1e6
    val kernel = sim match {
      case "bm25" => if (exhaustive) "exhaustive" else "wand"
      case other  => other
    }
    println(f"[query] '$query' top-$k in $ms%.1f ms ($kernel)")
    hits.zipWithIndex.foreach { case (r, i) =>
      println(f"#${i + 1}%-3d score=${r.getAs[Double]("score")}%.4f " +
        f"${r.getAs[String]("conv_id")}/${r.getAs[Int]("turn_idx")} docId=${r.getAs[Long]("docId")}")
    }
    spark.stop()
  }
}
