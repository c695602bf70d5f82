package graft.cli

import graft.query.{Bm25, Searcher}
import org.apache.spark.sql.SparkSession

/** Warm query-latency percentiles over an EXISTING index — the source of
  * the per-query latency table in BENCH/BASELINE.md. For each query: 5
  * warmup reps, then `reps` timed reps → p50/p95; then one batched-path
  * measurement (topKBatch, 200 queries in one index pass).
  *
  * Usage: LatBench <indexDir> [reps] [-- q1 q2 ...]
  */
object LatBench {
  private val DefaultQueries = Seq(
    "quick brown fox",
    "machine learning",
    "information retrieval systems",
    "posting lists variable bytes",
    "tok0 rare1000")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(40)
    val queries = {
      val i = args.indexOf("--")
      if (i >= 0) args.drop(i + 1).toSeq else DefaultQueries
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-latbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = new Searcher(spark, dir, Bm25.RefDefaults)
    println(s"colocated=${s.colocated} n=${s.n}")
    queries.foreach { q =>
      (1 to 5).foreach(_ => s.topK(q, 10).collect())
      val lat = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        s.topK(q, 10).collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      val p50 = lat(lat.size / 2)
      val p95 = lat((lat.size * 95 / 100).min(lat.size - 1))
      println(f"LATBENCH '$q' p50=$p50%.1f ms p95=$p95%.1f ms (n=$reps)")
    }
    // batched path: 200 queries, one index pass
    val batch = (0 until 200).map(i => s"q$i" -> queries(i % queries.size)).toMap
    s.topKBatch(batch.take(4), 10).collect() // warm
    val qps = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      s.topKBatch(batch, 10).collect()
      batch.size / ((System.nanoTime() - t0) / 1e9)
    }.max
    println(f"LATBENCH batch 200 queries: $qps%.1f q/s (best of 3)")
    spark.stop()
  }
}
