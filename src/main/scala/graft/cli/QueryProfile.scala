package graft.cli

import graft.query.{Bm25, Searcher}
import org.apache.spark.sql.SparkSession

/** Query-path profiler: repeated warm topK over an existing index, with
  * per-phase timings — used to locate latency regressions.
  * Usage: QueryProfile <indexDir> [query] [reps] [--cache] [--grouped]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val query = args.lift(1).filterNot(_.startsWith("--")).getOrElse("quick brown fox")
    val reps = args.lift(2).filterNot(_.startsWith("--")).map(_.toInt).getOrElse(8)
    val cache = args.contains("--cache")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.openCostInBytes", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[$name] ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      r
    }

    val s = time("searcher-init")(new Searcher(spark, dir, Bm25.NorthStar, cacheTables = cache))
    println(s"colocated=${s.colocated}")
    time("dfSlice")(s.dfSlice(s.analyzeQuery(query).keys.toSeq))
    (1 to reps).foreach { i =>
      time(s"topK#$i")(s.topK(query, 10).collect())
    }
    // phase split: kernel+merge only (no doc-meta join) vs full
    val qtf = s.analyzeQuery(query)
    val dfm = s.dfSlice(qtf.keys.toSeq)
    println(s"terms=${qtf.keys.toSeq.sorted.mkString(",")} dfs=${dfm.toSeq.sortBy(_._1).map(_._2).mkString(",")}")
    spark.stop()
  }
}
