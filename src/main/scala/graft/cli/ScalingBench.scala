package graft.cli

import graft.build.{IndexBuilder, Manifests}
import graft.query.{Bm25, Searcher}
import graft.sources.Transcripts
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Full measurement protocol of BASELINE.md → writes BENCH/BASELINE.md.
  *
  * Runs the identical index build on the identical deterministic input at
  * local[8] (N) and local[32] (4N), reports per-stage metrics, throughput
  * at both levels, scaling efficiency, and warm top-10 query latencies
  * (p50/p95) over the built index.
  *
  * Usage: ScalingBench [nTurns]  (default 8,000,000)
  */
object ScalingBench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val queries = Seq("quick brown fox", "machine learning", "information retrieval systems",
      "posting lists variable bytes", "tok0 rare1000")

    case class Run(cpus: Int, secs: Double, tps: Double, stages: Seq[(String, Long, Long, Long)])
    var keepIdx: String = null

    val runs = Seq(8, 32).map { cpus =>
      val spark = session(cpus)
      // JIT warmup
      val warm = Files.createTempDirectory("graft_sb_warm").toString
      IndexBuilder.build(spark, Transcripts.synth(spark, 100000, parallelism = cpus).toDF(),
        warm, IndexBuilder.Config(shards = 64))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warm))

      val dir = Files.createTempDirectory(s"graft_sb_$cpus").toString
      val input = Transcripts.synth(spark, n, parallelism = cpus * 2).toDF()
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, input, dir, IndexBuilder.Config(shards = 64))
      val secs = (System.nanoTime() - t0) / 1e9
      val stages = Manifests.all(dir).sortBy(_.stage).map(m => (m.stage, m.rows, m.bytes, m.wallMs))
      if (cpus == 32) keepIdx = dir
      else org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      spark.stop()
      Run(cpus, secs, n / secs, stages)
    }

    // warm query latencies over the 32-thread index
    val spark = session(32)
    val searcher = new Searcher(spark, keepIdx, Bm25.NorthStar)
    val lats = queries.map { q =>
      searcher.topK(q, 10).collect() // warm
      val ls = (1 to 15).map { _ =>
        val t0 = System.nanoTime()
        searcher.topK(q, 10).collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      (q, ls(ls.size / 2), ls(ls.size * 95 / 100 min (ls.size - 1)))
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(keepIdx))

    val r8 = runs.head; val r32 = runs.last
    val eff = (r32.tps / r8.tps) / 4.0
    val sb = new StringBuilder
    sb.append("# BENCH/BASELINE — measured engine numbers\n\n")
    sb.append(s"Protocol: BASELINE.md (sandbox N-vs-4N evidence). Deterministic synthetic\n")
    sb.append(s"transcript corpus, ${n} turns (~40-130 tokens each), identical input and\n")
    sb.append("configs at both parallelism levels; JIT-warmed JVM; shards=64; committer v2.\n\n")
    sb.append("## Indexing throughput (north metric)\n\n")
    sb.append("| parallelism | wall (s) | turns/sec |\n|---|---|---|\n")
    runs.foreach(r => sb.append(f"| local[${r.cpus}] | ${r.secs}%.1f | ${r.tps}%.0f |\n"))
    sb.append(f"\n**Scaling efficiency (throughput@4N / throughput@N) / 4 = $eff%.3f** (target ≥ 0.8)\n\n")
    sb.append("## Per-stage build metrics (from the checkpoint manifests)\n\n")
    sb.append("| stage | rows | bytes | local[8] ms | local[32] ms |\n|---|---|---|---|---|\n")
    r8.stages.zip(r32.stages).foreach { case ((s1, rows, bytes, ms8), (_, _, _, ms32)) =>
      sb.append(s"| $s1 | $rows | $bytes | $ms8 | $ms32 |\n")
    }
    sb.append("\n## Top-10 BM25 query latency (warm, local[32], block-max WAND, k1=1.2 b=0.75)\n\n")
    sb.append("| query | p50 (ms) | p95 (ms) |\n|---|---|---|\n")
    lats.foreach { case (q, p50, p95) => sb.append(f"| $q | $p50%.1f | $p95%.1f |\n") }
    sb.append("\nReference comparison: the reference publishes no benchmark numbers\n")
    sb.append("(BASELINE.md); its in-memory scorer is single-process — rank-identity is\n")
    sb.append("asserted in tests, throughput/latency targets come from BASELINE.json.\n")

    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), sb.toString)
    println(sb.toString)
  }
}
