package graft

import org.apache.spark.sql.SparkSession
import graft.build.IndexBuilder
import graft.sources.Transcripts

/** Per-round benchmark (driver contract: ONE JSON line on stdout).
  *
  * Reports (a) warm per-query wall times over SPARK_GRAFT_SF_DIR, with the
  * documents index pre-built so query numbers measure querying, not
  * indexing; (b) index-build throughput for a deterministic synthetic
  * transcript corpus at two parallelism levels — 1 executor × 8 cores vs
  * 4 executors × 8 cores via in-process local-cluster (REAL forked
  * executor JVMs, the north rule's N-vs-4N-executors shape; thread-level
  * local[8]/local[32] as documented fallback when the executor launcher
  * is unavailable) — the sandbox evidence for the scaling criterion
  * (BASELINE.md protocol), plus the derived efficiency.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Corpus materialized to Parquet ONCE per JVM: the north metric is
    * indexing throughput FROM A TABLE (Iceberg in production, Parquet
    * standing in — TableIO), so the timed region must start at the table
    * scan. Generating synthetic text inside the timed build would charge
    * the generator's memory traffic to the index — and charge it twice
    * differently at the two parallelism levels. Both levels read the SAME
    * files. */
  private val corpusCache = new java.util.concurrent.ConcurrentHashMap[Long, String]()
  private[graft] def corpusPath(nTurns: Long): String =
    corpusCache.computeIfAbsent(nTurns, _ => {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_corpus_$nTurns").toString
      val spark = session(32)
      Transcripts.synth(spark, nTurns, parallelism = 128).toDF()
        .write.mode("overwrite").parquet(dir)
      spark.stop()
      dir
    })

  /** Executor-level session for the scaling samples: local-cluster forks
    * REAL executor JVMs (N = 1 × 8 cores vs 4N = 4 × 8 cores), the same
    * shape as BASELINE.md's spark-submit protocol and the north rule's
    * "N and 4N executors" — unlike thread counts inside one JVM, the two
    * levels differ in executor count, with per-executor heaps, GC, and
    * shuffle clients like a real cluster. Executors resolve Spark from
    * SPARK_HOME (set by build.sbt for forked runs) and graft classes from
    * the build output on their classpath. */
  private def lcSession(executors: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local-cluster[$executors,8,16384]")
      .appName(s"graft-bench-lc$executors")
      .config("spark.executor.memory", "12g")
      // fixed pre-touched heaps: a growing heap triggers kernel
      // page-zeroing storms mid-build (ScalingBench measured +15-25%)
      .config("spark.executor.extraJavaOptions", "-Xms12g -XX:+AlwaysPreTouch")
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.sql.shuffle.partitions", executors * 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Whether the executor-level protocol works here (needs SPARK_HOME for
    * the forked executors); decided once, with the thread-level protocol
    * as the documented fallback. */
  private[graft] lazy val lcAvailable: Boolean =
    try {
      val s = lcSession(1)
      try { s.range(1000).count(); true } finally s.stop()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] local-cluster unavailable (${e.getMessage}); " +
        "falling back to thread-level scaling samples")
      false
    }

  /** One warmed, timed build at `cpus` total cores (fresh session per
    * sample so the two parallelism levels never share executor state):
    * cpus/8 executor JVMs × 8 cores when local-cluster is available,
    * local[cpus] threads otherwise. */
  private[graft] def buildOnce(cpus: Int, nTurns: Long): Double = {
    val corpus = corpusPath(nTurns)
    val spark = if (lcAvailable) lcSession(cpus / 8) else session(cpus)
    // JIT/codegen warmup on a small corpus so the timed run measures
    // steady-state throughput, not first-job compilation
    val warmDir = java.nio.file.Files.createTempDirectory(s"graft_warm$cpus").toString
    IndexBuilder.build(spark, Transcripts.synth(spark, 100000, parallelism = cpus).toDF(),
      warmDir, IndexBuilder.Config(shards = 64))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmDir))
    val dir = java.nio.file.Files.createTempDirectory(s"graft_bench_idx$cpus").toString
    val input = spark.read.parquet(corpus)
    val t0 = System.nanoTime()
    IndexBuilder.build(spark, input, dir, IndexBuilder.Config(shards = 64))
    val secs = (System.nanoTime() - t0) / 1e9
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
    nTurns / secs
  }

  /** One interleaved (8-thread, 32-thread) build pair plus the DRAM probe
    * reading of its window (min of the bracketing probes — a window is
    * only as quiet as its worse bracket). */
  final case class ScaleSample(tp8: Double, tp32: Double, probeMemX: Double)

  /** INTERLEAVED sampling with a QUIET-WINDOW retry policy: this vCPU host
    * has noisy neighbors (observed >3× wall variance between back-to-back
    * identical runs), so every (N, 4N) pair is bracketed by HostProbe DRAM
    * measurements and sampling RETRIES until two samples land in a quiet
    * window (bracketing memory-streaming 8→32 speedup ≥ 2.7×, the level
    * this host shows when uncontended) AND pass the plausibility gate, or
    * the sample budget runs out. The estimator itself ignores the window
    * classification — see buildThroughputs.
    * (A per-adjacent-pair ratio was tried and rejected: contention windows
    * are shorter than one N+4N pair, so a contended-N/quiet-4N pair
    * reports efficiency > 1 — measured 1.28 once. Quiet-only per-level
    * maxes were also tried and rejected — see buildThroughputs.) */
  private val QuietMemX = 2.7
  /** A sample is plausible only if the 4N level actually beat the N level:
    * interference only ever slows a run, and 4× the cores running the
    * same job slower than 1× is definitionally a contaminated window the
    * bracketing probes missed (observed: mid-build contention between two
    * quiet brackets). Gating on ratio < 1 cannot inflate the estimate —
    * a genuine DRAM-bound ratio is always ≥ 1. */
  private def plausible(s: ScaleSample): Boolean = s.tp32 > s.tp8
  private[graft] def buildThroughputs(nTurns: Long): (Double, Double, Seq[ScaleSample], Double, Double) = {
    val MaxSamples = 8
    val samples = scala.collection.mutable.ArrayBuffer.empty[ScaleSample]
    var regMax = 0.0
    var memMax = 0.0
    var before = graft.cli.HostProbe.measure()
    regMax = before._1; memMax = before._2
    def goodCount = samples.count(s => s.probeMemX >= QuietMemX && plausible(s))
    // Wall-clock budget: under heavy neighbor contention an executor fork
    // (12g pre-touched heap) can stall minutes before registering, so a
    // full 8-pair sweep could grind for an hour. Checked between pairs —
    // the samples already collected are always reported.
    val deadline = System.nanoTime() + 20L * 60 * 1000000000L
    while (samples.size < MaxSamples && goodCount < 2 &&
           (samples.isEmpty || System.nanoTime() < deadline)) {
      val tp8 = buildOnce(8, nTurns)
      val tp32 = buildOnce(32, nTurns)
      val after = graft.cli.HostProbe.measure()
      regMax = math.max(regMax, after._1); memMax = math.max(memMax, after._2)
      samples += ScaleSample(tp8, tp32, math.min(before._2, after._2))
      before = after
    }
    // Estimator: max PER LEVEL over ALL samples, pairing-free. Since
    // interference only ever slows a run, each level's max is its best
    // available lower bound on true throughput; restricting to
    // probe-quiet samples was measured to BIAS the ratio (a noisy-probe
    // window held the highest tp8 — quiet brackets around a build do not
    // certify the build itself, and discarding the best tp8 inflates
    // efficiency). Quiet/plausible classification only controls when
    // sampling may stop; every sample ships in the JSON for audit.
    (samples.map(_.tp8).max, samples.map(_.tp32).max, samples.toSeq, regMax, memMax)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "8000000").toLong

    val spark = session(cpus)
    // warm up: index build + one pass of every query (JIT, codegen, IO
    // cache); failures surface on stderr here and as status below — never
    // silently (a swallowed failure once let a broken query's
    // time-to-failure pass as a measurement)
    graft.ops.DocQueries.indexDir(spark, sfDir)
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).count() catch {
        case e: Throwable => System.err.println(s"[bench] warmup $name FAILED: ${e.getMessage}")
      }
    }
    // timed warm pass, best of 2 per query: the host's noisy neighbors
    // (documented >3× wall variance) only ever SLOW a sample, so the min
    // over two passes is the faithful per-query estimator — same logic as
    // the interleaved best-of build samples below. A query that throws is
    // recorded failed (sec = -1 in the JSON, excluded from the total).
    def timedPass(): Seq[(String, Double, Boolean)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    val results = timedPass().zip(timedPass()).map { case ((n, a, okA), (_, b, okB)) =>
      (n, math.min(a, b), okA && okB)
    }
    val failed = results.collect { case (n, _, false) => n }
    // p95 latency of the flagship top-10 WAND query, warm index. Noise
    // protocol mirrors the build sampling: host contention only ever SLOWS
    // a rep, so run two separated 40-rep loops and report the loop with
    // the lower p50 (a contended loop inflates every quantile together);
    // the bracketing DRAM probe is reported so a reader can judge the
    // window (≥ 2.7× = quiet on this host).
    val searcher = graft.ops.DocQueries.searcher(spark, sfDir)
    def latLoop(): Seq[Double] = (1 to 40).map { _ =>
      val t0 = System.nanoTime()
      searcher.topK("spark stream window", 10).collect()
      (System.nanoTime() - t0) / 1e6
    }.sorted
    val lat = Seq(latLoop(), latLoop()).minBy(l => l(l.size / 2))
    val latProbeMem = graft.cli.HostProbe.measure()._2
    val p95 = lat((lat.size * 95 / 100).min(lat.size - 1))
    val p50 = lat(lat.size / 2)
    // batched query throughput (one index pass for the whole batch)
    val batchQs = Seq("spark stream window", "fast query join", "sort merge join",
      "data filter merge", "slow batch value")
    val batch = (0 until 100).map(i => s"q$i" -> batchQs(i % batchQs.size)).toMap
    searcher.topKBatch(batch.take(4), 10).collect()
    val qps = (1 to 2).map { _ =>
      val tb0 = System.nanoTime()
      searcher.topKBatch(batch, 10).collect()
      batch.size / ((System.nanoTime() - tb0) / 1e9)
    }.max
    spark.stop()

    // scaling: same job, same input, N=8 vs 4N=32 threads, each (8,32)
    // pair bracketed by DRAM probes and retried until a quiet window is
    // observed (see buildThroughputs). The best-window probe ceiling is
    // the conservative normalizer (a higher ceiling can only lower the
    // normalized efficiency).
    val (tp8, tp32, scaleSamples, reg, mem) = buildThroughputs(scaleTurns)
    corpusCache.values.forEach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    val eff = (tp32 / tp8) / 4.0
    // The build pipeline is memory-traffic-bound (BENCH/BASELINE.md: task
    // CPU ≈ wall at N; the loss at 4N tracks the DRAM probe, not the
    // register probe), so the DRAM-streaming speedup is the relevant
    // single-host ceiling; both probes are reported raw alongside it.
    val effVsDram = (tp32 / tp8) / mem

    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.4f" else "-1")
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val samplesJson = scaleSamples.map(s =>
      f"""{"tp8":${s.tp8}%.0f,"tp32":${s.tp32}%.0f,"probe_mem_x":${s.probeMemX}%.2f,"quiet":${s.probeMemX >= QuietMemX}}""")
      .mkString("[", ",", "]")
    val protocol = if (lcAvailable) "executors-local-cluster-1x8-vs-4x8"
      else "threads-local8-vs-local32"
    val total = results.collect { case (_, v, true) => v }.sum
    println(
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"failed_queries":$failedJson,"sf":"$sfDir","query_p95_ms":$p95%.1f,"query_p50_ms":$p50%.1f,"query_lat_probe_mem_x":$latProbeMem%.2f,"batch_qps":$qps%.1f,"indexing":{"turns":$scaleTurns,"protocol":"$protocol","turns_per_sec_local8":$tp8%.0f,"turns_per_sec_local32":$tp32%.0f,"scaling_efficiency":$eff%.3f,"scaling_samples":$samplesJson,"host_probe_register_x":$reg%.2f,"host_probe_memory_x":$mem%.2f,"efficiency_vs_dram_ceiling":$effVsDram%.3f}}""")
  }
}
