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
  *
  * CRASH CONTAINMENT (round-3 failure: the scaling phase OOM-killed the
  * JVM after the query phase had finished, and its results died with the
  * single end-of-run println):
  *  - the query-phase record is emitted EARLY — one stdout JSON line with
  *    `"partial":true` right after the query phase (and a copy in
  *    BENCH/bench_partial.json), so a later kill can no longer erase
  *    finished work; the final line repeats every field with the scaling
  *    results and `"partial":false`;
  *  - executor heaps are sized from /proc/meminfo MemAvailable AT SAMPLE
  *    TIME (the fixed 4 × 12g pre-touched heaps of round 3 were an
  *    instant-RSS suicide pact on a contended 125 GiB box) with a floor
  *    below which the sample runs thread-level instead;
  *  - the launcher probe runs a GRAFT-CLASS job on 4 executors (round 3
  *    probed 1 executor with s.range — it validated neither the executor
  *    classpath nor the 4-fork fit);
  *  - every local-cluster attempt runs under a WATCHDOG: on timeout the
  *    session is stopped, stray forked executors are killed, and the
  *    sample falls back to thread-level — a fork stuck in "Initial job
  *    has not accepted any resources" can cost one timeout, never the run.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      // zstd shuffle/broadcast codec: measured 2.6x less shuffle byte
      // traffic than lz4 at IDENTICAL wall time on this pipeline at both 8
      // and 32 cores (BENCH/BASELINE.md exchange table) -- at cluster scale
      // that is 2.6x less network+spill IO for free. Must be set at session
      // creation: SparkEnv reads it once at context start.
      .config("spark.io.compression.codec",
        sys.env.getOrElse("GRAFT_IO_CODEC", "zstd"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel(LogLevel)
    s
  }

  /** Diagnostic knob: GRAFT_BENCH_LOGLEVEL=INFO surfaces master/worker/
    * executor lifecycle timestamps when investigating scheduling stalls. */
  private val LogLevel = sys.env.getOrElse("GRAFT_BENCH_LOGLEVEL", "WARN")

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

  // ---- executor-level (local-cluster) machinery ---------------------------

  private val LcProtocol = "executors-local-cluster-1x8-vs-4x8"
  private val ThreadProtocol = "threads-local8-vs-local32"
  private val MaxExecutors = 4
  /** Below this per-executor heap an 8-core 8M-turn build thrashes GC —
    * the sample is more faithful thread-level inside the driver heap. */
  private val MinExecHeapMb = 3072
  private val MaxExecHeapMb = 12288
  /** Headroom left for the OS, page cache and neighbor drift between the
    * MemAvailable reading and the forks' pre-touch. */
  private val HostSlackMb = 10240L

  private def memAvailableMb: Long =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines().collectFirst {
        case l if l.startsWith("MemAvailable:") => l.trim.split("\\s+")(1).toLong / 1024
      }.getOrElse(0L)
      finally src.close()
    } catch { case _: Throwable => 0L }

  /** Per-executor heap sized so the 4-FORK level plus slack fits in
    * MemAvailable measured NOW (the driver's own pre-touched heap is
    * already committed, so already excluded). Both levels use the same
    * per-executor heap — the real-cluster shape, where 4N executors have
    * 4× the total memory of N. */
  private[graft] def execHeapMb(): Int =
    math.min((memAvailableMb - HostSlackMb) / MaxExecutors, MaxExecHeapMb.toLong).toInt

  private def lcSession(executors: Int, heapMb: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      // the worker-memory figure is standalone ACCOUNTING, not an
      // allocation — keep it comfortably above the executor ask so
      // scheduling can never refuse the fork that sizing already fitted
      .master(s"local-cluster[$executors,8,${heapMb + 4096}]")
      .appName(s"graft-bench-lc$executors")
      .config("spark.executor.memory", s"${heapMb}m")
      // Xms=Xmx + pre-touch: commit and zero each executor heap once at
      // fork — a growing heap triggers kernel page-zeroing storms
      // mid-build (ScalingBench measured +15-25%). Safe only because the
      // heap is sized from MemAvailable above. MEASURED COST on this box:
      // 4 concurrent 12g pre-touched forks can take MINUTES to reach
      // main() under a populated page cache (48 GiB of faults against
      // kernel reclaim), stalling each 4N sample before its (untimed)
      // warmup — GRAFT_BENCH_PRETOUCH=0 trades pre-touch for lazy
      // first-touch zeroing absorbed by the warm build.
      .config("spark.executor.extraJavaOptions",
        s"-Xms${heapMb}m" +
          (if (sys.env.get("GRAFT_BENCH_PRETOUCH").contains("0")) ""
           else " -XX:+AlwaysPreTouch"))
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.sql.shuffle.partitions", executors * 8)
      // zstd shuffle/broadcast codec: measured 2.6x less shuffle byte
      // traffic than lz4 at IDENTICAL wall time on this pipeline at both 8
      // and 32 cores (BENCH/BASELINE.md exchange table) -- at cluster scale
      // that is 2.6x less network+spill IO for free. Must be set at session
      // creation: SparkEnv reads it once at context start.
      .config("spark.io.compression.codec",
        sys.env.getOrElse("GRAFT_IO_CODEC", "zstd"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel(LogLevel)
    s
  }

  /** Kill forked Spark child processes a stuck/failed local-cluster
    * attempt left behind (worker JVMs and their executor backends) — a
    * leaked 8-core executor would poison every later sample. */
  private def killStrayExecutors(): Unit = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.current().descendants().iterator().asScala.foreach { p =>
      val cmd = p.info().commandLine().orElse("")
      if (cmd.contains("CoarseGrainedExecutorBackend") ||
          cmd.contains("deploy.worker.Worker")) {
        System.err.println(s"[bench] killing stray executor pid=${p.pid()}")
        p.destroyForcibly()
      }
    }
  }

  /** Run `body` on a daemon thread with a hard deadline. On timeout or
    * failure: stop whatever session the attempt registered as default,
    * reap stray executor forks, return None. The abandoned thread parks
    * on a dead SparkContext and never runs user code again. */
  private def withDeadline[T](secs: Int, label: String)(body: => T): Option[T] = {
    val done = new java.util.concurrent.CompletableFuture[Either[Throwable, T]]()
    val t = new Thread(() => {
      try done.complete(Right(body))
      catch { case e: Throwable => done.complete(Left(e)) }
    }, s"bench-$label")
    t.setDaemon(true)
    t.start()
    val res =
      try done.get(secs, java.util.concurrent.TimeUnit.SECONDS) match {
        case Right(v) => Some(v)
        case Left(e) =>
          System.err.println(s"[bench] $label FAILED: ${e.getMessage}")
          None
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          System.err.println(s"[bench] $label TIMED OUT after ${secs}s")
          None
      }
    if (res.isEmpty) {
      try SparkSession.getDefaultSession.foreach(_.stop())
      catch { case e: Throwable =>
        System.err.println(s"[bench] session teardown after $label: ${e.getMessage}") }
      // a failure inside session CREATION can leave an active
      // SparkContext with no session wrapper; reap it through
      // getOrCreate (returns the stray if one exists, else a throwaway
      // local[1]) so the fallback session can never inherit it
      try org.apache.spark.SparkContext.getOrCreate(
        new org.apache.spark.SparkConf()
          .setMaster("local[1]").setAppName("bench-reaper")).stop()
      catch { case e: Throwable =>
        System.err.println(s"[bench] context reap after $label: ${e.getMessage}") }
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      killStrayExecutors()
    }
    res
  }

  /** Whether the executor-level protocol works here: a GRAFT-CLASS job on
    * ALL FOUR forked executors (validates SPARK_HOME, the executor
    * extraClassPath AND the 4-fork fit at the floor heap — round 3's
    * 1-executor s.range probe validated none of what buildOnce needs),
    * under the same watchdog as the real samples. */
  private[graft] lazy val lcAvailable: Boolean = {
    val ok =
      if (sys.env.get("GRAFT_BENCH_FORCE_THREADS").contains("1")) {
        System.err.println("[bench] GRAFT_BENCH_FORCE_THREADS=1: thread-level protocol forced")
        false
      } else if (execHeapMb() < MinExecHeapMb) {
        System.err.println(s"[bench] local-cluster skipped: " +
          s"MemAvailable=${memAvailableMb}M leaves <${MinExecHeapMb}M per executor")
        false
      } else withDeadline(300, "lc-probe") {
        val s = lcSession(MaxExecutors, MinExecHeapMb)
        try {
          import s.implicits._
          val toks = Transcripts.synth(s, 20000, parallelism = MaxExecutors * 8)
            .toDF().selectExpr("text").as[String]
            .mapPartitions { it =>
              val pa = new graft.analysis.PartitionAnalyzer(
                graft.analysis.StopWords.forLang("en"), graft.analysis.Analyzer.Identity)
              it.map(t => pa.analyze(t)._1.toLong)
            }.reduce(_ + _)
          toks > 0L
        } finally s.stop()
      }.getOrElse(false)
    if (!ok) System.err.println(
      "[bench] executor-level protocol unavailable; thread-level scaling samples")
    ok
  }

  /** Latched after a mid-run local-cluster failure: the launcher passed
    * its probe but a real sample died/hung, so stop paying a watchdog
    * timeout per remaining sample. */
  @volatile private var lcBroken = false

  /** One warmed, timed build of the shared corpus on `spark`. `corpus`
    * must be materialized by the CALLER before the sample session exists:
    * corpusPath builds its own local[32] session, and SparkContext
    * .getOrCreate would silently hijack an already-active local-cluster
    * context instead (one JVM, one context). */
  private def timedBuild(spark: SparkSession, cpus: Int, nTurns: Long,
                         corpus: String): Double = {
    // JIT/codegen warmup on a small corpus so the timed run measures
    // steady-state throughput, not first-job compilation
    val warmDir = java.nio.file.Files.createTempDirectory(s"graft_warm$cpus").toString
    // warmup capped at the timed size so a small smoke run (BenchSmoke)
    // is not dominated by a warmup larger than its measurement
    IndexBuilder.build(spark,
      Transcripts.synth(spark, math.min(100000L, nTurns), parallelism = cpus).toDF(),
      warmDir, IndexBuilder.Config(shards = 64))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmDir))
    // Several timed builds per session, best kept: the fork + pre-touch +
    // warmup dominate a sample's cost (minutes under a populated page
    // cache) while one more timed build inside the SAME already-zeroed
    // heaps costs only its own wall — so reps multiply window coverage
    // per sweep budget. Max-of-reps is exactly the per-level estimator's
    // semantics (interference only ever slows a run; see
    // buildThroughputs), so this cannot inflate the ratio, only tighten
    // each level's lower bound.
    val reps = math.max(1, sys.env.getOrElse("GRAFT_BENCH_REPS", "2").toInt)
    val input = spark.read.parquet(corpus)
    var best = 0.0
    var r = 0
    while (r < reps) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_bench_idx$cpus").toString
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, input, dir, IndexBuilder.Config(shards = 64))
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      best = math.max(best, nTurns / secs)
      r += 1
    }
    best
  }

  private def threadBuild(cpus: Int, nTurns: Long): Double = {
    val corpus = corpusPath(nTurns)
    val spark = session(cpus)
    try timedBuild(spark, cpus, nTurns, corpus) finally spark.stop()
  }

  /** One warmed, timed build at `cpus` total cores, fresh session per
    * sample so the two parallelism levels never share executor state:
    * cpus/8 executor JVMs × 8 cores when the executor protocol is usable
    * (heap sized from MemAvailable NOW; a too-tight window runs this one
    * sample thread-level without latching), local[cpus] threads
    * otherwise. Returns (throughput, protocol actually used). */
  private[graft] def buildOnce(cpus: Int, nTurns: Long): (Double, String) = {
    val corpus = corpusPath(nTurns) // BEFORE any sample session exists
    if (lcAvailable && !lcBroken) {
      val heap = execHeapMb()
      if (heap < MinExecHeapMb) {
        System.err.println(s"[bench] sample at $cpus cores: transient memory " +
          s"pressure (heap would be ${heap}M) — thread-level this sample")
        (threadBuild(cpus, nTurns), ThreadProtocol)
      } else withDeadline(900, s"lc-build-$cpus") {
        val spark = lcSession(cpus / 8, heap)
        try timedBuild(spark, cpus, nTurns, corpus) finally spark.stop()
      } match {
        case Some(tp) => (tp, LcProtocol)
        case None =>
          lcBroken = true
          (threadBuild(cpus, nTurns), ThreadProtocol)
      }
    } else (threadBuild(cpus, nTurns), ThreadProtocol)
  }

  /** One interleaved (8-core, 32-core) build pair plus the DRAM probe
    * reading of its window (min of the bracketing probes — a window is
    * only as quiet as its worse bracket) and the protocol each level
    * actually ran under (a watchdog fallback can split a pair). */
  final case class ScaleSample(tp8: Double, tp32: Double, probeMemX: Double,
                               proto8: String, proto32: String)

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
  private[graft] def buildThroughputs(nTurns: Long): (Double, Double, Seq[ScaleSample], Double, Double, String) = {
    // GRAFT_BENCH_MAX_SAMPLES: smoke-test knob (BenchSmoke runs the whole
    // main with 1 sample); the driver run keeps the default budget.
    val MaxSamples = sys.env.getOrElse("GRAFT_BENCH_MAX_SAMPLES", "8").toInt
    val samples = scala.collection.mutable.ArrayBuffer.empty[ScaleSample]
    var regMax = 0.0
    var memMax = 0.0
    var before = graft.cli.HostProbe.measure()
    regMax = before._1; memMax = before._2
    def goodCount = samples.count(s => s.probeMemX >= QuietMemX && plausible(s))
    // Wall-clock budget, checked between pairs; a single stalled fork is
    // additionally bounded by buildOnce's own watchdog, so one sweep can
    // no longer grind unbounded. The samples already collected are always
    // reported.
    val deadline = System.nanoTime() + 20L * 60 * 1000000000L
    while (samples.size < MaxSamples && goodCount < 2 &&
           (samples.isEmpty || System.nanoTime() < deadline)) {
      val (tp8, p8) = buildOnce(8, nTurns)
      val (tp32, p32) = buildOnce(32, nTurns)
      val after = graft.cli.HostProbe.measure()
      regMax = math.max(regMax, after._1); memMax = math.max(memMax, after._2)
      samples += ScaleSample(tp8, tp32, math.min(before._2, after._2), p8, p32)
      before = after
    }
    // Estimator: max PER LEVEL over ALL samples of one protocol,
    // pairing-free. Since interference only ever slows a run, each level's
    // max is its best available lower bound on true throughput;
    // restricting to probe-quiet samples was measured to BIAS the ratio
    // (a noisy-probe window held the highest tp8 — quiet brackets around
    // a build do not certify the build itself, and discarding the best
    // tp8 inflates efficiency). Quiet/plausible classification only
    // controls when sampling may stop; every sample ships in the JSON for
    // audit. Executor-level and thread-level throughputs are NOT
    // comparable (different shuffle transports and heap layouts), so the
    // pools never mix: the executor protocol is reported iff both levels
    // measured under it at least once, else the thread pools.
    val lc8 = samples.collect { case s if s.proto8 == LcProtocol => s.tp8 }
    val lc32 = samples.collect { case s if s.proto32 == LcProtocol => s.tp32 }
    val (pool8, pool32, proto) =
      if (lc8.nonEmpty && lc32.nonEmpty) (lc8, lc32, LcProtocol)
      else (samples.collect { case s if s.proto8 == ThreadProtocol => s.tp8 },
            samples.collect { case s if s.proto32 == ThreadProtocol => s.tp32 },
            ThreadProtocol)
    (pool8.max, pool32.max, samples.toSeq, regMax, memMax, proto)
  }

  /** Write `json` under BENCH/ for post-mortem audit (the stdout line is
    * the driver contract; the file survives an sbt-output mishap). */
  private def dumpJson(name: String, json: String): Unit =
    try {
      val p = java.nio.file.Paths.get("BENCH", name)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH/$name: ${e.getMessage}")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "8000000").toLong

    // GRAFT_BENCH_QUERIES: smoke-test knob — comma-separated subset of the
    // query surface (BenchSmoke exercises the full main with 3 queries);
    // the driver run times every query.
    val queries = sys.env.get("GRAFT_BENCH_QUERIES") match {
      case Some(names) =>
        val keep = names.split(",").map(_.trim).toSet
        SparkEntry.queries.filter { case (n, _) => keep(n) }
      case None => SparkEntry.queries
    }

    val spark = session(cpus)
    // warm up: index build + one pass of every query (JIT, codegen, IO
    // cache); failures surface on stderr here and as status below — never
    // silently (a swallowed failure once let a broken query's
    // time-to-failure pass as a measurement)
    graft.ops.DocQueries.indexDir(spark, sfDir)
    queries.foreach { case (name, fn) =>
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
      queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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
    // best-of-3 with a bracketing probe: the single-shot batch number is
    // window-sensitive on a shared host (round 4 saw 113 vs 453 q/s pure
    // noise); contention only ever SLOWS a pass, so the max is the
    // honest capability figure and the probe reading says how quiet the
    // window was
    val qpsRuns = (1 to 3).map { _ =>
      val tb0 = System.nanoTime()
      searcher.topKBatch(batch, 10).collect()
      batch.size / ((System.nanoTime() - tb0) / 1e9)
    }
    val qps = qpsRuns.max
    val qpsProbeMem = graft.cli.HostProbe.measure()._2
    spark.stop()

    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.4f" else "-1")
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    def line(partial: Boolean, indexingJson: String): String =
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","partial":$partial,"queries":$qs,"failed_queries":$failedJson,"sf":"$sfDir","query_p95_ms":$p95%.1f,"query_p50_ms":$p50%.1f,"query_lat_probe_mem_x":$latProbeMem%.2f,"batch_qps":$qps%.1f,"batch_qps_best3":$qps%.1f,"batch_qps_runs":${qpsRuns.map(r => f"$r%.1f").mkString("[", ",", "]")},"batch_qps_probe_mem_x":$qpsProbeMem%.2f,"indexing":$indexingJson}"""

    // EARLY EMISSION (round-3 lesson): the query phase is finished — put
    // it on stdout and on disk NOW, so the scaling phase can only ever
    // ADD information, never destroy it.
    val partialLine = line(partial = true, """{"status":"pending"}""")
    println(partialLine)
    System.out.flush()
    dumpJson("bench_partial.json", partialLine)

    // scaling: same job, same input, N = 1×8 vs 4N = 4×8 executors (or
    // 8 vs 32 threads on fallback), each (N, 4N) pair bracketed by DRAM
    // probes and retried until a quiet window is observed (see
    // buildThroughputs). The best-window probe ceiling is the
    // conservative normalizer (a higher ceiling can only lower the
    // normalized efficiency). Any scaling-phase crash still yields a
    // complete final line with the failure inlined.
    val indexingJson =
      try {
        val (tpN, tp4N, scaleSamples, reg, mem, proto) = buildThroughputs(scaleTurns)
        corpusCache.values.forEach(d =>
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
        val eff = (tp4N / tpN) / 4.0
        // The build pipeline is memory-traffic-bound (BENCH/BASELINE.md:
        // task CPU ≈ wall at N; the loss at 4N tracks the DRAM probe, not
        // the register probe), so the DRAM-streaming speedup is the
        // relevant single-host ceiling; both probes are reported raw
        // alongside it.
        val effVsDram = (tp4N / tpN) / mem
        val samplesJson = scaleSamples.map(s =>
          f"""{"tp_n":${s.tp8}%.0f,"tp_4n":${s.tp32}%.0f,"probe_mem_x":${s.probeMemX}%.2f,"quiet":${s.probeMemX >= QuietMemX},"plausible":${plausible(s)},"proto_n":"${s.proto8}","proto_4n":"${s.proto32}"}""")
          .mkString("[", ",", "]")
        f"""{"status":"complete","turns":$scaleTurns,"protocol":"$proto","turns_per_sec_n":$tpN%.0f,"turns_per_sec_4n":$tp4N%.0f,"scaling_efficiency":$eff%.3f,"scaling_samples":$samplesJson,"host_probe_register_x":$reg%.2f,"host_probe_memory_x":$mem%.2f,"efficiency_vs_dram_ceiling":$effVsDram%.3f}"""
      } catch { case e: Throwable =>
        val msg = String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r]", " ").take(200)
        s"""{"status":"failed","error":"${e.getClass.getSimpleName}: $msg"}"""
      }

    val finalLine = line(partial = false, indexingJson)
    println(finalLine)
    dumpJson("bench_last.json", finalLine)
  }
}
