package graft.cli

import graft.build.IndexBuilder
import graft.sources.Transcripts
import org.apache.spark.sql.SparkSession

/** spark-submit entry point: build an index from a transcript source.
  *
  * Usage: BuildIndex <indexDir> <nTurns|parquetPath> [shards]
  *   - numeric second arg → deterministic synthetic corpus of that size;
  *   - otherwise a parquet path with (conv_id, turn_idx, text) columns.
  */
object BuildIndex {
  def main(args: Array[String]): Unit = {
    val indexDir = args(0)
    val source = args(1)
    val shards = args.lift(2).filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val builder = SparkSession.builder()
      .appName("graft-build-index")
      .config("spark.sql.shuffle.partitions", cpus)
      // zstd shuffle/broadcast codec: measured 2.6x less shuffle byte
      // traffic than lz4 at IDENTICAL wall time on this pipeline at both 8
      // and 32 cores (BENCH/BASELINE.md exchange table) -- at cluster scale
      // that is 2.6x less network+spill IO for free. Must be set at session
      // creation: SparkEnv reads it once at context start.
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // spark-submit supplies the master (e.g. local-cluster[4,8,..] for real
    // executor JVMs); standalone runs fall back to local threads.
    if (!sys.props.contains("spark.master")) builder.master(s"local[$cpus]")
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    // total shuffle-write bytes — the scaling-efficiency lever we track
    // across engine versions (reported in BUILD_JSON)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    if (args.contains("--warmup")) {
      // JIT/codegen warmup so the timed build measures steady-state
      val warm = java.nio.file.Files.createTempDirectory("graft_warm").toString
      IndexBuilder.build(spark, Transcripts.synth(spark, 100000, parallelism = cpus.toInt).toDF(),
        warm, IndexBuilder.Config(shards = shards))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warm))
    }
    shuffleBytes.set(0L)
    val t0 = System.nanoTime()
    val input =
      if (source.forall(_.isDigit))
        Transcripts.synth(spark, source.toLong, parallelism = cpus.toInt * 2).toDF()
      else spark.read.parquet(source)
    IndexBuilder.build(spark, input, indexDir, IndexBuilder.Config(shards = shards))
    val secs = (System.nanoTime() - t0) / 1e9
    val n = spark.read.parquet(graft.build.IndexBuilder.statsPath(indexDir)).head().getAs[Long]("n")
    println(f"[build-index] $n turns in $secs%.2f s (${n / secs}%.0f turns/sec) → $indexDir")
    // listener events are posted asynchronously — let the bus drain
    Thread.sleep(500)
    println(f"""BUILD_JSON {"turns":$n,"secs":$secs%.3f,"tps":${n / secs}%.1f,"shuffle_bytes":${shuffleBytes.get}}""")
    graft.build.Manifests.all(indexDir).sortBy(_.stage).foreach { m =>
      println(f"[stage] ${m.stage}%-9s rows=${m.rows}%-9d bytes=${m.bytes}%-10d ${m.wallMs} ms")
    }
    spark.stop()
  }
}
