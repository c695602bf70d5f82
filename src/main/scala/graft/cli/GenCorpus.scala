package graft.cli

import graft.sources.Transcripts
import org.apache.spark.sql.SparkSession

/** Materialize the deterministic synthetic transcript corpus to Parquet —
  * the table the timed builds ingest (Iceberg stand-in; TableIO).
  *
  * Usage: runMain graft.cli.GenCorpus <outDir> <nTurns>
  */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val n = args(1).toLong
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-gen-corpus")
      .config("spark.sql.shuffle.partitions", "32")
      // zstd shuffle/broadcast codec: measured 2.6x less shuffle byte
      // traffic than lz4 at IDENTICAL wall time on this pipeline at both 8
      // and 32 cores (BENCH/BASELINE.md exchange table) -- at cluster scale
      // that is 2.6x less network+spill IO for free. Must be set at session
      // creation: SparkEnv reads it once at context start.
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Transcripts.synth(spark, n, parallelism = 128).toDF()
      .write.mode("overwrite").parquet(out)
    println(s"[gen-corpus] $n turns -> $out")
    spark.stop()
  }
}
