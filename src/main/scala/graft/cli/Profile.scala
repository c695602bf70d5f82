package graft.cli

import graft.analysis.{Analyzer, StopWords}
import graft.model.Ids
import graft.sources.Transcripts
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling profiler: times each phase of the index build separately at the
  * given thread count, to locate serialization bottlenecks. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // zstd shuffle/broadcast codec: measured 2.6x less shuffle byte
      // traffic than lz4 at IDENTICAL wall time on this pipeline at both 8
      // and 32 cores (BENCH/BASELINE.md exchange table) -- at cluster scale
      // that is 2.6x less network+spill IO for free. Must be set at session
      // creation: SparkEnv reads it once at context start.
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[$name] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val input = Transcripts.synth(spark, n, parallelism = cpus * 2).toDF()
    time("synth-count")(input.count())
    time("synth-count2")(input.count())

    // tokenize only, no shuffle, no write
    val toks = input.select(col("text")).as[String]
      .mapPartitions { it => val s = StopWords.english; it.map(t => Analyzer.tokenize(t, s).length.toLong) }
    time("tokenize-noshuffle")(toks.reduce(_ + _))

    // shuffle only (repartition + sort), no tokenize, no write
    val shuffled = input
      .withColumn("shard", pmod(hash(col("conv_id")), lit(64)).cast("int"))
      .repartition(64, col("shard"))
      .sortWithinPartitions("shard", "conv_id", "turn_idx")
    time("shuffle-sort")(shuffled.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ()))

    // full analyzed stage without parquet write
    val analyzed = shuffled.mapPartitions { rows =>
      val stopSet = StopWords.english
      var curShard = -1; var rank = 0L
      rows.map { r =>
        val shard = r.getAs[Int]("shard")
        if (shard != curShard) { curShard = shard; rank = 0L }
        val docId = Ids.docId(shard, rank); rank += 1L
        val toks = Analyzer.tokenize(r.getAs[String]("text"), stopSet)
        val tfm = Analyzer.termFreqs(toks)
        val terms = tfm.keysIterator.toArray
        scala.util.Sorting.quickSort(terms)
        graft.build.AnalyzedRow(shard, docId, r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"),
          toks.length, terms, terms.map(tfm))
      }
    }
    time("analyze-nowrite")(analyzed.foreachPartition((_: Iterator[graft.build.AnalyzedRow]) => ()))

    val dir = java.nio.file.Files.createTempDirectory("prof").toString
    time("analyze-write")(analyzed.write.mode("overwrite").parquet(s"$dir/analyzed"))
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    time("analyze-write-v2")(analyzed.write.mode("overwrite").parquet(s"$dir/analyzed2"))
    hc.setBoolean("file.bytes-per-checksum.skip", true)
    hc.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    time("analyze-write-rawfs")(analyzed.write.mode("overwrite").parquet(s"$dir/analyzed3"))
    time("analyze-write-rawfs2")(analyzed.write.mode("overwrite").parquet(s"$dir/analyzed4"))
    spark.stop()
  }
}
