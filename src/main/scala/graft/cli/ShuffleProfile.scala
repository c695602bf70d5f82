package graft.cli

import graft.build.IndexBuilder
import graft.sources.Transcripts
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Measures the index build's exchanges: per-stage shuffle read/write bytes
  * (SparkListener task metrics) and the exact byte composition of the
  * postings-chunk rows (term strings vs the three VByte blob streams) — the
  * data behind the shuffle-volume discussion in BENCH/BASELINE.md.
  *
  * Usage: runMain graft.cli.ShuffleProfile [cpus] [nTurns]
  */
object ShuffleProfile {

  private final class Acc {
    var write = 0L; var read = 0L; var records = 0L; var tasks = 0
  }

  def main(args: Array[String]): Unit = {
    val cpus = args.lift(0).map(_.toInt).getOrElse(32)
    val n = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // A/B knob for the shuffle/broadcast codec experiments behind
      // BENCH/BASELINE.md's exchange table (GRAFT_IO_CODEC=zstd|lz4)
      .config("spark.io.compression.codec", sys.env.getOrElse("GRAFT_IO_CODEC", "lz4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stageNames = mutable.Map.empty[Int, String]
    val acc = mutable.Map.empty[Int, Acc]
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stageNames(s.stageInfo.stageId) = s.stageInfo.name.takeWhile(_ != '\n')
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (t.taskMetrics != null) {
        val a = acc.getOrElseUpdate(t.stageId, new Acc)
        a.write += t.taskMetrics.shuffleWriteMetrics.bytesWritten
        a.records += t.taskMetrics.shuffleWriteMetrics.recordsWritten
        a.read += t.taskMetrics.shuffleReadMetrics.totalBytesRead
        a.tasks += 1
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val dir = java.nio.file.Files.createTempDirectory("graft_shufprof").toString
    val input = Transcripts.synth(spark, n, parallelism = cpus * 2).toDF()
    val t0 = System.nanoTime()
    IndexBuilder.build(spark, input, dir, IndexBuilder.Config(shards = 64))
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    println(f"build: $n turns in $wall%.1f s (${n / wall}%.0f turns/s) at local[$cpus]")
    println("\nstages with shuffle traffic (bytes are post-lz4, as shipped):")
    println("stageId | write MB | records | read MB | tasks | name")
    acc.toSeq.sortBy(_._1).foreach { case (id, a) =>
      if (a.write > 0 || a.read > 0)
        println(f"$id%7d | ${a.write / 1e6}%8.1f | ${a.records}%7d | ${a.read / 1e6}%7.1f | ${a.tasks}%5d | ${stageNames.getOrElse(id, "?")}")
    }
    val totW = acc.values.map(_.write).sum
    println(f"total shuffle write: ${totW / 1e6}%.1f MB (${totW.toDouble / n}%.1f bytes/turn)")

    // Exact pre-compression composition of the postings-chunk exchange rows.
    // Terms ride dictionary-encoded (4-byte tid; the sorted vocab is a
    // once-per-build broadcast) — report both the tid column and what the
    // strings WOULD have cost had they ridden every chunk row.
    val analyzed = spark.read.parquet(s"$dir/analyzed")
    val dict = IndexBuilder.termDict(spark, analyzed)
    val bcv = spark.sparkContext.broadcast(dict)
    val dictB = dict.iterator.map(_.length.toLong).sum
    val isLens = col("tid") === lit(IndexBuilder.LensTid)
    val z = lit(0L)
    val row = IndexBuilder.chunkRows(spark, analyzed, bcv)
      .agg(count(lit(1)).as("chunks"),
        sum(when(!isLens, element_at(lit(dict.map(_.length)), col("tid") + 1)
          .cast("long")).otherwise(z)).as("termB"),
        sum(when(!isLens, octet_length(col("docs")).cast("long")).otherwise(z)).as("docsB"),
        sum(when(!isLens, octet_length(col("aux")).cast("long")).otherwise(z)).as("tfsB"),
        sum(when(isLens, (octet_length(col("docs")) + octet_length(col("aux"))).cast("long"))
          .otherwise(z)).as("lensB"),
        sum(when(!isLens, col("n").cast("long")).otherwise(z)).as("postings"))
      .head()
    val chunks = row.getAs[Long]("chunks")
    val termB = row.getAs[Long]("termB")
    val docsB = row.getAs[Long]("docsB")
    val tfsB = row.getAs[Long]("tfsB")
    val lensB = row.getAs[Long]("lensB")
    val postings = row.getAs[Long]("postings")
    val tidB = chunks * 4L
    val fixed = chunks * (4L + 4L + 8L) // shard + n + firstDoc per row
    val tot = tidB + docsB + tfsB + lensB + fixed
    println(f"\npostings-chunk exchange (pre-compression): $chunks chunks, $postings postings")
    println(f"  term ids       ${tidB / 1e6}%8.1f MB (${100.0 * tidB / tot}%4.1f%%) — replaces ${termB / 1e6}%.1f MB of per-chunk term strings")
    println(f"  doc deltas     ${docsB / 1e6}%8.1f MB (${100.0 * docsB / tot}%4.1f%%)")
    println(f"  tfs            ${tfsB / 1e6}%8.1f MB (${100.0 * tfsB / tot}%4.1f%%)")
    println(f"  lens sidecars  ${lensB / 1e6}%8.1f MB (${100.0 * lensB / tot}%4.1f%%)")
    println(f"  fixed cols     ${fixed / 1e6}%8.1f MB (${100.0 * fixed / tot}%4.1f%%)")
    println(f"  dict broadcast ${dictB / 1e6}%8.1f MB once per build (${dict.length} terms, not shuffled)")
    println(f"  bytes/posting: ${tot.toDouble / postings}%.2f")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
