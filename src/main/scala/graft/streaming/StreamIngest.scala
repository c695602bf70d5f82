package graft.streaming

import graft.analysis.{Analyzer, StopWords}
import graft.build.{Hwm, Manifests, ShardKeys}
import graft.model.{Ids, StageManifest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming ingest: transcripts arriving as files feed the same
  * analyzer and land as analyzed rows, with docIds assigned incrementally.
  *
  * The batch builder assigns docIds by global (conv_id, turn_idx) rank;
  * a stream cannot know future ranks, so the streaming path assigns them
  * per shard above a persisted high-water mark, in arrival order — docIds
  * remain unique and strictly ascending per shard (the postings rebuild
  * only needs ascending, not dense: doc lengths ride inline in the posting
  * blobs). Downstream stages (stats/df/postings) are refreshed by running
  * the normal batch stages over the appended analyzed table — posting
  * compaction is a batch job by design (the reference has no streaming
  * either; SURVEY.md §2.2 marks streaming N/A — this is the ingestion
  * shape a production deployment would add in front of it).
  *
  * Exactly-once: each micro-batch is (1) written to a staging dir keyed by
  * batchId (overwrite — idempotent on retry), (2) committed by renaming
  * the part files to DETERMINISTIC names `stream-<batchId>-<i>.parquet`
  * under analyzed/ (a replay overwrites the same names — never
  * duplicates), (3) recorded in per-shard HWM manifests and a
  * `stream_batch_<id>` manifest; a batchId whose manifest exists is
  * skipped entirely. The only non-atomic window (crash between the HWM
  * write and the batch manifest) re-lands the batch at higher ranks —
  * leaving a harmless rank gap, never a duplicate docId.
  */
object StreamIngest {

  // Per-shard next-rank HWMs are shared with the batch builder/append —
  // see graft.build.Hwm.
  private def readHwm(spark: SparkSession, indexDir: String, shards: Int): Array[Long] =
    Hwm.read(spark, indexDir, shards)

  private def writeHwm(indexDir: String, hwm: Array[Long]): Unit =
    Hwm.write(indexDir, hwm)

  /** Start ingesting a streaming DataFrame of turns into
    * `<indexDir>/analyzed`. Returns the StreamingQuery (caller awaits /
    * stops). Micro-batches are processed with the same shard routing and
    * analyzer as the batch build. */
  def start(spark: SparkSession, stream: DataFrame, indexDir: String,
            shards: Int, language: String = "en",
            checkpoint: String = null,
            /** Must equal the IndexBuilder.Config.normalizer the index was
              * built with — streamed docs must normalize identically or
              * their terms never match normalized query terms. */
            normalizer: Analyzer.Norm = Analyzer.Identity): StreamingQuery = {
    val lang = language
    val norm = normalizer
    val analyzeUdf = udf((text: String) => Analyzer.analyze(text, StopWords.forLang(lang), norm))
    val pkeys = ShardKeys.keys(shards, shards)
    val cp = Option(checkpoint).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_stream_cp").toString)

    stream
      .select(col("conv_id").cast("string"), col("turn_idx").cast("int"), col("text"))
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!Manifests.isDone(indexDir, s"stream_batch_$batchId")) {
          val ss = batch.sparkSession
          val hwm = readHwm(ss, indexDir, shards)
          val bhwm = ss.sparkContext.broadcast(hwm)
          val analyzed = batch
            .withColumn("shard", pmod(hash(col("conv_id")), lit(shards)).cast("int"))
            .withColumn("pkey", element_at(lit(pkeys), col("shard") + 1))
            .withColumn("tok", analyzeUdf(col("text")))
            .select(col("pkey"), col("shard"), col("conv_id"), col("turn_idx"),
              col("tok._1").as("len"), col("tok._2").as("terms"), col("tok._3").as("tfs"))
            .repartition(shards, col("pkey"))
            .sortWithinPartitions("shard", "conv_id", "turn_idx")
            .mapPartitions { rows =>
              var curShard = -1
              var rank = 0L
              rows.map { r =>
                val shard = r.getInt(1)
                if (shard != curShard) { curShard = shard; rank = bhwm.value(shard) }
                val docId = Ids.docId(shard, rank)
                rank += 1L
                (shard, docId, r.getString(2), r.getInt(3), r.getInt(4),
                  r.getSeq[String](5), r.getSeq[Int](6))
              }
            }(org.apache.spark.sql.Encoders.product)
            .toDF("shard", "docId", "conv_id", "turn_idx", "len", "terms", "tfs")

          // (1) stage the batch (idempotent overwrite)
          val staging = s"$indexDir/_staging/batch_$batchId"
          analyzed.write.mode("overwrite").parquet(staging)
          // (2) commit: rename to deterministic names — replays overwrite
          val hconf = ss.sparkContext.hadoopConfiguration
          val stagingPath = new org.apache.hadoop.fs.Path(staging)
          val destDir = new org.apache.hadoop.fs.Path(s"$indexDir/analyzed")
          val fs = stagingPath.getFileSystem(hconf)
          fs.mkdirs(destDir)
          val parts = fs.listStatus(stagingPath)
            .filter(_.getPath.getName.startsWith("part-"))
            .sortBy(_.getPath.getName)
          parts.zipWithIndex.foreach { case (f, i) =>
            val dst = new org.apache.hadoop.fs.Path(destDir, s"stream-$batchId-$i.parquet")
            if (fs.exists(dst)) fs.delete(dst, false)
            fs.rename(f.getPath, dst)
          }
          fs.delete(stagingPath, true)
          // (3) advance HWMs from what actually landed, then seal the batch
          val counts = batch
            .withColumn("shard", pmod(hash(col("conv_id")), lit(shards)).cast("int"))
            .groupBy("shard").count().collect()
          counts.foreach(r => hwm(r.getAs[Int]("shard")) += r.getAs[Long]("count"))
          writeHwm(indexDir, hwm)
          Manifests.write(indexDir,
            StageManifest(s"stream_batch_$batchId", counts.map(_.getAs[Long]("count")).sum, 0, "done", 0))
        }
        ()
      }
      .start()
  }
}
