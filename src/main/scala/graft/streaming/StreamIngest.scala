package graft.streaming

import graft.analysis.{Analyzer, StopWords}
import graft.build.{Manifests, ShardKeys}
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
  * remain unique + dense per shard, and the per-turn text-equality
  * invariant holds (identity is still (conv_id, turn_idx)). Downstream
  * stages (stats/df/postings) are refreshed by running the normal batch
  * stages over the appended analyzed table — posting compaction is a
  * batch job by design (the reference has no streaming either;
  * SURVEY.md §2.2 marks streaming N/A — this is the ingestion shape a
  * production deployment would add in front of it).
  */
object StreamIngest {

  /** Per-shard next-rank high-water marks, persisted like a stage manifest. */
  private def readHwm(indexDir: String, shards: Int): Array[Long] = {
    val hwm = new Array[Long](shards)
    Manifests.read(indexDir, "stream_hwm_max") match {
      case Some(_) =>
        (0 until shards).foreach { s =>
          hwm(s) = Manifests.read(indexDir, s"stream_hwm_$s").map(_.rows).getOrElse(0L)
        }
      case None => ()
    }
    hwm
  }

  private def writeHwm(indexDir: String, hwm: Array[Long]): Unit = {
    hwm.zipWithIndex.foreach { case (v, s) =>
      Manifests.write(indexDir, StageManifest(s"stream_hwm_$s", v, 0, "hwm", 0))
    }
    Manifests.write(indexDir, StageManifest("stream_hwm_max", hwm.max, 0, "hwm", 0))
  }

  /** Start ingesting a streaming DataFrame of turns into
    * `<indexDir>/analyzed`. Returns the StreamingQuery (caller awaits /
    * stops). Micro-batches are processed with the same shard routing and
    * analyzer as the batch build. */
  def start(spark: SparkSession, stream: DataFrame, indexDir: String,
            shards: Int, language: String = "en",
            checkpoint: String = null): StreamingQuery = {
    val lang = language
    val analyzeUdf = udf((text: String) => Analyzer.analyze(text, StopWords.forLang(lang)))
    val pkeys = ShardKeys.keys(shards, shards)
    val cp = Option(checkpoint).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_stream_cp").toString)

    stream
      .select(col("conv_id").cast("string"), col("turn_idx").cast("int"), col("text"))
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val hwm = readHwm(indexDir, shards)
        val bhwm = batch.sparkSession.sparkContext.broadcast(hwm)
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
        analyzed.write.mode("append").parquet(s"$indexDir/analyzed")
        // advance the high-water marks from what actually landed
        val counts = batch
          .withColumn("shard", pmod(hash(col("conv_id")), lit(shards)).cast("int"))
          .groupBy("shard").count().collect()
        counts.foreach(r => hwm(r.getAs[Int]("shard")) += r.getAs[Long]("count"))
        writeHwm(indexDir, hwm)
        ()
      }
      .start()
  }
}
