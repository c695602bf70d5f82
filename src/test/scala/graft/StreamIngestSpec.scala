package graft

import graft.sources.Transcripts
import graft.streaming.StreamIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingest: file-source micro-batches land in analyzed/ with
  * unique, per-shard-dense docIds and analyzer parity with the batch path. */
class StreamIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two micro-batches append analyzed rows with unique dense docIds") {
    val srcDir = TestSpark.tmpDir("stream_src")
    val idxDir = TestSpark.tmpDir("stream_idx")
    val all = Transcripts.synth(spark, 600, turnsPerConv = 5)

    // batch 1 files
    all.filter($"conv_id" < "conv-000000060").toDF()
      .write.mode("append").parquet(srcDir)
    val stream = spark.readStream.schema(all.toDF().schema).parquet(srcDir)
    val q = StreamIngest.start(spark, stream, idxDir, shards = 4)
    q.processAllAvailable()
    val n1 = spark.read.parquet(s"$idxDir/analyzed").count()
    assert(n1 == 300)

    // batch 2 files arrive later
    all.filter($"conv_id" >= "conv-000000060").toDF()
      .write.mode("append").parquet(srcDir)
    q.processAllAvailable()
    q.stop()

    val analyzed = spark.read.parquet(s"$idxDir/analyzed")
    assert(analyzed.count() == 600)
    // docIds unique; dense per shard from 0
    assert(analyzed.select("docId").distinct().count() == 600)
    val perShard = analyzed.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("docId").as("lo"), max("docId").as("hi"))
      .collect()
    perShard.foreach { r =>
      val shard = r.getAs[Int]("shard")
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("lo") == graft.model.Ids.docId(shard, 0L))
      assert(r.getAs[Long]("hi") == graft.model.Ids.docId(shard, n - 1))
    }
    // analyzer parity with the batch analyzer + text-equality invariant
    val src = all.toDF().withColumn("explen",
      udf((t: String) => graft.analysis.Analyzer.tokenizeEn(t).length).apply($"text"))
    val joined = src.join(analyzed, Seq("conv_id", "turn_idx"), "full_outer")
    assert(joined.filter($"docId".isNull || $"text".isNull).count() == 0)
    assert(joined.filter($"len" =!= $"explen").count() == 0)
  }

  test("streaming into a batch-built index seeds HWMs — no docId reuse") {
    // regression (ADVICE r1 high): readHwm must seed from the existing
    // analyzed table when stream manifests are absent
    val srcDir = TestSpark.tmpDir("stream_src2")
    val idxDir = TestSpark.tmpDir("stream_idx2")
    val batchTurns = Transcripts.synth(spark, 200, turnsPerConv = 5)
    graft.build.IndexBuilder.build(spark, batchTurns.toDF(), idxDir,
      graft.build.IndexBuilder.Config(shards = 4))

    val streamTurns = Transcripts.synth(spark, 400, turnsPerConv = 5)
      .toDF().filter($"conv_id" >= "conv-000000040") // disjoint conv_ids
    streamTurns.write.mode("append").parquet(srcDir)
    val stream = spark.readStream.schema(streamTurns.schema).parquet(srcDir)
    val q = StreamIngest.start(spark, stream, idxDir, shards = 4)
    q.processAllAvailable()
    q.stop()

    val analyzed = spark.read.parquet(s"$idxDir/analyzed")
    assert(analyzed.count() == 400)
    assert(analyzed.select("docId").distinct().count() == 400,
      "streamed docIds must not collide with batch-built ones")
  }

  test("replayed micro-batch never duplicates rows (exactly-once commit)") {
    val srcDir = TestSpark.tmpDir("stream_src3")
    val idxDir = TestSpark.tmpDir("stream_idx3")
    val turns = Transcripts.synth(spark, 300, turnsPerConv = 5)
    turns.toDF().write.mode("append").parquet(srcDir)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(turns.toDF().schema).parquet(srcDir)
      // fresh checkpoint each run → the file source REPLAYS batch 0
      val q = StreamIngest.start(spark, stream, idxDir, shards = 4,
        checkpoint = TestSpark.tmpDir("stream_cp3"))
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    // replay with commit manifests intact → batch skipped entirely
    runOnce()
    assert(spark.read.parquet(s"$idxDir/analyzed").count() == 300)
    // simulate a crash AFTER the data landed but BEFORE the commit records:
    // replay re-stages and overwrites the same deterministic file names
    graft.build.Manifests.clear(idxDir, "stream_batch_0")
    graft.build.Manifests.clear(idxDir, "stream_hwm_max")
    runOnce()
    val analyzed = spark.read.parquet(s"$idxDir/analyzed")
    assert(analyzed.count() == 300, "replay after partial commit must not duplicate rows")
    assert(analyzed.select("docId").distinct().count() == 300)
  }

  test("stream → refresh → searchable: end-to-end freshness without a rebuild") {
    val srcDir = TestSpark.tmpDir("stream_src4")
    val idxDir = TestSpark.tmpDir("stream_idx4")
    // batch-built base index
    graft.build.IndexBuilder.build(spark,
      Transcripts.synth(spark, 400, turnsPerConv = 5).toDF(), idxDir,
      graft.build.IndexBuilder.Config(shards = 4))
    // a streamed doc with a vocabulary the base corpus lacks
    Transcripts.fixture(spark, "cSTREAM",
        Seq("zeppelin zeppelin archive fresh streamed turn")).toDF()
      .write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema(Transcripts.synth(spark, 1).toDF().schema).parquet(srcDir)
    val q = StreamIngest.start(spark, stream, idxDir, shards = 4)
    q.processAllAvailable()
    q.stop()
    // not yet searchable (postings/stats/df unchanged)...
    val before = new graft.query.Searcher(spark, idxDir)
    assert(before.topK("zeppelin archive", 5).count() == 0)
    // ...one refresh makes it searchable through a delta segment
    graft.build.IndexBuilder.refresh(spark, idxDir)
    val after = new graft.query.Searcher(spark, idxDir)
    val hits = after.topK("zeppelin archive", 5).select("conv_id").as[String].collect()
    assert(hits.contains("cSTREAM"))
  }
}
