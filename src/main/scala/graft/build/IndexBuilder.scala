package graft.build

import graft.analysis.{Analyzer, StopWords}
import graft.codec.{Postings, VByte}
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** One analyzed term of one doc (exploded form). */
final case class TermRow(shard: Int, term: String, docId: Long, tf: Int)

/** Analyzed doc row — the first checkpointed stage. `terms`/`tfs` are the
  * per-doc distinct terms and their frequencies (parallel arrays), `len`
  * the total token count (BM25 length normalization needs the raw count,
  * BM25Reranker.cs:411). */
final case class AnalyzedRow(
    shard: Int, docId: Long, conv_id: String, turn_idx: Int, len: Int,
    terms: Array[String], tfs: Array[Int])

/** Distributed inverted-index build (SURVEY.md §7.2 steps 4-5).
  *
  * Layout under `indexDir`:
  *   analyzed/  (shard, docId, conv_id, turn_idx, len, terms[], tfs[])
  *   docs/      (shard, docId, conv_id, turn_idx, len)
  *   stats/     (n, avgdl)                        — single row
  *   df/        (term, df)                        — global document freqs
  *   postings/  Posting rows, sorted by (shard, term)
  *   doclens/   (shard, count, lensBlob)          — one row per shard
  *   _manifest/ per-stage JSON checkpoints (Manifests)
  *
  * Scale design (10^12 turns):
  *  - The index is **document-partitioned**: shard = pmod(murmur3(conv_id),
  *    shards), a pure function of the data with a FIXED shard count — the
  *    same doc lands in the same shard at any parallelism, which is what
  *    makes docIDs (and therefore top-k output) identical between N and 4N
  *    executors. Head (Zipfian) terms are automatically spread over all
  *    shards — the document partitioning is the salt (north rule's "salted
  *    repartitioning of head terms"): no single reducer ever owns a full
  *    head-term posting list, and within a shard posting assembly is a
  *    spillable sort, not a hash-group materialization.
  *  - Nothing proportional to corpus size is ever collected to the driver;
  *    global stats are one row, df is a table joined/sliced at query time.
  *  - groupBy(term) for df relies on Spark's partial (map-side) aggregation,
  *    which collapses head terms per partition before the shuffle.
  *  - Every stage is checkpointed to the index directory with an atomic
  *    manifest, so an interrupted build resumes without recomputation.
  */
object IndexBuilder {

  final case class Config(
      shards: Int = 32,
      language: String = "en",
      /** Partitions for the shard-repartition passes; defaults to `shards`
        * (capped by it — more partitions than shards is useless). */
      buildPartitions: Int = 0)

  def build(spark: SparkSession, input: DataFrame, indexDir: String,
            cfg: Config = Config()): Unit = {
    import spark.implicits._
    val parts = if (cfg.buildPartitions > 0) math.min(cfg.buildPartitions, cfg.shards) else cfg.shards
    val stop = cfg.language // resolved on executors via StopWords.forLang

    // ---- stage: analyzed -------------------------------------------------
    stage(spark, indexDir, "analyzed") { () =>
      val nShards = cfg.shards
      val withShard = input
        .select(col("conv_id").cast("string"), col("turn_idx").cast("int"), col("text"))
        .withColumn("shard", pmod(hash(col("conv_id")), lit(nShards)).cast("int"))
      // All rows of a shard into one partition, sorted: local rank becomes
      // a deterministic function of the data alone.
      val sorted = withShard
        .repartition(parts, col("shard"))
        .sortWithinPartitions("shard", "conv_id", "turn_idx")
      val analyzed = sorted.mapPartitions { rows =>
        val stopSet = StopWords.forLang(stop)
        var curShard = -1
        var rank = 0L
        rows.map { r =>
          val shard = r.getAs[Int]("shard")
          if (shard != curShard) { curShard = shard; rank = 0L }
          val docId = Ids.docId(shard, rank)
          rank += 1L
          val toks = Analyzer.tokenize(r.getAs[String]("text"), stopSet)
          val tfm = Analyzer.termFreqs(toks)
          val terms = tfm.keysIterator.toArray
          scala.util.Sorting.quickSort(terms)
          AnalyzedRow(shard, docId, r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"),
            toks.length, terms, terms.map(tfm))
        }
      }
      analyzed.write.mode("overwrite").parquet(s"$indexDir/analyzed")
      spark.read.parquet(s"$indexDir/analyzed").count()
    }

    lazy val analyzed = spark.read.parquet(s"$indexDir/analyzed").as[AnalyzedRow]

    // ---- stage: docs (doc map without the term payload) ------------------
    stage(spark, indexDir, "docs") { () =>
      analyzed.select($"shard", $"docId", $"conv_id", $"turn_idx", $"len")
        .write.mode("overwrite").parquet(s"$indexDir/docs")
      spark.read.parquet(s"$indexDir/docs").count()
    }

    // ---- stage: stats (N, avgdl) -----------------------------------------
    stage(spark, indexDir, "stats") { () =>
      analyzed.agg(count(lit(1)).as("n"), avg($"len").as("avgdl"))
        .select($"n".cast("long"), $"avgdl".cast("double"))
        .write.mode("overwrite").parquet(s"$indexDir/stats")
      1L
    }

    // ---- stage: df (global document frequencies) -------------------------
    stage(spark, indexDir, "df") { () =>
      // terms are distinct per doc already → count(*) = document frequency.
      // Partial aggregation collapses head terms map-side before the shuffle.
      analyzed.select(explode($"terms").as("term"))
        .groupBy($"term").agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$indexDir/df")
      spark.read.parquet(s"$indexDir/df").count()
    }

    // ---- stage: postings --------------------------------------------------
    stage(spark, indexDir, "postings") { () =>
      val termRows = analyzed.flatMap { a =>
        val out = new Array[TermRow](a.terms.length)
        var i = 0
        while (i < a.terms.length) {
          out(i) = TermRow(a.shard, a.terms(i), a.docId, a.tfs(i)); i += 1
        }
        out
      }
      // Spillable sort-merge assembly (SURVEY.md §7.3): one pass over
      // (shard, term, docId)-sorted rows, encoding each run into a Posting.
      // No collect_list — a head term's run streams through the encoder.
      val postings = termRows
        .repartition(parts, $"shard")
        .sortWithinPartitions("shard", "term", "docId")
        .mapPartitions { rows =>
          new Iterator[Posting] {
            private val it = rows.buffered
            def hasNext: Boolean = it.hasNext
            def next(): Posting = {
              val first = it.head
              val docs = new ArrayBuffer[Long](64)
              val tfs = new ArrayBuffer[Int](64)
              while (it.hasNext && it.head.shard == first.shard && it.head.term == first.term) {
                val r = it.next()
                docs += r.docId; tfs += r.tf
              }
              Postings.encode(first.shard, first.term, docs.toArray, tfs.toArray)
            }
          }
        }
      postings.write.mode("overwrite").parquet(s"$indexDir/postings")
      spark.read.parquet(s"$indexDir/postings").count()
    }

    // ---- stage: doclens (per-shard packed lengths) ------------------------
    stage(spark, indexDir, "doclens") { () =>
      val lens = analyzed.map(a => (a.shard, a.docId, a.len))
        .repartition(parts, $"_1")
        .sortWithinPartitions("_1", "_2")
        .mapPartitions { rows =>
          new Iterator[ShardLens] {
            private val it = rows.buffered
            def hasNext: Boolean = it.hasNext
            def next(): ShardLens = {
              val shard = it.head._1
              val lens = new ArrayBuffer[Int](1024)
              while (it.hasNext && it.head._1 == shard) lens += it.next()._3
              ShardLens(shard, lens.length, VByte.encodeInts(lens.toArray))
            }
          }
        }
      lens.write.mode("overwrite").parquet(s"$indexDir/doclens")
      spark.read.parquet(s"$indexDir/doclens").count()
    }
  }

  /** Run one stage unless its manifest says done; record rows/bytes/time. */
  private def stage(spark: SparkSession, indexDir: String, name: String)
                   (body: () => Long): Unit = {
    if (Manifests.isDone(indexDir, name)) return
    val t0 = System.nanoTime()
    val rows = body()
    val wallMs = (System.nanoTime() - t0) / 1000000L
    Manifests.write(indexDir,
      StageManifest(name, rows, Manifests.dirBytes(s"$indexDir/$name"), "done", wallMs))
  }
}
