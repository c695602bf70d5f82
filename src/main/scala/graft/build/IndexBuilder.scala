package graft.build

import graft.analysis.{Analyzer, StopWords}
import graft.codec.{Postings, VByte}
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer
import scala.util.chaining._

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
  *              — also serves as the doc map via Parquet column pruning
  *   stats/     (n, avgdl)                        — single row
  *   df/        (term, df)                        — global document freqs
  *   postings/  Posting rows, sorted by (shard, term); doc lengths ride
  *              INLINE in each posting (Lucene-norms-style), so the query
  *              path needs no side length table — no per-query shuffle and
  *              no O(shard) state anywhere. One output file per build
  *              partition; a shard never spans files (the colocated
  *              zero-exchange read path relies on this).
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

  /** Bump when the on-disk index layout changes — consumers key caches on it. */
  val FormatVersion = 3

  final case class Config(
      shards: Int = 32,
      language: String = "en",
      /** Partitions for the shard-repartition passes; defaults to `shards`
        * (capped by it — more partitions than shards is useless). */
      buildPartitions: Int = 0,
      /** Token-normalization hook (lemmatizer seam); must be pure and
        * deterministic, and the SAME function must be passed to the
        * Searcher so queries normalize identically. */
      normalizer: Analyzer.Norm = Analyzer.Identity)

  def build(spark: SparkSession, input: DataFrame, indexDir: String,
            cfg: Config = Config()): Unit = {
    import spark.implicits._
    // Task-side file commit (v2): the v1 default renames every task's
    // output sequentially on the driver, a constant cost that destroys
    // scaling efficiency on many-file stages. (On object stores, swap for
    // the store's committer; Iceberg commits replace this entirely.)
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    // The analyzed table explodes ~30-50x into term rows downstream; with
    // the default 128 MB splits its map side runs on a handful of tasks
    // and starves the cluster. Small splits keep every core busy (scan
    // cost is trivial next to the explode+shuffle it feeds).
    val prev = Seq(
      "spark.sql.files.maxPartitionBytes",
      // AQE partition coalescing would undo the exact shard→partition
      // balance below (it merges by size, re-introducing stragglers).
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try buildStages(spark, input, indexDir, cfg)
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def buildStages(spark: SparkSession, input: DataFrame, indexDir: String,
                          cfg: Config): Unit = {
    import spark.implicits._
    val parts = if (cfg.buildPartitions > 0) math.min(cfg.buildPartitions, cfg.shards) else cfg.shards
    val stop = cfg.language // resolved on executors via StopWords.forLang

    // Exact shard→partition placement (see ShardKeys): shard s goes to
    // partition s % parts, so every stage keyed by shard is perfectly
    // balanced — no balls-in-bins stragglers.
    val pkeys = ShardKeys.keys(cfg.shards, parts)
    def withPkey(df: DataFrame): DataFrame =
      df.withColumn("pkey", element_at(lit(pkeys), col("shard") + 1))

    // ---- stage: analyzed -------------------------------------------------
    // One exchange (exact placement by shard) carrying RAW TEXT only — the
    // analyzer runs AFTER the shuffle, fused into the same per-partition
    // pass that assigns ranks, so the exchange never moves the (larger)
    // term/tf arrays and the analyzed form is materialized exactly once,
    // straight into the Parquet writer. shard = murmur3(conv_id) mod FIXED
    // shard count: a pure function of the data, so docIds are identical at
    // any parallelism.
    stage(spark, indexDir, "analyzed") { () =>
      val nShards = cfg.shards
      val norm = cfg.normalizer
      withPkey(input
          .select(col("conv_id").cast("string"), col("turn_idx").cast("int"), col("text"))
          .withColumn("shard", pmod(hash(col("conv_id")), lit(nShards)).cast("int")))
        .select(col("pkey"), col("shard"), col("conv_id"), col("turn_idx"), col("text"))
        .repartition(parts, col("pkey"))
        .sortWithinPartitions("shard", "conv_id", "turn_idx")
        .mapPartitions { rows =>
          val stopSet = StopWords.forLang(stop)
          var curShard = -1
          var rank = 0L
          rows.map { r =>
            val shard = r.getInt(1)
            if (shard != curShard) { curShard = shard; rank = 0L }
            val docId = Ids.docId(shard, rank)
            rank += 1L
            val (len, terms, tfs) = Analyzer.analyze(r.getString(4), stopSet, norm)
            (shard, docId, r.getString(2), r.getInt(3), len, terms, tfs)
          }
        }
        .toDF("shard", "docId", "conv_id", "turn_idx", "len", "terms", "tfs")
        .pipe(df => graft.sources.TableIO.write(df, s"$indexDir/analyzed"))
      graft.sources.TableIO.read(spark, s"$indexDir/analyzed").count()
    }

    lazy val analyzed = graft.sources.TableIO.read(spark, s"$indexDir/analyzed")
    // NOTE: there is no separate "docs" table — doc metadata reads go
    // through Parquet column pruning on analyzed/ (only the selected
    // columns are scanned), so materializing a projection would only add
    // a stage and double the doc-map storage.

    // The four post-analyze stages depend only on analyzed/ and not on each
    // other — submit them concurrently so the small aggregations overlap
    // the posting-assembly shuffle instead of serializing after it.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val stages = Seq(

    // ---- stage: stats (N, avgdl) -----------------------------------------
    Future(stage(spark, indexDir, "stats") { () =>
      analyzed.agg(count(lit(1)).as("n"), avg($"len").as("avgdl"))
        .select($"n".cast("long"), $"avgdl".cast("double"))
        .pipe(df => graft.sources.TableIO.write(df, s"$indexDir/stats"))
      1L
    }),

    // ---- stage: df (global document frequencies) -------------------------
    Future(stage(spark, indexDir, "df") { () =>
      // terms are distinct per doc already → count(*) = document frequency.
      // Partial aggregation collapses head terms map-side before the shuffle.
      analyzed.select(explode($"terms").as("term"))
        .groupBy($"term").agg(count(lit(1)).as("df"))
        .pipe(df => graft.sources.TableIO.write(df, s"$indexDir/df"))
      spark.read.parquet(s"$indexDir/df").count()
    }),

    // ---- stage: postings --------------------------------------------------
    Future(stage(spark, indexDir, "postings") { () =>
      // Chunked sort-merge assembly (SURVEY.md §7.3). Map side pre-groups
      // each input slice into (shard, term, docIds[], tfs[]) CHUNKS — the
      // shuffle carries ~vocab-sized rows per slice instead of one row per
      // term occurrence (orders of magnitude fewer rows and no per-row
      // overhead), which is THE shuffle-volume lever at 10^12 turns.
      // Because analyzed rows are docId-ordered per shard and every
      // (file-slice, shard) covers a contiguous docId range, chunks of one
      // (shard, term) have disjoint ranges: the reduce side just sorts
      // chunks by head docId and concatenates — no element-wise merge.
      // Head terms are already split across all shards by the document
      // partitioning; within a shard they stream through the encoder.
      val chunks = analyzed
        .select(col("shard"), col("docId"), col("len"), col("terms"), col("tfs"))
        .mapPartitions { rows =>
          // Map-side pre-grouping AND pre-compression: each chunk's docId
          // deltas + tfs + doc lens are VByte-encoded BEFORE the shuffle,
          // so the exchange carries ~1-2 bytes per posting entry instead
          // of 12 — the shuffle-volume lever at 10^12 turns. Keys are
          // "term shard" (tokens never contain spaces). The map FLUSHES
          // whenever it holds FlushEntries postings, so task memory is
          // bounded no matter how hard Parquet compressed the input
          // slice; a key flushed twice just produces two chunks, and
          // chunk docId ranges stay disjoint because flushes preserve
          // arrival (= docId) order.
          final class Chunk(val shard: Int) {
            val docs = new ArrayBuffer[Byte](16)
            val tfs = new ArrayBuffer[Byte](8)
            val lens = new ArrayBuffer[Byte](8)
            var n = 0
            var firstDoc = 0L
            private var prev = 0L
            def add(d: Long, f: Int, dl: Int): Unit = {
              if (n == 0) firstDoc = d
              VByte.writeVLong(docs, d - prev); prev = d
              VByte.writeVLong(tfs, f.toLong)
              VByte.writeVLong(lens, dl.toLong)
              n += 1
            }
          }
          val FlushEntries = 4000000
          new Iterator[(Int, String, Long, Int, Array[Byte], Array[Byte], Array[Byte])] {
            private val m = new java.util.HashMap[String, Chunk]()
            private var entries = 0
            private var pending: java.util.Iterator[java.util.Map.Entry[String, Chunk]] =
              java.util.Collections.emptyIterator()
            private def refill(): Unit = {
              while (rows.hasNext && entries < FlushEntries) {
                val r = rows.next()
                val shard = r.getInt(0)
                val docId = r.getLong(1)
                val dl = r.getInt(2)
                val terms = r.getSeq[String](3)
                val tfs = r.getSeq[Int](4)
                var i = 0
                while (i < terms.length) {
                  val key = terms(i) + " " + shard
                  var c = m.get(key)
                  if (c == null) { c = new Chunk(shard); m.put(key, c) }
                  c.add(docId, tfs(i), dl)
                  entries += 1
                  i += 1
                }
              }
              pending = new java.util.HashMap(m).entrySet().iterator()
              m.clear()
              entries = 0
            }
            // Iterator contract: a refill can produce ZERO entries (e.g. a
            // stopword-only slice) — keep refilling until something pends
            // or the input is exhausted.
            def hasNext: Boolean = {
              while (!pending.hasNext && rows.hasNext) refill()
              pending.hasNext
            }
            def next(): (Int, String, Long, Int, Array[Byte], Array[Byte], Array[Byte]) = {
              if (!hasNext) throw new NoSuchElementException("postings chunk iterator")
              val e = pending.next()
              val c = e.getValue
              (c.shard, e.getKey.substring(0, e.getKey.indexOf(' ')), c.firstDoc, c.n,
                c.docs.toArray, c.tfs.toArray, c.lens.toArray)
            }
          }
        }
        .toDF("shard", "term", "firstDoc", "n", "docs", "tfs", "lens")
      val postings = withPkey(chunks)
        .repartition(parts, $"pkey")
        .select(col("shard"), col("term"), col("firstDoc"), col("n"),
          col("docs"), col("tfs"), col("lens"))
        .sortWithinPartitions("shard", "term", "firstDoc")
        .mapPartitions { rows =>
          new Iterator[Posting] {
            private val it = rows.buffered
            def hasNext: Boolean = it.hasNext
            def next(): Posting = {
              val first = it.head
              val shard = first.getInt(0)
              val term = first.getString(1)
              // chunks arrive sorted by firstDoc; ranges are disjoint, so
              // decode + concatenate (no element-wise merge), then re-encode
              // with block-aligned skip metadata.
              var parts = List.empty[(Array[Long], Array[Int], Array[Int])]
              var total = 0
              while (it.hasNext && it.head.getInt(0) == shard && it.head.getString(1) == term) {
                val r = it.next()
                val n = r.getInt(3)
                val d = VByte.decodeDeltas(r.getAs[Array[Byte]](4), n)
                val t = VByte.decodeInts(r.getAs[Array[Byte]](5), n)
                val l = VByte.decodeInts(r.getAs[Array[Byte]](6), n)
                parts = (d, t, l) :: parts
                total += n
              }
              val ordered = parts.reverse
              val docs = new Array[Long](total)
              val tfs = new Array[Int](total)
              val lens = new Array[Int](total)
              var o = 0
              ordered.foreach { case (d, t, l) =>
                System.arraycopy(d, 0, docs, o, d.length)
                System.arraycopy(t, 0, tfs, o, t.length)
                System.arraycopy(l, 0, lens, o, l.length)
                o += d.length
              }
              Postings.encode(shard, term, docs, tfs, lens)
            }
          }
        }
      graft.sources.TableIO.write(postings.toDF(), s"$indexDir/postings")
      graft.sources.TableIO.read(spark, s"$indexDir/postings").count()
    }))

    stages.foreach(Await.result(_, Duration.Inf))
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
