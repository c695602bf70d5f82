package graft.query

import graft.analysis.{Analyzer, StopWords}
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Query executor over a built index (SURVEY.md §3 entry points 1-2).
  *
  * Two equivalent paths, both returning (conv_id, turn_idx, docId, score):
  *
  *  - `topK` — the scale path: broadcast the analyzed query + its global
  *    df slice (a handful of values — never the df table itself), prune the
  *    postings scan to the query terms (predicate pushed to Parquet), run
  *    the block-max WAND kernel per shard (bounded heap; doc lengths ride
  *    INLINE in the posting blobs, so no side table is touched), then merge
  *    the ≤ shards·k candidates with a distributed TakeOrdered.
  *
  *    Shard grouping strategy (scale design):
  *     * COLOCATED (default when sound): the build writes one file per
  *       build partition and a shard never spans files, so a mapPartitions
  *       over the pruned scan sees whole shards — ZERO exchange anywhere in
  *       the query plan. Sound iff Spark never splits a postings file
  *       across read partitions, which is guaranteed when every file is ≤
  *       min(spark.sql.files.maxPartitionBytes, openCostInBytes) — checked
  *       once at construction. On a production deployment the same
  *       guarantee comes from bucketed-table layout or per-shard files
  *       sized under the split threshold.
  *     * FALLBACK: groupByKey(shard) — one narrow exchange of ONLY the
  *       pruned query-term posting rows (≤ |terms|·shards rows), never the
  *       corpus and never any length table.
  *
  *  - `topKExhaustive` / `scoreAll` — the relational twin: explode analyzed
  *    docs, broadcast-hash-join query terms, aggregate the codegen'd BM25
  *    expression. Used for correctness cross-checks and full score dumps
  *    (≅ reference ScoreAsync, which yields every doc).
  */
object Searcher {
  /** Doc metadata view: a pruned-column read of analyzed/ (no separate doc
    * table is materialized — Parquet scans only these columns). */
  def docMeta(spark: SparkSession, indexDir: String): DataFrame =
    graft.sources.TableIO.read(spark, s"$indexDir/analyzed")
      .select(col("shard"), col("docId"), col("conv_id"), col("turn_idx"), col("len"))
}

final class Searcher(spark: SparkSession, indexDir: String,
                     params: Bm25.Params = Bm25.RefDefaults,
                     language: String = "en",
                     cacheTables: Boolean = false,
                     /** Must equal the IndexBuilder.Config.normalizer the
                       * index was built with. */
                     normalizer: Analyzer.Norm = Analyzer.Identity,
                     /** Snapshot (time-travel) read: serve the index as of
                       * this committed refresh generation; -1 = latest.
                       * Validity is checked at construction (retention
                       * keeps the last two generations' stats/df; compact
                       * collapses older snapshots) — see
                       * IndexBuilder.validateSnapshot. */
                     asOfGen: Long = -1L,
                     /** Federated serving ([[Federated]]): score with these
                       * GLOBAL (n, avgdl) instead of this index's own —
                       * Lucene's MultiReader contract, making member scores
                       * comparable across indexes. Pair with the combined
                       * df via [[topKWithDf]]. */
                     statsOverride: Option[(Long, Double)] = None) {
  import spark.implicits._

  /** The generation this Searcher serves (pinned at construction — a
    * Searcher serves ONE snapshot; the serving tier builds a new Searcher
    * on publish). */
  val generation: Long =
    if (asOfGen >= 0L) {
      graft.build.IndexBuilder.validateSnapshot(spark, indexDir, asOfGen)
      asOfGen
    } else graft.build.IndexBuilder.committedGen(indexDir)

  /** Hot-index mode: pin the (small) per-query tables in executor memory.
    * Off by default — a 10^12-doc index must not be blanket-persisted;
    * the serving tier decides what stays hot. */
  private def maybeCache(df: DataFrame): DataFrame =
    if (cacheTables) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else df

  /** Base postings + any refresh-written delta segments (postings_seg_<g>).
    * A document lives in exactly ONE segment, so per-doc scores never span
    * segments; when one kernel group sees the same term from two segments
    * the lists are merged (disjoint ranges — pure concatenation). Snapshot
    * of the segment list is taken at construction: a Searcher serves one
    * index generation; the serving tier builds a new Searcher on publish. */
  private val postingsPaths: Seq[String] =
    s"$indexDir/postings" +: graft.build.IndexBuilder.segmentPathsAsOf(spark, indexDir, generation)
  private val postingsDF = maybeCache(graft.sources.TableIO.read(spark, postingsPaths))
  private val dfDF = maybeCache(graft.sources.TableIO.read(spark,
    graft.build.IndexBuilder.dfPathAsOf(indexDir, generation)))
  /** Doc-meta projection for KERNEL-HIT resolution: coverage-filtered
    * only. Kernel hits come from gen-pinned postings with tombstones
    * already excluded in the kernel, so the tombstone anti-join would be
    * pure redundancy — an extra tombstone-table scan + BroadcastExchange
    * on every query's point read (PlanSpec pins its absence). */
  private lazy val hitMetaDF = maybeCache {
    val base = graft.sources.TableIO.read(spark, s"$indexDir/analyzed")
    coveredOnly.fold(base)(base.where)
      .select(col("shard"), col("docId"), col("conv_id"), col("turn_idx"), col("len"))
  }
  /** Same projection for RELATIONAL paths (scoreAll keepZeros, doc scans),
    * which surface docs without going through a kernel — tombstones hidden
    * with the broadcast anti-join, layered over the shared cached frame. */
  private lazy val docMetaDF = tombstoneFree(hitMetaDF)

  /** The shared (cached when cacheTables) doc-meta projection — exposed so
    * the query surface's repeated doc-map reads (candidate resolution,
    * doc-length views) hit the hot frame instead of re-scanning analyzed/
    * per query. Same rows as [[Searcher.docMeta]] on an index with no
    * unrefreshed appends; coverage-filtered like every kernel-hit read. */
  private[graft] def hitMeta: DataFrame = hitMetaDF

  /** The (cached when cacheTables) base+segment postings table — exposed
    * for relational consumers that decode pruned posting slices themselves
    * (combined-fields fold), so they share the searcher's hot frame. */
  private[graft] def postingsView: DataFrame = postingsDF

  private val statsRow = graft.sources.TableIO.read(spark,
    graft.build.IndexBuilder.statsPathAsOf(indexDir, generation)).head()

  /** Committed-coverage filter: analyzed/ may hold appended-but-UNREFRESHED
    * rows, and the relational paths (scoreAll, doc-meta) scan analyzed/
    * directly — without this filter they would surface documents the WAND
    * path (committed postings only) and the committed stats/df cannot see.
    * None when no append/stream ever touched the index (no HWM manifests):
    * coverage is then trivially complete and the filter would only cost. */
  private val coveredOnly: Option[org.apache.spark.sql.Column] =
    if (asOfGen < 0L &&
      graft.build.Manifests.read(indexDir, "stream_hwm_max").isEmpty) None
    else graft.build.IndexBuilder.metaShards(indexDir).map { shards =>
      // a snapshot read ALWAYS filters to its generation's coverage —
      // analyzed/ holds every later generation's rows too
      val cover = graft.build.IndexBuilder.readCoverAsOf(spark, indexDir, shards, generation)
      expr(s"docId & ${graft.model.Ids.RankMask}")
        .lt(element_at(lit(cover), col("shard") + 1))
    }
  /** Delete tombstones as of this Searcher's generation
    * ([[graft.build.IndexBuilder.delete]]): per-shard docId sets, encoded
    * once at construction into the same VByte posting form the MUST_NOT
    * path uses and broadcast — every kernel excludes them with a
    * forward-only leapfrog cursor ([[Wand.Excl]]), never an anti-join of
    * the corpus. Driver/broadcast residency is bounded by DELETED docs
    * (VByte ≈ 1-2 bytes/doc after delta encoding); the growth path past
    * ~10^9 accumulated deletes is per-shard tombstone sidecar files
    * colocated with the postings shards — at that point [[compact]] (which
    * folds tombstones away physically) is overdue anyway. Usually None. */
  private val tombstonePath: Option[String] =
    graft.build.IndexBuilder.tombstonePathAsOf(indexDir, generation)
  private val tombBc: org.apache.spark.broadcast.Broadcast[Map[Int, Posting]] = {
    val m: Map[Int, Posting] = tombstonePath.fold(Map.empty[Int, Posting]) { path =>
      graft.sources.TableIO.read(spark, path)
        .select(col("shard"), col("docId")).as[(Int, Long)].collect()
        .groupBy(_._1).map { case (s, arr) =>
          val docs = arr.map(_._2).sorted
          s -> graft.codec.Postings.encode(s, "\u0000tombstone", docs,
            Array.fill(docs.length)(1), Array.fill(docs.length)(1))
        }
    }
    spark.sparkContext.broadcast(m)
  }

  /** Hide tombstoned docs from a relational frame with one broadcast
    * anti-join against the (tiny) tombstone table. */
  private def tombstoneFree(df: DataFrame): DataFrame =
    tombstonePath.fold(df)(p => df.join(
      broadcast(graft.sources.TableIO.read(spark, p).select(col("docId"))),
      Seq("docId"), "left_anti"))

  private def covered(df: DataFrame): DataFrame =
    tombstoneFree(coveredOnly.fold(df)(df.where))
  val n: Long = statsOverride.map(_._1).getOrElse(statsRow.getAs[Long]("n"))
  val avgdl: Double = statsOverride.map(_._2).getOrElse(statsRow.getAs[Double]("avgdl"))
  /** Exact total token count (stats `sumlen`) — the collection-model
    * denominator for [[topKDirichlet]]. Not overridable by `statsOverride`
    * (the federated surface is BM25-only; see [[Federated]]). Legacy
    * stats tables predate the column — fall back to round(n·avgdl), the
    * same reconstruction IndexBuilder's maintenance ops use, so opening
    * an old index never fails (only Dirichlet sees the approximation). */
  val sumlen: Long =
    if (statsRow.schema.fieldNames.contains("sumlen")) statsRow.getAs[Long]("sumlen")
    else math.round(statsRow.getAs[Long]("n") * statsRow.getAs[Double]("avgdl"))

  /** Largest posting file across base + segments (listed once at
    * construction); -1 when listing failed. */
  private val maxPostingsFileLen: Long = {
    try {
      postingsPaths.flatMap { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(path).collect {
          case f if f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith(".") => f.getLen
        }
      }.foldLeft(0L)(math.max)
    } catch { case _: Throwable => -1L }
  }

  /** True when the zero-exchange colocated kernel is sound: no postings
    * file can be split across read partitions (see class doc). Evaluated
    * against the CURRENT session conf on every call — split sizes are
    * mutable session state (IndexBuilder.build temporarily lowers
    * maxPartitionBytes on the same session), and a stale construction-time
    * answer would let a split file be scored as two half-shards. */
  /** Whether every postings file is DOC-complete (a doc's whole term set
    * in one file) — true for broadcast-dictionary builds and all refresh
    * segments; false for range-partitioned builds (Config.dictRanges > 1),
    * whose files each hold one TERM range of a shard. The colocated
    * kernel scores each partition independently, which is only sound when
    * a doc's full term set is visible in one partition. Legacy indexes
    * (no layout manifest) predate the ranged path and are doc-complete. */
  private val docCompleteFiles: Boolean =
    graft.build.Manifests.read(indexDir, "postings_layout").forall(_.rows <= 1L)

  def colocated: Boolean = maxPostingsFileLen >= 0 && docCompleteFiles && {
    val conf = spark.sessionState.conf
    maxPostingsFileLen <= math.min(conf.filesMaxPartitionBytes, conf.filesOpenCostInBytes)
  }

  def analyzeQuery(query: String): Map[String, Int] =
    Analyzer.termFreqs(Analyzer.tokenize(query, StopWords.forLang(language), normalizer))

  /** Per-term global df, memoized across queries (misses cached as 0).
    * First sight of a term costs one pushed-down ≤|terms|-row scan of the
    * df table; repeat queries then build their plans without any job. */
  private val dfCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  def dfSlice(terms: Seq[String]): Map[String, Long] = {
    val missing = terms.filterNot(dfCache.containsKey)
    if (missing.nonEmpty) {
      val found = dfDF.where(col("term").isin(missing: _*))
        .as[TermStat].collect().map(t => t.term -> t.df).toMap
      missing.foreach(t => dfCache.put(t, java.lang.Long.valueOf(found.getOrElse(t, 0L))))
    }
    terms.iterator.map(t => t -> dfCache.get(t).longValue).filter(_._2 > 0L).toMap
  }

  /** Run the WAND kernel per shard over a pruned postings Dataset,
    * answering every query in `qs` in one pass. Emits (qid, docId, score).
    * Zero-exchange when `colocated`; narrow groupByKey(shard) otherwise. */
  private def shardTopK(postings: Dataset[Posting],
                        qs: Seq[(String, Map[String, Int])],
                        dfm: Map[String, Long], k: Int,
                        exhaustive: Boolean,
                        forceGrouped: Boolean = false,
                        /** >0 = conjunctive (AND) mode: a doc must contain
                          * this many distinct query terms (= all of them). */
                        conjunctiveRequired: Int = 0,
                        /** minimum_should_match for OR mode (1 = plain OR). */
                        minMatch: Int = 1,
                        /** search_after page gate — see [[Wand.TopK]]. */
                        gateMax: Double = Double.PositiveInfinity,
                        /** per-ANALYZED-term query-time boosts (absent = 1). */
                        boosts: Map[String, Double] = Map.empty): DataFrame = {
    val p = params
    val (nn, ad) = (n, avgdl)
    val tb = tombBc
    def kernel(group: Seq[Posting]): Iterator[(String, Long, Double)] = {
      // A term can appear once per SEGMENT (base + refresh deltas) when a
      // partition holds both; merge on the fly — segment docId ranges are
      // disjoint, so the merge is a concatenation + one re-encode.
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val tomb = tb.value.get(group.head.shard).toSeq
      qs.iterator.flatMap { case (qid, qtf) =>
        val inputs = qtf.toSeq.collect {
          case (t, f) if byTerm.contains(t) && dfm.contains(t) =>
            Wand.TermInput(byTerm(t), f, dfm(t), boosts.getOrElse(t, 1.0))
        }
        val scored =
          if (conjunctiveRequired > 0)
            Wand.topKAnd(inputs, conjunctiveRequired, nn, ad, k, p, excludes = tomb)
          else if (exhaustive) Wand.topKExhaustive(inputs, nn, ad, k, p, excludes = tomb)
          else if (tomb.nonEmpty) Wand.topKNot(inputs, tomb, nn, ad, k, p, minMatch, gateMax)
          else Wand.topK(inputs, nn, ad, k, p, minMatch, gateMax)
        scored.iterator.map(s => (qid, s.docId, s.score))
      }
    }
    val out =
      if (colocated && !forceGrouped)
        postings.mapPartitions { ps =>
          val byShard = new java.util.HashMap[Integer, ArrayBuffer[Posting]]()
          ps.foreach(po => byShard.computeIfAbsent(po.shard, _ => new ArrayBuffer[Posting]) += po)
          import scala.jdk.CollectionConverters._
          byShard.values.iterator.asScala.flatMap(g => kernel(g.toSeq))
        }
      else
        postings.groupByKey(_.shard).flatMapGroups((_, ps) => kernel(ps.toSeq))
    out.toDF("qid", "docId", "score")
  }

  /** The kernel + merge plan of a single query, BEFORE hit collection —
    * ends in a TakeOrdered over ≤ shards·k candidate rows. Exposed so plan
    * tests can pin the scan pushdown / no-Exchange contracts. */
  private[graft] def kernelFrame(query: String, k: Int,
                                 exhaustiveKernel: Boolean = false): Option[DataFrame] = {
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return None
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return None
    val terms = dfm.keys.toSeq.sorted
    val postings = postingsDF.where(col("term").isin(terms: _*)).as[Posting]
    val perShard = shardTopK(postings, Seq(("q", qtf)), dfm, k, exhaustiveKernel)
      .select($"docId", $"score")
    Some(perShard.orderBy(desc("score"), asc("docId")).limit(k))
  }

  /** WAND top-k. Deterministic order: score desc, docId asc. */
  def topK(query: String, k: Int, exhaustiveKernel: Boolean = false): DataFrame = {
    val kernel = kernelFrame(query, k, exhaustiveKernel)
    if (kernel.isEmpty) return emptyHits()
    // TakeOrdered merge of the ≤ shards·k candidates; the ≤ k winners come
    // back to the driver so the doc-meta lookup becomes a PRUNED point
    // read (docId IN (...) gets Parquet rowgroup / in-memory batch
    // pruning — docIds are sorted within shard files) instead of a join
    // that scans the whole doc map per query.
    val hits = kernel.get.as[(Long, Double)].collect()
    if (hits.isEmpty) return emptyHits()
    val scoreMap = typedLit(hits.toMap)
    hitMetaDF
      .filter(col("docId").isin(hits.map(_._1): _*))
      .select($"conv_id", $"turn_idx", $"docId",
        element_at(scoreMap, $"docId").as("score"))
      .orderBy(desc("score"), asc("docId")).limit(k)
  }

  /** minimum_should_match top-k (Lucene's msm over a SHOULD clause list):
    * OR-mode BM25, but a document qualifies only if it contains at least
    * `minMatch` DISTINCT analyzed query terms. minMatch = 1 ≡ [[topK]];
    * minMatch = all terms ≡ [[topKAnd]] (with identical scores — the count
    * filter never changes a qualifying doc's score). Same zero-exchange
    * plan; the count check rides the kernel's existing full-evaluation
    * loop, so pruning power is unchanged. */
  def topKMsm(query: String, minMatch: Int, k: Int): DataFrame = {
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return emptyHits()
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty || dfm.size < minMatch) return emptyHits()
    val terms = dfm.keys.toSeq.sorted
    val postings = postingsDF.where(col("term").isin(terms: _*)).as[Posting]
    val perShard = shardTopK(postings, Seq(("q", qtf)), dfm, k,
      exhaustive = false, minMatch = minMatch)
    resolveHits(perShard, k)
  }

  /** Deep-pagination top-k (Elasticsearch's search_after): the hits whose
    * ROUND-4 score is ≤ `afterScore4` — i.e. at or below the previous
    * page's last hit — with the page gate applied INSIDE the kernel heap
    * ([[Wand.TopK]] gateMax), so page p costs one k-sized heap per shard,
    * never a (p·k)-sized one and never a driver-side re-sort of p·k rows.
    *
    * Boundary ties (score == afterScore4) are RETURNED: a total-order
    * pagination cursor needs a caller-unique tiebreak key (ES documents
    * the same requirement), and only the caller knows its key — it
    * finishes the strictly-after cut relationally on (score, its key).
    * Scores are exposed round-4 everywhere on this surface, so the cursor
    * lives in the same quantized space: stable under JSON round-trips. */
  def topKAfter(query: String, k: Int, afterScore4: Double): DataFrame = {
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return emptyHits()
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return emptyHits()
    val terms = dfm.keys.toSeq.sorted
    val postings = postingsDF.where(col("term").isin(terms: _*)).as[Posting]
    // +5e-5 = half a round-4 ulp: every doc ROUNDING to ≤ afterScore4
    // passes the raw-score gate; the caller's relational cut is exact.
    val perShard = shardTopK(postings, Seq(("q", qtf)), dfm, k,
      exhaustive = false, gateMax = afterScore4 + 5e-5)
    resolveHits(perShard, k)
  }

  /** Synonym-aware top-k — Lucene's SynonymQuery semantics, exactly: each
    * query term and its synonyms form ONE pseudo-term whose per-doc tf is
    * the SUM of member tfs ([[graft.codec.Postings.unionSum]]) and whose
    * df is the MAX member df (SynonymQuery's docFreq contract), so a doc
    * is never double-counted for saying the same thing two ways, yet the
    * group never scores above a genuinely-frequent single term. Synonym
    * strings are analyzed with the index's own analyzer. Member lists
    * union-merge per shard inside the kernel (bounded by the group's
    * pruned posting rows); everything else — pruning, tombstones, plan
    * shape — is the standard zero-exchange kernel path. Empty synonym
    * map ≡ [[topK]]. */
  def topKSynonyms(query: String, synonyms: Map[String, Seq[String]],
                   k: Int): DataFrame = {
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return emptyHits()
    val groups: Map[String, Seq[String]] = qtf.keys.map { t =>
      val syns = synonyms.getOrElse(t, Nil)
        .flatMap(s => analyzeQuery(s).keys).distinct.filterNot(_ == t)
      t -> (t +: syns)
    }.toMap
    val allTerms = groups.values.flatten.toSeq.distinct
    val dfm = dfSlice(allTerms)
    val gdf: Map[String, Long] = groups.collect {
      case (t, ms) if ms.exists(dfm.contains) =>
        t -> ms.flatMap(dfm.get).max
    }
    if (gdf.isEmpty) return emptyHits()
    val live = allTerms.filter(dfm.contains).sorted
    val postings = postingsDF.where(col("term").isin(live: _*)).as[Posting]
    val p = params
    val (nn, ad) = (n, avgdl)
    val tb = tombBc
    val kk = k
    def kernel(group: Seq[Posting]): Iterator[(Long, Double)] = {
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val tomb = tb.value.get(group.head.shard).toSeq
      val inputs = qtf.toSeq.flatMap { case (t, f) =>
        val members = groups(t).filter(byTerm.contains)
        gdf.get(t) match {
          case Some(d) if members.nonEmpty =>
            val posting =
              if (members.lengthCompare(1) == 0) byTerm(members.head)
              else graft.codec.Postings.unionSum(members.map(byTerm), t)
            Some(Wand.TermInput(posting, f, d))
          case _ => None
        }
      }
      val scored =
        if (tomb.nonEmpty) Wand.topKNot(inputs, tomb, nn, ad, kk, p)
        else Wand.topK(inputs, nn, ad, kk, p)
      scored.iterator.map(s => (s.docId, s.score))
    }
    resolveHits(perShardScores(postings)(kernel), k)
  }

  /** Top-k with CALLER-supplied per-term global df — the federated path
    * ([[Federated]]): the caller sums df across member indexes and every
    * member kernel scores with the combined values (paired with the
    * `statsOverride` constructor arg for global n/avgdl). Terms absent
    * from this member still prune its postings scan to nothing — a
    * member without the term simply contributes no candidates. */
  def topKWithDf(query: String, k: Int, dfm: Map[String, Long]): DataFrame = {
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty || dfm.isEmpty) return emptyHits()
    val terms = dfm.keys.toSeq.sorted
    val postings = postingsDF.where(col("term").isin(terms: _*)).as[Posting]
    val perShard = shardTopK(postings, Seq(("q", qtf)), dfm, k, exhaustive = false)
    resolveHits(perShard, k)
  }

  /** Boosted top-k (Lucene's `term^w` query-time weights): OR-mode BM25
    * with each term's contribution scaled by its boost. Boost keys are RAW
    * tokens (analyzed here with the index's own analyzer, so stemming /
    * normalization can never desynchronize the key from the indexed term);
    * absent terms default to 1.0 — boosts = empty ≡ [[topK]] exactly. The
    * boost scales the kernel's pruning upper bound by the same factor
    * ([[Wand.TermInput]]), so WAND skipping stays exact. */
  def topKBoosted(query: String, boosts: Map[String, Double], k: Int): DataFrame = {
    // driver-side twin of Wand.TermInput's require: fail before any job
    // is launched rather than as an executor task failure
    boosts.foreach { case (t, b) =>
      require(b > 0.0, s"boost for term '$t' must be > 0 (got $b)") }
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return emptyHits()
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return emptyHits()
    val aboosts = boosts.flatMap { case (raw, b) =>
      analyzeQuery(raw).keys.map(_ -> b) }
    val terms = dfm.keys.toSeq.sorted
    val postings = postingsDF.where(col("term").isin(terms: _*)).as[Posting]
    val perShard = shardTopK(postings, Seq(("q", qtf)), dfm, k,
      exhaustive = false, boosts = aboosts)
    resolveHits(perShard, k)
  }

  /** Shared per-shard kernel dispatch for single-query (docId, score)
    * kernels: zero-exchange mapPartitions when [[colocated]], narrow
    * groupByKey(shard) of the pruned rows otherwise — the same two plan
    * shapes [[shardTopK]] documents. `kernel` must capture only
    * method-local state (never the Searcher itself). */
  private def perShardScores(postings: Dataset[Posting])(
      kernel: Seq[Posting] => Iterator[(Long, Double)]): DataFrame = {
    val out =
      if (colocated)
        postings.mapPartitions { ps =>
          val byShard = new java.util.HashMap[Integer, ArrayBuffer[Posting]]()
          ps.foreach(po => byShard.computeIfAbsent(po.shard, _ => new ArrayBuffer[Posting]) += po)
          import scala.jdk.CollectionConverters._
          byShard.values.iterator.asScala.flatMap(g => kernel(g.toSeq))
        }
      else
        postings.groupByKey(_.shard).flatMapGroups((_, ps) => kernel(ps.toSeq))
    out.toDF("docId", "score")
  }

  /** Per-term global COLLECTION frequency (total occurrences — the
    * language-model statistic df can't substitute for), memoized like
    * [[dfSlice]]. The index stores no cf table (BM25 never needs one), so
    * first sight of a term costs one pass over that term's PRUNED posting
    * rows — decode, skip tombstoned docs, sum tfs — aggregated per term;
    * repeat queries hit the memo. Misses cached as 0. */
  private val cfCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  def cfSlice(terms: Seq[String]): Map[String, Long] = {
    val missing = terms.distinct.filterNot(cfCache.containsKey)
    if (missing.nonEmpty) {
      val tb = tombBc
      val found = postingsDF.where(col("term").isin(missing: _*)).as[Posting]
        .map { po =>
          val ex = new Wand.Excl(tb.value.get(po.shard).toSeq)
          val c = new graft.codec.Postings.Cursor(po)
          var s = 0L
          while (c.next()) if (!ex.excluded(c.docId)) s += c.tf
          (po.term, s)
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .collect().toMap
      missing.foreach(t => cfCache.put(t, java.lang.Long.valueOf(found.getOrElse(t, 0L))))
    }
    terms.iterator.map(t => t -> cfCache.get(t).longValue).filter(_._2 > 0L).toMap
  }

  /** Completion suggester (ES completion / Lucene prefix termsEnum over
    * the dictionary): dictionary terms starting with `prefix`, popularity-
    * ranked (df desc, term asc). One pushed-down StartsWith scan of the
    * vocabulary-sized df table — never touches postings or the corpus. */
  def complete(prefix: String, k: Int): DataFrame =
    dfDF.where(col("term").startsWith(prefix))
      .select(col("term"), col("df"))
      .orderBy(desc("df"), asc("term")).limit(k)

  /** Dirichlet-smoothed query-likelihood top-k ([[LmDirichlet]]) — the
    * alternative similarity seam: same index, same pruned-scan plan shape
    * as [[topK]], a different per-term formula needing cf instead of df.
    * The kernel is exhaustive over the pruned postings (WAND's bound
    * algebra doesn't transfer to the clamped LM contribution — see
    * [[LmDirichlet]]); everything else (colocated zero-exchange dispatch,
    * tombstones, point-read hit resolution) is the standard path. */
  def topKDirichlet(query: String, mu: Double, k: Int): DataFrame = {
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return emptyHits()
    val cfm = cfSlice(qtf.keys.toSeq)
    if (cfm.isEmpty) return emptyHits()
    val live = cfm.keys.toSeq.sorted
    val postings = postingsDF.where(col("term").isin(live: _*)).as[Posting]
    val (tt, muu, kk) = (sumlen, mu, k)
    val tb = tombBc
    def kernel(group: Seq[Posting]): Iterator[(Long, Double)] = {
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val inputs = qtf.toSeq.collect {
        case (t, f) if byTerm.contains(t) && cfm.contains(t) =>
          LmDirichlet.TermInput(byTerm(t), f, cfm(t))
      }
      LmDirichlet.topK(inputs, tt, muu, kk,
          excludes = tb.value.get(group.head.shard).toSeq)
        .iterator.map(s => (s.docId, s.score))
    }
    resolveHits(perShardScores(postings)(kernel), k)
  }

  /** Classic TF-IDF top-k ([[ClassicTfIdf]]) — the third similarity over
    * the same index: √tf · idf² · 1/√dl, df statistics like BM25, same
    * pruned-scan dispatch, exhaustive kernel. */
  def topKTfIdf(query: String, k: Int): DataFrame = {
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return emptyHits()
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return emptyHits()
    val live = dfm.keys.toSeq.sorted
    val postings = postingsDF.where(col("term").isin(live: _*)).as[Posting]
    val (nn, kk) = (n, k)
    val tb = tombBc
    def kernel(group: Seq[Posting]): Iterator[(Long, Double)] = {
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val inputs = qtf.toSeq.collect {
        case (t, f) if byTerm.contains(t) && dfm.contains(t) =>
          ClassicTfIdf.TermInput(byTerm(t), f, dfm(t))
      }
      ClassicTfIdf.topK(inputs, nn, kk,
          excludes = tb.value.get(group.head.shard).toSeq)
        .iterator.map(s => (s.docId, s.score))
    }
    resolveHits(perShardScores(postings)(kernel), k)
  }

  /** Disjunction-max top-k (Lucene's DisjunctionMaxQuery): each subquery
    * scores independently as OR-mode BM25; a doc's combined score is its
    * BEST subquery score plus `tie` times the rest —
    * max + tie·(sum − max) — so a doc matching several subqueries only
    * modestly outranks one nailing a single subquery (tie=0 = pure max,
    * tie=1 = plain sum). One kernel pass over the UNION of the subqueries'
    * pruned postings accumulates per-(doc, subquery) partials, combines,
    * and heaps per shard — the cross-subquery max needs every subquery's
    * partial for a doc in one place, which is exactly what doc-complete
    * shards guarantee, so the plan stays zero-exchange when colocated. */
  def topKDisMax(queries: Seq[String], tie: Double, k: Int): DataFrame = {
    val subs: Seq[Map[String, Int]] = queries.map(analyzeQuery).filter(_.nonEmpty)
    val allTerms = subs.flatMap(_.keys).distinct
    if (allTerms.isEmpty) return emptyHits()
    val dfm = dfSlice(allTerms)
    if (dfm.isEmpty) return emptyHits()
    val live = allTerms.filter(dfm.contains).sorted
    val postings = postingsDF.where(col("term").isin(live: _*)).as[Posting]
    val p = params
    val (nn, ad) = (n, avgdl)
    val tb = tombBc
    val (tiez, kk, nSub) = (tie, k, subs.size)
    def kernel(group: Seq[Posting]): Iterator[(Long, Double)] = {
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val exSet = new java.util.HashSet[java.lang.Long]()
      tb.value.get(group.head.shard).foreach { e =>
        val c = new graft.codec.Postings.Cursor(e)
        while (c.next()) exSet.add(c.docId)
      }
      val acc = new java.util.HashMap[java.lang.Long, Array[Double]]()
      subs.zipWithIndex.foreach { case (sq, si) =>
        sq.foreach { case (t, f) =>
          if (byTerm.contains(t) && dfm.contains(t)) {
            val iq = Bm25.idf(nn, dfm(t)) * Bm25.qtfSat(f, p)
            val (docs, tfs, lens) = graft.codec.Postings.decode(byTerm(t))
            var i = 0
            while (i < docs.length) {
              val arr = acc.computeIfAbsent(docs(i), _ => new Array[Double](nSub))
              arr(si) += iq * Bm25.tfSat(tfs(i), lens(i), ad, p)
              i += 1
            }
          }
        }
      }
      val topk = new Wand.TopK(kk)
      acc.forEach { (d, arr) =>
        if (!exSet.contains(d)) {
          var mx = 0.0; var sm = 0.0; var i = 0
          while (i < nSub) { if (arr(i) > mx) mx = arr(i); sm += arr(i); i += 1 }
          val s = mx + tiez * (sm - mx)
          if (s > 0.0) topk.offer(d, s)
        }
      }
      topk.drainDescending().iterator.map(s => (s.docId, s.score))
    }
    resolveHits(perShardScores(postings)(kernel), k)
  }

  /** Significant-terms aggregation (Elasticsearch's significant_terms,
    * JLH heuristic): terms OVERREPRESENTED in the foreground — the docs
    * containing ALL analyzed query terms — relative to the whole corpus.
    * Per term with foreground df fg and corpus df:
    *
    *   fgPct = fg/F,  bgPct = df/N,  JLH = (fgPct − bgPct)·(fgPct/bgPct)
    *
    * only terms with fgPct > bgPct qualify. Plan: the conjunctive kernel
    * enumerates the foreground ONCE (cost ∝ shortest posting list, never
    * the corpus — [[matchAllDocs]]); the collected docId set (driver
    * residency ∝ the selective foreground, the shape this aggregation
    * serves) broadcast-joins the analyzed table (per-doc DISTINCT terms,
    * so one exploded row per (doc, term)); the per-term foreground counts
    * (≤ foreground vocab, small) then broadcast-join the global df table.
    * Nothing here scans the corpus: the two big inputs are touched only
    * through the pruned kernel scan and a column-pruned df read.
    *
    * GUARDED against a non-selective foreground: a bounded `take` probes
    * the match-set size first (never an unbounded collect). At or below
    * `fgBroadcastMax` the probe IS the complete foreground and broadcasts
    * as before; above it the foreground stays DISTRIBUTED — a left-semi
    * shuffle join against the analyzed table — so a broad query costs
    * extra kernel passes (each ∝ query-term postings), never driver
    * memory. Both paths produce identical rows (spec-pinned). */
  def significantTerms(query: String, topN: Int,
                       fgBroadcastMax: Int = 100000): DataFrame = {
    val fg = matchAllDocs(query).select($"docId")
    val probe = fg.as[Long].take(fgBroadcastMax + 1)
    if (probe.isEmpty) return Seq.empty[(String, Long, Long, Double)]
      .toDF("term", "fg_df", "df", "score")
    val analyzed = covered(graft.sources.TableIO.read(spark, s"$indexDir/analyzed"))
    val (fcnt, fgRows) =
      if (probe.length <= fgBroadcastMax)
        (probe.length.toLong,
          analyzed.join(broadcast(probe.toSeq.toDF("docId")), Seq("docId")))
      else
        (fg.count(), analyzed.join(fg, Seq("docId"), "left_semi"))
    val fgTerms = fgRows
      .select(explode($"terms").as("term"))
      .groupBy($"term").agg(count(lit(1)).as("fg_df"))
    val nn = n
    fgTerms.join(dfDF, "term")
      .withColumn("fg_pct", $"fg_df".cast("double") / fcnt)
      .withColumn("bg_pct", $"df".cast("double") / nn)
      .where($"fg_pct" > $"bg_pct")
      .withColumn("score", ($"fg_pct" - $"bg_pct") * ($"fg_pct" / $"bg_pct"))
      .select($"term", $"fg_df", $"df", round($"score", 4).as("score"))
      .orderBy(round($"score", 4).desc, $"term".asc).limit(topN)
  }

  /** Merge per-shard candidates to the global ≤ k winners, then resolve
    * (conv_id, turn_idx) with a PRUNED point read of the doc map — shared
    * tail of every single-query top-k path. */
  private def resolveHits(perShard: DataFrame, k: Int): DataFrame = {
    val hits = perShard.select($"docId", $"score")
      .orderBy(desc("score"), asc("docId")).limit(k)
      .as[(Long, Double)].collect()
    if (hits.isEmpty) return emptyHits()
    val scoreMap = typedLit(hits.toMap)
    hitMetaDF
      .filter(col("docId").isin(hits.map(_._1): _*))
      .select($"conv_id", $"turn_idx", $"docId",
        element_at(scoreMap, $"docId").as("score"))
      .orderBy(desc("score"), asc("docId")).limit(k)
  }

  /** Conjunctive (AND-mode) top-k: only documents containing EVERY analyzed
    * query term are ranked; scores equal the OR-mode BM25 score of the same
    * doc. A query term absent from the corpus ⇒ empty result (strict AND).
    * Same zero-exchange plan shape as [[topK]]; the kernel is leapfrog
    * intersection (cost ∝ shortest posting list, not the union). */
  def topKAnd(query: String, k: Int): DataFrame = {
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return emptyHits()
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.size < qtf.size) return emptyHits() // some term nowhere in corpus
    val terms = dfm.keys.toSeq.sorted
    val postings = postingsDF.where(col("term").isin(terms: _*)).as[Posting]
    val perShard = shardTopK(postings, Seq(("q", qtf)), dfm, k,
        exhaustive = false, conjunctiveRequired = qtf.size)
    resolveHits(perShard, k)
  }

  /** Negated (NOT-mode) top-k: OR-mode BM25 over the query terms,
    * excluding every document containing ANY analyzed `exclude` term
    * (Lucene's MUST_NOT shape). A query term that is also excluded can
    * never contribute — any doc containing it is excluded — so it is
    * dropped from the scoring inputs; survivors' scores equal their plain
    * OR-mode BM25. Same zero-exchange plan shape as [[topK]]: the exclude
    * lists ride the same term-pruned postings scan and exclusion is a
    * forward-only leapfrog inside the kernel ([[Wand.topKNot]]) — never an
    * anti-join of the corpus. Exclusion is per-shard-sound because a doc's
    * query and exclude postings live in the same doc-sharded partition. */
  def topKNot(query: String, exclude: String, k: Int): DataFrame = {
    val eset = analyzeQuery(exclude).keySet
    val qtf = analyzeQuery(query).filterNot { case (t, _) => eset.contains(t) }
    if (qtf.isEmpty) return emptyHits()
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return emptyHits()
    val eterms = eset.toSeq.sorted
    val all = (dfm.keys.toSeq ++ eterms).distinct.sorted
    val postings = postingsDF.where(col("term").isin(all: _*)).as[Posting]
    val qterms = qtf
    val p = params
    val (nn, ad) = (n, avgdl)
    val tb = tombBc
    def kernel(group: Seq[Posting]): Iterator[(Long, Double)] = {
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val ex = eterms.flatMap(byTerm.get) ++ tb.value.get(group.head.shard)
      val inputs = qterms.toSeq.collect {
        case (t, f) if byTerm.contains(t) && dfm.contains(t) =>
          Wand.TermInput(byTerm(t), f, dfm(t))
      }
      Wand.topKNot(inputs, ex, nn, ad, k, p).iterator.map(s => (s.docId, s.score))
    }
    resolveHits(perShardScores(postings)(kernel), k)
  }

  /** Per-term score breakdown for ONE document — Lucene's explain(): each
    * query term's (tf, df, contribution) on `docId`, the contributions
    * summing to the doc's [[topK]]/[[scoreAll]] score exactly (same
    * codegen'd expression, same global stats). A PRUNED point read of the
    * doc's analyzed row (docId filter pushed to the scan) joined to the
    * broadcast query + df slices — never a corpus scan. Coverage and
    * tombstones apply: explaining a deleted or not-yet-refreshed doc
    * returns no rows, matching its absence from every query path. */
  def explain(query: String, docId: Long): DataFrame = {
    val qtf = analyzeQuery(query)
    val empty = Seq.empty[(String, Long, Long, Double)].toDF("term", "tf", "df", "contrib")
    if (qtf.isEmpty) return empty
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return empty
    val qdf = qtf.toSeq.toDF("term", "qtf")
    val dfTable = dfm.toSeq.toDF("term", "df")
    covered(graft.sources.TableIO.read(spark, s"$indexDir/analyzed"))
      .where(col("docId") === docId)
      .select(col("len"), explode(arrays_zip(col("terms"), col("tfs"))).as("tt"))
      .select(col("len"), col("tt.terms").as("term"), col("tt.tfs").as("tf"))
      .join(broadcast(qdf), "term")
      .join(broadcast(dfTable), "term")
      .withColumn("contrib", Bm25.scoreCol(col("tf"), col("qtf"), col("df"),
        col("len"), lit(n), lit(avgdl), params))
      .select(col("term"), col("tf").cast("long").as("tf"),
        col("df").cast("long").as("df"), col("contrib"))
      .orderBy(col("term"))
  }

  /** Boolean retrieval — Lucene's BooleanQuery shape in ONE kernel pass:
    * every analyzed `must` term is required AND scores, `should` terms are
    * optional and score, `not` terms exclude (MUST_NOT). Candidates = docs
    * containing every must term and no not term; score = plain OR-mode
    * BM25 over must ∪ should (a term in both clauses scores once, with the
    * must qtf; a should term that is also excluded can never contribute
    * and is dropped; a must term that is also excluded is unsatisfiable —
    * empty result, Lucene's contract). Degenerate shapes delegate to the
    * specialized kernels: no must → [[topKNot]], no should and no not →
    * [[topKAnd]]. `facets` adds metadata (column = value) filters — facet
    * posting lists ([[graft.model.Facets]]; the index must carry them via
    * Config.facetCols) join the must lists in the filter cursor set,
    * required but never scoring. Plan shape is [[topKFiltered]]'s: the
    * must + facet lists drive the kernel as filter cursors (cost ∝
    * shortest filter list per shard), the not lists ride the same
    * term-pruned postings scan as forward-leapfrog exclusion cursors —
    * zero exchange when colocated, never an anti-join of the corpus. */
  def search(must: String, should: String = "", not: String = "",
             k: Int = 10, facets: Map[String, String] = Map.empty): DataFrame = {
    val eset = analyzeQuery(not).keySet
    val m0 = analyzeQuery(must)
    if (m0.keys.exists(eset.contains)) return emptyHits()
    if (facets.isEmpty && m0.isEmpty) return topKNot(should, not, k)
    val stf = analyzeQuery(should)
      .filterNot { case (t, _) => eset.contains(t) || m0.contains(t) }
    if (facets.isEmpty && stf.isEmpty && eset.isEmpty) return topKAnd(must, k)
    val qtf = m0 ++ stf
    if (qtf.isEmpty) return emptyHits()
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return emptyHits()
    if (m0.keys.exists(t => !dfm.contains(t))) return emptyHits() // a must term nowhere in the corpus
    val fterms = facets.toSeq.map { case (c, v) => graft.model.Facets.term(c, v) }
    val mterms = m0.keys.toSeq.sorted ++ fterms.sorted
    val eterms = eset.toSeq.sorted
    val all = (dfm.keys.toSeq ++ mterms ++ eterms).distinct.sorted
    val postings = postingsDF.where(col("term").isin(all: _*)).as[Posting]
    val qterms = qtf
    val required = mterms.size
    val p = params
    val (nn, ad) = (n, avgdl)
    val tb = tombBc
    def kernel(group: Seq[Posting]): Iterator[(Long, Double)] = {
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val filterPs = mterms.flatMap(byTerm.get)
      val ex = eterms.flatMap(byTerm.get) ++ tb.value.get(group.head.shard)
      val inputs = qterms.toSeq.collect {
        case (t, f) if byTerm.contains(t) && dfm.contains(t) =>
          Wand.TermInput(byTerm(t), f, dfm(t))
      }
      Wand.topKFiltered(inputs, filterPs, required, nn, ad, k, p, excludes = ex)
        .iterator.map(s => (s.docId, s.score))
    }
    val out =
      if (colocated)
        postings.mapPartitions { ps =>
          val byShard = new java.util.HashMap[Integer, ArrayBuffer[Posting]]()
          ps.foreach(po => byShard.computeIfAbsent(po.shard, _ => new ArrayBuffer[Posting]) += po)
          import scala.jdk.CollectionConverters._
          byShard.values.iterator.asScala.flatMap(g => kernel(g.toSeq))
        }
      else
        postings.groupByKey(_.shard).flatMapGroups((_, ps) => kernel(ps.toSeq))
    resolveHits(out.toDF("docId", "score"), k)
  }

  /** Filtered (faceted) top-k: rank only documents whose facet posting
    * lists contain them for EVERY (column, value) in `facets` — the filter
    * IS a posting list ([[graft.model.Facets]]; the index must have been
    * built with these columns in Config.facetCols). Scores are the normal
    * OR-mode BM25 over the query terms; zero-overlap docs are not emitted.
    * Same zero-exchange plan shape as [[topK]]: the facet lists are scanned
    * term-pruned alongside the query postings, and the kernel drives from
    * the filter intersection (cost ∝ shortest filter list per shard). */
  def topKFiltered(query: String, facets: Map[String, String], k: Int): DataFrame = {
    if (facets.isEmpty) return topK(query, k)
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return emptyHits()
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return emptyHits()
    val fterms = facets.toSeq.map { case (c, v) => graft.model.Facets.term(c, v) }
    val required = fterms.size
    val all = (dfm.keys.toSeq ++ fterms).distinct.sorted
    val postings = postingsDF.where(col("term").isin(all: _*)).as[Posting]
    val qterms = qtf
    val fset = fterms.toSet
    val p = params
    val (nn, ad) = (n, avgdl)
    val tb = tombBc
    def kernel(group: Seq[Posting]): Iterator[(Long, Double)] = {
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val filterPs = fterms.flatMap(byTerm.get)
      val inputs = qterms.toSeq.collect {
        case (t, f) if !fset.contains(t) && byTerm.contains(t) && dfm.contains(t) =>
          Wand.TermInput(byTerm(t), f, dfm(t))
      }
      Wand.topKFiltered(inputs, filterPs, required, nn, ad, k, p,
          excludes = tb.value.get(group.head.shard).toSeq)
        .iterator.map(s => (s.docId, s.score))
    }
    resolveHits(perShardScores(postings)(kernel), k)
  }

  /** Facet value counts over the documents matching ≥ 1 analyzed query term
    * (the OR-match set — identical to the score>0 set, since this engine's
    * idf variant is strictly positive): the aggregation panel of a faceted
    * search. Returns (value, cnt), cnt desc / value asc, top `topN`.
    *
    * Scale shape: the per-shard kernel marks the query postings in a rank
    * bitmap and counts each facet posting list against it
    * ([[Wand.facetCounts]]) — zero-exchange under the colocated layout; the
    * only shuffle is the final ≤ shards·|values| aggregate. The facet lists
    * are read via a PREFIX-pushed scan (StringStartsWith reaches Parquet),
    * never an explode/join of the corpus. */
  def facetCounts(query: String, facetCol: String, topN: Int): DataFrame = {
    val empty = Seq.empty[(String, Long)].toDF("value", "cnt")
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return empty
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return empty
    val qterms = dfm.keys.toSeq.sorted
    val prefix = graft.model.Facets.Prefix + facetCol + graft.model.Facets.Prefix
    val prefixLen = prefix.length
    val postings = postingsDF
      .where(col("term").isin(qterms: _*) || col("term").startsWith(prefix))
      .as[Posting]
    val tb = tombBc
    def kernel(group: Seq[Posting]): Iterator[(String, Long)] = {
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val (fac, rest) = byTerm.partition(_._1.startsWith(prefix))
      Wand.facetCounts(qterms.flatMap(rest.get), fac.values.toSeq,
          excludes = tb.value.get(group.head.shard).toSeq)
        .map { case (t, c) => (t.substring(prefixLen), c) }
    }
    val out =
      if (colocated)
        postings.mapPartitions { ps =>
          val byShard = new java.util.HashMap[Integer, ArrayBuffer[Posting]]()
          ps.foreach(po => byShard.computeIfAbsent(po.shard, _ => new ArrayBuffer[Posting]) += po)
          import scala.jdk.CollectionConverters._
          byShard.values.iterator.asScala.flatMap(g => kernel(g.toSeq))
        }
      else
        postings.groupByKey(_.shard).flatMapGroups((_, ps) => kernel(ps.toSeq))
    out.toDF("value", "cnt")
      .groupBy($"value").agg(sum($"cnt").as("cnt"))
      .orderBy(desc("cnt"), asc("value")).limit(topN)
  }

  /** Multi-column facet panel: value counts for SEVERAL facet columns in
    * ONE kernel pass. The rank bitmap over the query's OR-match set is
    * built once per shard and every column's facet lists are counted
    * against it ([[Wand.facetCounts]] already takes the whole facet list
    * set) — calling facetCounts per column would rescan the query postings
    * and rebuild the bitmap |columns| times. Same zero-exchange plan shape:
    * one term+prefix-pruned postings scan, then a ≤ shards·|values|
    * aggregate. Returns (facet, value, cnt), the top `topN` values per
    * facet, ordered (facet asc, cnt desc, value asc). */
  def facetCountsMulti(query: String, facetCols: Seq[String], topN: Int): DataFrame = {
    val empty = Seq.empty[(String, String, Long)].toDF("facet", "value", "cnt")
    if (facetCols.isEmpty) return empty
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return empty
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return empty
    val qterms = dfm.keys.toSeq.sorted
    val P = graft.model.Facets.Prefix
    val prefixes = facetCols.distinct.sorted.map(c => P + c + P)
    val postings = postingsDF
      .where(col("term").isin(qterms: _*) ||
        prefixes.map(p => col("term").startsWith(p)).reduce(_ || _))
      .as[Posting]
    val tb = tombBc
    def kernel(group: Seq[Posting]): Iterator[(String, String, Long)] = {
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val (fac, rest) = byTerm.partition(_._1.startsWith(P))
      Wand.facetCounts(qterms.flatMap(rest.get), fac.values.toSeq,
          excludes = tb.value.get(group.head.shard).toSeq)
        .map { case (t, c) =>
          val sep = t.indexOf(P, 1)
          (t.substring(1, sep), t.substring(sep + 1), c)
        }
    }
    val out =
      if (colocated)
        postings.mapPartitions { ps =>
          val byShard = new java.util.HashMap[Integer, ArrayBuffer[Posting]]()
          ps.foreach(po => byShard.computeIfAbsent(po.shard, _ => new ArrayBuffer[Posting]) += po)
          import scala.jdk.CollectionConverters._
          byShard.values.iterator.asScala.flatMap(g => kernel(g.toSeq))
        }
      else
        postings.groupByKey(_.shard).flatMapGroups((_, ps) => kernel(ps.toSeq))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("facet").orderBy(desc("cnt"), asc("value"))
    out.toDF("facet", "value", "cnt")
      .groupBy($"facet", $"value").agg(sum($"cnt").as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= topN).drop("rn")
      .orderBy(asc("facet"), desc("cnt"), asc("value"))
  }

  /** Numeric-range facet panel: matching-doc counts per [lo, hi) bucket of
    * a NUMERIC facet column. `bounds` are the B+1 ascending bucket edges;
    * every bucket is emitted (empty ones at cnt 0), values outside all
    * buckets are dropped. Returns (bucket, lo, hi, cnt) ordered by bucket.
    *
    * Scale shape: identical to [[facetCounts]] — the rank-bitmap kernel
    * yields per-VALUE counts (vocab-sized, zero-exchange), and the range
    * rollup is a tiny bucket-table join over those counts, never a corpus
    * scan. Bounds are integral on purpose: the bucket DECISION stays in
    * integer arithmetic end-to-end (the repo's oracle-parity rule — string
    * facet values cast back with an exact long parse, no float rounding).
    * A very-high-cardinality numeric column (raw timestamps) should be
    * bucketed at INDEX time instead; this query-time rollup is for the
    * moderate-cardinality case where per-value lists already exist. */
  def facetCountsRange(query: String, facetCol: String, bounds: Seq[Long]): DataFrame = {
    require(bounds.size >= 2, "need at least two bucket edges")
    require(bounds == bounds.sorted, "bucket edges must be ascending")
    val buckets = bounds.sliding(2).zipWithIndex
      .map { case (Seq(lo, hi), i) => (i, lo, hi) }.toSeq
    val bucketsDF = buckets.toDF("bucket", "lo", "hi")
    val perValue = facetCounts(query, facetCol, Int.MaxValue)
      .withColumn("v", col("value").cast("long"))
    bucketsDF.join(perValue,
        perValue("v") >= bucketsDF("lo") && perValue("v") < bucketsDF("hi"), "left")
      .groupBy($"bucket", $"lo", $"hi")
      .agg(coalesce(sum($"cnt"), lit(0L)).as("cnt"))
      .orderBy($"bucket")
  }

  /** Every doc containing ALL analyzed query terms, as (docId, score) with
    * the conjunctive (= OR-mode) BM25 score — the distributed candidate
    * enumerator for phrase/positional verification. Output size ≤ the
    * query's shortest posting list; the caller point-reads only these
    * candidates (never the corpus). */
  def matchAllDocs(query: String): DataFrame = {
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return Seq.empty[(Long, Double)].toDF("docId", "score")
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.size < qtf.size) return Seq.empty[(Long, Double)].toDF("docId", "score")
    val required = qtf.size
    val terms = dfm.keys.toSeq.sorted
    val postings = postingsDF.where(col("term").isin(terms: _*)).as[Posting]
    val qterms = qtf // local for closure
    val p = params
    val (nn, ad) = (n, avgdl)
    val tb = tombBc
    def kernel(group: Seq[Posting]): Iterator[(Long, Double)] = {
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val inputs = qterms.toSeq.collect {
        case (t, f) if byTerm.contains(t) && dfm.contains(t) =>
          Wand.TermInput(byTerm(t), f, dfm(t))
      }
      Wand.matchAll(inputs, required, nn, ad, p,
          excludes = tb.value.get(group.head.shard).toSeq)
        .iterator.map(s => (s.docId, s.score))
    }
    perShardScores(postings)(kernel)
  }

  /** Batched multi-query top-k: ONE pass over the index answers every
    * query — the at-scale shape (the reference scores query-by-query; a
    * 10^12-doc engine amortizes the scan across the query batch).
    * Returns (qid, conv_id, turn_idx, docId, score), k rows per query,
    * ordered (qid, score desc, docId). */
  def topKBatch(queries: Map[String, String], k: Int): DataFrame = {
    val qterms: Seq[(String, Map[String, Int])] =
      queries.toSeq.map { case (qid, q) => qid -> analyzeQuery(q) }
    val allTerms = qterms.flatMap(_._2.keys).distinct.sorted
    if (allTerms.isEmpty) return emptyBatchHits()
    val dfm = dfSlice(allTerms)

    val postings = postingsDF.where(col("term").isin(allTerms: _*)).as[Posting]
    // Batch mode trades one narrow exchange (the pruned rows only) for
    // shard-level parallelism of the kernel work — the colocated read may
    // pack a small index into few partitions, which is right for
    // single-query latency but serializes a 100-query batch.
    val perShard = shardTopK(postings, qterms, dfm, k, exhaustive = false,
      forceGrouped = true)

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("score"), asc("docId"))
    val top = perShard
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
    // Hit resolution follows the single-query path whenever the batch's
    // total hit budget is small: the ≤ |batch|·k winners come to the
    // driver and the doc map is read with a pushed-down `docId IN (...)`
    // POINT READ (Parquet rowgroup pruning — docIds are sorted within
    // shard files), never a full doc-meta scan. The scan-join fallback
    // exists only for huge batches, where |batch|·k ids outgrow a
    // practical IN-list and one corpus pass genuinely amortizes across
    // the whole batch.
    if (queries.size.toLong * k <= MaxPointReadHits) {
      val hits = top.select($"qid", $"docId", $"score")
        .as[(String, Long, Double)].collect()
      if (hits.isEmpty) return emptyBatchHits()
      val hitsDF = hits.toSeq.toDF("qid", "docId", "score")
      hitMetaDF
        .filter(col("docId").isin(hits.map(_._2).distinct.toSeq: _*))
        .select($"conv_id", $"turn_idx", $"docId")
        .join(broadcast(hitsDF), "docId")
        .select($"qid", $"conv_id", $"turn_idx", $"docId", $"score")
        .orderBy(asc("qid"), desc("score"), asc("docId"))
    } else
      hitMetaDF
        .join(broadcast(top), "docId")
        .select($"qid", $"conv_id", $"turn_idx", $"docId", $"score")
        .orderBy(asc("qid"), desc("score"), asc("docId"))
  }

  /** Threshold between point-read and scan-join hit resolution in
    * [[topKBatch]] — ~10^5 ids keeps the driver round-trip and the
    * pushed-down IN list cheap while covering every realistic online
    * batch (10^4 queries × k=10). */
  private val MaxPointReadHits = 100000L

  private def emptyBatchHits(): DataFrame =
    Seq.empty[(String, String, Int, Long, Double)]
      .toDF("qid", "conv_id", "turn_idx", "docId", "score")

  /** Every doc with ≥1 analyzed query term, as (docId, score) with the
    * OR-mode BM25 score — [[scoreAll]]'s positive-score set served from
    * the INDEX: a pruned postings scan + the streaming [[Wand.matchAny]]
    * kernel, cost ∝ the union of the query terms' posting lists, never an
    * analyzed-table scan. The backbone of scoring aggregations
    * (function_score, top_hits, collapse, recency rerank): they need every
    * match's score, not a top-k heap, and they resolve metadata against
    * the doc-meta sidecar ([[docMetaSidecar]]) — the whole plan touches
    * postings + docmeta only (PlanSpec pins this). */
  def scoreMatches(query: String): DataFrame = {
    val qtf = analyzeQuery(query)
    if (qtf.isEmpty) return Seq.empty[(Long, Double)].toDF("docId", "score")
    val dfm = dfSlice(qtf.keys.toSeq)
    if (dfm.isEmpty) return Seq.empty[(Long, Double)].toDF("docId", "score")
    val terms = dfm.keys.toSeq.sorted
    val postings = postingsDF.where(col("term").isin(terms: _*)).as[Posting]
    // sorted: deterministic float-accumulation order at any parallelism
    val qterms = qtf.toSeq.sortBy(_._1)
    val p = params
    val (nn, ad) = (n, avgdl)
    val tb = tombBc
    def kernel(group: Seq[Posting]): Iterator[(Long, Double)] = {
      val byTerm = group.groupBy(_.term).map { case (t, ps) =>
        t -> (if (ps.lengthCompare(1) == 0) ps.head
              else graft.codec.Postings.merge(ps))
      }
      val inputs = qterms.collect {
        case (t, f) if byTerm.contains(t) && dfm.contains(t) =>
          Wand.TermInput(byTerm(t), f, dfm(t))
      }
      Wand.matchAny(inputs, nn, ad, p,
          excludes = tb.value.get(group.head.shard).toSeq)
        .map(s => (s.docId, s.score))
    }
    perShardScores(postings)(kernel)
  }

  /** Build-time doc-meta sidecar (Lucene docvalues): (shard, docId,
    * conv_id, turn_idx, <metaCols…>) materialized by IndexBuilder when
    * `Config.metaCols` is set, so scoring aggregations join static
    * per-doc features/group columns WITHOUT reaching back to the source
    * table (which at 100 TB may not even be co-located with the index).
    * None when the index was built without one. */
  lazy val docMetaSidecar: Option[DataFrame] = {
    val p = s"$indexDir/docmeta"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      Some(maybeCache(graft.sources.TableIO.read(spark, p)))
    else None
  }

  /** Score every doc with ≥1 overlapping term (relational path); when
    * `keepZeros`, emit every doc (zero-score included) like the
    * reference's ScoreAsync stream. */
  def scoreAll(query: String, keepZeros: Boolean = false): DataFrame = {
    val qtf = analyzeQuery(query)
    val docs = docMetaDF
    if (qtf.isEmpty) {
      return docs.select($"conv_id", $"turn_idx", $"docId", lit(0.0).as("score"))
    }
    val qdf = qtf.toSeq.toDF("term", "qtf")
    val dfTable = dfDF
      .where(col("term").isin(qtf.keys.toSeq: _*))
    val analyzed = covered(graft.sources.TableIO.read(spark, s"$indexDir/analyzed"))
    val exploded = analyzed
      .select($"docId", $"conv_id", $"turn_idx", $"len",
        explode(arrays_zip($"terms", $"tfs")).as("tt"))
      .select($"docId", $"conv_id", $"turn_idx", $"len",
        $"tt.terms".as("term"), $"tt.tfs".as("tf"))
    val scored = exploded
      .join(broadcast(qdf), "term")
      .join(broadcast(dfTable), "term")
      .withColumn("part", Bm25.scoreCol($"tf", $"qtf", $"df", $"len", lit(n), lit(avgdl), params))
      .groupBy($"docId", $"conv_id", $"turn_idx")
      .agg(sum($"part").as("score"))
    if (!keepZeros) scored
    else docs.join(scored.select($"docId", $"score"), Seq("docId"), "left")
      .select($"conv_id", $"turn_idx", $"docId", coalesce($"score", lit(0.0)).as("score"))
  }

  /** Relational top-k (TakeOrderedAndProject). */
  def topKExhaustive(query: String, k: Int): DataFrame =
    scoreAll(query).filter($"score" > 0.0)
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .select($"conv_id", $"turn_idx", $"docId", $"score")

  private def emptyHits(): DataFrame =
    Seq.empty[(String, Int, Long, Double)].toDF("conv_id", "turn_idx", "docId", "score")
}
