package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.analysis.Analyzer
import graft.ops.{BpeOps, DocQueries, TextOps, VectorOps, Multimodal, EventOps}
import graft.oracle.{OracleSql, OracleSqlOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry runs THROUGH the engine (index build → query path)
  * over `<sfDir>/documents.parquet`; `oracleSql` holds the equivalent
  * DuckDB SQL the driver checks it against. Column names/types and
  * (round4, doc_id) cut rules are shared — see OracleSql's contract note.
  */
object SparkEntry {

  private val P = DocQueries.P

  /** Analyzed (term, qtf) pairs of a query string — the single source of
    * truth for both the Spark side and the generated oracle SQL. */
  private def qt(q: String): Seq[(String, Int)] =
    Analyzer.termFreqs(Analyzer.tokenizeEn(q)).toSeq.sortBy(_._1)

  // Query strings drawn from the documents-table vocabulary.
  private val Q_SCORE = "fast query join"
  private val Q_TOPK = "spark stream window"
  private val Q_TOPK_REL = "sort merge join"
  private val Q_CASCADE = "data filter merge"
  private val Q_AND = "sort merge join"
  // NOT-mode query: rank Q_TOPK matches but exclude docs containing the
  // exclude term (Q_EVAL_LABELS proves the overlap is non-empty, so the
  // exclusion genuinely reshapes the top-k)
  private val Q_NOT = "spark stream window"
  private val E_NOT = "customer"
  // update (upsert) query: the marker token exists ONLY in the replaced
  // text, so ranking on it proves the new versions are live
  private val Q_UPD = "zzupdated stream window"
  // boolean (must/should/not) query: one required clause, two optional
  // scoring clauses, one exclusion — terms deliberately disjoint so the
  // oracle's scoring union is simply must ∪ should
  private val B_MUST = "join"
  private val B_SHOULD = "spark window"
  private val B_NOT = "customer"
  // the update oracle's corpus: documents with the SAME text transform the
  // Spark side applied before IndexBuilder.update (doc_id ≡ 2 mod 5 rows
  // get the marker suffix)
  private val UpdatedRel =
    "(SELECT doc_id, CASE WHEN (doc_id % 5) = 2 THEN text || ' zzupdated marker' " +
      "ELSE text END AS text FROM documents)"
  private val Q_PHRASE = "merge batch"
  // rank-eval relevance labels: conjunctive matches of a query STRICTER
  // than Q_TOPK, so MRR/nDCG land strictly inside (0, 1)
  private val Q_EVAL_LABELS = "spark stream window customer"
  // phrases for the positional sidecar: one with a stopword inside the
  // phrase ("the" is never a scoring term), one of ONLY stopwords
  private val Q_PHRASE_POS = "the batch"
  private val Q_PHRASE_STOP = "a the"
  // span-near proximity query: two head terms co-occurring at varying
  // distances (sf0.01: 95 of 314 co-occurring docs fit window 3)
  private val Q_SPAN = "sort join"

  // Non-default SimilarityConfigs exercised end-to-end against the oracle
  // (the knobs a larger corpus would turn — VERDICT r2 Missing #3).
  private val CfgK16 = graft.ops.SimilarityConfig(minHashK = 16)
  private val CfgW48 = graft.ops.SimilarityConfig(lshBits = 48)

  // n_chars bucket edges for the numeric-range facet panel (testdata
  // documents span ~44..577 chars)
  private val NCharBounds = Seq(0L, 100L, 200L, 300L, 400L, 1000L)

  // query-time boosts for q_boost: up-weight one Q_TOPK term, down-weight
  // another (exactly-representable doubles, so the SQL literal round-trips)
  private val Boosts = Map("window" -> 2.5, "spark" -> 0.5)

  // conversation block-join clauses: disjoint term sets so the combined
  // rollup query's qtf stays 1 per term
  private val CJ_A = "spark stream"
  private val CJ_B = "customer order"

  // synonym groups (SynonymQuery): members chosen so group tfs genuinely
  // sum (stream/batch and customer/order/part co-occur in many docs)
  private val Q_SYN = "stream customer"
  private val Syns = Map("stream" -> Seq("batch"), "customer" -> Seq("order", "part"))
  private def synMembers(t: String): Seq[String] =
    t +: Syns.getOrElse(t, Nil).flatMap(s => qt(s).map(_._1)).distinct.filterNot(_ == t)

  // combined-fields (BM25F-simple): source^2 folded into the scored text;
  // the query carries one text term + one field term so the field weight
  // genuinely reshapes the ranking
  private val Q_CF = "spark stream src7"
  private val CfW = 2
  private val CombinedRel =
    s"(SELECT doc_id, text || repeat(' ' || source, $CfW) AS text FROM documents)"

  // match_phrase_prefix: fixed head "merge" + prefix "ba" (completes to
  // batch/batches in the corpus vocabulary)
  private val Q_PP = "merge ba"
  private val PpRaw = Analyzer.tokenizeRaw(Q_PP).toSeq

  // standing percolation queries: two conjunctive alerts + one with an
  // exclusion (the must/not ReqExcl shape)
  private val Percs = Seq(
    graft.streaming.Percolator.Query("p1", Q_TOPK),
    graft.streaming.Percolator.Query("p2", Q_AND),
    graft.streaming.Percolator.Query("p3", "filter", "customer"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    DocQueries.topK(spark, "/root/testdata/sf0.001", Q_TOPK, 10, relational = false)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O3 corpus statistics
    "q_corpus_stats" -> ((s, d) => DocQueries.corpusStats(s, d)),
    "q_term_df" -> ((s, d) => DocQueries.termDf(s, d, 20)),
    "q_doc_len" -> ((s, d) => DocQueries.docLens(s, d)),
    // O1/O2 analyze + per-doc TF
    "q_doc_tf" -> ((s, d) => DocQueries.docTf(s, d)),
    // posting-list build + VByte codec roundtrip
    "q_postings_roundtrip" -> ((s, d) => DocQueries.postingsRoundtrip(s, d)),
    // O4/O5/O6 full-corpus scoring
    "q_bm25_score_all" -> ((s, d) => DocQueries.scoreAll(s, d, Q_SCORE)),
    // O7 top-k via block-max WAND kernel
    "q_bm25_topk" -> ((s, d) => DocQueries.topK(s, d, Q_TOPK, 10, relational = false)),
    // O7 top-k via the relational exhaustive path
    "q_bm25_topk_rel" -> ((s, d) => DocQueries.topK(s, d, Q_TOPK_REL, 10, relational = true)),
    // conjunctive (AND-mode) top-k: leapfrog intersection kernel
    "q_bm25_and" -> ((s, d) => DocQueries.topKAnd(s, d, Q_AND, 10)),
    // negated (MUST_NOT) top-k: forward-leapfrog exclusion inside WAND
    "q_bm25_not" -> ((s, d) => DocQueries.topKNot(s, d, Q_NOT, E_NOT, 10)),
    // minimum_should_match: ≥2 of the 3 query terms required, OR scores
    "q_bm25_msm" -> ((s, d) => DocQueries.msmTopK(s, d, Q_TOPK, 2, 10)),
    // deep pagination: page 2 via a kernel-gated search_after cursor
    "q_search_after" -> ((s, d) => DocQueries.searchAfter(s, d, Q_TOPK, 10)),
    // did-you-mean: df-ranked dictionary terms within 2 edits of a typo
    "q_suggest" -> ((s, d) => DocQueries.suggest(s, d, "spak", 2, 10)),
    // two half-indexes merged (addIndexes) ≡ the full build: same oracle
    "q_merge_topk" -> ((s, d) => DocQueries.mergeTopK(s, d, Q_TOPK, 10)),
    "q_merge_stats" -> ((s, d) => DocQueries.mergeStats(s, d)),
    // query-time term boosts (term^w): contributions scaled in-kernel
    "q_boost" -> ((s, d) => DocQueries.boostTopK(s, d, Q_TOPK, Boosts, 10)),
    // synonym groups scored as one pseudo-term (tf summed, df = max)
    "q_synonyms" -> ((s, d) => DocQueries.synonymTopK(s, d, Q_SYN, Syns, 10)),
    // disjunction-max: best-subquery score + tie·rest (Lucene dis_max)
    "q_dismax" -> ((s, d) => DocQueries.disMaxTopK(s, d, Seq(Q_TOPK, Q_SCORE), 0.3, 10)),
    // Dirichlet-smoothed query-likelihood LM ranking (alt similarity seam)
    "q_lm_dirichlet" -> ((s, d) => DocQueries.dirichletTopK(s, d, Q_TOPK, 2000.0, 10)),
    // significant-terms aggregation (JLH) over the conjunctive foreground
    "q_sig_terms" -> ((s, d) => DocQueries.significantTerms(s, d, Q_AND, 20)),
    // classic TF-IDF similarity (√tf·idf²/√dl) — third similarity seam
    "q_tfidf" -> ((s, d) => DocQueries.tfidfTopK(s, d, Q_TOPK, 10)),
    // ES rescore window: BM25 top-50 pool re-ranked by +2.0 exact-phrase
    "q_rescore" -> ((s, d) => DocQueries.rescoreTopK(s, d, Q_CASCADE, Q_PHRASE, 2.0, 50, 10)),
    // per-group top hits (terms agg + top_hits): 5 best sources × 2 hits
    "q_top_hits" -> ((s, d) => DocQueries.topHitsByGroup(s, d, Q_SCORE, "source", 2, 5)),
    // term dictionary stats: df + collection frequency (cfSlice seam)
    "q_term_stats" -> ((s, d) => DocQueries.termStats(s, d, 20)),
    // combined-fields (BM25F-simple): text + source^2 as one pseudo-field
    "q_combined_fields" -> ((s, d) => DocQueries.combinedFieldsTopK(s, d, Q_CF, CfW, 10)),
    // match_phrase_prefix: head adjacency + any completion of the prefix
    "q_phrase_prefix" -> ((s, d) => DocQueries.phrasePrefixTopK(s, d, Q_PP, 10)),
    // function_score (field_value_factor): BM25 × ln(1 + n_chars/100)
    "q_func_score" -> ((s, d) => DocQueries.funcScoreTopK(s, d, Q_SCORE, 10)),
    // filtered vector search (knn + filter): label-sliced exact cosine
    "q_ann_filtered" -> ((s, d) => VectorOps.cosTopKFiltered(s, d, 0L, 3, 10)),
    // phrase suggester: per-position edit candidates × unigram-df ranking
    "q_phrase_suggest" -> ((s, d) => DocQueries.phraseSuggest(s, d, "spak sort", 2, 5, 10)),
    // completion suggester: df-ranked dictionary terms under a prefix
    "q_complete" -> ((s, d) => DocQueries.complete(s, d, "s", 10)),
    // field collapse: one best doc per source, k best groups
    "q_collapse" -> ((s, d) => DocQueries.collapseTopK(s, d, Q_SCORE, "source", 5)),
    // wildcard retrieval: glob-expanded dictionary terms, OR-scored
    "q_wildcard" -> ((s, d) => DocQueries.wildcardTopK(s, d, "s*a*", 10, 10)),
    // federated (MultiReader) search over two half-indexes: combined
    // stats make member scores comparable — same oracle as the full build
    "q_federated" -> ((s, d) => DocQueries.federatedTopK(s, d, Q_TOPK, 10)),
    // percolation (reverse search): docs matched against standing queries
    "q_percolate" -> ((s, d) => DocQueries.percolate(s, d, Percs)),
    // phrase top-k: conjunctive candidates + raw-adjacency verify on text
    "q_phrase" -> ((s, d) => DocQueries.phraseTopK(s, d, Q_PHRASE, 10)),
    // phrase top-k over the POSITIONAL sidecar (stopword inside the phrase)
    "q_phrase_pos" -> ((s, d) => DocQueries.phraseTopKPos(s, d, Q_PHRASE_POS, 10)),
    // stopword-only phrase: only answerable with positions (score 0, by id)
    "q_phrase_stop" -> ((s, d) => DocQueries.phraseTopKPos(s, d, Q_PHRASE_STOP, 10)),
    // proximity retrieval: all terms within a 3-token window (positional
    // sidecar; emits the per-doc minimal span alongside the BM25 score)
    "q_span_near" -> ((s, d) => DocQueries.spanNearTopK(s, d, Q_SPAN, 3, 10)),
    // ordered sloppy phrase (span_near in_order): "sort ... join", slop 2
    "q_phrase_slop" -> ((s, d) => DocQueries.phraseSlopTopK(s, d, Q_SPAN, 2, 10)),
    // faceted top-k: metadata filters as facet posting lists
    "q_filtered_topk" -> ((s, d) => DocQueries.filteredTopK(s, d, Q_SCORE,
      Map("lang" -> "en", "source" -> "src7"), 10)),
    // top-k + snippet extraction over point-read hit text
    "q_snippets" -> ((s, d) => DocQueries.snippets(s, d, Q_TOPK, 10)),
    // faceted aggregation panel: facet value counts among matching docs
    "q_facet_counts" -> ((s, d) => DocQueries.facetCounts(s, d, Q_SCORE, "source", 8)),
    // multi-column facet panel: several columns' counts in ONE kernel pass
    "q_facet_multi" -> ((s, d) => DocQueries.facetCountsMulti(s, d, Q_SCORE,
      Seq("lang", "source"), 5)),
    // numeric-range facet panel: per-[lo,hi) bucket counts of a numeric col
    "q_facet_range" -> ((s, d) => DocQueries.facetCountsRange(s, d, Q_SCORE,
      "n_chars", NCharBounds)),
    // empty-query contract: every doc, score exactly 0
    "q_bm25_empty" -> ((s, d) => DocQueries.emptyQuery(s, d)),
    // incremental maintenance: base build + append + refresh ≡ full index
    "q_refresh_topk" -> ((s, d) => DocQueries.refreshTopK(s, d, Q_TOPK_REL, 10)),
    // tombstone delete: 20% of the corpus deleted; survivors must score as
    // a from-scratch build without them (exact stats/df decrement + kernel
    // tombstone exclusion)
    "q_delete_topk" -> ((s, d) => DocQueries.deleteTopK(s, d, Q_TOPK, 10)),
    "q_delete_stats" -> ((s, d) => DocQueries.deleteStats(s, d)),
    // upsert (updateDocument): 20% of the corpus re-indexed with REPLACED
    // text; the query carries the replacement's marker token, so ranking
    // proves the new text is live, the old text is gone, and stats/df
    // recomposed exactly (oracle: same transform applied in SQL)
    "q_update_topk" -> ((s, d) => DocQueries.updateTopK(s, d, Q_UPD, 10)),
    "q_update_stats" -> ((s, d) => DocQueries.updateStats(s, d)),
    // boolean retrieval: must + should + must_not in one kernel pass
    "q_bm25_bool" -> ((s, d) => DocQueries.boolTopK(s, d, B_MUST, B_SHOULD, B_NOT, 10)),
    // the full search-engine shape: boolean clauses + metadata facet
    // filter, all filters as posting-list cursors in the same kernel
    "q_bool_filtered" -> ((s, d) => DocQueries.boolFilteredTopK(s, d,
      B_MUST, B_SHOULD, B_NOT, Map("lang" -> "en"), 10)),
    // Lucene's explain(): per-term score breakdown of the top-1 hit —
    // contributions must sum to the hit's score under the same stats
    "q_explain" -> ((s, d) => DocQueries.explainTopHit(s, d, Q_TOPK)),
    // snapshot (time-travel) read: the SAME index as of generation 0 must
    // equal the oracle over the base 80% subset (stats included)
    "q_snapshot_topk" -> ((s, d) => DocQueries.snapshotTopK(s, d, Q_TOPK_REL, 10)),
    // O9-O14 cascade (BM25 stage → mock LM stage, threshold/topK/topM)
    "q_cascade" -> ((s, d) => DocQueries.cascade(s, d, Q_CASCADE, 0.5, 20, 5)),
    // O6/O8 two-pass scoring without a prebuilt index, caller-named columns
    "q_bm25_twopass" -> ((s, d) => DocQueries.scoreTwoPass(s, d, Q_SCORE)),
    // O13 cascade per-stage lineage metrics
    "q_cascade_metrics" -> ((s, d) => DocQueries.cascadeMetrics(s, d, Q_CASCADE, 0.5, 20, 5)),
    // O15 model-judged relevance contracts (clamp / empty→0 / error→0)
    "q_lm_score" -> ((s, d) => DocQueries.lmScore(s, d, Q_TOPK)),
    // O16 model-judged top-N
    "q_lm_rank" -> ((s, d) => DocQueries.lmRank(s, d, Q_TOPK, 5)),
    // batched multi-query top-k: one index pass answers the whole batch
    "q_bm25_batch" -> ((s, d) => DocQueries.batchTopK(s, d,
      Map("q1" -> Q_TOPK, "q2" -> Q_SCORE), 10)),
    // group-level retrieval: conversation/source rollup of BM25 relevance
    "q_group_topk" -> ((s, d) => DocQueries.groupTopK(s, d, Q_SCORE, "source", 5)),
    // conversation-level retrieval: sum-of-top-3-turns rollup, top-5 convs
    "q_conv_topk" -> ((s, d) => DocQueries.convTopK(s, d, Q_SCORE, 3, 5)),
    // conversation block-join: convs with a turn matching A AND one matching B
    "q_conv_join" -> ((s, d) => DocQueries.convJoinTopK(s, d, CJ_A, CJ_B, 8)),
    // RAG context stitch: top-k turn hits + same-conversation neighbors
    "q_turn_context" -> ((s, d) => DocQueries.turnContext(s, d, Q_TOPK, 10)),
    // recency-boosted ranking (integer-rational freshness × BM25)
    "q_time_topk" -> ((s, d) => DocQueries.timeTopK(s, d, Q_SCORE, 10)),
    // behavioral log pipeline: gap-based sessionization over `events`
    "q_sessionize" -> ((s, d) => EventOps.sessionize(s, d, 360)),
    // tumbling event-time windows: daily per-type volume + value rollup
    "q_event_windows" -> ((s, d) => EventOps.eventWindows(s, d, 1440)),
    // as-of join: attach each user's most recent prior purchase to every event
    "q_asof" -> ((s, d) => EventOps.asOf(s, d, "purchase")),
    // conversion funnel: users completing each ordered-step prefix
    "q_funnel" -> ((s, d) => EventOps.funnel(s, d,
      Seq("signup", "click", "purchase"))),
    // per-doc TF-IDF keyword extraction over the index tables
    "q_keywords" -> ((s, d) => DocQueries.keywords(s, d, 30L, 3)),
    // pseudo-relevance-feedback expansion terms from the top-10 pool
    "q_expand" -> ((s, d) => DocQueries.expandTerms(s, d, Q_TOPK, 10, 10)),
    // hybrid sparse+dense retrieval: RRF fusion of BM25 and cosine top-20
    "q_hybrid_rrf" -> ((s, d) => DocQueries.hybridTopK(s, d, Q_SCORE, 0L, 20, 10)),
    // more-like-this: doc 0's top-5 TF-IDF terms re-issued as a BM25 query
    "q_mlt" -> ((s, d) => DocQueries.moreLikeThis(s, d, 0L, 5, 10)),
    // corpus-skew profile: top-20 terms by collection frequency + coverage
    "q_zipf" -> ((s, d) => DocQueries.zipfCoverage(s, d, 20)),
    // analyzed-length histogram (chunk/filter sizing profile)
    "q_len_hist" -> ((s, d) => DocQueries.lenHist(s, d, 16)),
    // wildcard retrieval: prefix expansion against the term dictionary
    "q_prefix" -> ((s, d) => DocQueries.prefixTopK(s, d, "s", 10)),
    // fuzzy retrieval: 'past' expands to dictionary terms {fast, part}
    // within edit distance 1, scored as a qtf=1 BM25 query
    "q_fuzzy" -> ((s, d) => DocQueries.fuzzyTopK(s, d, "past", 1, 50, 10)),
    // MMR-diversified rerank over the BM25 top-20 pool (rows-only check;
    // semantics pinned by MmrSpec's independent greedy recompute)
    "q_mmr" -> ((s, d) => DocQueries.mmrTopK(s, d, Q_SCORE, 20, 10, 0.7)),
    // offline eval harness: MRR@10 / nDCG@10 of the Q_TOPK ranking vs a
    // STRICTER conjunctive label set (so the metrics discriminate)
    "q_rank_eval" -> ((s, d) => DocQueries.rankEval(s, d, Q_TOPK, Q_EVAL_LABELS, 10)),
    // stemmed-index top-k (lemmatizer seam end-to-end): the DuckDB oracle
    // inlines the raw→stem map the query publishes as a VALUES table
    // (stemming becomes SQL-expressible through the mapping — see
    // stemOracle below), so this is a full hash-checked query
    "q_stem_topk" -> ((s, d) => DocQueries.stemTopK(s, d, "merging windows", 10)),
    // training-data pipeline: text analysis
    "q_token_count" -> ((s, d) => TextOps.tokenCount(s, d)),
    "q_token_pieces" -> ((s, d) => TextOps.tokenPieces(s, d)),
    // learned-subword token budget: BPE merges trained on THIS corpus
    // (one corpus pass + vocab-sized merge rounds), then applied per doc.
    // No SQL oracle — iterative argmax training is not SQL-expressible;
    // the merge semantics are pinned by BpeSpec's from-scratch reference
    // (driver records the rows-only check, like q_mmr/q_stem_topk)
    "q_bpe_pieces" -> ((s, d) => BpeOps.bpePieceCount(s, d, 30, 2L)),
    "q_langid" -> ((s, d) => TextOps.langId(s, d)),
    "q_quality" -> ((s, d) => TextOps.quality(s, d)),
    "q_fingerprint" -> ((s, d) => TextOps.fingerprint(s, d)),
    // repetition diagnostics (Gopher-style repeated-bigram quality filter)
    "q_repetition" -> ((s, d) => TextOps.repetition(s, d)),
    // mean unigram surprisal (LM-free perplexity proxy for quality filters)
    "q_surprisal" -> ((s, d) => TextOps.surprisal(s, d)),
    // benchmark decontamination vs a held-out eval slice
    "q_decontaminate" -> ((s, d) => TextOps.decontaminate(s, d)),
    // deterministic per-source stratified sampling (mixture weights)
    "q_sample_stratified" -> ((s, d) => TextOps.stratifiedSample(s, d,
      Map("src0" -> 0.75, "src3" -> 0.25), 0.5)),
    // composed one-scan cleaning predicate (lang + tokens + quality + dup)
    "q_filter_pipeline" -> ((s, d) => TextOps.filterPipeline(s, d,
      Set("en"), 30L, 0.35, 0.05)),
    // fixed-window strided token chunking (context-sized training pieces)
    "q_chunks" -> ((s, d) => TextOps.chunks(s, d, 64, 48)),
    // corpus collocation mining: adjacent-bigram PMI, micro-unit parity
    "q_pmi" -> ((s, d) => TextOps.pmi(s, d, 10L)),
    // sequence packing: chunks concat-split into 256-token training bins
    // (distributed two-pass prefix sum — never a one-task global window)
    "q_pack" -> ((s, d) => TextOps.packChunks(s, d, 64, 48, 256L)),
    // deduplication family
    "q_dedup_exact" -> ((s, d) => TextOps.dedupExact(s, d)),
    // exact-substring dedup: maximal repeated ≥8-token spans (shingle
    // approximation of suffix-array substring dedup — two shingle-keyed
    // shuffles + one doc-keyed window, never all-pairs)
    "q_substr_dup" -> ((s, d) => TextOps.substrDupSpans(s, d, 8)),
    // its end product: the corpus with duplicated spans removed (fully-
    // duplicated docs drop out entirely)
    "q_substr_apply" -> ((s, d) => TextOps.substrDedupApply(s, d, 8)),
    "q_simhash" -> ((s, d) => TextOps.simHash(s, d)),
    "q_simhash_pairs" -> ((s, d) => TextOps.simHashPairs(s, d, 3)),
    // precision stage after banded recall: true edit distance ≤ 32 on
    // SimHash candidates, via the banded-threshold Levenshtein kernel
    "q_near_edit" -> ((s, d) => TextOps.nearDupEdit(s, d, 3, 32)),
    "q_minhash_pairs" -> ((s, d) => TextOps.minHashPairs(s, d)),
    // continuous-ingest dedup: new batch (doc_id%10==3) vs the old corpus,
    // broadcast-new band join — cost scales with the batch, not the corpus
    "q_dedup_incr" -> ((s, d) => TextOps.dedupIncremental(s, d, 10L, 3L)),
    // near-dup clustering: connected components over the LSH pair graph
    "q_dup_clusters" -> ((s, d) => TextOps.dupClusters(s, d)),
    // same clusters through the alternating large-star/small-star finder
    // (O(log n) rounds on any diameter — the adversarial-chain path);
    // shares q_dup_clusters' oracle because the output contract is identical
    "q_dup_clusters_ls" -> ((s, d) => TextOps.dupClustersStar(s, d)),
    // dedup end product: the corpus minus non-canonical cluster members
    "q_dedup_apply" -> ((s, d) => TextOps.dedupApply(s, d)),
    // NON-DEFAULT SimilarityConfig, oracle-mirrored: 16 permutations =
    // 8 bands (the larger-corpus recall setting) — proves the knobs are
    // real and parity survives a constant change
    "q_minhash_k16" -> ((s, d) => TextOps.minHashPairs(s, d, CfgK16)),
    "q_ngram_jaccard" -> ((s, d) => TextOps.ngramJaccard(s, d, 0.5)),
    // asymmetric Broder containment over the same banded candidates —
    // catches the quote/subset near-dup shape Jaccard dilutes away
    "q_containment" -> ((s, d) => TextOps.containment(s, d, 0.8)),
    // similarity search over embeddings
    "q_cos_topk" -> ((s, d) => VectorOps.cosTopK(s, d, 0L, 10)),
    "q_ann_ivf" -> ((s, d) => VectorOps.annIvf(s, d, 0L, 10, 2)),
    // IVF over the MATERIALIZED index: nprobe prunes at the partition
    // (file) level — per-query IO ∝ probed clusters, never the corpus
    "q_ann_ivf_idx" -> ((s, d) => VectorOps.annIvfIndexed(s, d, 0L, 10, 2)),
    // product quantization: ADC over pqM sub-codes per vector (64× less
    // scan IO than raw vectors) + exact-cosine refine of pqRefine cands
    "q_ann_pq" -> ((s, d) => VectorOps.annPq(s, d, 0L, 10)),
    // IVF-PQ over the MATERIALIZED index: probed partitions of the codes
    // table only, then a bounded point-read refine — the 100-TB ANN shape
    "q_ann_ivfpq" -> ((s, d) => VectorOps.annIvfPqIndexed(s, d, 0L, 10, 2)),
    "q_embed_pairs" -> ((s, d) => VectorOps.similarPairs(s, d, 20)),
    // NON-DEFAULT lshBits=48 (12 rows/band — the larger-corpus key-space
    // setting), oracle-mirrored like q_minhash_k16
    "q_embed_pairs_w48" -> ((s, d) => VectorOps.similarPairs(s, d, 20, CfgW48)),
    // corpus organization: k-means cluster assignment per embedding
    "q_embed_cluster" -> ((s, d) => VectorOps.embedCluster(s, d)),
    // multimodal: real PNG/WAV/AVI header parsing over synth containers
    "q_mm_features" -> ((s, d) => Multimodal.features(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_corpus_stats" -> OracleSql.corpusStats,
    "q_term_df" -> OracleSql.termDf(20),
    "q_doc_len" -> OracleSql.docLens,
    "q_doc_tf" -> OracleSql.docTf,
    "q_postings_roundtrip" -> OracleSql.docTf,
    "q_bm25_score_all" -> OracleSql.scoreAll(qt(Q_SCORE), P),
    "q_bm25_topk" -> OracleSql.topK(qt(Q_TOPK), P, 10),
    "q_bm25_topk_rel" -> OracleSql.topK(qt(Q_TOPK_REL), P, 10),
    "q_bm25_and" -> OracleSql.topKAnd(qt(Q_AND), P, 10),
    "q_bm25_msm" -> OracleSql.topKMsm(qt(Q_TOPK), P, 2, 10),
    "q_search_after" -> OracleSql.topKOffset(qt(Q_TOPK), P, 10),
    "q_suggest" -> OracleSql.suggest("spak", 2, 10),
    "q_merge_topk" -> OracleSql.topK(qt(Q_TOPK), P, 10),
    "q_merge_stats" -> OracleSql.corpusStats,
    "q_boost" -> OracleSql.topKBoosted(
      qt(Q_TOPK).map { case (t, c) => (t, c, Boosts.getOrElse(t, 1.0)) }, P, 10),
    "q_synonyms" -> OracleSql.topKSynonyms(
      qt(Q_SYN).map { case (t, c) => (t, c, synMembers(t)) }, P, 10),
    "q_dismax" -> OracleSql.topKDisMax(Seq(qt(Q_TOPK), qt(Q_SCORE)), 0.3, P, 10),
    "q_tfidf" -> OracleSql.topKTfIdf(qt(Q_TOPK), 10),
    "q_rescore" -> OracleSql.rescoreTopK(qt(Q_CASCADE),
      Analyzer.tokenizeRaw(Q_PHRASE).toSeq, 2.0, P, 50, 10),
    "q_top_hits" -> OracleSql.topHitsByGroup(qt(Q_SCORE), P, "source", 2, 5),
    "q_term_stats" -> OracleSql.termStats(20),
    "q_combined_fields" -> OracleSql.topK(qt(Q_CF), P, 10, rel = CombinedRel),
    "q_phrase_prefix" -> OracleSql.phrasePrefixTopK(
      qt(PpRaw.init.mkString(" ")), PpRaw.init, PpRaw.last, P, 10),
    "q_func_score" -> OracleSql.funcScoreTopK(qt(Q_SCORE), P, 10),
    "q_ann_filtered" -> OracleSqlOps.cosTopKFiltered(0L, 3, 10),
    "q_phrase_suggest" -> OracleSql.phraseSuggest(
      Analyzer.tokenizeRaw("spak sort").toSeq, 2, 5, 10),
    "q_complete" -> OracleSql.complete("s", 10),
    "q_lm_dirichlet" -> OracleSql.topKDirichlet(qt(Q_TOPK), 2000.0, 10),
    "q_sig_terms" -> OracleSql.significantTerms(qt(Q_AND).map(_._1), 20),
    "q_collapse" -> OracleSql.collapseTopK(qt(Q_SCORE), P, "source", 5),
    "q_wildcard" -> OracleSql.wildcardTopK("^s.*a.*$", 10, P, 10),
    "q_federated" -> OracleSql.topK(qt(Q_TOPK), P, 10),
    "q_percolate" -> OracleSql.percolate(Percs.map(p =>
      (p.qid, qt(p.must).map(_._1), qt(p.not).map(_._1)))),
    "q_bm25_not" -> OracleSql.topKNot(
      qt(Q_NOT).filterNot(t => qt(E_NOT).exists(_._1 == t._1)),
      qt(E_NOT).map(_._1), P, 10),
    "q_phrase" -> OracleSql.phraseTopK(qt(Q_PHRASE),
      Analyzer.tokenizeRaw(Q_PHRASE).toSeq, P, 10),
    "q_phrase_pos" -> OracleSql.phraseTopK(qt(Q_PHRASE_POS),
      Analyzer.tokenizeRaw(Q_PHRASE_POS).toSeq, P, 10),
    "q_phrase_stop" -> OracleSql.phraseStopTopK(
      Analyzer.tokenizeRaw(Q_PHRASE_STOP).toSeq, 10),
    "q_span_near" -> OracleSql.spanNearTopK(qt(Q_SPAN),
      Analyzer.tokenizeRaw(Q_SPAN).toSeq, 3, P, 10),
    "q_phrase_slop" -> OracleSql.phraseSlopTopK(qt(Q_SPAN),
      Analyzer.tokenizeRaw(Q_SPAN).toSeq, 2, P, 10),
    "q_filtered_topk" -> OracleSql.topKFiltered(qt(Q_SCORE), P, 10,
      Seq("lang" -> "en", "source" -> "src7")),
    "q_snippets" -> OracleSql.snippets(qt(Q_TOPK), P, 10, DocQueries.SnippetWindow),
    "q_facet_counts" -> OracleSql.facetCounts(qt(Q_SCORE), "source", 8),
    "q_facet_multi" -> OracleSql.facetCountsMulti(qt(Q_SCORE), Seq("lang", "source"), 5),
    "q_facet_range" -> OracleSql.facetCountsRange(qt(Q_SCORE), "n_chars", NCharBounds),
    "q_bm25_empty" -> OracleSql.emptyQuery,
    "q_refresh_topk" -> OracleSql.topK(qt(Q_TOPK_REL), P, 10),
    "q_delete_topk" -> OracleSql.topK(qt(Q_TOPK), P, 10,
      where = "(d.doc_id % 5) <> 2"),
    "q_delete_stats" -> OracleSql.corpusStatsWhere("(d.doc_id % 5) <> 2"),
    "q_update_topk" -> OracleSql.topK(qt(Q_UPD), P, 10, rel = UpdatedRel),
    "q_update_stats" -> OracleSql.corpusStatsWhere("TRUE", rel = UpdatedRel),
    "q_bm25_bool" -> OracleSql.topKBool(qt(B_MUST + " " + B_SHOULD),
      qt(B_MUST).map(_._1), qt(B_NOT).map(_._1), P, 10),
    "q_bool_filtered" -> OracleSql.topKBool(qt(B_MUST + " " + B_SHOULD),
      qt(B_MUST).map(_._1), qt(B_NOT).map(_._1), P, 10,
      facets = Seq("lang" -> "en")),
    "q_explain" -> OracleSql.explainTopHit(qt(Q_TOPK), P),
    "q_snapshot_topk" -> OracleSql.topK(qt(Q_TOPK_REL), P, 10,
      where = "d.doc_id % 5 <> 0"),
    "q_cascade" -> OracleSql.cascade(qt(Q_CASCADE), P, 0.5, 20, 5),
    "q_bm25_twopass" -> OracleSql.scoreAll(qt(Q_SCORE), P),
    "q_cascade_metrics" -> OracleSql.cascadeMetrics(qt(Q_CASCADE), P, 0.5, 20, 5),
    "q_lm_score" -> OracleSql.lmScore(Analyzer.tokenizeRaw(Q_TOPK).distinct.toSeq),
    "q_lm_rank" -> OracleSql.lmRank(Analyzer.tokenizeRaw(Q_TOPK).distinct.toSeq, 5),
    "q_bm25_batch" -> OracleSql.topKBatch(
      Seq("q1" -> qt(Q_TOPK), "q2" -> qt(Q_SCORE)), P, 10),
    "q_group_topk" -> OracleSql.groupTopK(qt(Q_SCORE), P, "source", 5),
    "q_conv_topk" -> OracleSql.convTopK(qt(Q_SCORE), P, DocQueries.TurnsPerConv, 3, 5),
    "q_conv_join" -> OracleSql.convJoinTopK(qt(CJ_A + " " + CJ_B),
      qt(CJ_A).map(_._1), qt(CJ_B).map(_._1), DocQueries.TurnsPerConv, P, 8),
    "q_turn_context" -> OracleSql.turnContext(qt(Q_TOPK), P, DocQueries.TurnsPerConv, 10),
    "q_time_topk" -> OracleSql.timeTopK(qt(Q_SCORE), P, 10),
    "q_sessionize" -> OracleSqlOps.sessionize(360),
    "q_event_windows" -> OracleSqlOps.eventWindows(1440),
    "q_asof" -> OracleSqlOps.asOf("purchase"),
    "q_funnel" -> OracleSqlOps.funnel(Seq("signup", "click", "purchase")),
    "q_keywords" -> OracleSql.keywords(30L, 3),
    "q_expand" -> OracleSql.expandTerms(qt(Q_TOPK), P, 10, 10),
    "q_hybrid_rrf" -> OracleSqlOps.hybridTopK(qt(Q_SCORE), P, 0L, 20, 10),
    "q_mlt" -> OracleSql.moreLikeThis(0L, 5, 10, P),
    "q_zipf" -> OracleSql.zipfCoverage(20),
    "q_len_hist" -> OracleSql.lenHist(16),
    "q_prefix" -> OracleSql.prefixTopK("s", P, 10),
    "q_fuzzy" -> OracleSql.fuzzyTopK("past", 1, 50, P, 10),
    "q_rank_eval" -> OracleSqlOps.rankEval(qt(Q_TOPK),
      qt(Q_EVAL_LABELS).map(_._1), P, 10),
    "q_token_count" -> OracleSqlOps.tokenCount,
    "q_token_pieces" -> OracleSqlOps.tokenPieces,
    "q_langid" -> OracleSqlOps.langId,
    "q_quality" -> OracleSqlOps.quality,
    "q_fingerprint" -> OracleSqlOps.fingerprint,
    "q_repetition" -> OracleSqlOps.repetition,
    "q_surprisal" -> OracleSqlOps.surprisal,
    "q_decontaminate" -> OracleSqlOps.decontaminate(13L, 7L),
    "q_sample_stratified" -> OracleSqlOps.stratifiedSample(
      Map("src0" -> 0.75, "src3" -> 0.25), 0.5),
    "q_filter_pipeline" -> OracleSqlOps.filterPipeline(Set("en"), 30L, 0.35, 0.05),
    "q_chunks" -> OracleSqlOps.chunks(64, 48),
    "q_pmi" -> OracleSqlOps.pmi(10L),
    "q_pack" -> OracleSqlOps.packChunks(64, 48, 256L),
    "q_near_edit" -> OracleSqlOps.nearDupEdit(3, 32),
    "q_dedup_incr" -> OracleSqlOps.dedupIncremental(10L, 3L),
    "q_dedup_exact" -> OracleSqlOps.dedupExact,
    "q_substr_dup" -> OracleSqlOps.substrDupSpans(8),
    "q_substr_apply" -> OracleSqlOps.substrDedupApply(8),
    "q_simhash" -> OracleSqlOps.simHash,
    "q_simhash_pairs" -> OracleSqlOps.simHashPairs(3),
    "q_minhash_pairs" -> OracleSqlOps.minHashPairs(),
    "q_dup_clusters" -> OracleSqlOps.dupClusters(),
    "q_dup_clusters_ls" -> OracleSqlOps.dupClusters(),
    "q_dedup_apply" -> OracleSqlOps.dedupApply(),
    "q_minhash_k16" -> OracleSqlOps.minHashPairs(CfgK16),
    "q_ngram_jaccard" -> OracleSqlOps.ngramJaccard(0.5),
    "q_containment" -> OracleSqlOps.containment(0.8),
    "q_cos_topk" -> OracleSqlOps.cosTopK(0L, 10),
    "q_ann_ivf" -> OracleSqlOps.annIvf(0L, 10, 2),
    "q_ann_ivf_idx" -> OracleSqlOps.annIvf(0L, 10, 2),
    "q_ann_pq" -> OracleSqlOps.annPq(0L, 10),
    "q_ann_ivfpq" -> OracleSqlOps.annIvfPq(0L, 10, 2),
    "q_embed_pairs" -> OracleSqlOps.similarPairs(20),
    "q_embed_pairs_w48" -> OracleSqlOps.similarPairs(20, CfgW48),
    "q_embed_cluster" -> OracleSqlOps.embedCluster(),
    "q_mm_features" -> OracleSqlOps.mmFeatures
  ) ++ stemOracle

  /** q_stem_topk's DuckDB oracle: stemming is SQL-expressible through the
    * raw→stem mapping table computed at DUMP time for the corpus
    * DocQueries.stemTopK last served (Verify executes every query before
    * dumping oracle_sql.json, so the corpus is recorded by then; the
    * vocab-sized collect the inlined VALUES literal needs lives on this
    * dump path only — never on the query surface). The query terms are
    * stemmed with the same Norm the stemmed index uses. Empty only if
    * the query never ran — the driver then records the weaker rows-only
    * check, exactly as before. */
  private def stemOracle: Map[String, String] =
    DocQueries.stemCorpusDir.flatMap { _ =>
      DocQueries.stemOraclePairs(org.apache.spark.sql.SparkSession.active)
    }.filter(_.nonEmpty).map { pairs =>
      val stemQt = Analyzer.termFreqs(Analyzer.tokenize(
          "merging windows", graft.analysis.StopWords.english,
          Analyzer.EnglishStem))
        .toSeq.sortBy(_._1)
      "q_stem_topk" -> OracleSql.stemTopK(pairs, stemQt, P, 10)
    }.toMap
}
