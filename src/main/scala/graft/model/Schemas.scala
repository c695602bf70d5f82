package graft.model

import java.sql.Timestamp

/** Core data model of the engine (SURVEY.md §1.2).
  *
  * The source table shape follows the `input_hint` in BASELINE.json: a table
  * of multi-turn conversation/agent transcripts; one turn = one document.
  * Mirrors (re-expressed, not ported) the reference's stream-of-strings model
  * (/root/reference/src/SemanticKernel.Rankers.Abstractions/IRanker.cs:8-11).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** Analyzed document: ≅ ProcessedDocument (BM25Reranker.cs:26-32), but keyed
  * by a deterministic dense docId instead of the raw text. */
final case class AnalyzedDoc(docId: Long, terms: Array[String], len: Int)

/** Global corpus statistics ≅ CorpusStatistics (BM25Reranker.cs:16-21), with
  * the document-frequency dictionary factored out into a distributed table
  * (TermStat) instead of a driver-side map — the map does not survive 10^12
  * docs. */
final case class CorpusStats(n: Long, avgdl: Double)
final case class TermStat(term: String, df: Long)

/** One posting list: all docs of one shard containing `term`.
  *
  * docsBlob = delta-encoded + variable-byte docIDs (ascending);
  * tfsBlob  = variable-byte term frequencies, aligned with docsBlob;
  * lensBlob = variable-byte doc lengths, aligned with docsBlob — the
  *            Lucene-norms-style inline length makes every posting list
  *            self-sufficient for BM25 scoring: the query path needs NO
  *            side lookup of a per-shard length table, so a shard of any
  *            size (10^10+ docs) is scored with O(query·blocks) state.
  * block*   = per-block (BlockSize docs) skip metadata for block-max WAND:
  * last docID in block, max tf in block, byte offsets into the blobs.
  */
final case class Posting(
    shard: Int,
    term: String,
    count: Int,
    maxTf: Int,
    docsBlob: Array[Byte],
    tfsBlob: Array[Byte],
    lensBlob: Array[Byte],
    blockLast: Array[Long],
    blockMaxTf: Array[Int],
    blockDocOff: Array[Int],
    blockTfOff: Array[Int],
    blockLenOff: Array[Int]
)

/** One positional posting list: all docs of one shard containing raw token
  * `term`, with every occurrence position (positions index the RAW token
  * stream — stopwords included — so phrase adjacency over the sidecar is
  * byte-for-byte the same relation as raw-token containsSlice).
  *
  * docsBlob = delta-encoded + variable-byte docIDs (ascending);
  * cntsBlob = variable-byte per-doc occurrence counts, aligned with docsBlob;
  * posBlob  = per-doc delta-encoded + variable-byte positions, concatenated
  *            in docsBlob order (deltas restart at each doc, so per-doc
  *            position runs are self-contained and chunk blobs concatenate
  *            without re-encoding at merge time).
  */
final case class PosPosting(
    shard: Int,
    term: String,
    count: Int,
    docsBlob: Array[Byte],
    cntsBlob: Array[Byte],
    posBlob: Array[Byte]
)

/** Per-shard document map row: docId → identity + length. */
final case class DocMeta(
    shard: Int,
    docId: Long,
    conv_id: String,
    turn_idx: Int,
    len: Int
)

/** Query-side analyzed term with query term frequency and global df. */
final case class QueryTerm(term: String, qtf: Int, df: Long)

/** A scored hit. */
final case class Hit(
    qid: String,
    docId: Long,
    conv_id: String,
    turn_idx: Int,
    score: Double
)

/** Per-stage checkpoint manifest row (north rule: resumable build with
  * lineage + row/byte metrics). */
final case class StageManifest(
    stage: String,
    rows: Long,
    bytes: Long,
    status: String,
    wallMs: Long
)

object Ids {
  /** Bits reserved for the within-shard local rank. 2^40 docs per shard is
    * comfortably above 10^12 total docs / any sane shard count. */
  val RankBits = 40
  val RankMask: Long = (1L << RankBits) - 1L
  /** Fail fast at build/ingest time rather than silently corrupt docIds:
    * a shard holds at most 2^40 (~1.1e12) documents. */
  @inline def docId(shard: Int, rank: Long): Long = {
    if (rank > RankMask)
      throw new IllegalArgumentException(
        s"shard $shard exceeds 2^$RankBits docs (rank $rank) — raise the shard count")
    (shard.toLong << RankBits) | rank
  }
  @inline def shardOf(docId: Long): Int = (docId >>> RankBits).toInt
  @inline def rankOf(docId: Long): Long = docId & RankMask
}
