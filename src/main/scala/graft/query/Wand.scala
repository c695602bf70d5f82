package graft.query

import graft.codec.Postings
import graft.model.Posting

/** Block-max WAND top-k kernel (SURVEY.md §4 item 3).
  *
  * Runs per index shard inside a `mapGroups`/`mapPartitions` — the only
  * piece of the query path that is imperative by design: posting-list
  * traversal with threshold-based skipping is not expressible relationally.
  *
  * Semantics: identical top-k to exhaustive OR-mode BM25 (any overlapping
  * term contributes; the reference's scorer is OR-mode, BM25Reranker.cs:
  * 405-408). WAND only *prunes* documents that provably cannot enter the
  * current top-k heap:
  *  - term upper bound  ub(t) = idf(t)·qtfSat(t)·tfSatUpper(maxTf(t))
  *  - pivot selection over cursors sorted by current docId;
  *  - block-max refinement: before scoring a pivot, re-check with the
  *    *current block* max tf of each aligned cursor.
  */
object Wand {

  /** `boost` is the query-time per-term weight (Lucene's `term^w`): it
    * scales the term's every contribution AND its pruning upper bound by
    * the same factor, so WAND thresholding stays exact under boosting. */
  final case class TermInput(posting: Posting, qtf: Int, globalDf: Long,
                             boost: Double = 1.0) {
    // Lucene's BoostQuery contract: a zero/negative/NaN boost would make
    // the term's pruning upper bound non-positive and silently break
    // WAND's cumulative-bound pivot logic (pruned results diverging from
    // the exhaustive twin) — reject at construction, never in the kernel.
    require(boost > 0.0, s"term boost must be > 0 (got $boost)")
  }
  final case class Scored(docId: Long, score: Double)

  /** Bounded min-heap of (score, docId); keeps the k largest by
    * (score, then smaller docId preferred on equal score — deterministic
    * D2 tie-break: on equal scores the smaller docId wins a heap slot).
    *
    * `gateMax` is the search_after pagination gate: documents scoring
    * strictly above it (earlier pages) never enter the heap, so a deep
    * page keeps a k-sized heap instead of page·k. The gate carries half-a-
    * round-4-ulp slack at the caller (scores are exposed rounded to 4dp),
    * so boundary ties PASS the kernel and the exact strictly-after cut
    * happens relationally where the external doc key exists — Lucene/ES
    * searchAfter's "unique tiebreak field" contract, split the same way. */
  final class TopK(k: Int, gateMax: Double = Double.PositiveInfinity) {
    val heap = new java.util.PriorityQueue[Scored](math.max(k, 1),
      (a: Scored, b: Scored) =>
        if (a.score != b.score) java.lang.Double.compare(a.score, b.score)
        else java.lang.Long.compare(b.docId, a.docId)) // larger docId = weaker
    def threshold: Double =
      if (heap.size < k) Double.NegativeInfinity else heap.peek().score
    def offer(docId: Long, score: Double): Unit = {
      if (score > gateMax) return // earlier page (search_after)
      if (heap.size < k) heap.add(Scored(docId, score))
      else {
        val w = heap.peek()
        if (score > w.score || (score == w.score && docId < w.docId)) {
          heap.poll(); heap.add(Scored(docId, score))
        }
      }
    }
    def drainDescending(): Array[Scored] = {
      val out = new Array[Scored](heap.size)
      var i = out.length - 1
      while (!heap.isEmpty) { out(i) = heap.poll(); i -= 1 }
      out
    }
  }

  /** Number of documents fully scored by the most recent topK call ON THIS
    * THREAD — instrumentation for pruning-effectiveness tests only. */
  val lastScoredCount = new ThreadLocal[Long] { override def initialValue(): Long = 0L }

  /** Forward-only exclusion check over posting lists (MUST_NOT terms,
    * delete tombstones). Sound only when probed with NON-DECREASING docIds
    * — which every kernel here guarantees, because candidates are
    * enumerated in strictly ascending docId order. Each probe leapfrogs the
    * exclusion cursors forward, so total cost over a kernel run is one
    * block-skipping pass per exclusion list, never a pass per candidate. */
  final class Excl(lists: Seq[Posting]) {
    private val cs = lists.filter(_.count > 0).map { e =>
      val c = new Postings.Cursor(e); c.next(); c
    }.toArray
    def isEmpty: Boolean = cs.isEmpty
    def excluded(doc: Long): Boolean = {
      var j = 0
      while (j < cs.length) {
        val c = cs(j)
        if (!c.exhausted && c.docId < doc) c.advanceTo(doc)
        if (!c.exhausted && c.docId == doc) return true
        j += 1
      }
      false
    }
  }

  /** Top-k over one shard. Doc lengths come inline from the posting blobs
    * (Cursor.dl); stats are GLOBAL (n, avgdl, per-term global df).
    *
    * `minMatch` is Lucene's minimum_should_match: a document qualifies only
    * if it contains at least that many DISTINCT query terms (1 = plain OR).
    * It filters at full-evaluation time only — threshold pruning stays
    * sound because dropping candidates never raises the true k-th score.
    * `gateMax` is the search_after page gate (see [[TopK]]). */
  def topK(terms: Seq[TermInput], n: Long, avgdl: Double,
           k: Int, p: Bm25.Params, minMatch: Int = 1,
           gateMax: Double = Double.PositiveInfinity): Array[Scored] = {
    lastScoredCount.set(0L)
    val live = terms.filter(t => t.posting.count > 0 && t.globalDf > 0)
    val topk = new TopK(k, gateMax)
    if (live.isEmpty || live.size < minMatch || n == 0 || avgdl == 0.0)
      return topk.drainDescending()

    val m = live.size
    val cursors = new Array[Postings.Cursor](m)
    val ubs = new Array[Double](m) // term-level upper bound
    val idfQtf = new Array[Double](m) // idf * qtfSat, reused per hit
    var i = 0
    live.foreach { t =>
      cursors(i) = new Postings.Cursor(t.posting)
      cursors(i).next()
      idfQtf(i) = Bm25.idf(n, t.globalDf) * Bm25.qtfSat(t.qtf, p) * t.boost
      ubs(i) = idfQtf(i) * Bm25.tfSatUpper(t.posting.maxTf, p)
      i += 1
    }
    // order[] = cursor indices sorted by current docId (insertion-sorted,
    // m is the query length — tiny)
    val order = Array.range(0, m)
    def sortOrder(): Unit = {
      var a = 1
      while (a < m) {
        val x = order(a); var b = a - 1
        while (b >= 0 && cursors(order(b)).docId > cursors(x).docId) {
          order(b + 1) = order(b); b -= 1
        }
        order(b + 1) = x
        a += 1
      }
    }

    var liveCount = m
    while (liveCount > 0) {
      sortOrder()
      // drop exhausted cursors (they sort to the end with MaxValue)
      while (liveCount > 0 && cursors(order(liveCount - 1)).exhausted) liveCount -= 1
      if (liveCount == 0) return topk.drainDescending()

      // pivot: first position where the cumulative UB clears the threshold
      val theta = topk.threshold
      var acc = 0.0
      var pivotPos = -1
      var j = 0
      while (j < liveCount && pivotPos < 0) {
        acc += ubs(order(j))
        if (acc > theta) pivotPos = j
        j += 1
      }
      if (pivotPos < 0) return topk.drainDescending() // nothing can qualify

      val pivotDoc = cursors(order(pivotPos)).docId
      if (cursors(order(0)).docId == pivotDoc) {
        // block-max recheck: tighter bound using current blocks. Must scan
        // ALL live cursors — ones beyond the pivot position can also sit on
        // pivotDoc and contribute to its true score.
        var blockUb = 0.0
        var jj = 0
        while (jj < liveCount) {
          val ci = order(jj)
          val c = cursors(ci)
          if (!c.exhausted) {
            if (c.docId < pivotDoc) c.advanceTo(pivotDoc)
            if (!c.exhausted && c.docId == pivotDoc)
              blockUb += idfQtf(ci) * Bm25.tfSatUpper(c.currentBlockMaxTf, p)
          }
          jj += 1
        }
        if (blockUb > theta) {
          // fully score pivotDoc (doc length rides inline on each cursor)
          lastScoredCount.set(lastScoredCount.get + 1)
          var s = 0.0
          var matched = 0
          var jk = 0
          while (jk < liveCount) {
            val ci = order(jk)
            val c = cursors(ci)
            if (!c.exhausted && c.docId == pivotDoc) {
              s += idfQtf(ci) * Bm25.tfSat(c.tf, c.dl, avgdl, p)
              matched += 1
            }
            jk += 1
          }
          if (s > 0.0 && matched >= minMatch) topk.offer(pivotDoc, s)
        }
        // advance every cursor sitting on pivotDoc
        var ja = 0
        while (ja < liveCount) {
          val c = cursors(order(ja))
          if (!c.exhausted && c.docId == pivotDoc) c.next()
          ja += 1
        }
      } else {
        // advance the leading cursors to the pivot
        var ja = 0
        while (ja < pivotPos && cursors(order(ja)).docId < pivotDoc) {
          cursors(order(ja)).advanceTo(pivotDoc)
          ja += 1
        }
      }
    }
    topk.drainDescending()
  }

  /** NOT-mode top-k over one shard: OR-mode WAND top-k, excluding every
    * document present in ANY of the `excludes` posting lists (Lucene's
    * MUST_NOT / ReqExclScorer shape). The exclusion cursors leapfrog
    * forward only — valid because WAND fully scores candidates in strictly
    * increasing docId order (after a candidate is scored, every cursor
    * sitting on it advances past it) — so the extra cost is the excluded
    * lists' block skips, never a second pass. Threshold pruning stays
    * sound: exclusion only ever REMOVES candidates, and the heap
    * threshold is a lower bound on the final k-th score either way. */
  def topKNot(terms: Seq[TermInput], excludes: Seq[Posting], n: Long,
              avgdl: Double, k: Int, p: Bm25.Params, minMatch: Int = 1,
              gateMax: Double = Double.PositiveInfinity): Array[Scored] = {
    val ex = new Excl(excludes)
    if (ex.isEmpty) return topK(terms, n, avgdl, k, p, minMatch, gateMax)
    def excluded(doc: Long): Boolean = ex.excluded(doc)

    val live = terms.filter(t => t.posting.count > 0 && t.globalDf > 0)
    val topk = new TopK(k, gateMax)
    if (live.isEmpty || live.size < minMatch || n == 0 || avgdl == 0.0)
      return topk.drainDescending()
    val m = live.size
    val cursors = new Array[Postings.Cursor](m)
    val ubs = new Array[Double](m)
    val idfQtf = new Array[Double](m)
    var i = 0
    live.foreach { t =>
      cursors(i) = new Postings.Cursor(t.posting)
      cursors(i).next()
      idfQtf(i) = Bm25.idf(n, t.globalDf) * Bm25.qtfSat(t.qtf, p) * t.boost
      ubs(i) = idfQtf(i) * Bm25.tfSatUpper(t.posting.maxTf, p)
      i += 1
    }
    val order = Array.range(0, m)
    def sortOrder(): Unit = {
      var a = 1
      while (a < m) {
        val x = order(a); var b = a - 1
        while (b >= 0 && cursors(order(b)).docId > cursors(x).docId) {
          order(b + 1) = order(b); b -= 1
        }
        order(b + 1) = x
        a += 1
      }
    }
    var liveCount = m
    while (liveCount > 0) {
      sortOrder()
      while (liveCount > 0 && cursors(order(liveCount - 1)).exhausted) liveCount -= 1
      if (liveCount == 0) return topk.drainDescending()
      val theta = topk.threshold
      var acc = 0.0
      var pivotPos = -1
      var j = 0
      while (j < liveCount && pivotPos < 0) {
        acc += ubs(order(j))
        if (acc > theta) pivotPos = j
        j += 1
      }
      if (pivotPos < 0) return topk.drainDescending()
      val pivotDoc = cursors(order(pivotPos)).docId
      if (cursors(order(0)).docId == pivotDoc) {
        // exclusion check FIRST: an excluded doc skips the block-max
        // recheck and the full scoring entirely
        if (!excluded(pivotDoc)) {
          var blockUb = 0.0
          var jj = 0
          while (jj < liveCount) {
            val ci = order(jj)
            val c = cursors(ci)
            if (!c.exhausted) {
              if (c.docId < pivotDoc) c.advanceTo(pivotDoc)
              if (!c.exhausted && c.docId == pivotDoc)
                blockUb += idfQtf(ci) * Bm25.tfSatUpper(c.currentBlockMaxTf, p)
            }
            jj += 1
          }
          if (blockUb > theta) {
            var s = 0.0
            var matched = 0
            var jk = 0
            while (jk < liveCount) {
              val ci = order(jk)
              val c = cursors(ci)
              if (!c.exhausted && c.docId == pivotDoc) {
                s += idfQtf(ci) * Bm25.tfSat(c.tf, c.dl, avgdl, p)
                matched += 1
              }
              jk += 1
            }
            if (s > 0.0 && matched >= minMatch) topk.offer(pivotDoc, s)
          }
        }
        var ja = 0
        while (ja < liveCount) {
          val c = cursors(order(ja))
          if (!c.exhausted && c.docId == pivotDoc) c.next()
          ja += 1
        }
      } else {
        var ja = 0
        while (ja < pivotPos && cursors(order(ja)).docId < pivotDoc) {
          cursors(order(ja)).advanceTo(pivotDoc)
          ja += 1
        }
      }
    }
    topk.drainDescending()
  }

  /** Conjunctive (AND-mode) top-k over one shard: only documents containing
    * EVERY query term score. `required` is the number of distinct analyzed
    * query terms — when this shard's inputs cover fewer (a term has no
    * posting here), no document in the shard can match and the kernel
    * returns empty without touching a blob.
    *
    * Leapfrog intersection over the block-skipping cursors: repeatedly
    * advance the lagging cursor to the current candidate docId; agreement
    * of all m cursors is a match, scored with the same BM25 sum as OR-mode
    * (the reference's scorer is OR-only; AND is this engine's extension, so
    * its score on a matching doc equals the OR-mode score by design —
    * rank-consistent across modes). Cost is O(shortest list · block
    * skips), never O(union). */
  def topKAnd(terms: Seq[TermInput], required: Int, n: Long, avgdl: Double,
              k: Int, p: Bm25.Params,
              /** Docs present in any of these lists never match (delete
                * tombstones); same forward-leapfrog as [[topKNot]]. */
              excludes: Seq[Posting] = Nil): Array[Scored] = {
    val ex = new Excl(excludes)
    val topk = new TopK(k)
    val live = terms.filter(t => t.posting.count > 0 && t.globalDf > 0)
    if (live.size < required || live.isEmpty || n == 0 || avgdl == 0.0)
      return topk.drainDescending()
    val m = live.size
    val cursors = new Array[Postings.Cursor](m)
    val idfQtf = new Array[Double](m)
    var i = 0
    live.foreach { t =>
      cursors(i) = new Postings.Cursor(t.posting)
      cursors(i).next()
      idfQtf(i) = Bm25.idf(n, t.globalDf) * Bm25.qtfSat(t.qtf, p) * t.boost
      i += 1
    }
    var target = 0L
    var j = 0
    while (j < m) { if (cursors(j).docId > target) target = cursors(j).docId; j += 1 }
    var done = false
    while (!done) {
      var matched = true
      var jj = 0
      while (jj < m && matched) {
        val c = cursors(jj)
        if (c.docId < target) c.advanceTo(target)
        if (c.exhausted) { done = true; matched = false }
        else if (c.docId != target) { target = c.docId; matched = false } // re-scan from 0
        jj += 1
      }
      if (!done && matched) {
        if (!ex.excluded(target)) {
          var s = 0.0
          var jk = 0
          while (jk < m) {
            s += idfQtf(jk) * Bm25.tfSat(cursors(jk).tf, cursors(jk).dl, avgdl, p)
            jk += 1
          }
          topk.offer(target, s)
        }
        if (cursors(0).next()) target = cursors(0).docId else done = true
      }
    }
    topk.drainDescending()
  }

  /** Filtered (faceted) top-k over one shard: rank only documents that
    * appear in EVERY filter posting list (facet lists — see
    * [[graft.model.Facets]]), scoring them with the normal OR-mode BM25 sum
    * over the query terms (a doc passing the filter but overlapping no
    * query term scores 0 and is not emitted, mirroring [[topK]]).
    *
    * `required` is the number of distinct filters the caller requested —
    * when this shard holds fewer filter lists (some facet value absent
    * here), no document in the shard can match.
    *
    * The FILTER intersection drives iteration (leapfrog over the filter
    * cursors, same as [[topKAnd]]); query-term cursors only `advanceTo`
    * each surviving candidate. Cost ∝ shortest filter list · block skips —
    * for selective facets this beats WAND over the query union by the
    * selectivity factor, and for a facet covering ~the whole corpus it
    * degrades to one extra always-matching cursor on an OR-mode scan, so
    * driving from the filter is the right default at any selectivity. */
  def topKFiltered(query: Seq[TermInput], filters: Seq[Posting], required: Int,
                   n: Long, avgdl: Double, k: Int, p: Bm25.Params,
                   excludes: Seq[Posting] = Nil): Array[Scored] = {
    val ex = new Excl(excludes)
    val topk = new TopK(k)
    val liveF = filters.filter(_.count > 0)
    if (liveF.size < required || liveF.isEmpty || n == 0 || avgdl == 0.0)
      return topk.drainDescending()
    val live = query.filter(t => t.posting.count > 0 && t.globalDf > 0)
    if (live.isEmpty) return topk.drainDescending()

    val fm = liveF.size
    val fc = new Array[Postings.Cursor](fm)
    var i = 0
    liveF.foreach { f => fc(i) = new Postings.Cursor(f); fc(i).next(); i += 1 }
    val m = live.size
    val qc = new Array[Postings.Cursor](m)
    val idfQtf = new Array[Double](m)
    i = 0
    live.foreach { t =>
      qc(i) = new Postings.Cursor(t.posting)
      qc(i).next()
      idfQtf(i) = Bm25.idf(n, t.globalDf) * Bm25.qtfSat(t.qtf, p) * t.boost
      i += 1
    }

    var target = 0L
    var j = 0
    while (j < fm) { if (fc(j).docId > target) target = fc(j).docId; j += 1 }
    var done = false
    while (!done) {
      // leapfrog the filter cursors to a common docId
      var matched = true
      var jj = 0
      while (jj < fm && matched) {
        val c = fc(jj)
        if (c.docId < target) c.advanceTo(target)
        if (c.exhausted) { done = true; matched = false }
        else if (c.docId != target) { target = c.docId; matched = false }
        jj += 1
      }
      if (!done && matched) {
        // score the candidate: query cursors catch up, equal docIds add in
        var s = 0.0
        var liveQ = false
        var jk = 0
        while (jk < m) {
          val c = qc(jk)
          if (!c.exhausted && c.docId < target) c.advanceTo(target)
          if (!c.exhausted) {
            liveQ = true
            if (c.docId == target) s += idfQtf(jk) * Bm25.tfSat(c.tf, c.dl, avgdl, p)
          }
          jk += 1
        }
        if (s > 0.0 && !ex.excluded(target)) topk.offer(target, s)
        if (!liveQ) done = true // every query list exhausted: nothing can score
        else if (fc(0).next()) target = fc(0).docId
        else done = true
      }
    }
    topk.drainDescending()
  }

  /** Every doc (ascending docId) containing ALL query terms in this shard,
    * with its BM25 score — the candidate enumerator for phrase/positional
    * verification. Same leapfrog as [[topKAnd]], no heap; output size is
    * bounded by the SHORTEST posting list, which is what makes
    * verify-on-candidates a scale-safe plan for selective phrases. */
  def matchAll(terms: Seq[TermInput], required: Int, n: Long,
               avgdl: Double, p: Bm25.Params,
               excludes: Seq[Posting] = Nil): Array[Scored] = {
    val ex = new Excl(excludes)
    val live = terms.filter(t => t.posting.count > 0 && t.globalDf > 0)
    if (live.size < required || live.isEmpty || n == 0 || avgdl == 0.0)
      return Array.empty[Scored]
    val m = live.size
    val cursors = new Array[Postings.Cursor](m)
    val idfQtf = new Array[Double](m)
    var i = 0
    live.foreach { t =>
      cursors(i) = new Postings.Cursor(t.posting)
      cursors(i).next()
      idfQtf(i) = Bm25.idf(n, t.globalDf) * Bm25.qtfSat(t.qtf, p) * t.boost
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Scored]()
    var target = 0L
    var j = 0
    while (j < m) { if (cursors(j).docId > target) target = cursors(j).docId; j += 1 }
    var done = false
    while (!done) {
      var matched = true
      var jj = 0
      while (jj < m && matched) {
        val c = cursors(jj)
        if (c.docId < target) c.advanceTo(target)
        if (c.exhausted) { done = true; matched = false }
        else if (c.docId != target) { target = c.docId; matched = false }
        jj += 1
      }
      if (!done && matched) {
        if (!ex.excluded(target)) {
          var s = 0.0
          var jk = 0
          while (jk < m) {
            s += idfQtf(jk) * Bm25.tfSat(cursors(jk).tf, cursors(jk).dl, avgdl, p)
            jk += 1
          }
          out += Scored(target, s)
        }
        if (cursors(0).next()) target = cursors(0).docId else done = true
      }
    }
    out.toArray
  }

  /** Every doc (ascending docId) containing AT LEAST ONE live query term
    * in this shard, with its full OR-mode BM25 score — the match-set
    * enumerator behind scoring AGGREGATIONS (function_score, top_hits,
    * collapse, recency rerank), which need every matching doc's score but
    * never the corpus: cost ∝ the UNION of the query terms' posting
    * lists. Same per-term contribution formula as [[topK]] (reference
    * O5 semantics, BM25Reranker.cs:83-111 restricted to score > 0), no
    * heap cut. STREAMING: O(|terms|) cursor state, nothing buffered —
    * a non-selective query's match set never materializes in kernel
    * memory. */
  def matchAny(terms: Seq[TermInput], n: Long, avgdl: Double, p: Bm25.Params,
               excludes: Seq[Posting] = Nil): Iterator[Scored] = {
    val live = terms.filter(t => t.posting.count > 0 && t.globalDf > 0)
    if (live.isEmpty || n == 0 || avgdl == 0.0) return Iterator.empty
    val ex = new Excl(excludes)
    val m = live.size
    val cursors = new Array[Postings.Cursor](m)
    val idfQtf = new Array[Double](m)
    var i = 0
    live.foreach { t =>
      cursors(i) = new Postings.Cursor(t.posting)
      cursors(i).next()
      idfQtf(i) = Bm25.idf(n, t.globalDf) * Bm25.qtfSat(t.qtf, p) * t.boost
      i += 1
    }
    new scala.collection.AbstractIterator[Scored] {
      private var outDoc = 0L
      private var outScore = 0.0
      private var ready = false
      private var done = false
      private def advance(): Unit = {
        while (!ready && !done) {
          var minDoc = Long.MaxValue
          var j = 0
          while (j < m) {
            val c = cursors(j)
            if (!c.exhausted && c.docId < minDoc) minDoc = c.docId
            j += 1
          }
          if (minDoc == Long.MaxValue) { done = true; return }
          // terms arrive sorted from the caller, so the accumulation
          // order — and therefore the float sum — is deterministic at
          // any parallelism (N ≡ 4N output, the north-rule invariant)
          var s = 0.0
          var j2 = 0
          while (j2 < m) {
            val c = cursors(j2)
            if (!c.exhausted && c.docId == minDoc) {
              s += idfQtf(j2) * Bm25.tfSat(c.tf, c.dl, avgdl, p)
              c.next()
            }
            j2 += 1
          }
          if (s > 0.0 && !ex.excluded(minDoc)) {
            outDoc = minDoc; outScore = s; ready = true
          }
        }
      }
      def hasNext: Boolean = { if (!ready) advance(); ready }
      def next(): Scored = {
        if (!hasNext) throw new NoSuchElementException("matchAny exhausted")
        ready = false
        Scored(outDoc, outScore)
      }
    }
  }

  /** Growable two-level bitmap over per-shard document RANKS (dense by
    * construction — Ids.rankOf). Pages of 2^26 bits (8 MB) allocate lazily,
    * so memory tracks the highest rank actually touched, and the long page
    * index supports the full 2^40 ranks-per-shard docId space (no toInt
    * anywhere). Used by the facet-count kernel. */
  final class RankBitmap {
    private val PageBits = 26
    private val PageWords = 1 << (PageBits - 6)
    private var pages = new Array[Array[Long]](16)
    def set(rank: Long): Unit = {
      val p = (rank >>> PageBits).toInt // rank < 2^40 => page < 2^14: Int-safe
      if (p >= pages.length) pages = java.util.Arrays.copyOf(pages, Integer.highestOneBit(p) * 2)
      if (pages(p) == null) pages(p) = new Array[Long](PageWords)
      val off = (rank & ((1L << PageBits) - 1)).toInt
      pages(p)(off >>> 6) |= 1L << (off & 63)
    }
    def get(rank: Long): Boolean = {
      val p = (rank >>> PageBits).toInt
      if (p >= pages.length || pages(p) == null) return false
      val off = (rank & ((1L << PageBits) - 1)).toInt
      (pages(p)(off >>> 6) & (1L << (off & 63))) != 0L
    }
  }

  /** Facet-count kernel for one shard: mark every doc on any query posting
    * (OR-match set, == the score>0 set since this engine's idf is strictly
    * positive) in a rank bitmap, then for each facet posting list count its
    * docs that hit the bitmap. Returns (facetTerm, count) with count > 0.
    * Cost: one pass over the query postings + one over the facet lists; no
    * per-doc state beyond the bitmap (8 MB per 64M docs touched). */
  def facetCounts(queryPostings: Seq[Posting],
                  facetPostings: Seq[Posting],
                  excludes: Seq[Posting] = Nil): Iterator[(String, Long)] = {
    if (queryPostings.isEmpty || facetPostings.isEmpty) return Iterator.empty
    // the matched bitmap is probed in FACET-list order (not ascending
    // docIds), so exclusion must land while MARKING: pre-decode the
    // exclusion lists into their own bitmap (one pass, O(1) probes in any
    // order) and never mark an excluded doc
    val exMap = if (excludes.isEmpty) null else {
      val b = new RankBitmap
      excludes.foreach { e =>
        val c = new Postings.Cursor(e)
        while (c.next()) b.set(graft.model.Ids.rankOf(c.docId))
      }
      b
    }
    val matched = new RankBitmap
    queryPostings.foreach { qp =>
      val c = new Postings.Cursor(qp)
      while (c.next()) {
        val r = graft.model.Ids.rankOf(c.docId)
        if (exMap == null || !exMap.get(r)) matched.set(r)
      }
    }
    facetPostings.iterator.flatMap { fp =>
      val c = new Postings.Cursor(fp)
      var cnt = 0L
      while (c.next()) if (matched.get(graft.model.Ids.rankOf(c.docId))) cnt += 1
      if (cnt > 0) Iterator.single((fp.term, cnt)) else Iterator.empty
    }
  }

  /** Exhaustive (no pruning) scorer over the same inputs — the correctness
    * twin of topK; WAND ≡ this on every corpus (tested). */
  def topKExhaustive(terms: Seq[TermInput], n: Long,
                     avgdl: Double, k: Int, p: Bm25.Params,
                     excludes: Seq[Posting] = Nil): Array[Scored] = {
    val topk = new TopK(k)
    if (n == 0 || avgdl == 0.0) return topk.drainDescending()
    // the accumulator is drained in hash order, so forward-only exclusion
    // cursors don't apply — decode the exclusion lists into a set (this
    // kernel is the correctness twin, not the scale path)
    val exSet = new java.util.HashSet[java.lang.Long]()
    excludes.foreach { e =>
      val c = new Postings.Cursor(e)
      while (c.next()) exSet.add(c.docId)
    }
    val acc = new java.util.HashMap[java.lang.Long, java.lang.Double]()
    terms.foreach { t =>
      if (t.globalDf > 0) {
        val iq = Bm25.idf(n, t.globalDf) * Bm25.qtfSat(t.qtf, p) * t.boost
        val (docs, tfs, lens) = Postings.decode(t.posting)
        var i = 0
        while (i < docs.length) {
          val add = iq * Bm25.tfSat(tfs(i), lens(i), avgdl, p)
          val prev = acc.get(docs(i))
          acc.put(docs(i), if (prev == null) add else prev + add)
          i += 1
        }
      }
    }
    acc.forEach((d, s) => if (s > 0.0 && !exSet.contains(d)) topk.offer(d, s))
    topk.drainDescending()
  }
}
