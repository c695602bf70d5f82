package graft.codec

import graft.model.Posting

/** Posting-list encode/decode with per-block skip metadata for block-max
  * WAND (SURVEY.md §4 items 2-3). The reference materializes no postings at
  * all (its whole "index" is a driver dictionary, BM25Reranker.cs:16-21);
  * this is the from-scratch part of the engine.
  *
  * Doc lengths are stored INLINE (a third VByte stream aligned with the
  * docIds, Lucene-norms-style): BM25's length normalization then needs no
  * side table, which is what makes the query path shuffle-free and keeps
  * per-task state at O(query terms · one block) regardless of shard size.
  */
object Postings {

  /** Docs per skip block. 128 is the classic Lucene-style granularity. */
  val BlockSize = 128

  /** Build one posting list from parallel arrays sorted ascending by docId.
    * `lens(i)` = total token count of doc `docIds(i)`. */
  def encode(shard: Int, term: String, docIds: Array[Long], tfs: Array[Int],
             lens: Array[Int]): Posting = {
    require(docIds.length == tfs.length && docIds.length == lens.length,
      "docIds/tfs/lens length mismatch")
    // guard the delta encoding: a non-ascending docId would silently
    // corrupt the list (negative gaps wrap through the varint)
    var g = 1
    while (g < docIds.length) {
      require(docIds(g) > docIds(g - 1),
        s"docIds not strictly ascending for '$term' at $g: ${docIds(g - 1)} -> ${docIds(g)}")
      g += 1
    }
    val n = docIds.length
    val nBlocks = (n + BlockSize - 1) / BlockSize
    val blockLast = new Array[Long](nBlocks)
    val blockMaxTf = new Array[Int](nBlocks)
    val blockDocOff = new Array[Int](nBlocks)
    val blockTfOff = new Array[Int](nBlocks)
    val blockLenOff = new Array[Int](nBlocks)
    val docsOut = new ByteBuf(n * 2)
    val tfsOut = new ByteBuf(n)
    val lensOut = new ByteBuf(n)
    var maxTf = 0
    var b = 0
    while (b < nBlocks) {
      val start = b * BlockSize
      val end = math.min(start + BlockSize, n)
      blockDocOff(b) = docsOut.length
      blockTfOff(b) = tfsOut.length
      blockLenOff(b) = lensOut.length
      // Deltas restart at each block (first value of a block is absolute)
      // so a block can be decoded after a skip without touching its
      // predecessors.
      var prev = 0L
      var bm = 0
      var i = start
      while (i < end) {
        VByte.writeVLong(docsOut, docIds(i) - prev)
        prev = docIds(i)
        VByte.writeVLong(tfsOut, tfs(i).toLong)
        VByte.writeVLong(lensOut, lens(i).toLong)
        if (tfs(i) > bm) bm = tfs(i)
        i += 1
      }
      blockLast(b) = docIds(end - 1)
      blockMaxTf(b) = bm
      if (bm > maxTf) maxTf = bm
      b += 1
    }
    Posting(shard, term, n, maxTf, docsOut.toArray, tfsOut.toArray, lensOut.toArray,
      blockLast, blockMaxTf, blockDocOff, blockTfOff, blockLenOff)
  }

  /** Merge posting lists of the SAME (shard, term) coming from different
    * index segments (base + refresh deltas). Segment docId ranges are
    * disjoint by construction — a document lives in exactly one segment and
    * delta ranks start above the covered high-water mark — so the merge is
    * sort-segments-by-first-docId + concatenate, then one re-encode that
    * rebuilds the block-max skip metadata over the combined list. */
  def merge(parts: Seq[Posting]): Posting = {
    if (parts.lengthCompare(1) == 0) return parts.head
    val decoded = parts.filter(_.count > 0).map(p => (p, decode(p)))
      .sortBy(_._2._1.head)
    if (decoded.isEmpty) return parts.head
    val total = decoded.iterator.map(_._1.count).sum
    val docs = new Array[Long](total)
    val tfs = new Array[Int](total)
    val lens = new Array[Int](total)
    var o = 0
    decoded.foreach { case (_, (d, t, l)) =>
      System.arraycopy(d, 0, docs, o, d.length)
      System.arraycopy(t, 0, tfs, o, t.length)
      System.arraycopy(l, 0, lens, o, l.length)
      o += d.length
    }
    val head = decoded.head._1
    encode(head.shard, head.term, docs, tfs, lens)
  }

  /** Union-merge of OVERLAPPING posting lists with per-doc tf SUMMED —
    * Lucene SynonymQuery's posting view: a synonym group behaves as one
    * pseudo-term whose term frequency is the sum of its members' (doc
    * length is a per-doc property, identical across members). Unlike
    * [[merge]] (disjoint segment ranges, pure concatenation), members
    * here share documents. Query-time only, over the ≤ |group| member
    * lists one shard holds — never index-resident. */
  def unionSum(parts: Seq[Posting], term: String): Posting = {
    require(parts.nonEmpty, "empty synonym group")
    if (parts.lengthCompare(1) == 0) return parts.head
    val m = new java.util.TreeMap[java.lang.Long, Array[Int]]() // docId -> (tf, len)
    parts.foreach { p =>
      val (docs, tfs, lens) = decode(p)
      var i = 0
      while (i < docs.length) {
        val prev = m.get(docs(i))
        if (prev == null) m.put(docs(i), Array(tfs(i), lens(i)))
        else prev(0) += tfs(i)
        i += 1
      }
    }
    val nD = m.size()
    val docs = new Array[Long](nD)
    val tfs = new Array[Int](nD)
    val lens = new Array[Int](nD)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      docs(i) = e.getKey
      tfs(i) = e.getValue()(0)
      lens(i) = e.getValue()(1)
      i += 1
    }
    encode(parts.head.shard, term, docs, tfs, lens)
  }

  /** Full decode (test / exhaustive paths): (docIds, tfs, lens). */
  def decode(p: Posting): (Array[Long], Array[Int], Array[Int]) = {
    val docs = new Array[Long](p.count)
    val tfs = new Array[Int](p.count)
    val lens = new Array[Int](p.count)
    val nBlocks = p.blockLast.length
    var b = 0
    var o = 0
    while (b < nBlocks) {
      val start = b * BlockSize
      val end = math.min(start + BlockSize, p.count)
      val dr = new VByte.Reader(p.docsBlob, p.blockDocOff(b))
      val tr = new VByte.Reader(p.tfsBlob, p.blockTfOff(b))
      val lr = new VByte.Reader(p.lensBlob, p.blockLenOff(b))
      var prev = 0L
      var i = start
      while (i < end) {
        prev += dr.readVLong()
        docs(o) = prev
        tfs(o) = tr.readVInt()
        lens(o) = lr.readVInt()
        o += 1
        i += 1
      }
      b += 1
    }
    (docs, tfs, lens)
  }

  /** Streaming cursor over one posting list, with block-level skipping.
    * Core primitive of the WAND kernel: `advanceTo(target)` moves to the
    * first docId >= target, decoding only the blocks it lands in.
    */
  final class Cursor(p: Posting) {
    private val nBlocks = p.blockLast.length
    private var block = -1
    private var idxInBlock = 0
    private var blockEnd = 0 // #docs in current block
    private val bufDocs = new Array[Long](BlockSize)
    private val bufTfs = new Array[Int](BlockSize)
    private val bufLens = new Array[Int](BlockSize)
    var docId: Long = -1L
    var tf: Int = 0
    /** Length of the current doc (inline norm). */
    var dl: Int = 0
    var exhausted: Boolean = p.count == 0

    def count: Int = p.count

    /** Max tf over the remaining (current) block — used for block-max
      * upper bounds. */
    def currentBlockMaxTf: Int = if (block >= 0 && block < nBlocks) p.blockMaxTf(block) else p.maxTf
    def globalMaxTf: Int = p.maxTf

    private def loadBlock(b: Int): Unit = {
      block = b
      val start = b * BlockSize
      blockEnd = math.min(start + BlockSize, p.count) - start
      val dr = new VByte.Reader(p.docsBlob, p.blockDocOff(b))
      val tr = new VByte.Reader(p.tfsBlob, p.blockTfOff(b))
      val lr = new VByte.Reader(p.lensBlob, p.blockLenOff(b))
      var prev = 0L
      var i = 0
      while (i < blockEnd) {
        prev += dr.readVLong()
        bufDocs(i) = prev
        bufTfs(i) = tr.readVInt()
        bufLens(i) = lr.readVInt()
        i += 1
      }
      idxInBlock = 0
    }

    @inline private def setCurrent(): Unit = {
      docId = bufDocs(idxInBlock)
      tf = bufTfs(idxInBlock)
      dl = bufLens(idxInBlock)
    }

    /** Advance to the next posting; returns false when exhausted. */
    def next(): Boolean = {
      if (exhausted) return false
      if (block < 0) { loadBlock(0) }
      else {
        idxInBlock += 1
        if (idxInBlock >= blockEnd) {
          if (block + 1 >= nBlocks) { exhausted = true; docId = Long.MaxValue; return false }
          loadBlock(block + 1)
        }
      }
      setCurrent()
      true
    }

    /** Move to first posting with docId >= target. Returns false when the
      * list is exhausted before target. */
    def advanceTo(target: Long): Boolean = {
      if (exhausted) return false
      if (block >= 0 && docId >= target) return true
      // find the first block whose last docId >= target (binary search)
      var lo = math.max(block, 0)
      if (p.blockLast(nBlocks - 1) < target) { exhausted = true; docId = Long.MaxValue; return false }
      var hi = nBlocks - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (p.blockLast(mid) < target) lo = mid + 1 else hi = mid
      }
      if (lo != block) { loadBlock(lo) }
      else if (block < 0) { loadBlock(0) }
      // linear scan within the (≤128-entry) block
      while (idxInBlock < blockEnd && bufDocs(idxInBlock) < target) idxInBlock += 1
      if (idxInBlock >= blockEnd) {
        // can only happen when target fell between this block's last and
        // the next block's first
        if (block + 1 >= nBlocks) { exhausted = true; docId = Long.MaxValue; return false }
        loadBlock(block + 1)
      }
      setCurrent()
      true
    }
  }
}
