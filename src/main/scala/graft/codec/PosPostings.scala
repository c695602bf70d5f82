package graft.codec

import graft.model.PosPosting

/** Positional posting-list encode/decode (the positional sidecar's codec —
  * the reference has no positional index at all; its phrase story is
  * substring matching on raw text, BM25Reranker.cs has no phrase path).
  * Positions index the RAW token stream (stopwords included), so a phrase
  * match over this codec is exactly the raw-token containsSlice relation
  * the text-verify path computes.
  *
  * Layout mirrors [[Postings]] (delta + VByte) without skip blocks: phrase
  * terms are few and selective, and the kernel decodes whole per-shard
  * lists — a linear decode is the right cost model there. Per-doc position
  * deltas RESTART at each doc and the docs blob's first vlong is the
  * ABSOLUTE first docId, which is what lets the build-time chunk merge
  * ([[concatEncoded]]) rewrite one vlong per piece and copy every other
  * byte verbatim.
  */
object PosPostings {

  /** Encode one list from parallel arrays sorted ascending by docId;
    * `positions(i)` = ascending raw-token positions of the term in doc
    * `docIds(i)` (must be non-empty — a doc without the term has no row). */
  def encode(shard: Int, term: String, docIds: Array[Long],
             positions: Array[Array[Int]]): PosPosting = {
    require(docIds.length == positions.length, "docIds/positions length mismatch")
    val docsOut = new ByteBuf(docIds.length * 2)
    val cntsOut = new ByteBuf(docIds.length)
    val posOut = new ByteBuf(docIds.length * 2)
    var prev = 0L
    var i = 0
    while (i < docIds.length) {
      require(i == 0 || docIds(i) > docIds(i - 1),
        s"docIds not strictly ascending for '$term' at $i")
      VByte.writeVLong(docsOut, docIds(i) - prev)
      prev = docIds(i)
      val pa = positions(i)
      require(pa.length > 0, s"empty position run for '$term' doc ${docIds(i)}")
      VByte.writeVLong(cntsOut, pa.length.toLong)
      var p = 0
      var pp = 0L
      while (p < pa.length) {
        require(p == 0 || pa(p) > pa(p - 1),
          s"positions not strictly ascending for '$term' doc ${docIds(i)}")
        VByte.writeVLong(posOut, pa(p) - pp)
        pp = pa(p).toLong
        p += 1
      }
      i += 1
    }
    PosPostings.fromBuffers(shard, term, docIds.length, docsOut, cntsOut, posOut)
  }

  private def fromBuffers(shard: Int, term: String, n: Int,
                          docs: ByteBuf, cnts: ByteBuf,
                          pos: ByteBuf): PosPosting =
    PosPosting(shard, term, n, docs.toArray, cnts.toArray, pos.toArray)

  /** One map-side chunk of a (shard, term) list: already encoded exactly
    * like a full list (first docs vlong = absolute firstDoc), plus the
    * header the reduce-side merge needs. */
  final case class Piece(firstDoc: Long, lastDoc: Long, n: Int,
                         docs: Array[Byte], cnts: Array[Byte], pos: Array[Byte])

  /** Assemble one list from already-ENCODED pieces whose docId ranges are
    * disjoint and ascending across pieces. Each piece's docs blob starts
    * with its absolute firstDoc (delta from 0), so the merge rewrites
    * exactly ONE vlong per piece — the cross-piece delta — and copies every
    * other byte verbatim: the reduce side never decodes counts or
    * positions. This is the streaming reduce of the positional build. */
  def concatEncoded(shard: Int, term: String, pieces: Seq[Piece]): PosPosting = {
    var n = 0
    var cntLen = 0
    var posLen = 0
    var docsLen = 0
    pieces.foreach { p =>
      n += p.n; cntLen += p.cnts.length; posLen += p.pos.length
      docsLen += p.docs.length
    }
    val docsOut = new ByteBuf(docsLen)
    val cntsOut = new Array[Byte](cntLen)
    val posOut = new Array[Byte](posLen)
    var prevLast = 0L
    var first = true
    var co = 0
    var po = 0
    pieces.foreach { p =>
      require(p.n > 0, s"empty piece for '$term'")
      require(first || p.firstDoc > prevLast,
        s"piece docIds regress for '$term' at ${p.firstDoc} after $prevLast")
      val r = new VByte.Reader(p.docs)
      val abs = r.readVLong()
      require(abs == p.firstDoc, s"piece firstDoc header mismatch for '$term'")
      VByte.writeVLong(docsOut, p.firstDoc - prevLast)
      var i = r.pos
      while (i < p.docs.length) { docsOut += p.docs(i); i += 1 }
      System.arraycopy(p.cnts, 0, cntsOut, co, p.cnts.length); co += p.cnts.length
      System.arraycopy(p.pos, 0, posOut, po, p.pos.length); po += p.pos.length
      prevLast = p.lastDoc
      first = false
    }
    PosPosting(shard, term, n, docsOut.toArray, cntsOut, posOut)
  }

  /** Decode to (docIds, per-doc ascending positions). */
  def decode(p: PosPosting): (Array[Long], Array[Array[Int]]) = {
    val docs = VByte.decodeDeltas(p.docsBlob, p.count)
    val cnts = VByte.decodeInts(p.cntsBlob, p.count)
    val out = new Array[Array[Int]](p.count)
    val r = new VByte.Reader(p.posBlob)
    var i = 0
    while (i < p.count) {
      val k = cnts(i)
      val pa = new Array[Int](k)
      var prev = 0L
      var j = 0
      while (j < k) {
        prev += r.readVLong()
        pa(j) = prev.toInt
        j += 1
      }
      out(i) = pa
      i += 1
    }
    (docs, out)
  }
}
