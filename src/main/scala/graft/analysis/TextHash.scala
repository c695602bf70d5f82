package graft.analysis

/** Deterministic integer text hashing shared by the dedup/fingerprint ops.
  *
  * polyHash31 is a polynomial rolling hash mod the Mersenne prime 2^31-1,
  * defined as a left fold seeded with the FIRST character's code — chosen
  * because it is reproducible in plain SQL (DuckDB list_reduce over
  * ascii()), which is what the correctness oracle uses. All arithmetic
  * stays below 2^63 (values < 2^31, ×31 + c < 2^36), so the Scala and SQL
  * computations are bit-identical.
  */
object TextHash extends Serializable {

  val P31: Long = 2147483647L // 2^31 - 1

  /** Fold of CODEPOINTS (matches DuckDB's per-character ascii(), which
    * returns the code point, surrogate-free): h0 = cp0; h = (h*31 + cp)
    * mod P31. Codepoints < 2^21, so all arithmetic stays below 2^63. */
  def polyHash31(s: String): Long = {
    if (s.isEmpty) return 0L
    var h = -1L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = if (h < 0) cp.toLong else (h * 31L + cp.toLong) % P31
      i += Character.charCount(cp)
    }
    h
  }

  /** MinHash permutation family h_i(x) = (a_i·x + b_i) mod P31. The family
    * holds 16 members; a configuration uses the FIRST k of them
    * ([[graft.ops.SimilarityConfig.minHashK]]), so raising k strictly adds
    * bands without changing the existing ones. */
  val MinHashA: Array[Long] = Array(3, 5, 7, 11, 13, 17, 19, 23,
    29, 31, 37, 41, 43, 47, 53, 59)
  val MinHashB: Array[Long] = Array(101, 211, 307, 401, 503, 601, 701, 809,
    907, 1009, 1103, 1201, 1301, 1409, 1511, 1601)
  val MinHashK: Int = 8 // default member count (4 bands × 2 rows)

  /** Continue the polyHash31 fold from `h0` over s's codepoints —
    * polyHash31(prefix + s) == polyHash31Cont(polyHash31(prefix), s) for
    * non-empty prefix (the seed rule only applies to the first char). */
  @inline private def polyHash31Cont(h0: Long, s: String): Long = {
    var h = h0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp.toLong) % P31
      i += Character.charCount(cp)
    }
    h
  }

  /** polyHash31 of the space-joined w-token window starting at `from` —
    * ≡ polyHash31(tokens.slice(from, from+w).mkString(" ")) (pinned by a
    * test) without building the shingle string: the hash folds straight
    * over the window's codepoints with the joining space (32) between
    * tokens. The MinHash signature kernel iterates every window of the
    * doc; the string build (slice + mkString + the distinct set) was its
    * dominant allocation cost, and a MIN over permuted hashes is
    * duplicate-invariant, so the kernel needs neither the strings nor
    * the dedup. */
  def windowPolyHash31(tokens: Array[String], from: Int, w: Int): Long = {
    var h = -1L
    var t = from
    val end = from + w
    while (t < end) {
      val s = tokens(t)
      if (t > from) h = (h * 31L + 32L) % P31 // the joining ' '
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = if (h < 0) cp.toLong else (h * 31L + cp.toLong) % P31
        i += Character.charCount(cp)
      }
      t += 1
    }
    if (h < 0) 0L else h
  }

  /** k-value MinHash signature over every w-window of `tokens` — the
    * fused form of `minHashSig(shingles(tokens).distinct.map(polyHash31))`
    * (identical signatures: the min over permuted hashes is unchanged by
    * duplicate shingles, and windowPolyHash31 is the exact shingle-string
    * hash). Empty when fewer than w tokens, like [[shingles]]. */
  def minHashSigWindows(tokens: Array[String], w: Int, k: Int): Array[Long] =
    if (tokens.length < w) Array.empty[Long]
    else minHashSig(
      Iterator.range(0, tokens.length - w + 1).map(windowPolyHash31(tokens, _, w)), k)

  /** k-value MinHash signature of a set of shingle hashes. */
  def minHashSig(shingleHashes: Iterator[Long], k: Int = MinHashK): Array[Long] = {
    require(k >= 2 && k <= MinHashA.length && k % 2 == 0,
      s"minHashK must be even and in [2, ${MinHashA.length}] (got $k)")
    val sig = Array.fill(k)(Long.MaxValue)
    shingleHashes.foreach { th =>
      var i = 0
      while (i < k) {
        val v = (MinHashA(i) * th + MinHashB(i)) % P31
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Seeded 64-bit hash of the token window tokens(from until from+n):
    * per-char splitmix chaining with a separator step between tokens (so
    * ["ab","c"] never aliases ["a","bc"]). Two calls with independent
    * seeds give a 128-bit dedup key. Built for the exact-substring dedup
    * explode, where hashing the window DIRECTLY (one tight loop, no
    * slice/concat allocation, no interpreted higher-order expression)
    * is the per-task hot path. */
  def windowHash(tokens: Array[String], from: Int, n: Int, seed: Long): Long = {
    var h = mix64(seed + 0x9E3779B97F4A7C15L)
    var i = from
    val end = from + n
    while (i < end) {
      val t = tokens(i)
      var j = 0
      while (j < t.length) { h = mix64(h ^ t.charAt(j).toLong); j += 1 }
      h = mix64(h ^ 0x1FL) // token separator
      i += 1
    }
    h
  }

  /** Word w-shingles of a token array ("a b c" style, space-joined). */
  def shingles(tokens: Array[String], w: Int = 3): Array[String] = {
    if (tokens.length < w) return Array.empty
    Array.tabulate(tokens.length - w + 1)(i => tokens.slice(i, i + w).mkString(" "))
  }

  /** SimHash width: 63 bits (sign bit stays clear, so the value is always
    * a non-negative BIGINT in both engines). Four bands of 16/16/16/15
    * bits — the pigeonhole exhaustiveness argument for hamming ≤ 3 needs
    * only the band COUNT (4 bands, ≤ 3 differing bits ⇒ ≥ 1 band agrees),
    * so widening each band's key space from ≤ 2^8 to ~2^16 keys loses no
    * recall while letting band buckets stay small on corpora whose
    * near-dup clusters overwhelmed the old 31-bit / 7-8-bit-band layout
    * (sf0.1 already did). */
  val SimHashBits: Int = 63
  val SimHashBands: Int = 4
  val SimHashBandBits: Int = 16 // shift stride; band 3 carries the top 15 bits

  /** 63-bit SimHash over a term-frequency map: bit j of a per-bit term
    * hash votes ±tf; bit set when the weighted sum is positive. Bits
    * 0-30 come from polyHash31(term), 31-61 from polyHash31('#'+term),
    * bit 62 from polyHash31('##'+term) — three independent members of the
    * same 31-bit integer hash family (a single polyHash31 yields only 31
    * bits), each reproducible in the SQL mirror. Pure integer arithmetic
    * — bit-identical to the SQL mirror. */
  def simHash63(tf: Map[String, Int]): Long = {
    val acc = new Array[Long](SimHashBits)
    tf.foreach { case (term, f) =>
      // h2/h3 continue the fold from the '#'/'##' prefix hashes instead
      // of concatenating prefix strings per term (same values:
      // polyHash31("#") = 35, polyHash31("##") = 35·31+35 = 1120)
      val h1 = polyHash31(term)
      val h2 = polyHash31Cont(35L, term)
      val h3 = polyHash31Cont(1120L, term)
      var j = 0
      while (j < SimHashBits) {
        val bit =
          if (j < 31) (h1 >> j) & 1L
          else if (j < 62) (h2 >> (j - 31)) & 1L
          else h3 & 1L
        acc(j) += (if (bit == 1L) f.toLong else -f.toLong)
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < SimHashBits) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
