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

  /** MinHash permutation family h_i(x) = (a_i·x + b_i) mod P31. */
  val MinHashA: Array[Long] = Array(3, 5, 7, 11, 13, 17, 19, 23)
  val MinHashB: Array[Long] = Array(101, 211, 307, 401, 503, 601, 701, 809)
  val MinHashK: Int = 8

  /** 8-value MinHash signature of a set of shingle hashes. */
  def minHashSig(shingleHashes: Iterator[Long]): Array[Long] = {
    val sig = Array.fill(MinHashK)(Long.MaxValue)
    shingleHashes.foreach { th =>
      var i = 0
      while (i < MinHashK) {
        val v = (MinHashA(i) * th + MinHashB(i)) % P31
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Word w-shingles of a token array ("a b c" style, space-joined). */
  def shingles(tokens: Array[String], w: Int = 3): Array[String] = {
    if (tokens.length < w) return Array.empty
    Array.tabulate(tokens.length - w + 1)(i => tokens.slice(i, i + w).mkString(" "))
  }

  /** 31-bit SimHash over a term-frequency map: bit j of hash(term) votes
    * ±tf; bit set when the weighted sum is positive. Pure integer
    * arithmetic — bit-identical to the SQL mirror. */
  def simHash31(tf: Map[String, Int]): Long = {
    val acc = new Array[Long](31)
    tf.foreach { case (term, f) =>
      val h = polyHash31(term)
      var j = 0
      while (j < 31) {
        acc(j) += (if (((h >> j) & 1L) == 1L) f.toLong else -f.toLong)
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 31) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
