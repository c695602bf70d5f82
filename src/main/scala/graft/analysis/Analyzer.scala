package graft.analysis

import scala.collection.mutable

/** Deterministic text analyzer (SURVEY.md §2.1 O1/O18, divergence D1).
  *
  * The reference tokenizes with an NLP pipeline (language detection +
  * lemmatization + POS filtering, BM25Reranker.cs:423-441) whose model
  * artifacts are .NET-specific and non-deterministic across environments.
  * This engine replaces it with a deterministic, executor-side analyzer:
  *
  *   1. scan the text for maximal runs of letters/digits (Unicode-aware,
  *      CODEPOINT-based so astral-plane letters are handled), lowercasing
  *      as it goes — equivalent to
  *      `regexp_extract_all(lower(text), '[\p{L}\p{Nd}]+')`,
  *      which is what the DuckDB oracle SQL uses (verified: DuckDB's RE2
  *      supports \p{L}/\p{Nd} and its lower() agrees with Java's
  *      per-codepoint toLowerCase on everything but exotic 1:n mappings);
  *   2. normalize each token through a pluggable `norm` hook (identity by
  *      default) — the engine seam where a lemmatizer plugs in; like the
  *      reference, stopwords are checked on the NORMALIZED form
  *      (stopword-on-lemma, BM25Reranker.cs:435);
  *   3. drop stopwords (the reference's embedded spaCy lists, matched
  *      case-insensitively like its OrdinalIgnoreCase comparer);
  *   4. no default lemmatizer ships (divergence D1) — any deterministic
  *      String => String can be threaded through build + query (tested
  *      with a suffix-stripper, rank-identity held).
  *
  * Pure function of (text, stopword set): same text ⇒ same tokens on any
  * executor, any partitioning, any parallelism — required for the N-vs-4N
  * rank-identity criterion.
  */
object Analyzer extends Serializable {

  /** Token-normalization hook type: must be pure + deterministic (the
    * N-vs-4N rank-identity criterion rides on it). */
  type Norm = String => String
  val Identity: Norm = identity[String]

  /** Tokenize without stopword removal (codepoint iteration: surrogate
    * pairs are one character, like the oracle's regex engine sees them). */
  def tokenizeRaw(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = mutable.ArrayBuilder.make[String]
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) {
        sb.appendCodePoint(Character.toLowerCase(cp))
      } else if (sb.length > 0) {
        out += sb.toString
        sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out += sb.toString
    out.result()
  }

  /** Tokenize + normalize + stopword filter (stopword checked on the
    * normalized form, like the reference's stopword-on-lemma). */
  def tokenize(text: String, stop: Set[String], norm: Norm = Identity): Array[String] =
    tokenizeRaw(text).map(norm).filterNot(stop.contains)

  def tokenizeEn(text: String): Array[String] = tokenize(text, StopWords.english)

  /** Per-doc term frequencies, ≅ the reference's
    * `tokens.GroupBy(t=>t).ToDictionary(...)` (BM25Reranker.cs:359). */
  def termFreqs(terms: Array[String]): Map[String, Int] = {
    val m = mutable.HashMap.empty[String, Int]
    var i = 0
    while (i < terms.length) {
      m.update(terms(i), m.getOrElse(terms(i), 0) + 1)
      i += 1
    }
    m.toMap
  }

  /** Fused analyze for the index-build hot path: one scan producing
    * (token count, sorted distinct terms, aligned tfs) without
    * materializing the full token array. Semantically identical to
    * termFreqs(tokenize(text, stop)) — pinned by a test. */
  def analyze(text: String, stop: Set[String],
              norm: Norm = Identity): (Int, Array[String], Array[Int]) = {
    if (text == null || text.isEmpty) return (0, Array.empty, Array.empty)
    val tf = new java.util.HashMap[String, Int](32)
    val sb = new java.lang.StringBuilder(16)
    var len = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      val cp = if (i < n) text.codePointAt(i) else ' '.toInt
      if (i < n && Character.isLetterOrDigit(cp)) {
        sb.appendCodePoint(Character.toLowerCase(cp))
      } else if (sb.length > 0) {
        val tok = norm(sb.toString)
        sb.setLength(0)
        if (!stop.contains(tok)) {
          len += 1
          tf.merge(tok, 1, (a, b) => a + b)
        }
      }
      i += (if (i < n) Character.charCount(cp) else 1)
    }
    val terms = tf.keySet.toArray(new Array[String](tf.size))
    java.util.Arrays.sort(terms, java.util.Comparator.naturalOrder[String]())
    val tfs = new Array[Int](terms.length)
    var j = 0
    while (j < terms.length) { tfs(j) = tf.get(terms(j)); j += 1 }
    (len, terms, tfs)
  }
}
