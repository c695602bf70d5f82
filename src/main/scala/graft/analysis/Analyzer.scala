package graft.analysis

import scala.collection.mutable

/** Deterministic text analyzer (SURVEY.md §2.1 O1/O18, divergence D1).
  *
  * The reference tokenizes with an NLP pipeline (language detection +
  * lemmatization + POS filtering, BM25Reranker.cs:423-441) whose model
  * artifacts are .NET-specific and non-deterministic across environments.
  * This engine replaces it with a deterministic, executor-side analyzer:
  *
  *   1. scan the text for maximal runs of letters/digits (Unicode-aware),
  *      lowercasing as it goes — equivalent to
  *      `regexp_extract_all(lower(text), '[a-z0-9]+')` for ASCII input,
  *      which is what the DuckDB oracle SQL uses;
  *   2. drop stopwords (the reference's embedded spaCy lists, matched
  *      case-insensitively like its OrdinalIgnoreCase comparer);
  *   3. no lemmatization (configurable hook left out by design, D1).
  *
  * Pure function of (text, stopword set): same text ⇒ same tokens on any
  * executor, any partitioning, any parallelism — required for the N-vs-4N
  * rank-identity criterion.
  */
object Analyzer extends Serializable {

  /** Tokenize without stopword removal. */
  def tokenizeRaw(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = mutable.ArrayBuilder.make[String]
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetterOrDigit(c)) {
        sb.append(Character.toLowerCase(c))
      } else if (sb.length > 0) {
        out += sb.toString
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.result()
  }

  /** Tokenize + stopword filter. */
  def tokenize(text: String, stop: Set[String]): Array[String] =
    tokenizeRaw(text).filterNot(stop.contains)

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
}
