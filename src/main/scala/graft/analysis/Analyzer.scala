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

  /** Shipped default English normalizer for the lemmatizer seam: the
    * deterministic Porter-style stemmer ([[EnglishStemmer]]). Opt-in via
    * `IndexBuilder.Config.normalizer = Analyzer.EnglishStem` (and the same
    * value on the Searcher) — see EnglishStemmer's scaladoc for why it is
    * not on by default. */
  val EnglishStem: Norm = EnglishStemmer.stem

  /** Per-language light stemmers (inflection-only — see [[LightStemmers]]);
    * the non-English half of the lemmatizer seam. */
  val FrenchLightStem: Norm = LightStemmers.french
  val GermanLightStem: Norm = LightStemmers.german
  val SpanishLightStem: Norm = LightStemmers.spanish
  val ItalianLightStem: Norm = LightStemmers.italian

  /** The shipped normalizer for a language code: en → Porter-style
    * stemmer, fr/de/es/it (the full langId vote set) → light stemmers,
    * anything else → Identity (mirrors the reference's English fallback
    * for unregistered languages, BM25Reranker.cs:514-562). */
  def stemFor(lang: String): Norm = lang match {
    case "en" => EnglishStem
    case "fr" => FrenchLightStem
    case "de" => GermanLightStem
    case "es" => SpanishLightStem
    case "it" => ItalianLightStem
    case _ => Identity
  }

  /** ASCII fast-path tables: letter/digit membership and lowercase per
    * 7-bit char, precomputed FROM the same Character methods the general
    * path calls — identical classification and mapping, one array load
    * instead of two intrinsic calls per character. ASCII dominates real
    * corpora, and the per-character cost of the analyzer scan is a
    * measured hot frame of the index build (thread-dump profile). */
  private[analysis] val AsciiIsTok: Array[Boolean] =
    Array.tabulate(128)(c => Character.isLetterOrDigit(c))
  private[analysis] val AsciiLower: Array[Char] =
    Array.tabulate(128)(c => Character.toLowerCase(c.toChar))

  /** Tokenize without stopword removal (codepoint iteration: surrogate
    * pairs are one character, like the oracle's regex engine sees them;
    * sub-128 chars take the table fast path — same classification). */
  def tokenizeRaw(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = mutable.ArrayBuilder.make[String]
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c < 128) {
        if (AsciiIsTok(c)) sb.append(AsciiLower(c))
        else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
        i += 1
      } else {
        val cp = text.codePointAt(i)
        if (Character.isLetterOrDigit(cp)) {
          sb.appendCodePoint(Character.toLowerCase(cp))
        } else if (sb.length > 0) {
          out += sb.toString
          sb.setLength(0)
        }
        i += Character.charCount(cp)
      }
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
      // sub-128 chars take the table fast path (same classification)
      val c = if (i < n) text.charAt(i) else ' '
      if (c < 128) {
        if (AsciiIsTok(c)) sb.append(AsciiLower(c))
        else if (sb.length > 0) {
          val tok = norm(sb.toString)
          sb.setLength(0)
          if (!stop.contains(tok)) {
            len += 1
            tf.merge(tok, 1, (a, b) => a + b)
          }
        }
        i += 1
      } else {
        val cp = text.codePointAt(i)
        if (Character.isLetterOrDigit(cp)) {
          sb.appendCodePoint(Character.toLowerCase(cp))
        } else if (sb.length > 0) {
          val tok = norm(sb.toString)
          sb.setLength(0)
          if (!stop.contains(tok)) {
            len += 1
            tf.merge(tok, 1, (a, b) => a + b)
          }
        }
        i += Character.charCount(cp)
      }
    }
    val terms = tf.keySet.toArray(new Array[String](tf.size))
    java.util.Arrays.sort(terms, java.util.Comparator.naturalOrder[String]())
    val tfs = new Array[Int](terms.length)
    var j = 0
    while (j < terms.length) { tfs(j) = tf.get(terms(j)); j += 1 }
    (len, terms, tfs)
  }
}

/** Steady-state-allocation-free analyzer for the index-build hot path:
  * same output as [[Analyzer.analyze]] (pinned by a property test), with
  * the partition's vocabulary INTERNED in an open-addressing table so a
  * token occurrence costs a hash + probe + counter bump — no String, no
  * boxing, no per-doc map. At 10^12 turns the analyzer touches ~10^14
  * token occurrences; allocation bandwidth (young-gen writes + GC copy)
  * is the contended resource at high core counts, and interning drops it
  * from O(occurrences) to O(vocabulary).
  *
  * Each raw token's normalized form and stopword verdict are computed ONCE
  * at intern time (norm is pure, so caching per raw token is sound).
  * Distinct raw tokens may normalize to the SAME term (a lemmatizer seam
  * property); the per-doc output merges them after the sort.
  *
  * NOT thread-safe — create one per partition/task. */
final class PartitionAnalyzer(stop: Set[String], norm: Analyzer.Norm = Analyzer.Identity) {
  private var cap = 1 << 12
  private var mask = cap - 1
  private var keys = new Array[String](cap) // interned RAW token
  private var terms = new Array[String](cap) // normalized term; null = stopword
  private var hashes = new Array[Int](cap)
  private var vocab = 0

  // per-doc state: counts valid only where stamps == epoch
  private var counts = new Array[Int](cap)
  private var stamps = new Array[Int](cap)
  private var epoch = 0
  private var touched = new Array[Int](64)
  private var nTouched = 0

  private val buf = new java.lang.StringBuilder(32)

  /** String.hashCode over buf's UTF-16 units (== the hash of buf.toString). */
  private def bufHash(): Int = {
    var h = 0
    var i = 0
    val n = buf.length
    while (i < n) { h = h * 31 + buf.charAt(i); i += 1 }
    h
  }

  private def bufEquals(k: String): Boolean = {
    val n = buf.length
    if (k.length != n) return false
    var i = 0
    while (i < n) {
      if (k.charAt(i) != buf.charAt(i)) return false
      i += 1
    }
    true
  }

  private def grow(): Unit = {
    val oldKeys = keys; val oldTerms = terms; val oldHashes = hashes
    val oldCounts = counts; val oldStamps = stamps
    cap <<= 1; mask = cap - 1
    keys = new Array[String](cap); terms = new Array[String](cap)
    hashes = new Array[Int](cap); counts = new Array[Int](cap)
    stamps = new Array[Int](cap)
    var i = 0
    while (i < oldKeys.length) {
      val k = oldKeys(i)
      if (k != null) {
        var j = oldHashes(i) & mask
        while (keys(j) != null) j = (j + 1) & mask
        keys(j) = k; terms(j) = oldTerms(i); hashes(j) = oldHashes(i)
        counts(j) = oldCounts(i); stamps(j) = oldStamps(i)
      }
      i += 1
    }
    // touched holds slot indices — remap by rescanning the new table for
    // this doc's epoch (rehash is rare: O(cap) once per vocabulary double)
    nTouched = 0
    var j = 0
    while (j < cap) {
      if (keys(j) != null && stamps(j) == epoch && terms(j) != null) recordTouched(j)
      j += 1
    }
  }

  private def recordTouched(slot: Int): Unit = {
    if (nTouched == touched.length) touched = java.util.Arrays.copyOf(touched, nTouched * 2)
    touched(nTouched) = slot
    nTouched += 1
  }

  /** Intern buf's content; returns its slot. */
  private def slotOfBuf(): Int = {
    val h = bufHash()
    var i = h & mask
    while (true) {
      val k = keys(i)
      if (k == null) {
        val raw = buf.toString
        val t = norm(raw)
        keys(i) = raw
        terms(i) = if (stop.contains(t)) null else t
        hashes(i) = h
        vocab += 1
        if (vocab * 2 > cap) { grow(); return slotOfBuf() }
        return i
      }
      if (hashes(i) == h && bufEquals(k)) return i
      i = (i + 1) & mask
    }
    -1 // unreachable
  }

  /** Intern + count buf's token if non-empty; returns 1 when a
    * non-stopword token was recorded (its contribution to doc length). */
  private def flushTok(): Int = {
    if (buf.length == 0) return 0
    val slot = slotOfBuf()
    buf.setLength(0)
    if (terms(slot) != null) { // not a stopword
      if (stamps(slot) != epoch) {
        stamps(slot) = epoch
        counts(slot) = 1
        recordTouched(slot)
      } else counts(slot) += 1
      1
    } else 0
  }

  /** ≡ Analyzer.analyze(text, stop, norm). */
  def analyze(text: String): (Int, Array[String], Array[Int]) = {
    if (text == null || text.isEmpty) return (0, Array.empty, Array.empty)
    if (epoch == Int.MaxValue) { java.util.Arrays.fill(stamps, 0); epoch = 0 }
    epoch += 1
    nTouched = 0
    var len = 0
    buf.setLength(0)
    var i = 0
    val n = text.length
    while (i <= n) {
      // sub-128 chars take the table fast path (same classification as
      // the codepoint branch — see Analyzer.AsciiIsTok)
      val c = if (i < n) text.charAt(i) else ' '
      if (c < 128) {
        if (Analyzer.AsciiIsTok(c)) buf.append(Analyzer.AsciiLower(c))
        else len += flushTok()
        i += 1
      } else {
        val cp = text.codePointAt(i)
        if (Character.isLetterOrDigit(cp)) {
          buf.appendCodePoint(Character.toLowerCase(cp))
        } else len += flushTok()
        i += Character.charCount(cp)
      }
    }
    if (nTouched == 0) return (len, Array.empty, Array.empty)

    // gather + sort by term; norm collisions (distinct raws, same term)
    // sort adjacent and merge below
    val ts = new Array[String](nTouched)
    val cs = new Array[Int](nTouched)
    var j = 0
    while (j < nTouched) { ts(j) = terms(touched(j)); cs(j) = counts(touched(j)); j += 1 }
    var a = 1 // insertion sort on the parallel arrays (distinct terms per doc is small)
    while (a < nTouched) {
      val t = ts(a); val c = cs(a)
      var b = a - 1
      while (b >= 0 && ts(b).compareTo(t) > 0) { ts(b + 1) = ts(b); cs(b + 1) = cs(b); b -= 1 }
      ts(b + 1) = t; cs(b + 1) = c
      a += 1
    }
    var dedup = 0
    j = 1
    while (j < nTouched) {
      if (ts(j) == ts(dedup)) cs(dedup) += cs(j)
      else { dedup += 1; ts(dedup) = ts(j); cs(dedup) = cs(j) }
      j += 1
    }
    dedup += 1
    if (dedup == nTouched) (len, ts, cs)
    else (len, java.util.Arrays.copyOf(ts, dedup), java.util.Arrays.copyOf(cs, dedup))
  }
}
