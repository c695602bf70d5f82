package graft.analysis

/** Deterministic Porter-style English suffix-stripping stemmer — the
  * default normalizer a user can opt into through the engine's lemmatizer
  * seam (`IndexBuilder.Config.normalizer = Analyzer.EnglishStem`, with the
  * SAME value passed to the Searcher).
  *
  * The reference analyzer lemmatizes through an NLP model pipeline
  * (BM25Reranker.cs:423-441: CLD2 language ID at 426-428, lemma at 433,
  * stopword-on-lemma at 435) whose artifacts are non-deterministic across
  * environments — divergence D1. This stemmer closes the practical gap
  * ("running" vs "run" ranking differently) with a PURE function: Porter's
  * steps 1a/1b/1c plus a pruned single-pass step-2..4 suffix table and the
  * final e/ll cleanup, all measure-guarded like the original algorithm
  * (Porter 1980, public domain). It is deliberately NOT full Porter — the
  * goal is a deterministic, rank-stable normalizer, not linguistic
  * perfection — and it is opt-in because changing the normalizer changes
  * every docId-independent ranking contract an existing index pins.
  *
  * Purity/determinism contract (required by the N-vs-4N rank-identity
  * criterion): no locale, no tables loaded at runtime, ASCII-lowercase
  * input assumed (the analyzer lowercases first); non-ASCII-letter tokens
  * pass through untouched.
  */
object EnglishStemmer extends Serializable {

  private def isVowelAt(w: CharSequence, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** Porter's measure m: the number of vowel→consonant transitions in
    * [C](VC)^m[V]. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowelAt(w, i)) i += 1
    while (i < n) {
      while (i < n && isVowelAt(w, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && !isVowelAt(w, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(w: String): Boolean = {
    var i = 0
    while (i < w.length) { if (isVowelAt(w, i)) return true; i += 1 }
    false
  }

  private def endsDoubleConsonant(w: String): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) && !isVowelAt(w, n - 1)
  }

  /** *o rule: ends consonant-vowel-consonant where the final consonant is
    * not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowelAt(w, n - 3) && isVowelAt(w, n - 2) && !isVowelAt(w, n - 1) && {
      val c = w.charAt(n - 1)
      c != 'w' && c != 'x' && c != 'y'
    }
  }

  /** Pruned steps 2-4 as ONE longest-match-first pass (full Porter runs
    * three passes; collapsing them trades a little conflation quality for
    * simplicity while staying deterministic). Each entry carries Porter's
    * own measure guard for that suffix: step-2/3 rules (rewrites and the
    * ness/ful deletions) need m > 0, step-4 deletions need m > 1, and
    * "ion" additionally requires the stem to end in s or t (Porter's *S /
    * *T condition — "connection"→"connect" but "opinion" unchanged). */
  private val SuffixTable: Array[(String, String, Int)] = Array(
    ("ational", "ate", 0), ("ization", "ize", 0), ("fulness", "ful", 0),
    ("ousness", "ous", 0), ("iveness", "ive", 0), ("tional", "tion", 0),
    ("biliti", "ble", 0), ("entli", "ent", 0), ("ousli", "ous", 0),
    ("alism", "al", 0), ("ation", "ate", 0), ("iviti", "ive", 0),
    ("aliti", "al", 0), ("ement", "", 1), ("izer", "ize", 0), ("ator", "ate", 0),
    ("alli", "al", 0), ("ness", "", 0), ("ment", "", 1), ("able", "", 1),
    ("ible", "", 1), ("ance", "", 1), ("ence", "", 1), ("ious", "", 1),
    ("ful", "", 0), ("ism", "", 1), ("ate", "", 1), ("iti", "", 1),
    ("ous", "", 1), ("ive", "", 1), ("ize", "", 1), ("ant", "", 1),
    ("ent", "", 1), ("ion", "", 1), ("al", "", 1), ("er", "", 1), ("ic", "", 1))

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var i = 0
    while (i < word.length) { // non-ASCII-lowercase tokens pass through
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word
      i += 1
    }
    var w = word

    // step 1a: plurals
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s") && w.length > 3) w = w.dropRight(1)

    // step 1b: -eed / -ed / -ing
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else {
      val stripped =
        if (w.endsWith("ed") && hasVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped.foreach { s =>
        w =
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleConsonant(s) && {
            val c = s.charAt(s.length - 1); c != 'l' && c != 's' && c != 'z'
          }) s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }

    // step 1c: terminal y → i when a vowel precedes
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // pruned steps 2-4: first (longest-first-ordered) matching suffix wins
    var applied = false
    var t = 0
    while (!applied && t < SuffixTable.length) {
      val (suf, rep, needed) = SuffixTable(t)
      if (w.endsWith(suf)) {
        val stemPart = w.dropRight(suf.length)
        val condOk = suf != "ion" || (stemPart.nonEmpty && {
          val c = stemPart.charAt(stemPart.length - 1); c == 's' || c == 't'
        })
        if (condOk && measure(stemPart) > needed) { w = stemPart + rep; applied = true }
      }
      t += 1
    }

    // step 5: final -e and -ll cleanup
    if (w.endsWith("e")) {
      val s = w.dropRight(1)
      val m = measure(s)
      if (m > 1 || (m == 1 && !endsCvc(s))) w = s
    }
    if (measure(w) > 1 && w.endsWith("ll")) w = w.dropRight(1)
    w
  }
}
