package graft.analysis

/** Deterministic light (inflection-only) stemmers for French and German —
  * the per-language companions to [[EnglishStemmer]] behind the lemmatizer
  * seam (`Analyzer.Norm`). Re-expressed from the published light-stemming
  * procedures (Savoy, ACM SAC 2006, "Light stemming approaches for the
  * French, Portuguese, German and Hungarian languages"): strip only
  * plural / gender / case inflections, never derivational suffixes —
  * conservative by design (a light stemmer only merges forms that differ
  * by inflection, so it cannot cross word families).
  *
  * Reference counterpart: per-language lemma models
  * (BM25Reranker.cs:433, language pipelines 473-509) — divergence D1's
  * non-English half. Purity contract (required by the rank-identity
  * criterion): pure functions, no locale, no runtime tables; tokens with
  * characters outside lowercase Latin (incl. Latin-1 letters) pass through
  * untouched, mirroring EnglishStemmer's contract.
  */
object LightStemmers extends Serializable {

  /** Lowercase Latin letter incl. the Latin-1 accented block (ß…ÿ, minus
    * the ÷ sign). The analyzer lowercases before normalizing, so anything
    * else (digits, mixed scripts) passes through unstemmed. */
  private def allLatinLower(w: String): Boolean = {
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'ß' && c <= 'ÿ' && c != '÷')
      if (!ok) return false
      i += 1
    }
    true
  }

  /** French light stemmer (plural / feminine endings), longest-match
    * chain; only words of ≥ 6 letters are touched (shorter forms are too
    * ambiguous for suffix rules — Savoy's length guard):
    *  - `-aux → -al` (chevaux→cheval, journaux→journal)
    *  - otherwise drop a final `x` (perdrix-style plurals)
    *  - then drop a final `s`, then a final `r`, then `e`, then `é`,
    *    then a doubled final letter — each step re-examines the result,
    *    so `fenêtres` and `fenêtre` both land on `fenêtr`. */
  val french: Analyzer.Norm = (word: String) => {
    if (word.length < 6 || !allLatinLower(word)) word
    else {
      var w = word
      if (w.endsWith("aux")) w = w.dropRight(2) + "l"
      else {
        if (w.endsWith("x")) w = w.dropRight(1)
        if (w.endsWith("s")) w = w.dropRight(1)
        if (w.endsWith("r")) w = w.dropRight(1)
        if (w.endsWith("e")) w = w.dropRight(1)
        if (w.endsWith("é")) w = w.dropRight(1)
        if (w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2))
          w = w.dropRight(1)
      }
      w
    }
  }

  /** Spanish light stemmer (plural / gender endings), same design rules
    * as the French one — inflection only, step-local length guards so a
    * plural and its singular land on the same stem:
    *  - `-ces → -z` (luces→luz, veces→vez) — the orthographic c/z plural
    *  - else drop a final `s` at length ≥ 5 (libros→libro, mujeres→mujere)
    *  - then drop a final `o/a/e` at length ≥ 5 (libro→libr, mujere→mujer),
    *    which also merges the masculine/feminine pair the way Savoy's
    *    Spanish light rules do (libro/libra→libr). */
  val spanish: Analyzer.Norm = (word: String) => {
    if (word.length < 5 || !allLatinLower(word)) word
    else {
      var w = word
      if (w.endsWith("ces")) w = w.dropRight(3) + "z"
      else {
        if (w.length >= 5 && w.endsWith("s")) w = w.dropRight(1)
        if (w.length >= 5 && (w.endsWith("o") || w.endsWith("a") || w.endsWith("e")))
          w = w.dropRight(1)
      }
      w
    }
  }

  /** Italian light stemmer: plurals inflect by FINAL-VOWEL ALTERNATION
    * (amico/amici, gatto/gatti, casa/case), so the light rule is one
    * final-vowel strip with the `-he/-ie` orthographic plural handled
    * first (amiche→amic like amico/amici; banche→banc):
    *  - `-he`/`-ie` at length ≥ 6 → drop 2
    *  - else drop a final `a/e/i/o` at length ≥ 5. */
  val italian: Analyzer.Norm = (word: String) => {
    if (word.length < 5 || !allLatinLower(word)) word
    else {
      var w = word
      if (w.length >= 6 && (w.endsWith("he") || w.endsWith("ie"))) w = w.dropRight(2)
      else if ("aeio".indexOf(w.charAt(w.length - 1)) >= 0) w = w.dropRight(1)
      w
    }
  }

  /** German light stemmer (plural / case endings), with Savoy's length
    * guards so short stems are never over-stripped:
    *  - `-nen` at length > 6 (feminine plural), cascading into ONE more
    *    inflection strip so plural and singular land together
    *    (lehrerinnen → lehrerin → lehreri, same as lehrerin alone)
    *  - then exactly one of: `-em/-er/-es/-en` at length > 5
    *    (kinder→kind, frauen→frau) or final `e/s/n` at length > 4
    *    (jahre→jahr, autos→auto)
    * Umlauts are kept as-is: ä/ö/ü distinguish singular↔plural in pairs
    * the light approach deliberately leaves apart (haus/häuser). */
  val german: Analyzer.Norm = (word: String) => {
    if (word.length < 5 || !allLatinLower(word)) word
    else {
      var w = word
      if (w.length > 6 && w.endsWith("nen")) w = w.dropRight(3)
      if (w.length > 5 && (w.endsWith("em") || w.endsWith("er") ||
        w.endsWith("es") || w.endsWith("en"))) w = w.dropRight(2)
      else if (w.length > 4) {
        val c = w.charAt(w.length - 1)
        if (c == 'e' || c == 's' || c == 'n') w = w.dropRight(1)
      }
      w
    }
  }
}
