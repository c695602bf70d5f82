package graft.oracle

import graft.analysis.StopWords
import graft.query.Bm25

/** Generates the ANSI/DuckDB oracle SQL for SparkEntry.oracleSql.
  *
  * Contract with the Spark side (critical for the driver's hash compare):
  *  - identical column NAMES and order-compatible types (BIGINT/long,
  *    DOUBLE/double, VARCHAR/string);
  *  - every floating-point output rounded to 4 decimals at the very end;
  *  - every ORDER BY / LIMIT keyed on (round(score,4), unique id) so both
  *    engines make identical cuts even under last-bit fp divergence.
  */
object OracleSql {

  private def lit(s: String) = "'" + s.replace("'", "''") + "'"

  /** English stopword list as a SQL IN-list (matches Analyzer.tokenizeEn). */
  lazy val stopListEn: String = StopWords.english.toSeq.sorted.map(lit).mkString(",")

  /** Tokenization CTEs over the documents table restricted to `where`
    * (a predicate over alias `d`) — the corpus a snapshot/time-travel read
    * serves is a strict subset of documents, stats included. `rel` swaps
    * the corpus relation itself (any parenthesized SELECT exposing doc_id
    * and text) — the oracle of an UPDATE, whose corpus is documents with
    * some rows' text replaced. */
  def baseCtesFor(where: String, rel: String = "documents"): String =
    s"""toks AS (
       |  SELECT d.doc_id, t.term
       |  FROM $rel d, unnest(regexp_extract_all(lower(d.text), '[\\p{L}\\p{Nd}]+')) AS t(term)
       |  WHERE t.term NOT IN ($stopListEn) AND ($where)),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks GROUP BY 1),
       |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(coalesce(dl.len, 0)) AS DOUBLE) / count(*) AS avgdl
       |  FROM $rel d LEFT JOIN dl ON dl.doc_id = d.doc_id WHERE ($where))""".stripMargin

  /** Tokenization CTEs over the documents table — the SQL mirror of
    * Analyzer.tokenize(text, english) for ASCII input. */
  def baseCtes: String = baseCtesFor("TRUE")

  private def queryValues(terms: Seq[(String, Int)]): String =
    terms.map { case (t, c) => s"(${lit(t)}, $c)" }.mkString(", ")

  /** The BM25 score of BM25Reranker.cs:398-418 as a SQL aggregate, with
    * the query-term table given as any relation exposing (term, qtf). */
  private def scoredCteFrom(qtRel: String, p: Bm25.Params): String =
    s"""scored AS (
       |  SELECT tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * ${p.k1 + 1}) / (tf.tf + ${p.k1} * (1 - ${p.b} + ${p.b} * dl.len / stats.avgdl))
       |       * (qt.qtf * ${p.k3 + 1}) / (qt.qtf + ${p.k3}) ) AS score
       |  FROM tf
       |  JOIN $qtRel ON qt.term = tf.term
       |  JOIN dft ON dft.term = tf.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY tf.doc_id)""".stripMargin

  /** The BM25 score of BM25Reranker.cs:398-418 as a SQL aggregate. */
  def scoredCte(terms: Seq[(String, Int)], p: Bm25.Params): String =
    scoredCteFrom(s"(VALUES ${queryValues(terms)}) AS qt(term, qtf)", p)

  def corpusStats: String = corpusStatsWhere("TRUE")

  /** Corpus stats over a restricted subset — the oracle of a tombstone
    * delete's exact (n, avgdl) decrement (predicate over alias `d` selects
    * the SURVIVORS); `rel` swaps the corpus relation (update oracle). */
  def corpusStatsWhere(where: String, rel: String = "documents"): String =
    s"""WITH ${baseCtesFor(where, rel)}
       |SELECT CAST(count(*) AS BIGINT) AS n,
       |       round(CAST(sum(coalesce(dl.len, 0)) AS DOUBLE) / count(*), 4) AS avgdl
       |FROM $rel d LEFT JOIN dl ON dl.doc_id = d.doc_id WHERE ($where)""".stripMargin

  def termDf(limit: Int): String =
    s"""WITH $baseCtes
       |SELECT term, df FROM dft ORDER BY df DESC, term LIMIT $limit""".stripMargin

  def docTf: String =
    s"""WITH $baseCtes
       |SELECT doc_id, term, tf FROM tf ORDER BY doc_id, term""".stripMargin

  def docLens: String =
    s"""WITH $baseCtes
       |SELECT d.doc_id, CAST(coalesce(dl.len, 0) AS BIGINT) AS len
       |FROM documents d LEFT JOIN dl ON dl.doc_id = d.doc_id ORDER BY d.doc_id""".stripMargin

  def scoreAll(terms: Seq[(String, Int)], p: Bm25.Params): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)}
       |SELECT doc_id, round(score, 4) AS score FROM scored ORDER BY doc_id""".stripMargin

  def topK(terms: Seq[(String, Int)], p: Bm25.Params, k: Int,
           /** Corpus restriction (predicate over alias `d`) — the oracle of
             * a snapshot read: df/avgdl/N come from the subset only. */
           where: String = "TRUE",
           /** Corpus relation override — the oracle of an update. */
           rel: String = "documents"): String =
    s"""WITH ${baseCtesFor(where, rel)},
       |${scoredCte(terms, p)}
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin

  /** Stemmed-index top-k: the stemmer becomes SQL-expressible through a
    * precomputed raw→stem mapping table inlined as VALUES (computed by the
    * Scala side over the corpus' RAW token vocabulary — the mapping is an
    * input here; the stemmer itself is pinned by StemmerSpec). Tokens are
    * stemmed FIRST, then stopword-filtered on the stemmed form — the
    * engine's stopword-on-lemma order (Analyzer.tokenize). Everything
    * downstream (tf/dl/df/stats over stemmed terms, BM25, the round-4 cut)
    * is the full independent DuckDB recompute. `terms` are the STEMMED
    * analyzed query terms with qtf. */
  def stemTopK(stemPairs: Seq[(String, String)], terms: Seq[(String, Int)],
               p: Bm25.Params, k: Int): String = {
    require(stemPairs.nonEmpty, "stem map must be non-empty")
    val mapVals = stemPairs.map { case (r, s) => s"(${lit(r)}, ${lit(s)})" }
      .mkString(", ")
    s"""WITH stemmap(raw, stem) AS (VALUES $mapVals),
       |toks AS (
       |  SELECT d.doc_id, coalesce(m.stem, t.term) AS term
       |  FROM documents d
       |  CROSS JOIN unnest(regexp_extract_all(lower(d.text), '[\\p{L}\\p{Nd}]+')) AS t(term)
       |  LEFT JOIN stemmap m ON m.raw = t.term
       |  WHERE coalesce(m.stem, t.term) NOT IN ($stopListEn)),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks GROUP BY 1),
       |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(coalesce(dl.len, 0)) AS DOUBLE) / count(*) AS avgdl
       |  FROM documents d LEFT JOIN dl ON dl.doc_id = d.doc_id),
       |${scoredCte(terms, p)}
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Faceted top-k: BM25 over the full-corpus statistics, candidates
    * restricted to docs matching every (column = value) filter — the SQL
    * mirror of Searcher.topKFiltered (global df/avgdl, filter applied to
    * candidates only). */
  def topKFiltered(terms: Seq[(String, Int)], p: Bm25.Params, k: Int,
                   facets: Seq[(String, String)]): String = {
    val cond = facets.map { case (c, v) => s"d.$c = ${lit(v)}" }.mkString(" AND ")
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)}
       |SELECT s.doc_id, round(s.score, 4) AS score
       |FROM scored s JOIN documents d ON d.doc_id = s.doc_id
       |WHERE $cond
       |ORDER BY round(s.score, 4) DESC, s.doc_id LIMIT $k""".stripMargin
  }

  /** Facet value counts among the docs matching ≥1 query term — the SQL
    * mirror of Searcher.facetCounts. */
  def facetCounts(terms: Seq[(String, Int)], facetCol: String, topN: Int): String =
    s"""WITH $baseCtes,
       |m AS (
       |  SELECT DISTINCT tf.doc_id FROM tf
       |  JOIN (VALUES ${queryValues(terms)}) AS qt(term, qtf) ON qt.term = tf.term)
       |SELECT d.$facetCol AS value, CAST(count(*) AS BIGINT) AS cnt
       |FROM m JOIN documents d ON d.doc_id = m.doc_id
       |GROUP BY 1 ORDER BY cnt DESC, value LIMIT $topN""".stripMargin

  /** Numeric-range facet panel — the SQL mirror of
    * Searcher.facetCountsRange: matching-doc counts per [lo, hi) bucket,
    * all buckets emitted (empty → 0), integer bounds so the bucket
    * decision is integer arithmetic on both engines. */
  def facetCountsRange(terms: Seq[(String, Int)], facetCol: String,
                       bounds: Seq[Long]): String = {
    val bucketRows = bounds.sliding(2).zipWithIndex
      .map { case (Seq(lo, hi), i) => s"($i, $lo, $hi)" }.mkString(", ")
    s"""WITH $baseCtes,
       |m AS (
       |  SELECT DISTINCT tf.doc_id FROM tf
       |  JOIN (VALUES ${queryValues(terms)}) AS qt(term, qtf) ON qt.term = tf.term),
       |v AS (SELECT d.$facetCol AS v FROM m JOIN documents d ON d.doc_id = m.doc_id),
       |b(bucket, lo, hi) AS (VALUES $bucketRows)
       |SELECT CAST(b.bucket AS INTEGER) AS bucket, CAST(b.lo AS BIGINT) AS lo,
       |       CAST(b.hi AS BIGINT) AS hi, CAST(count(v.v) AS BIGINT) AS cnt
       |FROM b LEFT JOIN v ON v.v >= b.lo AND v.v < b.hi
       |GROUP BY 1, 2, 3 ORDER BY bucket""".stripMargin
  }

  /** Multi-column facet panel — the SQL mirror of Searcher.facetCountsMulti
    * (top N values per facet column over the OR-match doc set). */
  def facetCountsMulti(terms: Seq[(String, Int)], facetCols: Seq[String],
                       topN: Int): String = {
    val perCol = facetCols.distinct.sorted.map { c =>
      s"""SELECT ${lit(c)} AS facet, d.$c AS value, count(*) AS cnt
         |  FROM m JOIN documents d ON d.doc_id = m.doc_id GROUP BY 2""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH $baseCtes,
       |m AS (
       |  SELECT DISTINCT tf.doc_id FROM tf
       |  JOIN (VALUES ${queryValues(terms)}) AS qt(term, qtf) ON qt.term = tf.term),
       |c AS (
       |$perCol),
       |r AS (SELECT facet, value, cnt,
       |        row_number() OVER (PARTITION BY facet ORDER BY cnt DESC, value) AS rn
       |      FROM c)
       |SELECT facet, value, CAST(cnt AS BIGINT) AS cnt FROM r WHERE rn <= $topN
       |ORDER BY facet, cnt DESC, value""".stripMargin
  }

  /** Top-k with extracted snippets — the SQL mirror of DocQueries.snippets
    * (first raw token matching an analyzed query term, ± `w` tokens). */
  def snippets(terms: Seq[(String, Int)], p: Bm25.Params, k: Int, w: Int): String = {
    // first position (1-based) of any analyzed query term in the raw token
    // array: min over per-term list_position (NULL = absent; a scored hit
    // always contains >= 1 term, so the sentinel never survives)
    val firstPos = terms.map(t => s"coalesce(list_position(a, ${lit(t._1)}), 999999999)")
      .mkString("least(", ", ", ")")
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |topk AS (
       |  SELECT doc_id, round(score, 4) AS score FROM scored
       |  ORDER BY round(score, 4) DESC, doc_id LIMIT $k),
       |arr AS (
       |  SELECT t.doc_id, t.score,
       |         regexp_extract_all(lower(d.text), '[\\p{L}\\p{Nd}]+') AS a
       |  FROM topk t JOIN documents d ON d.doc_id = t.doc_id),
       |fi AS (SELECT doc_id, score, a, $firstPos AS i FROM arr)
       |SELECT doc_id, score,
       |  array_to_string(list_slice(a, greatest(1, i - $w), i + $w), ' ') AS snippet
       |FROM fi
       |ORDER BY score DESC, doc_id""".stripMargin
  }

  /** Conjunctive scored CTE: only docs matching EVERY query term. */
  def scoredAndCte(terms: Seq[(String, Int)], p: Bm25.Params): String =
    scoredCte(terms, p).stripSuffix(")") +
      s"\n  HAVING count(DISTINCT tf.term) = ${terms.size})"

  /** AND-mode top-k: docs containing every query term, OR-mode score. */
  /** Mirror of DocQueries.groupTopK: per-group Σ of round-4 scores summed
    * as integer 1e-4 units (exact, order-independent), cut on (micro-sum,
    * group). */
  def groupTopK(terms: Seq[(String, Int)], p: Bm25.Params,
                groupCol: String, k: Int): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |g AS (
       |  SELECT d.$groupCol AS grp,
       |    sum(CAST(round(round(s.score, 4) * 10000) AS BIGINT)) AS m,
       |    CAST(count(*) AS BIGINT) AS n_hits
       |  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
       |  GROUP BY 1)
       |SELECT grp AS $groupCol, CAST(m AS DOUBLE) / 10000 AS group_score, n_hits
       |FROM g ORDER BY m DESC, grp LIMIT $k""".stripMargin

  /** Field-collapsed top-k — the SQL mirror of DocQueries.collapseTopK:
    * one best (round4 desc, doc_id asc) doc per group value, then the k
    * best groups by their representative. */
  def collapseTopK(terms: Seq[(String, Int)], p: Bm25.Params,
                   groupCol: String, k: Int): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |h AS (
       |  SELECT s.doc_id, round(s.score, 4) AS s4, d.$groupCol AS grp
       |  FROM scored s JOIN documents d ON d.doc_id = s.doc_id),
       |r AS (
       |  SELECT grp, doc_id, s4,
       |    row_number() OVER (PARTITION BY grp ORDER BY s4 DESC, doc_id) AS rn
       |  FROM h)
       |SELECT grp AS $groupCol, doc_id, s4 AS score FROM r WHERE rn = 1
       |ORDER BY s4 DESC, doc_id LIMIT $k""".stripMargin

  /** Mirror of DocQueries.convJoinTopK: conversations with a turn
    * matching ALL of `mustA` and a turn matching ALL of `mustB`, ranked
    * by the full micro-summed rollup over `terms` (= A ∪ B analyzed). */
  def convJoinTopK(terms: Seq[(String, Int)], mustA: Seq[String],
                   mustB: Seq[String], turnsPerConv: Int, p: Bm25.Params,
                   k: Int): String = {
    def clause(name: String, must: Seq[String]) =
      s"""$name AS (
         |  SELECT DISTINCT doc_id // $turnsPerConv AS conv_id FROM (
         |    SELECT doc_id FROM tf WHERE term IN (${must.map(lit).mkString(",")})
         |    GROUP BY 1 HAVING count(DISTINCT term) = ${must.size}))""".stripMargin
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |m AS (
       |  SELECT doc_id // $turnsPerConv AS conv_id,
       |    CAST(round(round(score, 4) * 10000) AS BIGINT) AS micros
       |  FROM scored),
       |g AS (SELECT conv_id, sum(micros) AS m, CAST(count(*) AS BIGINT) AS n_hits
       |      FROM m GROUP BY 1),
       |${clause("ca", mustA)},
       |${clause("cb", mustB)}
       |SELECT g.conv_id, CAST(g.m AS DOUBLE) / 10000 AS conv_score, g.n_hits
       |FROM g JOIN ca USING (conv_id) JOIN cb USING (conv_id)
       |ORDER BY g.m DESC, g.conv_id LIMIT $k""".stripMargin
  }

  /** Mirror of DocQueries.convTopK: per-conversation relevance = Σ of the
    * conversation's top-`t` turn micros (conv = doc_id div TurnsPerConv),
    * (micro-sum desc, conv) cut. */
  def convTopK(terms: Seq[(String, Int)], p: Bm25.Params,
               turnsPerConv: Int, t: Int, k: Int): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |m AS (
       |  SELECT doc_id, doc_id // $turnsPerConv AS conv_id,
       |    CAST(round(round(score, 4) * 10000) AS BIGINT) AS micros
       |  FROM scored),
       |r AS (
       |  SELECT conv_id, micros,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY micros DESC, doc_id) AS rn
       |  FROM m),
       |g AS (
       |  SELECT conv_id, sum(micros) AS m, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM r WHERE rn <= $t GROUP BY 1)
       |SELECT conv_id, CAST(m AS DOUBLE) / 10000 AS conv_score, n_hits
       |FROM g ORDER BY m DESC, conv_id LIMIT $k""".stripMargin

  /** Mirror of DocQueries.turnContext: top-k turn hits with same-conversation
    * previous/next turn ids and char sizes (-1 / 0 on boundaries). */
  def turnContext(terms: Seq[(String, Int)], p: Bm25.Params,
                  turnsPerConv: Int, k: Int): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |topk AS (
       |  SELECT doc_id, round(score, 4) AS score FROM scored
       |  ORDER BY round(score, 4) DESC, doc_id LIMIT $k),
       |mx AS (SELECT max(doc_id) AS maxid FROM documents)
       |SELECT t.doc_id, t.score,
       |  CASE WHEN t.doc_id % $turnsPerConv = 0 THEN -1 ELSE t.doc_id - 1 END AS prev_id,
       |  CAST(coalesce(p.n_chars, 0) AS BIGINT) AS prev_chars,
       |  CASE WHEN t.doc_id % $turnsPerConv = ${turnsPerConv - 1}
       |         OR t.doc_id + 1 > mx.maxid THEN -1 ELSE t.doc_id + 1 END AS next_id,
       |  CAST(CASE WHEN t.doc_id % $turnsPerConv = ${turnsPerConv - 1} THEN 0
       |       ELSE coalesce(nx.n_chars, 0) END AS BIGINT) AS next_chars
       |FROM topk t CROSS JOIN mx
       |LEFT JOIN documents p ON p.doc_id = t.doc_id - 1 AND t.doc_id % $turnsPerConv <> 0
       |LEFT JOIN documents nx ON nx.doc_id = t.doc_id + 1
       |ORDER BY t.score DESC, t.doc_id""".stripMargin

  /** Mirror of DocQueries.timeTopK: integer-rational recency boost
    * boosted = (micros·(n + doc_id)) // (2n), (boosted desc, doc_id) cut. */
  def timeTopK(terms: Seq[(String, Int)], p: Bm25.Params, k: Int): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |b AS (
       |  SELECT doc_id,
       |    (CAST(round(round(score, 4) * 10000) AS BIGINT) * (stats.n + doc_id))
       |      // (2 * stats.n) AS boosted
       |  FROM scored CROSS JOIN stats)
       |SELECT doc_id, CAST(boosted AS DOUBLE) / 10000 AS score
       |FROM b ORDER BY boosted DESC, doc_id LIMIT $k""".stripMargin

  /** Mirror of DocQueries.keywords: top-n TF-IDF terms per doc, ranked on
    * (round-4 weight desc, term). */
  def keywords(maxDocId: Long, n: Int): String =
    s"""WITH $baseCtes,
       |sc AS (
       |  SELECT tf.doc_id, tf.term,
       |    round(tf.tf * ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)), 4) AS tfidf
       |  FROM tf JOIN dft ON dft.term = tf.term CROSS JOIN stats
       |  WHERE tf.doc_id < $maxDocId),
       |rk AS (
       |  SELECT doc_id, term, tfidf,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
       |  FROM sc)
       |SELECT doc_id, term, tfidf FROM rk WHERE rn <= $n
       |ORDER BY doc_id, tfidf DESC, term""".stripMargin

  /** Mirror of DocQueries.moreLikeThis: the target doc's top-nTerms
    * TF-IDF terms (keywords' round-4 desc, term asc rule) re-issued as a
    * qtf=1 BM25 query, target excluded, (round4, doc_id) cut. */
  def moreLikeThis(targetId: Long, nTerms: Int, k: Int, p: Bm25.Params): String =
    s"""WITH $baseCtes,
       |tgt AS (
       |  SELECT tf.term,
       |    round(tf.tf * ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)), 4) AS tfidf
       |  FROM tf JOIN dft ON dft.term = tf.term CROSS JOIN stats
       |  WHERE tf.doc_id = $targetId),
       |qt AS (SELECT term, 1 AS qtf FROM tgt ORDER BY tfidf DESC, term LIMIT $nTerms),
       |${scoredCteFrom("qt", p)}
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |WHERE doc_id <> $targetId
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin

  /** Mirror of DocQueries.zipfCoverage: top-limit terms by collection
    * frequency with integer-rational cumulative share. */
  def zipfCoverage(limit: Int): String =
    s"""WITH $baseCtes,
       |ctf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1),
       |tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS tot FROM ctf),
       |head AS (SELECT term, ctf FROM ctf ORDER BY ctf DESC, term LIMIT $limit)
       |SELECT term, ctf,
       |  CAST((sum(ctf) OVER (ORDER BY ctf DESC, term ROWS UNBOUNDED PRECEDING) * 20000 + t.tot)
       |       // (2 * t.tot) AS DOUBLE) / 10000 AS cum_share
       |FROM head CROSS JOIN tot t ORDER BY ctf DESC, term""".stripMargin

  /** Mirror of DocQueries.lenHist: analyzed-length histogram over fixed
    * buckets (token-less docs land in bucket 0, same as the doc-meta
    * table's len = 0). */
  def lenHist(width: Int): String =
    s"""WITH $baseCtes
       |SELECT (coalesce(dl.len, 0) // $width) * $width AS bucket_lo,
       |  CAST(count(*) AS BIGINT) AS n_docs
       |FROM documents d LEFT JOIN dl ON dl.doc_id = d.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Mirror of DocQueries.fuzzyTopK: dictionary terms within edit distance
    * ≤ maxDist (term-order capped) re-issued as a qtf=1 BM25 query. */
  def fuzzyTopK(term: String, maxDist: Int, maxExpansions: Int,
                p: Bm25.Params, k: Int): String =
    s"""WITH $baseCtes,
       |qt AS (
       |  SELECT term, 1 AS qtf FROM (
       |    SELECT term FROM dft WHERE levenshtein(term, ${lit(term)}) <= $maxDist
       |    ORDER BY term LIMIT $maxExpansions) t),
       |${scoredCteFrom("qt", p)}
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin

  /** Mirror of DocQueries.wildcardTopK: glob-matching dictionary terms
    * (term-order capped) re-issued as a qtf=1 BM25 query. `rx` is the
    * already-translated anchored regex (literals + `.` + `.*` only, so
    * Java and RE2 semantics coincide). */
  def wildcardTopK(rx: String, maxExpansions: Int, p: Bm25.Params,
                   k: Int): String =
    s"""WITH $baseCtes,
       |qt AS (
       |  SELECT term, 1 AS qtf FROM (
       |    SELECT term FROM dft WHERE regexp_matches(term, ${lit(rx)})
       |    ORDER BY term LIMIT $maxExpansions) t),
       |${scoredCteFrom("qt", p)}
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin

  /** Mirror of DocQueries.spanNearTopK: conjunctive BM25 candidates whose
    * distinct raw tokens all fit in a ≤ `window` position window; span =
    * min over one-occurrence-per-term combinations (the Spark kernel's
    * k-pointer sweep computes the same minimum without the product). */
  def spanNearTopK(terms: Seq[(String, Int)], rawToks: Seq[String],
                   window: Int, p: Bm25.Params, k: Int): String = {
    val ts = rawToks.distinct
    require(ts.length >= 2, "span-near oracle needs >= 2 distinct terms")
    val joins = ts.indices.tail.map(i =>
      s"JOIN pos p$i ON p$i.doc_id = p0.doc_id AND p$i.term = ${lit(ts(i))}")
      .mkString("\n|  ")
    val ps = ts.indices.map(i => s"p$i.p").mkString(", ")
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |arrs2 AS (SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{Nd}]+') AS a FROM documents),
       |pos AS (SELECT doc_id, a[i] AS term, i AS p FROM arrs2, unnest(range(1, len(a) + 1)) r(i)),
       |sp AS (
       |  SELECT p0.doc_id, min(greatest($ps) - least($ps) + 1) AS span
       |  FROM pos p0
       |  $joins
       |  WHERE p0.term = ${lit(ts.head)}
       |  GROUP BY 1)
       |SELECT s.doc_id, round(s.score, 4) AS score, CAST(sp.span AS BIGINT) AS span
       |FROM scored s JOIN sp ON sp.doc_id = s.doc_id AND sp.span <= $window
       |ORDER BY round(s.score, 4) DESC, s.doc_id LIMIT $k""".stripMargin
  }

  /** Mirror of DocQueries.phraseSlopTopK: min ORDERED span per doc
    * (strictly increasing positions, one per phrase offset), matched when
    * span − m ≤ slop. SQL enumerates every ordered selection, so its min
    * equals the kernel's greedy-anchored minimum. */
  def phraseSlopTopK(terms: Seq[(String, Int)], rawToks: Seq[String],
                     slop: Int, p: Bm25.Params, k: Int): String = {
    val m = rawToks.length
    require(m >= 2, "slop-phrase oracle needs >= 2 tokens")
    val joins = (1 until m).map(i =>
      s"JOIN pos p$i ON p$i.doc_id = p0.doc_id AND p$i.term = ${lit(rawToks(i))} AND p$i.p > p${i - 1}.p")
      .mkString("\n|  ")
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |arrs2 AS (SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{Nd}]+') AS a FROM documents),
       |pos AS (SELECT doc_id, a[i] AS term, i AS p FROM arrs2, unnest(range(1, len(a) + 1)) r(i)),
       |sp AS (
       |  SELECT p0.doc_id, min(p${m - 1}.p - p0.p + 1) AS span
       |  FROM pos p0
       |  $joins
       |  WHERE p0.term = ${lit(rawToks.head)}
       |  GROUP BY 1)
       |SELECT s.doc_id, round(s.score, 4) AS score, CAST(sp.span AS BIGINT) AS span
       |FROM scored s JOIN sp ON sp.doc_id = s.doc_id AND sp.span - $m <= $slop
       |ORDER BY round(s.score, 4) DESC, s.doc_id LIMIT $k""".stripMargin
  }

  /** Mirror of DocQueries.expandTerms: top-k doc pool by (round4, doc_id)
    * cut, then Σ over the pool of round-4 tf·idf as integer 1e-4 units. */
  def expandTerms(terms: Seq[(String, Int)], p: Bm25.Params,
                  k: Int, nTerms: Int): String = {
    val qlist = terms.map(t => lit(t._1)).mkString(",")
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |pool AS (
       |  SELECT doc_id FROM scored ORDER BY round(score, 4) DESC, doc_id LIMIT $k),
       |w AS (
       |  SELECT tf.term,
       |    sum(CAST(round(round(tf.tf * ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)), 4) * 10000) AS BIGINT)) AS m
       |  FROM tf JOIN pool ON pool.doc_id = tf.doc_id
       |  JOIN dft ON dft.term = tf.term CROSS JOIN stats
       |  WHERE tf.term NOT IN ($qlist)
       |  GROUP BY 1)
       |SELECT term, CAST(m AS DOUBLE) / 10000 AS weight FROM w
       |ORDER BY m DESC, term LIMIT $nTerms""".stripMargin
  }

  /** Mirror of DocQueries.prefixTopK: the query-term set is the term
    * dictionary's prefix slice (qtf = 1 each, so the reference's qtf
    * factor is exactly 1), scored and cut like topK. */
  def prefixTopK(prefix: String, p: Bm25.Params, k: Int): String =
    s"""WITH $baseCtes,
       |qt AS (SELECT term FROM dft WHERE term LIKE ${lit(prefix + "%")}),
       |scored AS (
       |  SELECT tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * ${p.k1 + 1}) / (tf.tf + ${p.k1} * (1 - ${p.b} + ${p.b} * dl.len / stats.avgdl)) ) AS score
       |  FROM tf
       |  JOIN qt ON qt.term = tf.term
       |  JOIN dft ON dft.term = tf.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin

  /** NOT-mode top-k: OR-mode BM25 over the query terms (exclude-overlaps
    * already dropped by the caller — Searcher.topKNot drops them too),
    * restricted to docs containing no exclude term. */
  def topKNot(terms: Seq[(String, Int)], excludes: Seq[String],
              p: Bm25.Params, k: Int): String = {
    val elist = excludes.map(lit).mkString(",")
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)}
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM tf WHERE term IN ($elist))
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Per-term score breakdown of the TOP-1 hit (round-4/doc_id cut, the
    * same target selection as DocQueries.explainTopHit) — the SQL mirror
    * of Searcher.explain: one row per query term present in the doc, the
    * contributions summing to the doc's score. */
  def explainTopHit(terms: Seq[(String, Int)], p: Bm25.Params): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |top1 AS (SELECT doc_id FROM scored ORDER BY round(score, 4) DESC, doc_id LIMIT 1)
       |SELECT tf.term, tf.tf, dft.df,
       |  round( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * ${p.k1 + 1}) / (tf.tf + ${p.k1} * (1 - ${p.b} + ${p.b} * dl.len / stats.avgdl))
       |       * (qt.qtf * ${p.k3 + 1}) / (qt.qtf + ${p.k3}), 4) AS contrib
       |FROM tf
       |JOIN top1 ON top1.doc_id = tf.doc_id
       |JOIN (VALUES ${queryValues(terms)}) AS qt(term, qtf) ON qt.term = tf.term
       |JOIN dft ON dft.term = tf.term
       |JOIN dl ON dl.doc_id = tf.doc_id
       |CROSS JOIN stats
       |ORDER BY tf.term""".stripMargin

  /** Boolean (must/should/not) top-k — Lucene's BooleanQuery shape: docs
    * containing EVERY must term and NO not term, scored OR-mode over
    * `terms` = must ∪ should (must qtf wins on overlap — the caller
    * builds the union exactly as Searcher.search does). */
  def topKBool(terms: Seq[(String, Int)], mustTerms: Seq[String],
               excludes: Seq[String], p: Bm25.Params, k: Int,
               facets: Seq[(String, String)] = Nil): String = {
    val mustPred =
      if (mustTerms.isEmpty) "TRUE"
      else s"""s.doc_id IN (
              |  SELECT doc_id FROM tf WHERE term IN (${mustTerms.map(lit).mkString(",")})
              |  GROUP BY 1 HAVING count(DISTINCT term) = ${mustTerms.size})""".stripMargin
    val notPred =
      if (excludes.isEmpty) "TRUE"
      else s"s.doc_id NOT IN (SELECT DISTINCT doc_id FROM tf WHERE term IN (${excludes.map(lit).mkString(",")}))"
    val facetPred =
      if (facets.isEmpty) "TRUE"
      else facets.map { case (c, v) => s"d.$c = ${lit(v)}" }.mkString(" AND ")
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)}
       |SELECT s.doc_id, round(s.score, 4) AS score
       |FROM scored s JOIN documents d ON d.doc_id = s.doc_id
       |WHERE ($mustPred)
       |AND ($notPred)
       |AND ($facetPred)
       |ORDER BY round(s.score, 4) DESC, s.doc_id LIMIT $k""".stripMargin
  }

  def topKAnd(terms: Seq[(String, Int)], p: Bm25.Params, k: Int): String =
    s"""WITH $baseCtes,
       |${scoredAndCte(terms, p)}
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin

  /** Page 2 of the (round4 desc, doc_id) ranking — the search_after
    * oracle: rows k+1..2k of exactly the [[topK]] ordering. */
  def topKOffset(terms: Seq[(String, Int)], p: Bm25.Params, k: Int): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)}
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k OFFSET $k""".stripMargin

  /** minimum_should_match top-k: OR-mode BM25 restricted to docs matching
    * ≥ `minMatch` distinct query terms (count(*) — tf rows are unique per
    * (doc, term), so the join count IS the distinct-match count). */
  def topKMsm(terms: Seq[(String, Int)], p: Bm25.Params, minMatch: Int,
              k: Int): String =
    s"""WITH $baseCtes,
       |scored AS (
       |  SELECT tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * ${p.k1 + 1}) / (tf.tf + ${p.k1} * (1 - ${p.b} + ${p.b} * dl.len / stats.avgdl))
       |       * (qt.qtf * ${p.k3 + 1}) / (qt.qtf + ${p.k3}) ) AS score,
       |    CAST(count(*) AS BIGINT) AS matched
       |  FROM tf
       |  JOIN (VALUES ${queryValues(terms)}) AS qt(term, qtf) ON qt.term = tf.term
       |  JOIN dft ON dft.term = tf.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |WHERE matched >= $minMatch
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin

  /** Boosted top-k: every term contribution scaled by its query-time
    * boost — the SQL mirror of Searcher.topKBoosted. `terms` carries
    * (term, qtf, boost). */
  def topKBoosted(terms: Seq[(String, Int, Double)], p: Bm25.Params,
                  k: Int): String = {
    val vals = terms.map { case (t, c, b) => s"(${lit(t)}, $c, $b)" }.mkString(", ")
    s"""WITH $baseCtes,
       |scored AS (
       |  SELECT tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * ${p.k1 + 1}) / (tf.tf + ${p.k1} * (1 - ${p.b} + ${p.b} * dl.len / stats.avgdl))
       |       * (qt.qtf * ${p.k3 + 1}) / (qt.qtf + ${p.k3})
       |       * qt.boost ) AS score
       |  FROM tf
       |  JOIN (VALUES $vals) AS qt(term, qtf, boost) ON qt.term = tf.term
       |  JOIN dft ON dft.term = tf.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Synonym-query oracle — Lucene SynonymQuery semantics: per (group,
    * qtf, members), group tf = Σ member tfs per doc, group df = max
    * member df present in the corpus. */
  def topKSynonyms(groups: Seq[(String, Int, Seq[String])], p: Bm25.Params,
                   k: Int): String = {
    val synValues = groups.flatMap { case (g, _, ms) =>
      ms.map(m => s"(${lit(g)}, ${lit(m)})") }.mkString(", ")
    val qtValues = groups.map { case (g, q, _) => s"(${lit(g)}, $q)" }.mkString(", ")
    s"""WITH $baseCtes,
       |syn AS (SELECT * FROM (VALUES $synValues) AS s0(grp, member)),
       |gtf AS (
       |  SELECT tf.doc_id, s.grp, CAST(sum(tf.tf) AS BIGINT) AS tf
       |  FROM tf JOIN syn s ON s.member = tf.term GROUP BY 1, 2),
       |gdf AS (
       |  SELECT s.grp, CAST(max(dft.df) AS BIGINT) AS df
       |  FROM syn s JOIN dft ON dft.term = s.member GROUP BY 1),
       |scored AS (
       |  SELECT gtf.doc_id,
       |    sum( ln(1 + (stats.n - gdf.df + 0.5) / (gdf.df + 0.5))
       |       * (gtf.tf * ${p.k1 + 1}) / (gtf.tf + ${p.k1} * (1 - ${p.b} + ${p.b} * dl.len / stats.avgdl))
       |       * (qt.qtf * ${p.k3 + 1}) / (qt.qtf + ${p.k3}) ) AS score
       |  FROM gtf
       |  JOIN (VALUES $qtValues) AS qt(grp, qtf) ON qt.grp = gtf.grp
       |  JOIN gdf ON gdf.grp = gtf.grp
       |  JOIN dl ON dl.doc_id = gtf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY gtf.doc_id)
       |SELECT doc_id, round(score, 4) AS score FROM scored
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Dirichlet-smoothed query-likelihood oracle — graft.query.LmDirichlet:
    * per term, qtf · max(0, ln(1 + tf/(μ·(cf+1)/(T+1))) + ln(μ/(dl+μ)))
    * with cf = collection frequency and T = total corpus tokens; only
    * docs with positive total score rank. */
  def topKDirichlet(terms: Seq[(String, Int)], mu: Double, k: Int): String =
    s"""WITH $baseCtes,
       |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
       |tot AS (SELECT CAST(sum(len) AS BIGINT) AS t FROM dl),
       |scored AS (
       |  SELECT tf.doc_id,
       |    sum( qt.qtf * greatest(0.0,
       |      ln(1 + tf.tf / ($mu * ((cf.cf + 1.0) / (tot.t + 1.0))))
       |      + ln($mu / (dl.len + $mu))) ) AS score
       |  FROM tf
       |  JOIN (VALUES ${queryValues(terms)}) AS qt(term, qtf) ON qt.term = tf.term
       |  JOIN cf ON cf.term = tf.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN tot
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, round(score, 4) AS score FROM scored WHERE score > 0
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin

  /** Disjunction-max oracle — graft.query.Searcher.topKDisMax: per-doc
    * combined score = max subquery score + tie·(sum − max) over per-
    * subquery OR-mode BM25 sums. */
  def topKDisMax(subs: Seq[Seq[(String, Int)]], tie: Double, p: Bm25.Params,
                 k: Int): String = {
    val subValues = subs.zipWithIndex.flatMap { case (ts, i) =>
      ts.map { case (t, q) => s"('s$i', ${lit(t)}, $q)" } }.mkString(", ")
    s"""WITH $baseCtes,
       |sub AS (SELECT * FROM (VALUES $subValues) AS s0(sub, term, qtf)),
       |parts AS (
       |  SELECT tf.doc_id, s.sub,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * ${p.k1 + 1}) / (tf.tf + ${p.k1} * (1 - ${p.b} + ${p.b} * dl.len / stats.avgdl))
       |       * (s.qtf * ${p.k3 + 1}) / (s.qtf + ${p.k3}) ) AS score
       |  FROM tf
       |  JOIN sub s ON s.term = tf.term
       |  JOIN dft ON dft.term = tf.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2),
       |comb AS (
       |  SELECT doc_id, max(score) + $tie * (sum(score) - max(score)) AS score
       |  FROM parts GROUP BY 1)
       |SELECT doc_id, round(score, 4) AS score FROM comb WHERE score > 0
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Significant-terms oracle — graft.query.Searcher.significantTerms
    * (JLH): foreground = docs containing ALL `terms`; per term present in
    * the foreground with fgPct > bgPct,
    * score = (fg/F − df/N)·((fg/F)/(df/N)). */
  def significantTerms(terms: Seq[String], topN: Int): String = {
    val inList = terms.map(lit).mkString(", ")
    s"""WITH $baseCtes,
       |fg AS (SELECT doc_id FROM tf WHERE term IN ($inList)
       |       GROUP BY doc_id HAVING count(*) = ${terms.size}),
       |fcnt AS (SELECT CAST(count(*) AS BIGINT) AS f FROM fg),
       |fgc AS (
       |  SELECT tf.term, CAST(count(*) AS BIGINT) AS fg_df
       |  FROM tf JOIN fg ON fg.doc_id = tf.doc_id GROUP BY 1),
       |scored AS (
       |  SELECT fgc.term, fgc.fg_df, dft.df,
       |    (CAST(fgc.fg_df AS DOUBLE) / fcnt.f - CAST(dft.df AS DOUBLE) / stats.n)
       |      * ((CAST(fgc.fg_df AS DOUBLE) / fcnt.f) / (CAST(dft.df AS DOUBLE) / stats.n)) AS score
       |  FROM fgc
       |  JOIN dft ON dft.term = fgc.term
       |  CROSS JOIN fcnt CROSS JOIN stats
       |  WHERE CAST(fgc.fg_df AS DOUBLE) / fcnt.f > CAST(dft.df AS DOUBLE) / stats.n)
       |SELECT term, fg_df, df, round(score, 4) AS score FROM scored
       |ORDER BY round(score, 4) DESC, term LIMIT $topN""".stripMargin
  }

  /** Term-dictionary stats oracle — DocQueries.termStats: top-df terms
    * with document AND collection frequency. */
  def termStats(limit: Int): String =
    s"""WITH $baseCtes,
       |cfc AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1)
       |SELECT dft.term, dft.df, cfc.cf
       |FROM dft JOIN cfc ON cfc.term = dft.term
       |ORDER BY dft.df DESC, dft.term LIMIT $limit""".stripMargin

  /** Completion-suggester oracle — Searcher.complete: df-ranked dictionary
    * terms under a prefix (prefix is [a-z0-9]+ on this surface, so no LIKE
    * metacharacter escaping is needed). */
  def complete(prefix: String, k: Int): String =
    s"""WITH $baseCtes
       |SELECT term, df FROM dft WHERE term LIKE ${lit(prefix + "%")}
       |ORDER BY df DESC, term LIMIT $k""".stripMargin

  /** Phrase-suggester oracle — DocQueries.phraseSuggest: per-position
    * df-ranked edit-distance candidates, cross-product phrases ranked by
    * the product of member dfs. */
  def phraseSuggest(toks: Seq[String], maxDist: Int, perTerm: Int,
                    k: Int): String = {
    val cands = toks.zipWithIndex.map { case (t, i) =>
      s"""c$i AS (SELECT term, df FROM dft
         |  WHERE levenshtein(term, ${lit(t)}) <= $maxDist
         |  ORDER BY df DESC, term LIMIT $perTerm)""".stripMargin
    }.mkString(",\n")
    val concat = toks.indices.map(i => s"c$i.term").mkString(" || ' ' || ")
    val prod = toks.indices.map(i => s"c$i.df").mkString(" * ")
    val from = toks.indices.map(i => s"c$i").mkString(" CROSS JOIN ")
    s"""WITH $baseCtes,
       |$cands
       |SELECT $concat AS suggestion, CAST($prod AS BIGINT) AS score
       |FROM $from
       |ORDER BY score DESC, suggestion LIMIT $k""".stripMargin
  }

  /** function_score / field_value_factor oracle — DocQueries.funcScoreTopK:
    * BM25 × ln(1 + n_chars/100) per matching doc. */
  def funcScoreTopK(terms: Seq[(String, Int)], p: Bm25.Params, k: Int): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |f AS (
       |  SELECT s.doc_id, s.score * ln(1 + d.n_chars / 100.0) AS score
       |  FROM scored s JOIN documents d ON d.doc_id = s.doc_id)
       |SELECT doc_id, round(score, 4) AS score FROM f
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin

  /** Classic TF-IDF oracle — graft.query.ClassicTfIdf: per term,
    * qtf · √tf · (1 + ln((N+1)/(df+1)))² / √dl (idf written out twice —
    * pow() association must match the engine's idf·idf exactly). */
  def topKTfIdf(terms: Seq[(String, Int)], k: Int): String =
    s"""WITH $baseCtes,
       |scored AS (
       |  SELECT tf.doc_id,
       |    sum( qt.qtf * sqrt(tf.tf)
       |       * (1 + ln((stats.n + 1.0) / (dft.df + 1.0)))
       |       * (1 + ln((stats.n + 1.0) / (dft.df + 1.0)))
       |       / sqrt(dl.len) ) AS score
       |  FROM tf
       |  JOIN (VALUES ${queryValues(terms)}) AS qt(term, qtf) ON qt.term = tf.term
       |  JOIN dft ON dft.term = tf.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, round(score, 4) AS score FROM scored WHERE score > 0
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin

  /** Rescore-window oracle — DocQueries.rescoreTopK: top `poolN` BM25
    * pool, + `w` when the doc contains the exact phrase (raw adjacency),
    * re-cut to k. */
  def rescoreTopK(terms: Seq[(String, Int)], rawToks: Seq[String], w: Double,
                  p: Bm25.Params, poolN: Int, k: Int): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |pool AS (
       |  SELECT doc_id, score FROM scored
       |  ORDER BY round(score, 4) DESC, doc_id LIMIT $poolN),
       |resc AS (
       |  SELECT p.doc_id, p.score + CASE
       |    WHEN regexp_matches(lower(d.text), ${lit(phrasePattern(rawToks))})
       |    THEN $w ELSE 0.0 END AS score
       |  FROM pool p JOIN documents d ON d.doc_id = p.doc_id)
       |SELECT doc_id, round(score, 4) AS score FROM resc
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $k""".stripMargin

  /** Per-group top-hits oracle — DocQueries.topHitsByGroup. */
  def topHitsByGroup(terms: Seq[(String, Int)], p: Bm25.Params,
                     groupCol: String, perGroup: Int, kGroups: Int): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |hit AS (
       |  SELECT s.doc_id, round(s.score, 4) AS s4, d.$groupCol AS grp
       |  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
       |  WHERE round(s.score, 4) > 0),
       |ranked AS (
       |  SELECT doc_id, s4, grp,
       |    row_number() OVER (PARTITION BY grp ORDER BY s4 DESC, doc_id) AS rnk
       |  FROM hit),
       |gsel AS (
       |  SELECT grp FROM (SELECT grp, max(s4) AS best FROM hit GROUP BY 1)
       |  ORDER BY best DESC, grp LIMIT $kGroups)
       |SELECT r.grp AS $groupCol, r.doc_id, r.s4 AS score,
       |  CAST(r.rnk AS BIGINT) AS rnk
       |FROM ranked r JOIN gsel ON gsel.grp = r.grp
       |WHERE r.rnk <= $perGroup
       |ORDER BY $groupCol, rnk""".stripMargin

  /** Percolation oracle: for each standing (qid, mustTerms, notTerms),
    * the docs containing EVERY must term and NO not term. */
  def percolate(queries: Seq[(String, Seq[String], Seq[String])]): String = {
    val arms = queries.map { case (qid, must, not) =>
      val notPred =
        if (not.isEmpty) "TRUE"
        else s"doc_id NOT IN (SELECT DISTINCT doc_id FROM tf WHERE term IN (${not.map(lit).mkString(",")}))"
      s"""SELECT ${lit(qid)} AS qid, doc_id FROM tf
         |WHERE term IN (${must.map(lit).mkString(",")}) AND ($notPred)
         |GROUP BY doc_id HAVING count(DISTINCT term) = ${must.size}""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $baseCtes
       |SELECT * FROM (
       |$arms
       |) ORDER BY qid, doc_id""".stripMargin
  }

  /** Did-you-mean suggestion oracle: dictionary terms within `maxDist`
    * edits of `term`, by (df desc, term). */
  def suggest(term: String, maxDist: Int, n: Int): String =
    s"""WITH $baseCtes
       |SELECT term, df FROM dft
       |WHERE levenshtein(term, ${lit(term)}) <= $maxDist
       |ORDER BY df DESC, term LIMIT $n""".stripMargin

  /** Full-token phrase regex over lower(text): each token bounded by
    * non-token chars, consecutive tokens separated by ≥1 of them — the
    * exact mirror of raw-token-stream adjacency (tokens are maximal
    * [letter/digit] runs, so the boundaries coincide). */
  private def phrasePattern(rawToks: Seq[String]): String = {
    val sep = "[^\\p{L}\\p{Nd}]"
    s"(^|$sep)" + rawToks.mkString(s"$sep+") + s"($$|$sep)"
  }

  /** Like [[phrasePattern]] but the LAST position accepts any completion
    * of `prefix` (match_phrase_prefix). */
  private def prefixPhrasePattern(headRaw: Seq[String], prefix: String): String = {
    val sep = "[^\\p{L}\\p{Nd}]"
    s"(^|$sep)" + (headRaw :+ (prefix + "[\\p{L}\\p{Nd}]*")).mkString(s"$sep+") +
      s"($$|$sep)"
  }

  /** match_phrase_prefix oracle — DocQueries.phrasePrefixTopK: docs whose
    * text contains head tokens adjacent + any completion of the prefix,
    * scored by the conjunctive BM25 of the HEAD terms only. */
  def phrasePrefixTopK(headTerms: Seq[(String, Int)], headRaw: Seq[String],
                       prefix: String, p: Bm25.Params, k: Int): String =
    s"""WITH $baseCtes,
       |${scoredAndCte(headTerms, p)}
       |SELECT sc.doc_id, round(sc.score, 4) AS score
       |FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id
       |WHERE regexp_matches(lower(d.text), ${lit(prefixPhrasePattern(headRaw, prefix))})
       |ORDER BY round(sc.score, 4) DESC, sc.doc_id LIMIT $k""".stripMargin

  /** Phrase top-k: conjunctive candidates + raw-adjacency verify on the
    * text (the SQL mirror of DocQueries.phraseTopK). `terms` are the
    * ANALYZED phrase terms (scoring); `rawToks` the full raw token
    * sequence (adjacency). */
  def phraseTopK(terms: Seq[(String, Int)], rawToks: Seq[String],
                 p: Bm25.Params, k: Int): String =
    s"""WITH $baseCtes,
       |${scoredAndCte(terms, p)}
       |SELECT sc.doc_id, round(sc.score, 4) AS score
       |FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id
       |WHERE regexp_matches(lower(d.text), ${lit(phrasePattern(rawToks))})
       |ORDER BY round(sc.score, 4) DESC, sc.doc_id LIMIT $k""".stripMargin

  /** Batched multi-query top-k: per-query top-k unioned with a qid tag. */
  def topKBatch(queries: Seq[(String, Seq[(String, Int)])], p: Bm25.Params, k: Int): String =
    queries.map { case (qid, terms) =>
      s"""SELECT * FROM (
         |WITH $baseCtes,
         |${scoredCte(terms, p)}
         |SELECT ${lit(qid)} AS qid, doc_id, round(score, 4) AS score FROM scored
         |ORDER BY round(score, 4) DESC, doc_id LIMIT $k)""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY qid, score DESC, doc_id"

  /** Stopword-only phrase top-k: no analyzed term survives → score 0 for
    * every raw-adjacency match, first k by doc_id (the positional path's
    * contract — the non-positional path has no indexed prefilter for a
    * stopword-only phrase and returns empty). */
  def phraseStopTopK(rawToks: Seq[String], k: Int): String =
    s"""SELECT doc_id, CAST(0.0 AS DOUBLE) AS score FROM documents
       |WHERE regexp_matches(lower(text), ${lit(phrasePattern(rawToks))})
       |ORDER BY doc_id LIMIT $k""".stripMargin

  def emptyQuery: String =
    """SELECT doc_id, CAST(0.0 AS DOUBLE) AS score FROM documents ORDER BY doc_id"""

  /** Two-stage cascade: BM25 stage (threshold+topK cut) then the
    * reference-test mock ranker `score*0.5 + len/100` (CascadeRerank
    * PipelineTests.cs:49-57), topM final cut. */
  def cascade(terms: Seq[(String, Int)], p: Bm25.Params,
              threshold: Double, topK: Int, topM: Int): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |stage1 AS (
       |  SELECT doc_id, score FROM scored WHERE score >= $threshold
       |  ORDER BY round(score, 4) DESC, doc_id LIMIT $topK),
       |stage2 AS (
       |  SELECT s.doc_id, s.score * 0.5 + dl.len / 100.0 AS score
       |  FROM stage1 s JOIN dl ON dl.doc_id = s.doc_id)
       |SELECT doc_id, round(score, 4) AS score FROM stage2 WHERE score >= $threshold
       |ORDER BY round(score, 4) DESC, doc_id LIMIT $topM""".stripMargin

  /** Per-stage cascade lineage counts (O13): candidates in, after the
    * threshold, after the topK/topM cut. */
  def cascadeMetrics(terms: Seq[(String, Int)], p: Bm25.Params,
                     threshold: Double, topK: Int, topM: Int): String =
    s"""WITH $baseCtes,
       |${scoredCte(terms, p)},
       |thr0 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM scored WHERE score >= $threshold),
       |stage1 AS (
       |  SELECT doc_id, score FROM scored WHERE score >= $threshold
       |  ORDER BY round(score, 4) DESC, doc_id LIMIT $topK),
       |in1 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM stage1),
       |thr1 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS c FROM stage1 s
       |  JOIN dl ON dl.doc_id = s.doc_id
       |  WHERE s.score * 0.5 + dl.len / 100.0 >= $threshold)
       |SELECT CAST(0 AS BIGINT) AS stage,
       |       CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_in,
       |       (SELECT c FROM thr0) AS n_threshold,
       |       CAST(least((SELECT c FROM thr0), $topK) AS BIGINT) AS n_out
       |UNION ALL
       |SELECT CAST(1 AS BIGINT), (SELECT c FROM in1), (SELECT c FROM thr1),
       |       CAST(least((SELECT c FROM thr1), $topM) AS BIGINT)
       |ORDER BY stage""".stripMargin

  /** Mock-LM relevance stage (O15): overlap/|q| + len/200, clamped [0,1],
    * docs containing the token `slow` → scorer error → 0. */
  def lmScore(queryRawTerms: Seq[String]): String = {
    val qlist = queryRawTerms.map(lit).mkString(",")
    val nq = math.max(queryRawTerms.size, 1)
    s"""WITH rt AS (
       |  SELECT d.doc_id, t.term
       |  FROM documents d, unnest(regexp_extract_all(lower(d.text), '[\\p{L}\\p{Nd}]+')) AS t(term)),
       |agg AS (
       |  SELECT doc_id,
       |    CAST(count(DISTINCT CASE WHEN term IN ($qlist) THEN term END) AS DOUBLE) AS ov,
       |    CAST(count(*) AS BIGINT) AS n,
       |    max(CASE WHEN term = 'slow' THEN 1 ELSE 0 END) AS failed
       |  FROM rt GROUP BY 1)
       |SELECT d.doc_id,
       |  round(CASE WHEN agg.doc_id IS NULL OR agg.failed = 1 THEN 0.0
       |             ELSE least(1.0, greatest(0.0, agg.ov / $nq + agg.n / 200.0)) END, 4) AS lm_score
       |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** O16: mock-LM top-N. */
  def lmRank(queryRawTerms: Seq[String], k: Int): String = {
    val inner = lmScore(queryRawTerms)
    s"""SELECT doc_id, lm_score FROM ($inner) t
       |ORDER BY lm_score DESC, doc_id LIMIT $k""".stripMargin
  }
}
