package graft.oracle

import graft.analysis.{StopWords, TextHash}

/** DuckDB oracle SQL for the training-data pipeline ops (TextOps /
  * VectorOps). Same parity contract as OracleSql. */
object OracleSqlOps {

  private def lit(s: String) = "'" + s.replace("'", "''") + "'"
  private def inList(set: Set[String]): String = set.toSeq.sorted.map(lit).mkString(",")
  private lazy val en = inList(StopWords.english)
  private lazy val fr = inList(StopWords.french)
  private lazy val de = inList(StopWords.german)
  private lazy val es = inList(StopWords.langIdSpanish)
  private lazy val it = inList(StopWords.langIdItalian)

  /** Raw tokens (stopwords kept) — mirror of Analyzer.tokenizeRaw. */
  private val rawToks =
    """rt AS (
      |  SELECT d.doc_id, t.term
      |  FROM documents d, unnest(regexp_extract_all(lower(d.text), '[\p{L}\p{Nd}]+')) AS t(term))""".stripMargin

  /** polyHash31 of a string expression, as SQL. */
  private def polyHash(expr: String): String =
    s"list_reduce(list_transform(string_split($expr, ''), x -> CAST(ascii(x) AS BIGINT)), (a, b) -> (a*31 + b) % 2147483647)"

  /** Mirror of TextOps.r4: half-up 4-dp rounding of the integer ratio
    * num/den in pure integer arithmetic (DuckDB `//` truncates = floor for
    * non-negative operands, same as Spark's `div`) — immune to the
    * round(x,4) half-way-tie divergence between the engines. */
  private def r4Sql(num: String, den: String): String =
    s"CAST((($num) * 20000 + ($den)) // (2 * ($den)) AS DOUBLE) / 10000"

  /** Distinct 3-word shingles per doc. */
  private val shingleCtes =
    """arrs AS (SELECT doc_id, regexp_extract_all(lower(text), '[\p{L}\p{Nd}]+') AS a FROM documents),
      |dsh AS (
      |  SELECT DISTINCT doc_id, s FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(a) - 1),
      |                   i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS s
      |    FROM arrs) t)""".stripMargin

  def tokenCount: String =
    """SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '[\p{L}\p{Nd}]+')) AS BIGINT) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Whitespace fields + BPE-ish pieces (mirror of TextOps.tokenPieces;
    * same explicit character classes — see the Java/RE2 \s caveat there). */
  def tokenPieces: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[^ \t\n\r]+')) AS BIGINT) AS n_ws,
      |  CAST(len(regexp_extract_all(lower(text), '[\p{L}]+|[\p{Nd}]+|[^\p{L}\p{Nd} \t\n\r]')) AS BIGINT) AS n_pieces
      |FROM documents ORDER BY doc_id""".stripMargin

  def langId: String =
    s"""WITH $rawToks,
       |v AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN term IN ($en) THEN 1 ELSE 0 END) AS en,
       |    sum(CASE WHEN term IN ($fr) THEN 1 ELSE 0 END) AS fr,
       |    sum(CASE WHEN term IN ($de) THEN 1 ELSE 0 END) AS de,
       |    sum(CASE WHEN term IN ($es) THEN 1 ELSE 0 END) AS es,
       |    sum(CASE WHEN term IN ($it) THEN 1 ELSE 0 END) AS it
       |  FROM rt GROUP BY 1)
       |SELECT d.doc_id,
       |  CASE WHEN v.doc_id IS NULL OR (v.en = 0 AND v.fr = 0 AND v.de = 0 AND v.es = 0 AND v.it = 0) THEN 'und'
       |       WHEN v.en >= v.fr AND v.en >= v.de AND v.en >= v.es AND v.en >= v.it THEN 'en'
       |       WHEN v.fr >= v.de AND v.fr >= v.es AND v.fr >= v.it THEN 'fr'
       |       WHEN v.de >= v.es AND v.de >= v.it THEN 'de'
       |       WHEN v.es >= v.it THEN 'es' ELSE 'it' END AS pred_lang
       |FROM documents d LEFT JOIN v ON v.doc_id = d.doc_id ORDER BY d.doc_id""".stripMargin

  def quality: String =
    s"""WITH $rawToks,
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
       |    sum(CASE WHEN term IN ($en) THEN 1 ELSE 0 END) AS stop,
       |    count(DISTINCT term) AS dn
       |  FROM rt GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens,
       |  CASE WHEN agg.n > 0 THEN ${r4Sql("agg.stop", "agg.n")} ELSE 0.0 END AS stop_ratio,
       |  CASE WHEN agg.n > 0 THEN ${r4Sql("agg.dn * (agg.n - agg.stop)", "agg.n * agg.n")} ELSE 0.0 END AS quality
       |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id ORDER BY d.doc_id""".stripMargin

  /** Mirror of TextOps.repetition: bigram multiset diagnostics. */
  def repetition: String =
    s"""WITH arrs AS (SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{Nd}]+') AS a FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS g
      |  FROM arrs),
      |cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS dn, max(c) AS mx FROM cnt GROUP BY 1)
      |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bigrams,
      |  CASE WHEN agg.n > 0 THEN ${r4Sql("agg.n - agg.dn", "agg.n")} ELSE 0.0 END AS dup_frac,
      |  CASE WHEN agg.n > 0 THEN ${r4Sql("agg.mx", "agg.n")} ELSE 0.0 END AS top_frac
      |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id ORDER BY d.doc_id""".stripMargin

  /** Mirror of TextOps.decontaminate: distinct-shingle overlap with the
    * doc_id % evalMod == evalRem eval slice. */
  def decontaminate(evalMod: Long, evalRem: Long): String =
    s"""WITH $shingleCtes,
       |hh AS (SELECT doc_id, ${polyHash("s")} AS h FROM dsh),
       |ev AS (SELECT DISTINCT h FROM hh WHERE doc_id % $evalMod = $evalRem)
       |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
       |FROM hh t JOIN ev ON ev.h = t.h
       |WHERE t.doc_id % $evalMod <> $evalRem
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Mirror of TextOps.stratifiedSample: integer thresholds precomputed the
    * same way (round(rate·10000)), hash over 'smpl:' || doc_id. */
  def stratifiedSample(rates: Map[String, Double], defaultRate: Double): String = {
    // empty rates → the bare default threshold ("CASE ELSE n END" is a
    // DuckDB syntax error; the Spark side's foldLeft degenerates the same way)
    val thr =
      if (rates.isEmpty) s"${math.round(defaultRate * 10000)}"
      else {
        val whens = rates.toSeq.sorted
          .map { case (src, r) => s"WHEN source = ${lit(src)} THEN ${math.round(r * 10000)}" }
          .mkString(" ")
        s"CASE $whens ELSE ${math.round(defaultRate * 10000)} END"
      }
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source,
       |    ${polyHash("'smpl:' || CAST(doc_id AS VARCHAR)")} AS h,
       |    $thr AS thr
       |  FROM documents) t
       |WHERE h % 10000 < thr ORDER BY doc_id""".stripMargin
  }

  /** Mirror of TextOps.filterPipeline: the composed keep predicate over
    * round-4 quality/dup_frac, function-word lang vote, token count. */
  def filterPipeline(keepLangs: Set[String], minTokens: Long,
                     minQuality: Double, maxDupFrac: Double): String = {
    // empty keepLangs → FALSE: "IN ()" is a DuckDB syntax error, and the
    // Spark side generates lit(false) for the same case
    val langPred =
      if (keepLangs.isEmpty) "FALSE"
      else s"pred_lang IN (${keepLangs.toSeq.sorted.map(lit).mkString(",")})"
    s"""WITH $rawToks,
       |v AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN term IN ($en) THEN 1 ELSE 0 END) AS en,
       |    sum(CASE WHEN term IN ($fr) THEN 1 ELSE 0 END) AS fr,
       |    sum(CASE WHEN term IN ($de) THEN 1 ELSE 0 END) AS de,
       |    sum(CASE WHEN term IN ($es) THEN 1 ELSE 0 END) AS es,
       |    sum(CASE WHEN term IN ($it) THEN 1 ELSE 0 END) AS it
       |  FROM rt GROUP BY 1),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
       |    sum(CASE WHEN term IN ($en) THEN 1 ELSE 0 END) AS stop,
       |    count(DISTINCT term) AS dn
       |  FROM rt GROUP BY 1),
       |arrs AS (SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{Nd}]+') AS a FROM documents),
       |bg AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS g
       |  FROM arrs),
       |cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
       |bagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb, count(*) AS dnb FROM cnt GROUP BY 1),
       |base AS (
       |  SELECT d.doc_id,
       |    CASE WHEN v.doc_id IS NULL OR (v.en = 0 AND v.fr = 0 AND v.de = 0 AND v.es = 0 AND v.it = 0) THEN 'und'
       |         WHEN v.en >= v.fr AND v.en >= v.de AND v.en >= v.es AND v.en >= v.it THEN 'en'
       |         WHEN v.fr >= v.de AND v.fr >= v.es AND v.fr >= v.it THEN 'fr'
       |         WHEN v.de >= v.es AND v.de >= v.it THEN 'de'
       |         WHEN v.es >= v.it THEN 'es' ELSE 'it' END AS pred_lang,
       |    CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens,
       |    CASE WHEN agg.n > 0 THEN ${r4Sql("agg.dn * (agg.n - agg.stop)", "agg.n * agg.n")} ELSE 0.0 END AS quality,
       |    CASE WHEN bagg.nb > 0 THEN ${r4Sql("bagg.nb - bagg.dnb", "bagg.nb")} ELSE 0.0 END AS dup_frac
       |  FROM documents d
       |  LEFT JOIN v ON v.doc_id = d.doc_id
       |  LEFT JOIN agg ON agg.doc_id = d.doc_id
       |  LEFT JOIN bagg ON bagg.doc_id = d.doc_id)
       |SELECT doc_id, pred_lang, n_tokens, quality, dup_frac,
       |  ($langPred AND n_tokens >= $minTokens
       |   AND quality >= $minQuality AND dup_frac <= $maxDupFrac) AS keep
       |FROM base ORDER BY doc_id""".stripMargin
  }

  def fingerprint: String =
    s"""SELECT doc_id, CAST(${polyHash("lower(text)")} AS BIGINT) AS fp
       |FROM documents ORDER BY doc_id""".stripMargin

  def dedupExact: String =
    s"""WITH $rawToks,
       |sig AS (SELECT doc_id, md5(string_agg(DISTINCT term, ' ' ORDER BY term)) AS sig FROM rt GROUP BY 1)
       |SELECT sig, CAST(count(*) AS BIGINT) AS cnt, CAST(min(doc_id) AS BIGINT) AS keep_id
       |FROM sig GROUP BY sig HAVING count(*) > 1 ORDER BY sig""".stripMargin

  def simHash: String =
    s"""WITH $rawToks,
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM rt GROUP BY 1, 2),
       |h AS (SELECT doc_id, tf, ${polyHash("term")} AS th1,
       |      ${polyHash("'#' || term")} AS th2, ${polyHash("'##' || term")} AS th3 FROM tf),
       |bits AS (
       |  SELECT doc_id, j.j,
       |    CASE WHEN sum(CASE WHEN (CASE WHEN j.j < 31 THEN (th1 >> CAST(j.j AS INT))
       |                                  WHEN j.j < 62 THEN (th2 >> CAST(j.j - 31 AS INT))
       |                                  ELSE th3 END) & 1 = 1 THEN tf ELSE -tf END) > 0
       |         THEN 1 ELSE 0 END AS b
       |  FROM h CROSS JOIN range(0, 63) j(j) GROUP BY 1, 2)
       |SELECT doc_id, CAST(sum(b * (CAST(1 AS BIGINT) << CAST(j AS INT))) AS BIGINT) AS simhash
       |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** SimHash banded near-dup pairs — the SQL mirror of TextOps.simHashPairs
    * (4 bands of 16/16/16/15 bits over the 63-bit simhash, hamming verify
    * via bit_count(xor)). */
  /** CTE chain ending in `shp` (a, b, hamming) — the SimHash banded
    * near-dup pairs, shared by simHashPairs and nearDupEdit. */
  private def simHashPairCtes(maxHam: Int): String =
    s"""sim AS (${simHash.replace("ORDER BY doc_id", "")}),
       |shbands AS (
       |  SELECT doc_id, simhash, b.b AS band, (simhash >> CAST(b.b * 16 AS INT)) % 65536 AS key
       |  FROM sim CROSS JOIN range(0, 4) b(b)),
       |shcand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.simhash AS sa, y.simhash AS sb
       |  FROM shbands x JOIN shbands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |shp AS (
       |  SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |  FROM shcand WHERE bit_count(xor(sa, sb)) <= $maxHam)""".stripMargin

  def simHashPairs(maxHam: Int): String =
    s"""WITH ${simHashPairCtes(maxHam)}
       |SELECT a, b, hamming FROM shp ORDER BY a, b""".stripMargin

  /** Mirror of TextOps.nearDupEdit: edit-distance verify over the SimHash
    * candidate pairs (the Spark side's banded-threshold Levenshtein equals
    * the plain distance on every row the ≤ maxEdit cut keeps). */
  def nearDupEdit(maxHam: Int, maxEdit: Int): String =
    s"""WITH ${simHashPairCtes(maxHam)}
       |SELECT p.a, p.b, p.hamming,
       |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
       |FROM shp p
       |JOIN documents da ON da.doc_id = p.a
       |JOIN documents db ON db.doc_id = p.b
       |WHERE levenshtein(da.text, db.text) <= $maxEdit
       |ORDER BY p.a, p.b""".stripMargin

  /** Strided-chunk CTEs; yields `ch` (doc_id, chunk_id, n, chunk). */
  private def chunkCtes(window: Int, stride: Int): String =
    s"""arrs AS (SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{Nd}]+') AS a FROM documents),
       |st AS (SELECT doc_id, a, unnest(range(0, len(a), $stride)) AS s FROM arrs),
       |ch AS (
       |  SELECT doc_id, s // $stride AS chunk_id,
       |    least(s + $window, len(a)) - s AS n,
       |    array_to_string(a[s + 1 : least(s + $window, len(a))], ' ') AS chunk
       |  FROM st)""".stripMargin

  /** Mirror of TextOps.chunks: strided fixed-window token chunks with the
    * polyHash31 chunk key. */
  def chunks(window: Int, stride: Int): String =
    s"""WITH ${chunkCtes(window, stride)}
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(n AS BIGINT) AS n_chunk_tokens, ${polyHash("chunk")} AS chunk_hash
       |FROM ch ORDER BY doc_id, chunk_id""".stripMargin

  /** Mirror of TextOps.packChunks: concat-and-split sequence packing —
    * each chunk's start offset in the (doc_id, chunk_id)-ordered token
    * stream, divided into `budget`-token bins. (The oracle's global
    * window IS the single-partition formulation the Spark side replaces
    * with a two-pass prefix sum; fine at oracle scale.) */
  def packChunks(window: Int, stride: Int, budget: Long): String =
    s"""WITH ${chunkCtes(window, stride)},
       |ord AS (
       |  SELECT doc_id, chunk_id, n,
       |    sum(n) OVER (ORDER BY doc_id, chunk_id ROWS UNBOUNDED PRECEDING) - n AS start
       |  FROM ch)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(start // $budget AS BIGINT) AS bin,
       |  CAST(start % $budget AS BIGINT) AS off
       |FROM ord ORDER BY doc_id, chunk_id""".stripMargin

  /** Mirror of TextOps.pmi: adjacent-bigram PMI in integer micro-units
    * (each log is of one ratio ≥ 1 of two exact BIGINTs, rounded to 1e-4
    * before the exact integer sum — the surprisal parity recipe). */
  def pmi(minCount: Long): String =
    s"""WITH arrs AS (SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{Nd}]+') AS a FROM documents),
       |uni AS (SELECT t.w, count(*) AS c
       |        FROM arrs, unnest(a) AS t(w) GROUP BY 1),
       |bgc AS (
       |  SELECT g[1] AS w1, g[2] AS w2, count(*) AS n_ab FROM (
       |    SELECT unnest(list_transform(range(1, len(a)), i -> [a[i], a[i+1]])) AS g
       |    FROM arrs) t GROUP BY 1, 2),
       |tot AS (SELECT (SELECT sum(c) FROM uni) AS tu, (SELECT sum(n_ab) FROM bgc) AS tb)
       |SELECT b.w1, b.w2, CAST(b.n_ab AS BIGINT) AS n_ab,
       |  CAST(round(10000.0 * ln(CAST(t.tu AS DOUBLE) / u1.c))
       |     + round(10000.0 * ln(CAST(t.tu AS DOUBLE) / u2.c))
       |     - round(10000.0 * ln(CAST(t.tb AS DOUBLE) / b.n_ab)) AS DOUBLE) / 10000 AS pmi
       |FROM bgc b
       |JOIN uni u1 ON u1.w = b.w1
       |JOIN uni u2 ON u2.w = b.w2
       |CROSS JOIN tot t
       |WHERE b.n_ab >= $minCount
       |ORDER BY b.w1, b.w2""".stripMargin

  /** Mirror of TextOps.dedupIncremental: new-batch docs (doc_id % mod =
    * rem) colliding with ≥ 1 old doc in a MinHash band bucket. */
  def dedupIncremental(batchMod: Long, batchRem: Long,
      cfg: graft.ops.SimilarityConfig = graft.ops.SimilarityConfig.Default): String =
    s"""WITH $shingleCtes,
       |${minHashBandCtes(cfg)},
       |inc AS (
       |  SELECT DISTINCT n.doc_id AS doc_id, o.doc_id AS old_id
       |  FROM bands n JOIN bands o ON n.band = o.band AND n.key = o.key
       |  WHERE n.doc_id % $batchMod = $batchRem AND o.doc_id % $batchMod <> $batchRem)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dups, min(old_id) AS first_dup
       |FROM inc GROUP BY 1 ORDER BY 1""".stripMargin

  private def permsValues(k: Int): String =
    (0 until k)
      .map(i => s"(${i}, ${TextHash.MinHashA(i)}, ${TextHash.MinHashB(i)})")
      .mkString(", ")

  /** MinHash band CTEs (expects `dsh` in scope); yields `bands`
    * (doc_id, band, key) — the bucket table minHashCandCtes and
    * dedupIncremental both build on. Takes the SAME SimilarityConfig as
    * the Spark ops. */
  private def minHashBandCtes(cfg: graft.ops.SimilarityConfig): String =
    s"""h AS (SELECT doc_id, ${polyHash("s")} AS th FROM dsh),
       |perms AS (SELECT * FROM (VALUES ${permsValues(cfg.minHashK)}) p(i, a, b)),
       |sig AS (SELECT doc_id, p.i, min((p.a * th + p.b) % 2147483647) AS mh
       |        FROM h CROSS JOIN perms p GROUP BY 1, 2),
       |bands AS (
       |  SELECT s1.doc_id, s1.i // 2 AS band, s1.mh * 2147483647 + s2.mh AS key
       |  FROM sig s1 JOIN sig s2 ON s1.doc_id = s2.doc_id AND s2.i = s1.i + 1
       |  WHERE s1.i % 2 = 0)""".stripMargin

  /** MinHash band-bucket CTEs (expects `dsh` in scope); yields `mhcand`
    * (a, b) candidate pairs — shared by minHashPairs and ngramJaccard. */
  private def minHashCandCtes(cfg: graft.ops.SimilarityConfig): String =
    s"""${minHashBandCtes(cfg)},
       |mhcand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)""".stripMargin

  def minHashPairs(
      cfg: graft.ops.SimilarityConfig = graft.ops.SimilarityConfig.Default): String =
    s"""WITH $shingleCtes,
       |${minHashCandCtes(cfg)}
       |SELECT a, b FROM mhcand ORDER BY a, b""".stripMargin

  /** Mirror of TextOps.dupClusters: component label = min doc_id reachable
    * over the candidate-pair graph, via a recursive transitive closure
    * (fine at oracle scale; the Spark side iterates min-propagation). */
  def dupClusters(
      cfg: graft.ops.SimilarityConfig = graft.ops.SimilarityConfig.Default): String =
    s"""WITH RECURSIVE $shingleCtes,
       |${minHashCandCtes(cfg)},
       |edges AS (SELECT a AS u, b AS v FROM mhcand UNION ALL SELECT b AS u, a AS v FROM mhcand),
       |reach(id, r) AS (
       |  SELECT DISTINCT u, u FROM edges
       |  UNION
       |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v)
       |SELECT id AS doc_id, min(r) AS cluster, (id = min(r)) AS keep
       |FROM reach GROUP BY id ORDER BY id""".stripMargin

  def ngramJaccard(minJ: Double,
      cfg: graft.ops.SimilarityConfig = graft.ops.SimilarityConfig.Default): String =
    s"""WITH $shingleCtes,
       |${minHashCandCtes(cfg)},
       |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM dsh GROUP BY 1),
       |cand AS (
       |  SELECT c.a, c.b, x.n AS na, y.n AS nb
       |  FROM mhcand c JOIN m x ON x.doc_id = c.a JOIN m y ON y.doc_id = c.b),
       |inter AS (
       |  SELECT c.a, c.b, c.na, c.nb, CAST(count(*) AS BIGINT) AS i
       |  FROM cand c
       |  JOIN dsh da ON da.doc_id = c.a
       |  JOIN dsh db ON db.doc_id = c.b AND db.s = da.s
       |  GROUP BY 1, 2, 3, 4)
       |SELECT a, b, ${r4Sql("i", "na + nb - i")} AS jaccard
       |FROM inter WHERE CAST(i AS DOUBLE) / (na + nb - i) >= $minJ
       |ORDER BY a, b""".stripMargin

  /** Mirror of TextOps.containment: the ngramJaccard CTEs, but the
    * asymmetric Broder containment in both directions, kept when either
    * direction reaches minC. */
  def containment(minC: Double,
      cfg: graft.ops.SimilarityConfig = graft.ops.SimilarityConfig.Default): String =
    s"""WITH $shingleCtes,
       |${minHashCandCtes(cfg)},
       |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM dsh GROUP BY 1),
       |cand AS (
       |  SELECT c.a, c.b, x.n AS na, y.n AS nb
       |  FROM mhcand c JOIN m x ON x.doc_id = c.a JOIN m y ON y.doc_id = c.b),
       |inter AS (
       |  SELECT c.a, c.b, c.na, c.nb, CAST(count(*) AS BIGINT) AS i
       |  FROM cand c
       |  JOIN dsh da ON da.doc_id = c.a
       |  JOIN dsh db ON db.doc_id = c.b AND db.s = da.s
       |  GROUP BY 1, 2, 3, 4)
       |SELECT a, b, ${r4Sql("i", "na")} AS cont_ab, ${r4Sql("i", "nb")} AS cont_ba
       |FROM inter
       |WHERE greatest(CAST(i AS DOUBLE) / na, CAST(i AS DOUBLE) / nb) >= $minC
       |ORDER BY a, b""".stripMargin

  /** Multimodal metadata: the closed-form synth formulas (Multimodal
    * imageDims/audioParams/videoDims + header byte counts) recomputed from
    * doc_id — the Spark side must recover the same values by PARSING the
    * container bytes, so this oracle checks the decode path. */
  def mmFeatures: String =
    s"""SELECT doc_id,
       |  CASE WHEN doc_id % 4 = 0 OR doc_id % 4 = 3 THEN 'image'
       |       WHEN doc_id % 4 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |  CAST(CASE WHEN doc_id % 4 = 0 THEN 33 WHEN doc_id % 4 = 1 THEN 44
       |            WHEN doc_id % 4 = 2 THEN 88 ELSE 33 END
       |       + strlen(text) AS BIGINT) AS n_bytes,
       |  CAST(CASE WHEN doc_id % 4 = 0 THEN 160 + (doc_id * 7) % 800
       |            WHEN doc_id % 4 = 1 THEN 8000 + 1000 * (doc_id % 5)
       |            WHEN doc_id % 4 = 2 THEN 320 + (doc_id * 11) % 1280
       |            ELSE 64 + (doc_id * 5) % 2048 END AS BIGINT) AS width,
       |  CAST(CASE WHEN doc_id % 4 = 0 THEN 90 + (doc_id * 13) % 600
       |            WHEN doc_id % 4 = 1 THEN 1 + doc_id % 2
       |            WHEN doc_id % 4 = 2 THEN 240 + (doc_id * 17) % 720
       |            ELSE 48 + (doc_id * 3) % 1536 END AS BIGINT) AS height
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- embeddings -----------------------------------------------------------

  private def cosAgg(vecA: String, vecB: String): String =
    s"""sum(CAST($vecA AS DOUBLE) * CAST($vecB AS DOUBLE)) AS dot,
       |    sqrt(sum(CAST($vecA AS DOUBLE) * CAST($vecA AS DOUBLE))) AS na,
       |    sqrt(sum(CAST($vecB AS DOUBLE) * CAST($vecB AS DOUBLE))) AS nb""".stripMargin

  /** Mirror of VectorOps.cosTopKFiltered: exact cosine top-k over the
    * label-filtered candidate slice (the query vector is unfiltered). */
  def cosTopKFiltered(targetId: Long, label: Int, k: Int): String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $targetId),
       |c AS (
       |  SELECT v.vec_id,
       |    ${cosAgg("v.embedding[i.i]", "q.qe[i.i]")}
       |  FROM embeddings v CROSS JOIN q CROSS JOIN range(1, 65) i(i)
       |  WHERE v.label = $label
       |  GROUP BY v.vec_id)
       |SELECT vec_id, round(dot / (na * nb), 4) AS cos FROM c
       |ORDER BY round(dot / (na * nb), 4) DESC, vec_id LIMIT $k""".stripMargin

  /** Mirror of TextOps.surprisal: corpus-unigram mean surprisal with
    * integer micro-unit contributions and r4 rounding of the mean. */
  def surprisal: String =
    s"""WITH $rawToks,
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM rt GROUP BY 1, 2),
       |ctf AS (SELECT term, sum(tf) AS ctf FROM tf GROUP BY 1),
       |tot AS (SELECT sum(tf) AS total FROM tf),
       |s AS (
       |  SELECT tf.doc_id,
       |    sum(tf.tf * CAST(round(10000 * ln(CAST(tot.total AS DOUBLE) / ctf.ctf)) AS BIGINT)) AS ssum,
       |    sum(tf.tf) AS n
       |  FROM tf JOIN ctf ON ctf.term = tf.term CROSS JOIN tot GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(s.n, 0) AS BIGINT) AS n_tokens,
       |  CASE WHEN s.n > 0 THEN ${r4Sql("s.ssum", "s.n * 10000")} ELSE 0.0 END AS surprisal
       |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id ORDER BY d.doc_id""".stripMargin

  /** Mirror of TextOps.dedupApply: docs surviving near-dup clustering
    * (non-clustered docs + each component's min-id representative). */
  def dedupApply(
      cfg: graft.ops.SimilarityConfig = graft.ops.SimilarityConfig.Default): String =
    s"""WITH RECURSIVE $shingleCtes,
       |${minHashCandCtes(cfg)},
       |edges AS (SELECT a AS u, b AS v FROM mhcand UNION ALL SELECT b AS u, a AS v FROM mhcand),
       |reach(id, r) AS (
       |  SELECT DISTINCT u, u FROM edges
       |  UNION
       |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
       |dropids AS (SELECT id FROM reach GROUP BY id HAVING id <> min(r))
       |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM dropids)
       |ORDER BY doc_id""".stripMargin

  /** Mirror of DocQueries.rankEval: MRR@k / nDCG@k of the BM25 top-k vs
    * the conjunctive relevance set of `labelTerms`; integer micro-unit
    * DCG gains and the tie-free r4 rounding on both ratios. */
  def rankEval(terms: Seq[(String, Int)], labelTerms: Seq[String],
               p: graft.query.Bm25.Params, k: Int): String = {
    val vals = labelTerms.map(t => s"(${lit(t)})").mkString(", ")
    s"""WITH ${OracleSql.baseCtes},
       |${OracleSql.scoredCte(terms, p)},
       |ranked AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS r
       |  FROM scored ORDER BY round(score, 4) DESC, doc_id LIMIT $k),
       |rel AS (
       |  SELECT tf.doc_id FROM tf
       |  JOIN (VALUES $vals) AS qt(term) ON qt.term = tf.term
       |  GROUP BY tf.doc_id HAVING count(DISTINCT tf.term) = ${labelTerms.size}),
       |nrel AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rel),
       |hits AS (SELECT r FROM ranked JOIN rel USING (doc_id)),
       |dcg AS (SELECT coalesce(sum(CAST(round(1000000 / log2(r + 1)) AS BIGINT)), 0) AS d,
       |               min(r) AS fr FROM hits),
       |idcg AS (
       |  SELECT coalesce(sum(CAST(round(1000000 / log2(t.i + 1)) AS BIGINT)), 0) AS d
       |  FROM range(1, $k + 1) t(i), nrel WHERE t.i <= least(nrel.n, $k))
       |SELECT nrel.n AS n_rel,
       |  CASE WHEN dcg.fr IS NULL THEN 0.0 ELSE ${r4Sql("1", "dcg.fr")} END AS mrr,
       |  CASE WHEN idcg.d = 0 THEN 0.0 ELSE ${r4Sql("dcg.d", "idcg.d")} END AS ndcg
       |FROM nrel, dcg, idcg""".stripMargin
  }

  /** Mirror of DocQueries.hybridTopK: RRF fusion of the BM25 top-m and
    * cosine top-m rankings, contributions as round(1e4/(60+rank))
    * integers, cut on (fused, doc_id). */
  def hybridTopK(terms: Seq[(String, Int)], p: graft.query.Bm25.Params,
                 targetId: Long, m: Int, k: Int): String =
    s"""WITH ${OracleSql.baseCtes},
       |${OracleSql.scoredCte(terms, p)},
       |bm AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rb
       |  FROM scored ORDER BY round(score, 4) DESC, doc_id LIMIT $m),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $targetId),
       |c AS (
       |  SELECT v.vec_id,
       |    ${cosAgg("v.embedding[i.i]", "q.qe[i.i]")}
       |  FROM embeddings v CROSS JOIN q CROSS JOIN range(1, 65) i(i)
       |  GROUP BY v.vec_id),
       |cs AS (
       |  SELECT vec_id AS doc_id,
       |    row_number() OVER (ORDER BY round(dot / (na * nb), 4) DESC, vec_id) AS rc
       |  FROM c ORDER BY round(dot / (na * nb), 4) DESC, vec_id LIMIT $m),
       |f AS (
       |  SELECT coalesce(bm.doc_id, cs.doc_id) AS doc_id,
       |    coalesce(CAST(round(10000.0 / (bm.rb + 60)) AS BIGINT), 0)
       |  + coalesce(CAST(round(10000.0 / (cs.rc + 60)) AS BIGINT), 0) AS w
       |  FROM bm FULL OUTER JOIN cs ON cs.doc_id = bm.doc_id)
       |SELECT doc_id, CAST(w AS DOUBLE) / 10000 AS rrf FROM f
       |ORDER BY w DESC, doc_id LIMIT $k""".stripMargin

  def cosTopK(targetId: Long, k: Int): String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $targetId),
       |c AS (
       |  SELECT v.vec_id,
       |    ${cosAgg("v.embedding[i.i]", "q.qe[i.i]")}
       |  FROM embeddings v CROSS JOIN q CROSS JOIN range(1, 65) i(i)
       |  GROUP BY v.vec_id)
       |SELECT vec_id, round(dot / (na * nb), 4) AS cos FROM c
       |ORDER BY round(dot / (na * nb), 4) DESC, vec_id LIMIT $k""".stripMargin

  /** Quantized milli-unit vectors (integer arithmetic ⇒ order-independent
    * sums ⇒ bit-identical bucketing decisions in both engines). Mirrors
    * VectorOps.quantize. */
  private val quantCte =
    """qv AS (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |FROM embeddings)""".stripMargin

  /** k-means CTE chain mirroring VectorOps.trainCentroids: seed = K
    * smallest vec_ids; `iters` Lloyd rounds of integer-L2 assignment +
    * round(avg) centroid update (empty cluster keeps its centroid); final
    * assignment `afin` against the last centroids `cfin`. */
  private def kmeansCtes(kk: Int, iters: Int): String = {
    val sb = new StringBuilder
    // (callers require !kmeansParSeeding — this CTE chain mirrors only the
    // naive vec_id seed; the ‖ sampling is a multi-round driver loop)
    sb.append(
      s"""c0 AS (SELECT rn - 1 AS k, q AS c FROM (
         |  SELECT vec_id, q, row_number() OVER (ORDER BY vec_id) AS rn FROM qv) WHERE rn <= $kk)""".stripMargin)
    def distAssign(n: Int, cPrev: String): String =
      s""",
         |d$n AS (SELECT v.vec_id, c.k, sum((v.q[i.i] - c.c[i.i]) * (v.q[i.i] - c.c[i.i])) AS d
         |       FROM qv v CROSS JOIN $cPrev c CROSS JOIN range(1, 65) i(i) GROUP BY 1, 2),
         |a$n AS (SELECT vec_id, k FROM (
         |  SELECT vec_id, k, row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS rn FROM d$n) WHERE rn = 1)""".stripMargin
    for (it <- 1 to iters) {
      sb.append(distAssign(it, s"c${it - 1}"))
      sb.append(
        s""",
           |u$it AS (SELECT a.k, i.i AS j, CAST(round(avg(v.q[i.i])) AS BIGINT) AS cj
           |       FROM a$it a JOIN qv v ON v.vec_id = a.vec_id CROSS JOIN range(1, 65) i(i) GROUP BY 1, 2),
           |c$it AS (SELECT cp.k, coalesce(nc.c, cp.c) AS c
           |       FROM c${it - 1} cp LEFT JOIN (
           |         SELECT k, list(cj ORDER BY j) AS c FROM u$it GROUP BY k) nc ON nc.k = cp.k)""".stripMargin)
    }
    sb.append(distAssign(iters + 1, s"c$iters"))
    sb.append(s",\ncfin AS (SELECT * FROM c$iters),\nafin AS (SELECT * FROM a${iters + 1})")
    sb.toString
  }

  /** Mirror of VectorOps.embedCluster: final k-means assignment (K/iters
    * referenced from VectorOps so a constant change cannot silently break
    * Spark↔oracle parity). */
  def embedCluster(
      cfg: graft.ops.SimilarityConfig = graft.ops.SimilarityConfig.Default): String = {
    require(!cfg.kmeansParSeeding,
      "oracle SQL mirrors the naive vec_id seed only (k-means‖ is spec-verified, not SQL-expressible)")
    s"""WITH $quantCte,
       |${kmeansCtes(cfg.kmeansK, cfg.kmeansIters)}
       |SELECT vec_id, CAST(k AS INT) AS k FROM afin ORDER BY vec_id""".stripMargin
  }

  def annIvf(targetId: Long, k: Int, nprobe: Int,
      cfg: graft.ops.SimilarityConfig = graft.ops.SimilarityConfig.Default): String = {
    require(!cfg.kmeansParSeeding,
      "oracle SQL mirrors the naive vec_id seed only (k-means‖ is spec-verified, not SQL-expressible)")
    s"""WITH $quantCte,
       |${kmeansCtes(cfg.kmeansK, cfg.kmeansIters)},
       |tq AS (SELECT q FROM qv WHERE vec_id = $targetId),
       |pd AS (SELECT c.k, sum((t.q[i.i] - c.c[i.i]) * (t.q[i.i] - c.c[i.i])) AS d
       |       FROM cfin c CROSS JOIN tq t CROSS JOIN range(1, 65) i(i) GROUP BY 1),
       |probed AS (SELECT k FROM (
       |  SELECT k, row_number() OVER (ORDER BY d, k) AS rn FROM pd) WHERE rn <= $nprobe),
       |qe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $targetId),
       |cx AS (
       |  SELECT v.vec_id,
       |    ${cosAgg("v.embedding[i.i]", "t.qe[i.i]")}
       |  FROM embeddings v JOIN afin a ON a.vec_id = v.vec_id
       |  JOIN probed p ON p.k = a.k
       |  CROSS JOIN qe t CROSS JOIN range(1, 65) i(i)
       |  GROUP BY v.vec_id)
       |SELECT vec_id, round(dot / (na * nb), 4) AS cos FROM cx
       |ORDER BY round(dot / (na * nb), 4) DESC, vec_id LIMIT $k""".stripMargin
  }

  /** Product-quantization CTE chain mirroring VectorOps.trainPqCodebooks +
    * the final code assignment: seed codebook entry (m, k) = subspace-m
    * slice of the k-th smallest vec_id; `pqIters` Lloyd rounds of
    * integer-L2 sub-assignment (ties → smaller code) + round(avg) update
    * (empty cell keeps its entry); `pcfin` = final codebooks (long format
    * (m, k, j, cj)), `pafin` = final sub-codes (vec_id, m, k). */
  private def pqCtes(cfg: graft.ops.SimilarityConfig): String = {
    val (m0, k0, sub, iters) = (cfg.pqM, cfg.pqK, cfg.pqSub, cfg.pqIters)
    val sb = new StringBuilder
    sb.append(
      s"""pc0 AS (
         |  SELECT m.m AS m, s.rn - 1 AS k, j.j AS j, s.q[m.m * $sub + j.j] AS cj
         |  FROM (SELECT q, row_number() OVER (ORDER BY vec_id) AS rn FROM qv) s
         |  CROSS JOIN range(0, $m0) m(m) CROSS JOIN range(1, ${sub + 1}) j(j)
         |  WHERE s.rn <= $k0)""".stripMargin)
    def distAssign(n: Int, cPrev: String): String =
      s""",
         |pd$n AS (SELECT v.vec_id, c.m, c.k,
         |    sum((v.q[c.m * $sub + c.j] - c.cj) * (v.q[c.m * $sub + c.j] - c.cj)) AS d
         |  FROM qv v CROSS JOIN $cPrev c GROUP BY 1, 2, 3),
         |pa$n AS (SELECT vec_id, m, k FROM (
         |  SELECT vec_id, m, k, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
         |  FROM pd$n) WHERE rn = 1)""".stripMargin
    for (it <- 1 to iters) {
      sb.append(distAssign(it, s"pc${it - 1}"))
      sb.append(
        s""",
           |pu$it AS (SELECT a.m, a.k, j.j AS j,
           |    CAST(round(avg(v.q[a.m * $sub + j.j])) AS BIGINT) AS cj
           |  FROM pa$it a JOIN qv v ON v.vec_id = a.vec_id
           |  CROSS JOIN range(1, ${sub + 1}) j(j) GROUP BY 1, 2, 3),
           |pc$it AS (SELECT cp.m, cp.k, cp.j, coalesce(nu.cj, cp.cj) AS cj
           |  FROM pc${it - 1} cp LEFT JOIN pu$it nu
           |    ON nu.m = cp.m AND nu.k = cp.k AND nu.j = cp.j)""".stripMargin)
    }
    sb.append(distAssign(iters + 1, s"pc$iters"))
    sb.append(s",\npcfin AS (SELECT * FROM pc$iters),\npafin AS (SELECT * FROM pa${iters + 1})")
    sb.toString
  }

  /** ADC + exact-refine tail shared by [[annPq]] and [[annIvfPq]]:
    * `padc` must exist as (vec_id, d2). */
  private def pqRefineTail(targetId: Long, k: Int, refine: Int): String =
    s"""pcand AS (SELECT vec_id FROM (
       |  SELECT vec_id, row_number() OVER (ORDER BY d2, vec_id) AS rn FROM padc)
       |  WHERE rn <= $refine),
       |pqe AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $targetId),
       |pcx AS (
       |  SELECT v.vec_id,
       |    ${cosAgg("v.embedding[i.i]", "t.qe[i.i]")}
       |  FROM embeddings v JOIN pcand p ON p.vec_id = v.vec_id
       |  CROSS JOIN pqe t CROSS JOIN range(1, 65) i(i)
       |  GROUP BY v.vec_id)
       |SELECT vec_id, round(dot / (na * nb), 4) AS cos FROM pcx
       |ORDER BY round(dot / (na * nb), 4) DESC, vec_id LIMIT $k""".stripMargin

  /** Mirror of VectorOps.annPq: flat PQ — ADC over all codes against the
    * query LUT, pqRefine candidates by (d2, vec_id), exact-cosine refine. */
  def annPq(targetId: Long, k: Int,
      cfg: graft.ops.SimilarityConfig = graft.ops.SimilarityConfig.Default): String = {
    val sub = cfg.pqSub
    s"""WITH $quantCte,
       |${pqCtes(cfg)},
       |ptq AS (SELECT q FROM qv WHERE vec_id = $targetId),
       |plut AS (SELECT c.m, c.k,
       |    sum((t.q[c.m * $sub + c.j] - c.cj) * (t.q[c.m * $sub + c.j] - c.cj)) AS d
       |  FROM pcfin c CROSS JOIN ptq t GROUP BY 1, 2),
       |padc AS (SELECT a.vec_id, sum(l.d) AS d2
       |  FROM pafin a JOIN plut l ON l.m = a.m AND l.k = a.k GROUP BY 1),
       |${pqRefineTail(targetId, k, cfg.pqRefine)}""".stripMargin
  }

  /** Mirror of VectorOps.annIvfPq / annIvfPqIndexed: the coarse k-means
    * assignment (kmeansCtes) prunes to the nprobe nearest clusters, ADC
    * runs over only the probed clusters' codes, exact refine re-ranks. */
  def annIvfPq(targetId: Long, k: Int, nprobe: Int,
      cfg: graft.ops.SimilarityConfig = graft.ops.SimilarityConfig.Default): String = {
    require(!cfg.kmeansParSeeding,
      "oracle SQL mirrors the naive vec_id seed only (k-means‖ is spec-verified, not SQL-expressible)")
    val sub = cfg.pqSub
    s"""WITH $quantCte,
       |${kmeansCtes(cfg.kmeansK, cfg.kmeansIters)},
       |${pqCtes(cfg)},
       |ptq AS (SELECT q FROM qv WHERE vec_id = $targetId),
       |cpd AS (SELECT c.k, sum((t.q[i.i] - c.c[i.i]) * (t.q[i.i] - c.c[i.i])) AS d
       |  FROM cfin c CROSS JOIN ptq t CROSS JOIN range(1, 65) i(i) GROUP BY 1),
       |probed AS (SELECT k FROM (
       |  SELECT k, row_number() OVER (ORDER BY d, k) AS rn FROM cpd) WHERE rn <= $nprobe),
       |plut AS (SELECT c.m, c.k,
       |    sum((t.q[c.m * $sub + c.j] - c.cj) * (t.q[c.m * $sub + c.j] - c.cj)) AS d
       |  FROM pcfin c CROSS JOIN ptq t GROUP BY 1, 2),
       |padc AS (SELECT a.vec_id, sum(l.d) AS d2
       |  FROM pafin a
       |  JOIN afin f ON f.vec_id = a.vec_id
       |  JOIN probed p ON p.k = f.k
       |  JOIN plut l ON l.m = a.m AND l.k = a.k GROUP BY 1),
       |${pqRefineTail(targetId, k, cfg.pqRefine)}""".stripMargin
  }

  /** Random-hyperplane LSH candidates + exact-cosine verify; the ±1
    * hyperplane family is the same closed-form LCG as VectorOps.hpSign. */
  def similarPairs(n: Int,
      cfg: graft.ops.SimilarityConfig = graft.ops.SimilarityConfig.Default): String =
    s"""WITH $quantCte,
       |hp AS (
       |  SELECT i, j, CASE WHEN xor(h3, h3 >> 13) % 2 = 1 THEN 1 ELSE -1 END AS s FROM (
       |    SELECT i, j, xor(h1, h1 >> 15) * 69621 % 2147483647 AS h3 FROM (
       |      SELECT i.i AS i, j.j AS j, (i.i * 64 + j.j + 1) * 48271 % 2147483647 AS h1
       |      FROM range(0, ${cfg.lshBits}) i(i) CROSS JOIN range(0, 64) j(j)) t1) t2),
       |dots AS (SELECT v.vec_id, hp.i, sum(v.q[hp.j + 1] * hp.s) AS d
       |         FROM qv v CROSS JOIN hp GROUP BY 1, 2),
       |bits AS (SELECT vec_id, i, CASE WHEN d >= 0 THEN 1 ELSE 0 END AS b FROM dots),
       |bands AS (SELECT vec_id, i // ${cfg.lshRows} AS band,
       |    sum(b * (CAST(1 AS BIGINT) << CAST(${cfg.lshRows - 1} - (i % ${cfg.lshRows}) AS INT))) AS key
       |  FROM bits GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
       |pr AS (
       |  SELECT c.a, c.b,
       |    ${cosAgg("x.embedding[i.i]", "y.embedding[i.i]")}
       |  FROM cand c JOIN embeddings x ON x.vec_id = c.a JOIN embeddings y ON y.vec_id = c.b
       |  CROSS JOIN range(1, 65) i(i)
       |  GROUP BY 1, 2)
       |SELECT a, b, round(dot / (na * nb), 4) AS cos FROM pr
       |ORDER BY round(dot / (na * nb), 4) DESC, a, b LIMIT $n""".stripMargin

  /** Mirror of EventOps.sessionize: gap-based sessions over the events
    * table (gap test on unix MICROSECONDS — exact integer arithmetic in
    * both engines), rolled up to one row per user. */
  def sessionize(gapMinutes: Int): String = {
    val gapUs = gapMinutes * 60000000L
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
       |f AS (
       |  SELECT user_id, us, event_id,
       |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > $gapUs
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |s AS (
       |  SELECT user_id,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sid
       |  FROM f),
       |ps AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS se FROM s GROUP BY 1, 2)
       |SELECT user_id, CAST(sum(se) AS BIGINT) AS n_events,
       |  CAST(count(*) AS BIGINT) AS n_sessions,
       |  CAST(max(se) AS BIGINT) AS max_session_events
       |FROM ps GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** Mirror of EventOps.asOf: most recent prior `rightType` event per
    * user in strict (us, event_id) arrival order, via the same
    * ignore-nulls window — DuckDB's native ASOF JOIN is deliberately NOT
    * used here because it cannot express the event_id tiebreak on equal
    * timestamps. All three prior-event fields come from ONE windowed
    * struct (like Spark's atomic struct-valued last(...)): three
    * independent last_value(CASE...) windows would silently desynchronize
    * if a right-type event ever carried a NULL field. */
  def asOf(rightType: String): String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
       |    CAST(floor(value * 10000) AS BIGINT) AS mv
       |  FROM events),
       |p AS (
       |  SELECT event_id, user_id, us,
       |    last_value(CASE WHEN event_type = ${lit(rightType)}
       |                    THEN struct_pack(eid := event_id, mv := mv, pus := us)
       |               END IGNORE NULLS)
       |      OVER w AS pr
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       |SELECT event_id, user_id,
       |  CAST(coalesce(struct_extract(pr, 'eid'), -1) AS BIGINT) AS prior_event_id,
       |  CAST(coalesce(struct_extract(pr, 'mv'), 0) AS DOUBLE) / 10000 AS prior_value,
       |  CAST(coalesce(us - struct_extract(pr, 'pus'), -1) AS BIGINT) AS gap_us
       |FROM p ORDER BY event_id""".stripMargin

  /** Mirror of EventOps.funnel: per-step frontier CTEs — step k joins the
    * step-(k−1) frontier and keeps events strictly after its time. */
  def funnel(steps: Seq[String]): String = {
    val ctes = steps.zipWithIndex.map { case (s, i) =>
      if (i == 0)
        s"""f1 AS (
           |  SELECT user_id, min(us) AS t FROM e
           |  WHERE event_type = ${lit(s)} GROUP BY 1)"""
      else
        s"""f${i + 1} AS (
           |  SELECT e.user_id, min(e.us) AS t FROM e
           |  JOIN f$i USING (user_id)
           |  WHERE e.event_type = ${lit(s)} AND e.us > f$i.t GROUP BY 1)"""
    }.mkString(",\n")
    val rows = steps.zipWithIndex.map { case (s, i) =>
      s"""SELECT CAST(${i + 1} AS INTEGER) AS step, ${lit(s)} AS event_type,
         |  CAST((SELECT count(*) FROM f${i + 1}) AS BIGINT) AS n_users"""
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
       |$ctes
       |SELECT * FROM (
       |$rows
       |) ORDER BY step""".stripMargin
  }

  /** Mirror of EventOps.eventWindows: tumbling µs windows, values summed
    * as floor(value·10⁴) integer units (floor of an identical IEEE double
    * is engine-identical — no round-half semantics in play). */
  def eventWindows(windowMinutes: Int): String = {
    val wUs = windowMinutes * 60000000L
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS us, event_type,
       |    CAST(floor(value * 10000) AS BIGINT) AS mv
       |  FROM events)
       |SELECT us - us % $wUs AS w_start, event_type,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(mv) AS DOUBLE) / 10000 AS sum_value
       |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Mirror of TextOps.substrDupSpans: n-token shingles keyed by md5 over
    * chr(31)-joined tokens, duplicated keys (count > 1 corpus-wide,
    * within-doc repeats included), gaps-and-islands merge of the
    * overlapping-or-touching [pos, pos+n) intervals per doc. The lag
    * coalesce sentinel is Long.MinValue so the first occurrence in a doc
    * always opens a span (pos ≥ 0 > MinValue is vacuously true). */
  def substrDupSpans(n: Int): String =
    s"""WITH arrs AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{Nd}]+') AS a
       |  FROM documents),
       |sh0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(a) - $n + 2),
       |      i -> {'pos': i - 1, 'key': md5(array_to_string(a[i:i+$n-1], chr(31)))})) AS s
       |  FROM arrs WHERE len(a) >= $n),
       |sh AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.key AS key FROM sh0),
       |dup AS (SELECT key FROM sh GROUP BY key HAVING count(*) > 1),
       |occ AS (SELECT doc_id, pos FROM sh WHERE key IN (SELECT key FROM dup)),
       |fl AS (SELECT doc_id, pos,
       |         CASE WHEN pos > coalesce(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $n,
       |                                  -9223372036854775808) THEN 1 ELSE 0 END AS nf
       |       FROM occ),
       |g AS (SELECT doc_id, pos,
       |        sum(nf) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
       |      FROM fl)
       |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |  CAST(max(pos) + $n AS BIGINT) AS span_end,
       |  CAST(max(pos) + $n - min(pos) AS BIGINT) AS span_len
       |FROM g GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin

  /** Mirror of TextOps.substrDedupApply: the substrDupSpans CTEs, then
    * positions NOT covered by any span reassemble into clean_text
    * (space-joined, position order). Token-less and fully-duplicated docs
    * drop out of the group-by exactly like the Spark side. */
  def substrDedupApply(n: Int): String =
    s"""WITH arrs AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{L}\\p{Nd}]+') AS a
       |  FROM documents),
       |sh0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(a) - $n + 2),
       |      i -> {'pos': i - 1, 'key': md5(array_to_string(a[i:i+$n-1], chr(31)))})) AS s
       |  FROM arrs WHERE len(a) >= $n),
       |sh AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.key AS key FROM sh0),
       |dup AS (SELECT key FROM sh GROUP BY key HAVING count(*) > 1),
       |occ AS (SELECT doc_id, pos FROM sh WHERE key IN (SELECT key FROM dup)),
       |fl AS (SELECT doc_id, pos,
       |         CASE WHEN pos > coalesce(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $n,
       |                                  -9223372036854775808) THEN 1 ELSE 0 END AS nf
       |       FROM occ),
       |g AS (SELECT doc_id, pos,
       |        sum(nf) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
       |      FROM fl),
       |spans AS (SELECT doc_id, min(pos) AS span_start, max(pos) + $n AS span_end
       |          FROM g GROUP BY doc_id, grp),
       |t0 AS (SELECT doc_id, unnest(list_transform(range(1, len(a) + 1),
       |         i -> {'pos': i - 1, 'term': a[i]})) AS t
       |       FROM arrs WHERE len(a) >= 1),
       |toks AS (SELECT doc_id, CAST(t.pos AS BIGINT) AS pos, t.term AS term FROM t0),
       |kept AS (SELECT tk.doc_id, tk.pos, tk.term FROM toks tk
       |         WHERE NOT EXISTS (SELECT 1 FROM spans s
       |                           WHERE s.doc_id = tk.doc_id
       |                             AND tk.pos >= s.span_start AND tk.pos < s.span_end))
       |SELECT doc_id, string_agg(term, ' ' ORDER BY pos) AS clean_text,
       |  CAST(count(*) AS BIGINT) AS n_kept
       |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
