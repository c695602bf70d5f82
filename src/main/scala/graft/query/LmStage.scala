package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable model-judged relevance stage with the reference LMRanker's
  * behavioral contracts (O15, LMRanker.cs):
  *
  *  - score clamped to [0, 1]            (LMRanker.cs:246)
  *  - empty query or empty doc → 0.0     (LMRanker.cs:90-97)
  *  - any scorer error → 0.0, never fail (LMRanker.cs:256-267)
  *
  * The scorer is any (query, docText) => Double — in production an LLM
  * call (no egress in this sandbox); tests and the driver queries use a
  * deterministic mock. The stage itself is what the engine owns: contract
  * enforcement + distribution (one scorer invocation per row, partitioned;
  * at 10^12 docs this stage only ever runs on a cascade's surviving
  * candidates, LMRanker is never the first cut).
  */
object LmStage {

  def score(df: DataFrame, idCol: String, textCol: String, query: String,
            scorer: (String, String) => Double): DataFrame = {
    val q = query
    val f = udf { (text: String) =>
      if (q == null || q.trim.isEmpty || text == null || text.trim.isEmpty) 0.0
      else {
        try {
          val s = scorer(q, text)
          math.max(0.0, math.min(1.0, s))
        } catch { case _: Throwable => 0.0 }
      }
    }
    df.select(col(idCol), f(col(textCol)).as("score"))
  }

  /** Deterministic mock "LM": query-term overlap ratio + a length prior.
    * Deliberately exceeds 1.0 on long docs (exercises the clamp) and
    * throws on docs containing the token `slow` (exercises error→0). */
  def mockScorer(language: String = "en"): (String, String) => Double = { (q, text) =>
    val qs = graft.analysis.Analyzer.tokenizeRaw(q).distinct
    val ts = graft.analysis.Analyzer.tokenizeRaw(text)
    if (ts.contains("slow")) throw new RuntimeException("mock model failure")
    val overlap = qs.count(ts.contains)
    overlap.toDouble / math.max(qs.length, 1) + ts.length / 200.0
  }
}
