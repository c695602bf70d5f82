package graft.sources

import graft.model.Turn
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Deterministic transcript sources (FIXTURES.md).
  *
  * The engine's production input is an Iceberg table of multi-turn
  * transcripts (BASELINE.json input_hint). The sandbox has no Iceberg jar
  * (SURVEY.md §7.6), so everything goes through plain DataFrames: fixtures
  * synthesized in-code, the scale corpus generated distributedly with
  * spark.range (never a driver-side collection), and Parquet standing in
  * for Iceberg behind the same column contract.
  */
object Transcripts {

  val BaseEpochMs = 1704067200000L // 2024-01-01T00:00:00Z

  /** One fixture corpus → one conversation; doc i → turn_idx i, roles
    * alternating user/assistant (FIXTURES.md §2). */
  def fixture(spark: SparkSession, convId: String, texts: Seq[String]): Dataset[Turn] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      Turn(convId, i, if (i % 2 == 0) "user" else "assistant", t, "",
        new Timestamp(BaseEpochMs + i * 1000L))
    }.toDS()
  }

  // Reference corpora, texts verbatim from the reference tests/samples.
  val F1: Seq[String] = Seq(
    "The cat is sleeping on the mat",
    "Dogs are loyal pets",
    "A black cat crossed the street")

  val F2: Seq[String] = Seq(
    "Machine learning is a subset of artificial intelligence",
    "Deep learning uses neural networks",
    "Artificial intelligence encompasses machine learning",
    "Neural networks are used in machine learning",
    "Cooking recipes for beginners",
    "Machine learning algorithms are powerful")

  val F3: Seq[String] = Seq(
    "The quick brown fox jumps over the lazy dog.",
    "The fox",
    "The dog",
    "A brown dog jumps over another dog.",
    "The quick brown fox.",
    "Machine learning is a subset of artificial intelligence.",
    "Natural language processing helps computers understand human language.",
    "The algorithm processes documents efficiently.",
    "Information retrieval systems rank documents by relevance.",
    "Text mining extracts useful information from unstructured data.")

  /** Topic templates for the scale corpus, in the style of the reference's
    * performance-test generator (LMRankerPerformanceTests.cs:295-322). */
  private val topics: Array[String] = Array(
    "machine learning models require large training datasets",
    "the quick brown fox jumps over the lazy dog",
    "distributed systems coordinate state across many nodes",
    "information retrieval systems rank documents by relevance",
    "neural networks learn hierarchical feature representations",
    "query engines optimize joins with cost based planning",
    "streaming pipelines process events with low latency",
    "natural language processing helps computers understand text",
    "search indexes compress posting lists with variable bytes",
    "agents call tools and observe structured results")

  private val toolNames: Array[String] =
    Array("", "", "", "search", "calculator", "browser", "compiler", "")

  /** Deterministic scale corpus: `nTurns` turns across conversations of
    * `turnsPerConv` turns. Generated distributedly from spark.range — the
    * text of turn t is a pure function of t (seeded mix), so the corpus is
    * identical at any parallelism. Texts are multi-sentence (~40-130
    * tokens, realistic transcript-turn length). A Zipf-ish skew is built
    * in: token `tok0` appears in ~half of all turns to exercise head-term
    * handling, and `rareNNN` tokens give a long tail.
    */
  def synth(spark: SparkSession, nTurns: Long, turnsPerConv: Int = 20,
            parallelism: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val ids = if (parallelism > 0) spark.range(0L, nTurns, 1L, parallelism)
              else spark.range(0L, nTurns)
    ids.map { t =>
      val conv = t / turnsPerConv
      val turn = (t % turnsPerConv).toInt
      // xorshift-style mix, pure function of t
      var x = t * 0x9E3779B97F4A7C15L + 0x7F4A7C15L
      x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29
      val sb = new java.lang.StringBuilder(680)
      val nSentences = 5 + (x % 11L).toInt // 5..15 sentences of ~8 tokens
      var s = 0
      var y = x
      while (s < nSentences) {
        y = y * 6364136223846793005L + 1442695040888963407L
        val yi = (y >>> 33)
        sb.append(topics((yi % topics.length).toInt))
        if ((yi & 1L) == 0L) sb.append(" tok0")
        if (yi % 97L == 0L) sb.append(" rare").append(yi % 5000L)
        sb.append(". ")
        s += 1
      }
      sb.append("turn ").append(turn)
      val role = turn % 3 match { case 0 => "user"; case 1 => "assistant"; case _ => "tool" }
      val tool = toolNames(((x >>> 8) % toolNames.length).toInt)
      Turn(f"conv-$conv%09d", turn, role, sb.toString, tool,
        new Timestamp(BaseEpochMs + conv * 60000L + turn * 1000L))
    }
  }

  /** Adapter: the driver-provided documents table
    * (doc_id, text, lang, source, n_chars) viewed as single-turn
    * conversations, so the same index pipeline runs over it. */
  def fromDocuments(docs: DataFrame, extraCols: Seq[String] = Nil): DataFrame =
    docs.select(Seq(
      col("doc_id").cast("string").as("conv_id"),
      lit(0).as("turn_idx"),
      lit("user").as("role"),
      col("text"),
      lit("").as("tool"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("ts")) ++ extraCols.map(col(_)): _*)
}
