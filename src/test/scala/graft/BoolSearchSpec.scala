package graft

import graft.build.IndexBuilder
import graft.query.Searcher
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boolean retrieval (Searcher.search): Lucene's BooleanQuery shape —
  * must (required + scoring), should (optional + scoring), not (excluding)
  * — composed in one kernel pass and equal to the brute-force composition
  * of the engine's own primitives. */
class BoolSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = TestSpark.tmpDir("boolidx")
    IndexBuilder.build(spark, Transcripts.synth(spark, 3000, 7).toDF(), d,
      IndexBuilder.Config(shards = 8))
    d
  }
  private lazy val s = new Searcher(spark, dir)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[(String, Int)] =
    df.select("conv_id", "turn_idx").as[(String, Int)].collect().toSeq

  test("search ≡ brute composition: AND(must) ∩ ¬match(not), scored over must ∪ should") {
    // terms from three DIFFERENT synth sentences, so candidates genuinely
    // overlap and the exclusion genuinely reshapes the result ("quick" /
    // "lazy" would not work: they co-occur in every doc, one sentence)
    val (must, should, not) = ("learning", "retrieval relevance", "streaming")
    val k = 25
    val got = s.search(must, should, not, k)
      .select($"conv_id", $"turn_idx", $"score").collect().toSeq

    // brute reference from independent primitives: full OR scores over
    // must ∪ should, candidates = docs with every must term, minus docs
    // with any not term
    val mustDocs = s.matchAllDocs(must).select($"docId").as[Long].collect().toSet
    val notDocs = s.scoreAll(not).select($"docId").as[Long].collect().toSet
    val expect = s.scoreAll(must + " " + should)
      .filter($"docId".isInCollection(mustDocs -- notDocs))
      .select($"conv_id", $"turn_idx", $"docId", $"score")
      .orderBy(desc("score"), asc("docId")).limit(k)
      .select($"conv_id", $"turn_idx", $"score").collect().toSeq
    assert(got.nonEmpty)
    assert(got.map(r => (r.getString(0), r.getInt(1))) ==
      expect.map(r => (r.getString(0), r.getInt(1))))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g.getDouble(2) - e.getDouble(2)) < 1e-9)
    }
  }

  test("degenerate shapes delegate: no must → NOT-mode; only must → AND-mode") {
    assert(ids(s.search("", "quick brown", "lazy", 15)) ==
      ids(s.topKNot("quick brown", "lazy", 15)))
    assert(ids(s.search("quick brown", "", "", 15)) ==
      ids(s.topKAnd("quick brown", 15)))
  }

  test("a must term that is also excluded is unsatisfiable") {
    assert(s.search("quick", "brown", "quick fox", 10).count() == 0)
  }

  test("should overlapping must scores once; should overlapping not is dropped") {
    // must ∪ should with duplicate terms must equal the deduped union
    val a = ids(s.search("quick", "quick brown", "", 15))
    val b = ids(s.search("quick", "brown", "", 15))
    assert(a == b)
    // a should term under exclusion cannot contribute to scores
    val c = ids(s.search("quick", "brown lazy", "lazy", 15))
    val d = ids(s.search("quick", "brown", "lazy", 15))
    assert(c == d)
  }

  test("must term absent from the corpus yields empty") {
    assert(s.search("zznowhere", "quick", "", 10).count() == 0)
  }

  test("explain: per-term contributions sum exactly to the doc's score") {
    val hit = s.topK("quick brown fox", 1)
      .select($"docId", $"score").as[(Long, Double)].head()
    val ex = s.explain("quick brown fox", hit._1)
    assert(ex.count() >= 2) // multi-term hit
    val total = ex.agg(sum($"contrib")).as[Double].head()
    assert(math.abs(total - hit._2) < 1e-9, s"explain sums to $total, score ${hit._2}")
    // a docId that exists nowhere explains to zero rows
    assert(s.explain("quick", -42L).count() == 0)
  }

  test("facet filter composes with boolean clauses in the same kernel") {
    val d = TestSpark.tmpDir("boolfacet")
    IndexBuilder.build(spark, Transcripts.synth(spark, 2000, 6).toDF(), d,
      IndexBuilder.Config(shards = 4, facetCols = Seq("role")))
    val sf = new Searcher(spark, d)
    val got = sf.search("learning", "retrieval relevance", "streaming", 15,
        facets = Map("role" -> "user"))
      .select($"conv_id", $"turn_idx").as[(String, Int)].collect().toSeq
    assert(got.nonEmpty)

    // brute: the unfaceted boolean composition intersected with the
    // deterministic synth corpus' role=user rows
    val mustDocs = sf.matchAllDocs("learning").select($"docId").as[Long].collect().toSet
    val notDocs = sf.scoreAll("streaming").select($"docId").as[Long].collect().toSet
    val userKeys = Transcripts.synth(spark, 2000, 6).toDF()
      .filter($"role" === "user")
      .select($"conv_id", $"turn_idx").as[(String, Int)].collect().toSet
    val expect = sf.scoreAll("learning retrieval relevance")
      .filter($"docId".isInCollection((mustDocs -- notDocs) + -1L))
      .select($"conv_id", $"turn_idx", $"docId", $"score").collect().toSeq
      .filter(r => userKeys((r.getString(0), r.getInt(1))))
      .sortBy(r => (-r.getDouble(3), r.getLong(2))).take(15)
      .map(r => (r.getString(0), r.getInt(1)))
    assert(got == expect)
  }
}
