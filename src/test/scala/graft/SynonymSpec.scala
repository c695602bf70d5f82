package graft

import graft.build.IndexBuilder
import graft.codec.Postings
import graft.query.{Bm25, Searcher}
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SynonymQuery semantics (Searcher.topKSynonyms): a synonym group scores
  * as ONE pseudo-term — per-doc tf summed across members, df = max member
  * df — so rephrasings don't double-count yet never outscore a genuinely
  * frequent term. */
class SynonymSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = TestSpark.tmpDir("synidx")
    IndexBuilder.build(spark, Transcripts.synth(spark, 3000, 7).toDF(), d,
      IndexBuilder.Config(shards = 8))
    d
  }
  private lazy val s = new Searcher(spark, dir)

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select($"docId".cast("long"), $"score").as[(Long, Double)].collect()
      .map { case (id, sc) => (id, r4(sc)) }
      .sortBy { case (id, sc) => (-sc, id) }.toSeq

  test("codec unionSum: summed tfs over the docId union, order preserved") {
    val a = Postings.encode(0, "a", Array(1L, 5L, 9L), Array(2, 1, 3), Array(10, 20, 30))
    val b = Postings.encode(0, "b", Array(5L, 7L, 9L), Array(4, 1, 1), Array(20, 25, 30))
    val (docs, tfs, lens) = Postings.decode(Postings.unionSum(Seq(a, b), "g"))
    assert(docs.toSeq == Seq(1L, 5L, 7L, 9L))
    assert(tfs.toSeq == Seq(2, 5, 1, 4))
    assert(lens.toSeq == Seq(10, 20, 25, 30))
  }

  test("empty synonym map and absent-synonym groups are plain topK") {
    val q = "learning retrieval streaming"
    assert(rows(s.topKSynonyms(q, Map.empty, 50)).take(20) ==
      rows(s.topK(q, 50)).take(20))
    assert(rows(s.topKSynonyms(q, Map("learning" -> Seq("zzznope")), 50)).take(20) ==
      rows(s.topK(q, 50)).take(20))
  }

  test("group score = idf(max df) · tfSat(Σ member tf) exactly") {
    val (base, syn) = ("learning", "retrieval")
    val hits = s.topKSynonyms(base, Map(base -> Seq(syn)), 10)
      .select($"docId".cast("long"), $"score").as[(Long, Double)].collect()
    assert(hits.nonEmpty)
    val dfm = s.dfSlice(Seq(base, syn))
    val gdf = math.max(dfm.getOrElse(base, 0L), dfm.getOrElse(syn, 0L))
    val lens = Searcher.docMeta(spark, dir)
      .select($"docId", $"len").as[(Long, Long)].collect().toMap
    val p = Bm25.RefDefaults
    hits.foreach { case (id, sc) =>
      val tfs = s.explain(base + " " + syn, id)
        .select($"term", $"tf").as[(String, Long)].collect().toMap
      val tfSum = (tfs.getOrElse(base, 0L) + tfs.getOrElse(syn, 0L)).toInt
      val expect = Bm25.idf(s.n, gdf) * Bm25.qtfSat(1, p) *
        Bm25.tfSat(tfSum, lens(id).toInt, s.avgdl, p)
      assert(math.abs(sc - expect) < 1e-9, s"doc $id: $sc vs $expect")
    }
  }

  test("synonyms reshape the ranking vs the plain query") {
    val plain = rows(s.topK("learning", 10)).map(_._1)
    val synned = rows(s.topKSynonyms("learning",
      Map("learning" -> Seq("retrieval", "streaming")), 10)).map(_._1)
    assert(plain != synned)
  }
}
