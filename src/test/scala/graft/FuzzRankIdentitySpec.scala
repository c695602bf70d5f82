package graft

import graft.analysis.StopWords
import graft.build.IndexBuilder
import graft.query.{Bm25, Searcher}
import graft.ref.OracleBm25
import graft.sources.Transcripts
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Seeded fuzz: random corpora and random queries — the full distributed
  * engine (WAND path) must stay rank-identical to the pure-Scala oracle,
  * not just on the curated fixtures. */
class FuzzRankIdentitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("random corpora × random queries: WAND top-k ≡ oracle") {
    val rnd = new Random(20260816L)
    val vocab = (Array("the", "a", "of", "and") ++ // stopwords in the mix
      (0 until 40).map(i => s"w$i")).toIndexedSeq
    for (trial <- 0 until 3) {
      val texts = Seq.fill(150 + rnd.nextInt(100)) {
        Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val dir = TestSpark.tmpDir(s"fuzz$trial")
      IndexBuilder.build(spark, Transcripts.fixture(spark, "c0", texts).toDF(), dir,
        IndexBuilder.Config(shards = 4))
      val s = new Searcher(spark, dir, Bm25.RefDefaults)
      for (_ <- 0 until 6) {
        val q = Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        val k = 1 + rnd.nextInt(12)
        val got = s.topK(q, k).select("turn_idx", "score").as[(Int, Double)].collect()
        val oracle = OracleBm25.scoreAll(q, texts, StopWords.english)
          .filter(_._2 > 0.0).sortBy { case (i, sc) => (-sc, i) }.take(k)
        assert(got.length == oracle.length, s"[$trial] size for '$q' k=$k")
        got.zip(oracle).foreach { case ((gi, gs), (oi, os)) =>
          assert(math.abs(gs - os) <= 1e-12 * math.max(1.0, math.abs(os)),
            s"[$trial] score $gs vs $os for '$q'")
          if (gi != oi) assert(math.abs(gs - os) <= 1e-12,
            s"[$trial] doc $gi vs $oi for '$q' (non-tie permutation)")
        }
      }
    }
  }
}
