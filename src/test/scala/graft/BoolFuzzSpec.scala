package graft

import graft.build.IndexBuilder
import graft.query.Searcher
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz for boolean retrieval: Searcher.search must equal the brute
  * composition of the engine's own primitives — OR scores over must ∪
  * should, candidates = AND(must) minus match(not) — for random term
  * triples drawn from the real corpus vocabulary (mixed df bands, the
  * occasional deliberately-unsatisfiable must∧not collision included). */
class BoolFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = TestSpark.tmpDir("boolfuzz")
    IndexBuilder.build(spark, Transcripts.synth(spark, 2500, 5).toDF(), d,
      IndexBuilder.Config(shards = 4))
    d
  }
  private lazy val s = new Searcher(spark, dir)
  /** Vocabulary spread across df bands (head terms + mid + tail). */
  private lazy val vocab: Array[String] =
    spark.read.parquet(s"$dir/df").orderBy(desc("df"), asc("term"))
      .select("term").as[String].take(120)

  private var nonEmptySeen = 0

  for (seed <- 1 to 8) test(s"seed $seed: search ≡ brute composition") {
    val rnd = new scala.util.Random(seed * 7919)
    def pick(n: Int, avoid: Set[String]): Seq[String] =
      rnd.shuffle(vocab.toSeq).filterNot(avoid).take(n)
    val must = pick(1 + rnd.nextInt(2), Set.empty)
    val should = pick(rnd.nextInt(3), must.toSet)
    // every third seed: force a must∧not collision (unsatisfiable branch)
    val not =
      if (seed % 3 == 0) Seq(must.head)
      else pick(rnd.nextInt(2), (must ++ should).toSet)
    val k = 20

    val got = s.search(must.mkString(" "), should.mkString(" "), not.mkString(" "), k)
      .select($"conv_id", $"turn_idx", $"score").collect().toSeq

    val mustDocs = s.matchAllDocs(must.mkString(" "))
      .select($"docId").as[Long].collect().toSet
    val notDocs =
      if (not.isEmpty) Set.empty[Long]
      else s.scoreAll(not.mkString(" ")).select($"docId").as[Long].collect().toSet
    val expect = s.scoreAll((must ++ should).mkString(" "))
      .filter($"docId".isInCollection((mustDocs -- notDocs) + -1L))
      .select($"conv_id", $"turn_idx", $"docId", $"score")
      .orderBy(desc("score"), asc("docId")).limit(k)
      .select($"conv_id", $"turn_idx", $"score").collect().toSeq

    assert(got.map(r => (r.getString(0), r.getInt(1))) ==
      expect.map(r => (r.getString(0), r.getInt(1))),
      s"must=$must should=$should not=$not")
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g.getDouble(2) - e.getDouble(2)) < 1e-9,
        s"score drift for must=$must should=$should not=$not")
    }
    if (got.nonEmpty) nonEmptySeen += 1
  }

  test("fuzz coverage sanity: most seeds produced non-empty results") {
    assert(nonEmptySeen >= 4, s"only $nonEmptySeen non-empty seeds — fuzz too degenerate")
  }
}
