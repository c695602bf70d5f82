package graft

import graft.build.IndexBuilder
import graft.query.Searcher
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Upsert (IndexBuilder.update): tombstone-delete by (conv_id, turn_idx) +
  * append + refresh must compose to a from-scratch build in which the
  * incoming keys carry the NEW text — Lucene's updateDocument on the
  * segment index. */
class UpdateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Queries = Seq("quick brown fox", "tok0", "zzfresh replacement")

  private def assertSameScores(a: Searcher, b: Searcher, q: String): Unit = {
    val sa = a.scoreAll(q).select($"conv_id", $"turn_idx", $"score".as("sa"))
    val sb = b.scoreAll(q).select($"conv_id", $"turn_idx", $"score".as("sb"))
    val joined = sa.join(sb, Seq("conv_id", "turn_idx"), "full_outer")
    assert(joined.filter($"sa".isNull || $"sb".isNull).count() == 0,
      s"scored doc sets differ for '$q'")
    val maxD = joined.agg(max(abs($"sa" - $"sb"))).as[Double].head()
    assert(maxD <= 1e-9, s"scores diverge by $maxD for '$q'")
  }

  test("update ≡ one-shot rebuild with the replaced text (scores, stats, df)") {
    val all = Transcripts.synth(spark, 3000, turnsPerConv = 6).toDF()
    val updPred = pmod(hash($"conv_id"), lit(4)) === 0
    val updates = all.filter(updPred)
      .withColumn("text", concat(lit("zzfresh replacement text only "), $"text"))
    assert(updates.count() > 0)

    // reference: one-shot build where the updated keys carry the new text
    val refDir = TestSpark.tmpDir("updref")
    IndexBuilder.build(spark, all.filter(!updPred).unionByName(updates), refDir,
      IndexBuilder.Config(shards = 8))

    val dir = TestSpark.tmpDir("updidx")
    IndexBuilder.build(spark, all, dir, IndexBuilder.Config(shards = 8))
    val replaced = IndexBuilder.update(spark, updates, dir, IndexBuilder.Config(shards = 8))
    assert(replaced == updates.count(), s"replaced $replaced")

    val rs = spark.read.parquet(s"$refDir/stats").head()
    val sDel = new Searcher(spark, dir)
    val sRef = new Searcher(spark, refDir)
    assert(sDel.n == rs.getAs[Long]("n")) // replace, not insert: n unchanged vs ref
    assert(math.abs(sDel.avgdl - rs.getAs[Double]("avgdl")) < 1e-9)

    val dfRef = spark.read.parquet(s"$refDir/df")
    val dfUpd = spark.read.parquet(
      IndexBuilder.dfPathAsOf(dir, IndexBuilder.committedGen(dir)))
    assert(dfRef.except(dfUpd).count() == 0 && dfUpd.except(dfRef).count() == 0)

    Queries.foreach(q => assertSameScores(sRef, sDel, q))
  }

  test("new text is live, old text is gone") {
    val dir = TestSpark.tmpDir("updswap")
    IndexBuilder.build(spark,
      Transcripts.fixture(spark, "cU", Seq(
        "zzoldtok original content here",
        "neighbour document untouched")).toDF(),
      dir, IndexBuilder.Config(shards = 2))
    val replacement = Transcripts.fixture(spark, "cU", Seq(
      "zznewtok rewritten content")).toDF() // turn_idx 0 — same key
    assert(IndexBuilder.update(spark, replacement, dir) == 1L)

    val s = new Searcher(spark, dir)
    assert(s.n == 2L)
    assert(s.topK("zzoldtok", 10).count() == 0, "old text still matches")
    val hit = s.topK("zznewtok", 10)
    assert(hit.count() == 1)
    assert(hit.select("conv_id", "turn_idx").as[(String, Int)].head() == ("cU", 0))
    // and the doc is not duplicated on an unrelated shared term
    assert(s.topK("content", 10).count() == 1)
  }

  test("unknown keys are plain inserts (replaced = 0)") {
    val dir = TestSpark.tmpDir("updinsert")
    IndexBuilder.build(spark,
      Transcripts.fixture(spark, "cA", Seq("zzbase alpha")).toDF(),
      dir, IndexBuilder.Config(shards = 2))
    val fresh = Transcripts.fixture(spark, "cNEW", Seq("zzins brand new doc")).toDF()
    assert(IndexBuilder.update(spark, fresh, dir) == 0L)
    val s = new Searcher(spark, dir)
    assert(s.n == 2L)
    assert(s.topK("zzins", 10).count() == 1)
    assert(s.topK("zzbase", 10).count() == 1)
  }

  test("re-applying the same update replaces again without drift") {
    val dir = TestSpark.tmpDir("updtwice")
    IndexBuilder.build(spark,
      Transcripts.fixture(spark, "cT", Seq("zztwice v0", "stable sibling")).toDF(),
      dir, IndexBuilder.Config(shards = 2))
    val v1 = Transcripts.fixture(spark, "cT", Seq("zztwice v1 text")).toDF()
    assert(IndexBuilder.update(spark, v1, dir) == 1L)
    val once = new Searcher(spark, dir).scoreAll("zztwice")
      .select($"conv_id", $"turn_idx", $"score").collect().toSeq
    assert(IndexBuilder.update(spark, v1, dir) == 1L) // replaces v1 with v1
    val s2 = new Searcher(spark, dir)
    val twice = s2.scoreAll("zztwice")
      .select($"conv_id", $"turn_idx", $"score").collect().toSeq
    assert(once == twice)
    assert(s2.n == 2L)
  }

  test("crash-retry: an update that died before its refresh leaves no duplicates when retried") {
    val all = Transcripts.synth(spark, 400, turnsPerConv = 4).toDF()
    val updPred = pmod(hash($"conv_id"), lit(5)) === 0
    val updates = all.filter(updPred)
      .withColumn("text", concat(lit("zzfresh replacement text only "), $"text"))
    assert(updates.count() > 0)

    val refDir = TestSpark.tmpDir("updcrashref")
    IndexBuilder.build(spark, all.filter(!updPred).unionByName(updates), refDir,
      IndexBuilder.Config(shards = 4))

    val dir = TestSpark.tmpDir("updcrash")
    IndexBuilder.build(spark, all, dir, IndexBuilder.Config(shards = 4))
    // simulate the crashed first attempt: delete + append landed, the
    // closing refresh did not — replacements are appended-but-uncovered
    assert(IndexBuilder.deleteByKeys(spark, dir,
      updates.select($"conv_id", $"turn_idx")) == updates.count())
    IndexBuilder.append(spark, updates, dir, IndexBuilder.Config(shards = 4))
    // the retry must net out to exactly one live copy per key (its leading
    // refresh covers the orphaned appends, making them deletable)
    IndexBuilder.update(spark, updates, dir, IndexBuilder.Config(shards = 4))

    val sRef = new Searcher(spark, refDir)
    val sUpd = new Searcher(spark, dir)
    assert(sUpd.n == sRef.n, "duplicate (conv_id, turn_idx) docs survived the retry")
    Queries.foreach(q => assertSameScores(sRef, sUpd, q))
  }
}
