package graft

import graft.build.{Fsck, IndexBuilder, Manifests}
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Index integrity checker (Fsck — Lucene's CheckIndex): every healthy
  * lifecycle state passes clean, and each class of corruption is caught by
  * the matching check. */
class FsckSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def build(n: Long, seed: Int): String = {
    val d = TestSpark.tmpDir("fsck")
    IndexBuilder.build(spark, Transcripts.synth(spark, n, seed).toDF(), d,
      IndexBuilder.Config(shards = 4))
    d
  }

  private def allOk(dir: String, stage: String): Unit = {
    val bad = Fsck.run(spark, dir).filterNot(_.ok)
    assert(bad.isEmpty, s"$stage: " + bad.mkString("; "))
  }

  test("every healthy lifecycle state fscks clean") {
    val d = build(2000, 7)
    allOk(d, "fresh build")
    IndexBuilder.append(spark, Transcripts.synth(spark, 300, 13).toDF(), d)
    allOk(d, "appended (uncovered rows invisible to stats)")
    IndexBuilder.refresh(spark, d)
    allOk(d, "refreshed")
    assert(IndexBuilder.delete(spark, d, col("turn_idx") % 7 === 3) > 0)
    allOk(d, "tombstone-deleted")
    IndexBuilder.compact(spark, d)
    allOk(d, "compacted")
    IndexBuilder.vacuum(spark, d)
    allOk(d, "vacuumed")
  }

  test("a corrupted stats table is caught by stats_n") {
    val d = build(1500, 11)
    val p = IndexBuilder.statsPath(d)
    val st = spark.read.parquet(p).collect().head
    Seq((st.getAs[Long]("n") + 1, st.getAs[Double]("avgdl"), st.getAs[Long]("sumlen")))
      .toDF("n", "avgdl", "sumlen").write.mode("overwrite").parquet(p)
    val bad = Fsck.run(spark, d).filterNot(_.ok).map(_.check)
    assert(bad.contains("stats_n"), s"got failures: $bad")
  }

  test("a healthy legacy index (pre-sumlen stats schema) fscks clean") {
    val d = build(1200, 23)
    val p = IndexBuilder.statsPath(d)
    val st = spark.read.parquet(p).collect().head
    // rewrite stats in the legacy 2-column shape the Searcher/deleteCore
    // round(n·avgdl) fallback explicitly supports
    Seq((st.getAs[Long]("n"), st.getAs[Double]("avgdl")))
      .toDF("n", "avgdl").write.mode("overwrite").parquet(p)
    val issues = Fsck.run(spark, d)
    val bad = issues.filterNot(_.ok)
    assert(bad.isEmpty, s"legacy stats schema must not fail fsck: $bad")
    assert(issues.exists(i => i.check == "stats_sumlen" &&
      i.detail.contains("legacy stats")), "fallback must be flagged in the detail")
  }

  test("a tampered df table is caught by the recount") {
    val d = build(1500, 17)
    val p = IndexBuilder.dfPath(d)
    val rows = spark.read.parquet(p).as[(String, Long)].collect()
    val tampered = rows.updated(0, (rows.head._1, rows.head._2 + 5))
    tampered.toSeq.toDF("term", "df").write.mode("overwrite").parquet(p)
    val bad = Fsck.run(spark, d).filterNot(_.ok)
    assert(bad.exists(_.check == "df"), s"got: $bad")
    assert(bad.find(_.check == "df").get.detail.contains(rows.head._1))
  }

  test("a missing cover manifest is caught") {
    val d = build(1000, 23)
    Manifests.clear(d, "postings_cover_g0_0")
    val bad = Fsck.run(spark, d).filterNot(_.ok)
    assert(bad.exists(_.check == "covers"), s"got: $bad")
  }

  test("a foreign tombstone (uncovered docId) is caught") {
    val d = build(1000, 29)
    // forge a delete generation pointing at a docId that was never covered
    Seq(Long.MaxValue - 7).toDF("docId")
      .write.parquet(s"$d/tombstones_g1")
    Manifests.write(d, graft.model.StageManifest("tombstones_g1", 1, 0, "done", 0))
    Manifests.write(d, graft.model.StageManifest("postings_gen", 1, 0, "gen", 0))
    // gen 1 needs covers; copy gen 0's
    (0 until 4).foreach { s =>
      val c = Manifests.read(d, s"postings_cover_g0_$s").get.rows
      Manifests.write(d, graft.model.StageManifest(s"postings_cover_g1_$s", c, 0, "cover", 0))
    }
    val bad = Fsck.run(spark, d).filterNot(_.ok)
    assert(bad.exists(_.check == "tombstones"), s"got: $bad")
  }
}
