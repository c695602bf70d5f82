package graft

import graft.build.IndexBuilder
import graft.query.Searcher
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IndexBuilder.merge (Lucene's addIndexes re-expressed): merging standing
  * indexes without re-analysis must be BYTE-EQUIVALENT to a from-scratch
  * build over the union of the sources' logical corpora — same docIds
  * (shard routing is a pure function of conv_id, ranks assigned in the
  * same sort order), same stats/df, same scores. */
class IndexMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = Transcripts.synth(spark, 3000, 7).toDF().cache()
  private def half(even: Boolean) =
    corpus.filter(pmod(hash(col("conv_id")), lit(2)) === (if (even) 0 else 1))

  private def build(df: org.apache.spark.sql.DataFrame): String = {
    val d = TestSpark.tmpDir("mrg")
    IndexBuilder.build(spark, df, d, IndexBuilder.Config(shards = 8))
    d
  }

  private def analyzedRows(dir: String): Seq[String] =
    graft.sources.TableIO.read(spark, s"$dir/analyzed")
      .select($"shard", $"docId", $"conv_id", $"turn_idx", $"len",
        concat_ws("|", $"terms").as("t"), concat_ws("|", $"tfs").as("f"))
      .orderBy($"docId").collect().map(_.toString).toSeq

  private def statsRow(dir: String): String =
    spark.read.parquet(IndexBuilder.statsPath(dir))
      .select($"n", $"avgdl").collect().head.toString

  private def dfRows(dir: String): Seq[(String, Long)] =
    spark.read.parquet(IndexBuilder.dfPath(dir))
      .as[(String, Long)].collect().sortBy(_._1).toSeq

  private def hits(dir: String, q: String): Seq[(Long, Double)] =
    new Searcher(spark, dir).topK(q, 20)
      .select($"docId".cast("long"), $"score").as[(Long, Double)]
      .collect().toSeq

  test("merge of two disjoint halves ≡ from-scratch build of the union") {
    val dirA = build(half(even = true))
    val dirB = build(half(even = false))
    val dirF = build(corpus)
    val dirM = TestSpark.tmpDir("mrgout")
    IndexBuilder.merge(spark, Seq(dirA, dirB), dirM, IndexBuilder.Config(shards = 8))

    assert(analyzedRows(dirM) == analyzedRows(dirF),
      "analyzed rows (docIds, terms, tfs) must be identical")
    assert(statsRow(dirM) == statsRow(dirF))
    assert(dfRows(dirM) == dfRows(dirF))
    // identical postings ⇒ identical kernel arithmetic ⇒ exact score match
    val q = "learning retrieval streaming"
    assert(hits(dirM, q) == hits(dirF, q))

    // tombstone-aware merge: delete a slice from one source, merge again —
    // must equal a from-scratch build over the survivors
    assert(IndexBuilder.delete(spark, dirA, col("turn_idx") % 5 === 2) > 0)
    val dirM2 = TestSpark.tmpDir("mrgout2")
    IndexBuilder.merge(spark, Seq(dirA, dirB), dirM2, IndexBuilder.Config(shards = 8))
    val survivors = corpus.filter(
      !(pmod(hash(col("conv_id")), lit(2)) === 0 && col("turn_idx") % 5 === 2))
    val dirR = build(survivors)
    assert(analyzedRows(dirM2) == analyzedRows(dirR))
    assert(statsRow(dirM2) == statsRow(dirR))
    assert(hits(dirM2, q) == hits(dirR, q))
  }

  test("single-source merge is an identity rebuild (same docIds throughout)") {
    val dirF = build(corpus)
    val dirM = TestSpark.tmpDir("mrgid")
    IndexBuilder.merge(spark, Seq(dirF), dirM, IndexBuilder.Config(shards = 8))
    assert(analyzedRows(dirM) == analyzedRows(dirF))
    assert(dfRows(dirM) == dfRows(dirF))
  }
}
