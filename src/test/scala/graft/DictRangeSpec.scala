package graft

import graft.build.IndexBuilder
import graft.codec.Postings
import graft.model.Posting
import graft.query.Searcher
import graft.sources.Transcripts
import org.scalatest.funsuite.AnyFunSuite

/** Range-partitioned dictionary assembly (Config.dictRanges > 1, the
  * web-vocabulary fallback where no full term dictionary may ever be
  * driver-resident) must produce the SAME index as the broadcast path:
  * identical decoded postings per (shard, term), identical df/stats, and
  * identical query results through the Searcher (which serves the
  * multi-file-per-shard layout through its grouped path). */
class DictRangeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val input = Transcripts.synth(spark, 2000, 7).toDF().cache()

  private lazy val (dirA, dirB) = {
    val a = TestSpark.tmpDir("dict_bcast")
    val b = TestSpark.tmpDir("dict_ranged")
    IndexBuilder.build(spark, input, a, IndexBuilder.Config(shards = 8))
    IndexBuilder.build(spark, input, b,
      IndexBuilder.Config(shards = 8, dictRanges = 5))
    (a, b)
  }

  /** Fully decoded postings of an index: (shard, term) -> (docs, tfs, lens). */
  private def decoded(dir: String): Map[(Int, String), (Seq[Long], Seq[Int], Seq[Int])] =
    spark.read.parquet(s"$dir/postings").as[Posting].collect().map { p =>
      val (docs, tfs, lens) = Postings.decode(p)
      (p.shard, p.term) -> (docs.toSeq, tfs.toSeq, lens.toSeq)
    }.toMap

  test("ranged assembly decodes to exactly the broadcast path's postings") {
    val a = decoded(dirA)
    val b = decoded(dirB)
    assert(a.keySet == b.keySet,
      s"term sets differ: only-bcast=${(a.keySet -- b.keySet).take(5)} " +
        s"only-ranged=${(b.keySet -- a.keySet).take(5)}")
    val diff = a.keys.filter(k => a(k) != b(k)).take(3)
    assert(diff.isEmpty, s"postings differ at $diff")
  }

  test("df and stats agree between the two paths") {
    val dfA = spark.read.parquet(s"$dirA/df").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val dfB = spark.read.parquet(s"$dirB/df").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(dfA == dfB)
    val stA = spark.read.parquet(s"$dirA/stats").collect().head.toSeq
    val stB = spark.read.parquet(s"$dirB/stats").collect().head.toSeq
    assert(stA == stB)
  }

  test("queries through the Searcher are rank-identical across layouts") {
    val sA = new Searcher(spark, dirA)
    val sB = new Searcher(spark, dirB)
    for (q <- Seq("quick brown fox", "machine learning", "tok0 rare5")) {
      val a = sA.topK(q, 10).select("docId", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = sB.topK(q, 10).select("docId", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a == b, s"top-k diverged for '$q':\n$a\nvs\n$b")
    }
  }
}
