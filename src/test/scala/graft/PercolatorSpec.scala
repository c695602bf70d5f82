package graft

import graft.streaming.Percolator
import graft.streaming.Percolator.Query
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Percolation (reverse search): conjunctive must + excluding not,
  * analyzed with the index analyzer, identical on batch tables and
  * Structured Streaming sources (stateless kernel). */
class PercolatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "quick brown shoes"),
    (3L, "a fox and a dog walk into a bar"),
    (4L, "quick Quick QUICK brown fox fox"), // repeats count once
    (5L, "nothing relevant here"))
  private val queries = Seq(
    Query("qfox", "quick fox"),          // docs 1, 4
    Query("qdog", "dog"),                // docs 1, 3
    Query("qnot", "quick", "dog"),       // quick minus dog docs → 2, 4
    Query("qempty", "the a"))            // stopword-only must → matches nothing

  private def brute: Set[(String, Long)] = {
    val stop = graft.analysis.StopWords.forLang("en")
    def terms(s: String) = graft.analysis.Analyzer
      .termFreqs(graft.analysis.Analyzer.tokenize(s, stop, graft.analysis.Analyzer.Identity)).keySet
    (for {
      q <- queries
      m = terms(q.must) if m.nonEmpty
      nt = terms(q.not)
      (id, text) <- docs
      dt = terms(text)
      if m.subsetOf(dt) && nt.forall(!dt.contains(_))
    } yield (q.qid, id)).toSet
  }

  test("batch percolation ≡ brute term-set evaluation") {
    val got = Percolator.percolate(spark, docs.toDF("doc_id", "text"), queries)
      .as[(String, Long)].collect().toSet
    val want = brute
    assert(want.contains(("qfox", 4L)), "repeat-term doc must match once")
    assert(!want.exists(_._1 == "qempty"))
    assert(got == want, s"got $got\nwant $want")
  }

  test("streaming percolation ≡ the batch twin across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = Percolator.percolate(spark, mem.toDF().toDF("doc_id", "text"), queries)
    val q = out.writeStream.format("memory").queryName("perc_out")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(2): _*); q.processAllAvailable()
      mem.addData(docs.drop(2): _*); q.processAllAvailable()
      val got = spark.table("perc_out").as[(String, Long)].collect().toSet
      assert(got == brute)
    } finally q.stop()
  }
}
