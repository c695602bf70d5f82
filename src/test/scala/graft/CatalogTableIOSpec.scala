package graft

import graft.build.IndexBuilder
import graft.query.Searcher
import graft.sources.{CatalogTableIO, ParquetTableIO, TableIO}
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The TableIO seam is real: swapping in the Iceberg-shaped catalog
  * implementation runs build+query UNCHANGED, readers only ever see
  * committed snapshots, and a failed write leaves the previous snapshot
  * intact (write-then-commit ordering). */
class CatalogTableIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withCatalog[T](body: CatalogTableIO => T): T = {
    val cat = new CatalogTableIO(TestSpark.tmpDir("warehouse"))
    TableIO.impl = cat
    try body(cat)
    finally TableIO.impl = ParquetTableIO
  }

  test("build+query through the catalog impl matches the parquet impl") {
    val texts = Transcripts.F3
    val turns = Transcripts.fixture(spark, "c0", texts).toDF()
    // baseline through the default parquet impl
    val dirP = TestSpark.tmpDir("idxparquet")
    IndexBuilder.build(spark, turns, dirP, IndexBuilder.Config(shards = 4))
    val expect = new Searcher(spark, dirP).topK("quick brown fox", 5)
      .select("turn_idx", "score").as[(Int, Double)].collect().toSeq
    // same build + query code, catalog-table storage
    withCatalog { cat =>
      val dirC = TestSpark.tmpDir("idxcatalog")
      IndexBuilder.build(spark, turns, dirC, IndexBuilder.Config(shards = 4))
      val got = new Searcher(spark, dirC).topK("quick brown fox", 5)
        .select("turn_idx", "score").as[(Int, Double)].collect().toSeq
      assert(got == expect)
      // the index tables exist as catalog tables with committed snapshots
      assert(cat.snapshotId(s"$dirC/postings").contains(1L))
      assert(cat.snapshotId(s"$dirC/analyzed").contains(1L))
    }
  }

  test("failed write never commits: readers keep the previous snapshot") {
    withCatalog { cat =>
      val t = TestSpark.tmpDir("cat") + "/t1"
      TableIO.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
      assert(cat.snapshotId(t).contains(1L))
      val boom = udf((s: String) => {
        if (s != null) throw new RuntimeException("mid-write failure"); s
      })
      val bad = Seq((3L, "c")).toDF("id", "v").withColumn("v", boom(col("v")))
      intercept[Exception] { TableIO.write(bad, t) }
      // commit never happened: same snapshot, same rows
      assert(cat.snapshotId(t).contains(1L))
      assert(TableIO.read(spark, t).count() == 2)
    }
  }

  test("append commits a fast-append snapshot referencing prior files") {
    withCatalog { cat =>
      val t = TestSpark.tmpDir("cat") + "/t2"
      TableIO.write(Seq((1L, "a")).toDF("id", "v"), t)
      TableIO.write(Seq((2L, "b")).toDF("id", "v"), t, mode = "append")
      assert(cat.snapshotId(t).contains(2L))
      assert(TableIO.read(spark, t).orderBy("id").as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b")))
      // overwrite replaces, not appends
      TableIO.write(Seq((9L, "z")).toDF("id", "v"), t)
      assert(TableIO.read(spark, t).as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    }
  }
}
