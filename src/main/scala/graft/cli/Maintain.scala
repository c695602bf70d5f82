package graft.cli

import graft.build.IndexBuilder
import org.apache.spark.sql.SparkSession

/** Index-maintenance entry point for the incremental path:
  *
  *   Maintain append  <indexDir> <parquetPath|nTurns>   — land new turns
  *   Maintain refresh <indexDir>                        — make them searchable
  *   Maintain upsert  <indexDir> <parquetPath>          — replace-or-insert by (conv_id, turn_idx)
  *   Maintain delete  <indexDir> <sqlPredicate>         — tombstone matching docs
  *   Maintain compact <indexDir>                        — fold delta segments, drop tombstoned docs
  *   Maintain vacuum  <indexDir>                        — compact + purge tombstoned rows from analyzed/
  *   Maintain fsck    <indexDir>                        — integrity check (CheckIndex); exit 2 on failure
  *   Maintain merge   <outDir> <src1,src2,...>          — merge standing indexes (addIndexes, no re-analysis)
  *   Maintain status  <indexDir>                        — generation + manifests
  *
  * The delete predicate is SQL over the analyzed table's columns
  * (conv_id, turn_idx, len, shard), e.g. "conv_id LIKE 'c00%'".
  */
object Maintain {
  def main(args: Array[String]): Unit = {
    val cmd = args(0)
    val indexDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val builder = SparkSession.builder()
      .appName(s"graft-maintain-$cmd")
      .config("spark.sql.shuffle.partitions", cpus)
      // zstd shuffle/broadcast codec: measured 2.6x less shuffle byte
      // traffic than lz4 at IDENTICAL wall time on this pipeline at both 8
      // and 32 cores (BENCH/BASELINE.md exchange table) -- at cluster scale
      // that is 2.6x less network+spill IO for free. Must be set at session
      // creation: SparkEnv reads it once at context start.
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (!sys.props.contains("spark.master")) builder.master(s"local[$cpus]")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    cmd match {
      case "append" =>
        val src = args(2)
        val input =
          if (src.forall(_.isDigit))
            graft.sources.Transcripts.synth(spark, src.toLong, parallelism = cpus.toInt).toDF()
          else spark.read.parquet(src)
        IndexBuilder.append(spark, input, indexDir)
        println(f"[maintain] appended in ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          "(searchable after the next refresh)")
      case "refresh" =>
        val before = IndexBuilder.committedGen(indexDir)
        IndexBuilder.refresh(spark, indexDir)
        val after = IndexBuilder.committedGen(indexDir)
        if (after == before)
          println(s"[maintain] nothing to refresh (generation $before)")
        else
          println(f"[maintain] committed generation $after in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      case "upsert" =>
        val replaced = IndexBuilder.update(spark, spark.read.parquet(args(2)), indexDir)
        println(f"[maintain] upserted in ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"($replaced replaced; generation ${IndexBuilder.committedGen(indexDir)})")
      case "delete" =>
        val dn = IndexBuilder.delete(spark, indexDir,
          org.apache.spark.sql.functions.expr(args(2)))
        println(f"[maintain] tombstoned $dn doc(s) in ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"(generation ${IndexBuilder.committedGen(indexDir)}; compact reclaims the space)")
      case "compact" =>
        IndexBuilder.compact(spark, indexDir)
        println(f"[maintain] compacted in ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"(generation ${IndexBuilder.committedGen(indexDir)})")
      case "vacuum" =>
        IndexBuilder.vacuum(spark, indexDir)
        println(f"[maintain] vacuumed in ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"(generation ${IndexBuilder.committedGen(indexDir)}; tombstones retired)")
      case "merge" =>
        val srcs = args(2).split(",").toSeq
        IndexBuilder.merge(spark, srcs, indexDir)
        println(f"[maintain] merged ${srcs.size} index(es) into $indexDir in " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      case "fsck" =>
        val issues = graft.build.Fsck.run(spark, indexDir)
        issues.foreach(i =>
          println(s"[fsck] ${if (i.ok) "PASS" else "FAIL"} ${i.check}: ${i.detail}"))
        val bad = issues.filterNot(_.ok)
        if (bad.isEmpty)
          println(f"[fsck] index OK (${issues.size} checks) in " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        else {
          println(s"[fsck] ${bad.size} check(s) FAILED")
          spark.stop()
          sys.exit(2)
        }
      case "status" =>
        val gen = IndexBuilder.committedGen(indexDir)
        val segs = IndexBuilder.segmentPaths(spark, indexDir)
        val st = spark.read.parquet(IndexBuilder.statsPath(indexDir)).head()
        println(s"[maintain] generation $gen; ${segs.size} live segment(s); " +
          s"n=${st.getAs[Long]("n")} avgdl=${st.getAs[Double]("avgdl")}")
        segs.foreach(p => println(s"  segment: $p"))
      case other => sys.error(s"unknown command '$other' (append|refresh|upsert|delete|compact|vacuum|status)")
    }
    spark.stop()
  }
}
