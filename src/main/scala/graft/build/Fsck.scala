package graft.build

import graft.model.Ids
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Index integrity checker — Lucene's CheckIndex re-expressed for the
  * manifest/generation layout. Verifies every cross-table invariant the
  * serving path relies on and returns one [[Fsck.Issue]] per check.
  *
  * Cost shape: every check except `df` is metadata-sized (manifest reads,
  * pruned counts over analyzed columns, tombstone-sized joins). The `df`
  * recount is the one corpus-sized pass — an explode + partial-agg of the
  * live covered docs' term arrays, the exact distributed shape of the
  * build's own df stage — because document frequency is the one derived
  * table whose ground truth IS the corpus. Like CheckIndex, fsck is an
  * offline maintenance verb; run it after restores, migrations, or any
  * suspected partial write.
  *
  * Invariants checked (live = covered analyzed rows minus tombstones):
  *  - meta: index_meta manifest present, shards > 0
  *  - covers: cover manifest per shard at the committed generation,
  *    monotone non-decreasing across generations
  *  - stats: stats.n == |live|, stats.sumlen == Σ len(live),
  *    avgdl == sumlen / n exactly as the build computes it
  *  - tombstones: every tombstoned docId is a covered analyzed row
  *    (deletes only ever target covered docs)
  *  - hwm: per-shard allocation high-water mark ≥ coverage (ranks are
  *    never re-allocated below committed coverage)
  *  - df: the committed df table == per-term live-doc incidence */
object Fsck {

  final case class Issue(check: String, ok: Boolean, detail: String)

  def run(spark: SparkSession, indexDir: String): Seq[Issue] = {
    import spark.implicits._
    val issues = scala.collection.mutable.ArrayBuffer[Issue]()

    val shardsOpt = IndexBuilder.metaShards(indexDir)
    if (shardsOpt.isEmpty || shardsOpt.get <= 0) {
      return Seq(Issue("meta", ok = false,
        s"index_meta manifest missing or invalid at $indexDir"))
    }
    val shards = shardsOpt.get
    issues += Issue("meta", ok = true, s"shards=$shards")
    val gen = IndexBuilder.committedGen(indexDir)

    // covers: present at the committed gen, monotone across generations
    val cover: Array[Long] =
      try {
        val c = IndexBuilder.readCoverAsOf(spark, indexDir, shards, gen)
        val monotone = (0L until gen).forall { g =>
          // earlier generations' covers may predate a rebuilt index; only
          // compare where the manifests still exist
          (0 until shards).forall { s =>
            Manifests.read(indexDir, s"postings_cover_g${g}_$s")
              .forall(_.rows <= c(s))
          }
        }
        issues += Issue("covers", monotone,
          if (monotone) s"gen=$gen covers present, monotone"
          else "a later generation covers FEWER ranks than an earlier one")
        c
      } catch {
        case e: IllegalStateException =>
          issues += Issue("covers", ok = false, e.getMessage)
          return issues.toSeq // everything below needs coverage
      }

    val analyzed = graft.sources.TableIO.read(spark, s"$indexDir/analyzed")
    val coveredRows = analyzed
      .where(expr(s"docId & ${Ids.RankMask}") <
        element_at(lit(cover.clone()), col("shard") + 1))

    // tombstones (full accumulated set at the committed generation)
    val tombPath = IndexBuilder.tombstonePathAsOf(indexDir, gen)
    val tomb = tombPath.map(p =>
      broadcast(graft.sources.TableIO.read(spark, p).select(col("docId"))))

    // tombstone containment: every doomed docId is a covered analyzed row
    tomb.foreach { t =>
      val total = t.count()
      val matched = coveredRows.select(col("docId"))
        .join(t, Seq("docId"), "left_semi").count()
      issues += Issue("tombstones", matched == total,
        s"$matched of $total tombstoned docIds found among covered rows")
    }

    // live = covered minus tombstoned; one pruned aggregate gives n+sumlen
    val live = tomb.fold(coveredRows)(t =>
      coveredRows.join(t, Seq("docId"), "left_anti"))
    val agg = live.agg(count(lit(1)).as("n"),
      coalesce(sum(col("len").cast("long")), lit(0L)).as("sumlen")).collect().head
    val (nLive, sumlenLive) = (agg.getAs[Long]("n"), agg.getAs[Long]("sumlen"))

    try {
      val stats = spark.read.parquet(IndexBuilder.statsPathAsOf(indexDir, gen))
        .collect().head
      val (nStats, avgdlStats) =
        (stats.getAs[Long]("n"), stats.getAs[Double]("avgdl"))
      // legacy pre-sumlen stats schema (explicitly supported by the
      // Searcher and deleteCore): mirror their round(n·avgdl) fallback
      // instead of reporting a healthy index as corrupt
      val legacy = !stats.schema.fieldNames.contains("sumlen")
      val sumlenStats =
        if (legacy) math.round(nStats * avgdlStats)
        else stats.getAs[Long]("sumlen")
      val legacyNote =
        if (legacy) " (legacy stats: sumlen reconstructed as round(n·avgdl))"
        else ""
      issues += Issue("stats_n", nStats == nLive,
        s"stats.n=$nStats, live covered rows=$nLive")
      issues += Issue("stats_sumlen", sumlenStats == sumlenLive,
        s"stats.sumlen=$sumlenStats, Σ len(live)=$sumlenLive$legacyNote")
      val avgdlExpect = if (nLive == 0) 0.0 else sumlenLive.toDouble / nLive
      issues += Issue("stats_avgdl", avgdlStats == avgdlExpect,
        s"stats.avgdl=$avgdlStats, sumlen/n=$avgdlExpect")
    } catch {
      case e: Exception =>
        issues += Issue("stats_n", ok = false,
          s"stats table unreadable at gen $gen: ${e.getMessage}")
    }

    // hwm ≥ cover: allocation never dips below committed coverage
    val hwm = Hwm.read(spark, indexDir, shards)
    val hwmBad = (0 until shards).filter(s => hwm(s) < cover(s))
    issues += Issue("hwm", hwmBad.isEmpty,
      if (hwmBad.isEmpty) "per-shard HWM ≥ cover"
      else s"shards with HWM < cover: ${hwmBad.mkString(",")}")

    // df recount: committed df table == per-term live incidence (the one
    // corpus-sized pass; same explode + partial-agg shape as the build)
    try {
      val expectDf = live.select(explode(col("terms")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("edf"))
      val gotDf = spark.read.parquet(IndexBuilder.dfPathAsOf(indexDir, gen))
        .select(col("term"), col("df"))
      val mismatches = expectDf.join(gotDf, Seq("term"), "full_outer")
        .where(coalesce(col("edf"), lit(0L)) =!= coalesce(col("df"), lit(0L)))
        .select(col("term"), coalesce(col("edf"), lit(0L)).as("expected"),
          coalesce(col("df"), lit(0L)).as("actual"))
        .limit(5).collect()
      issues += Issue("df", mismatches.isEmpty,
        if (mismatches.isEmpty) "df table matches live-doc incidence"
        else mismatches.map(r => s"${r.getString(0)}: expected=${r.getLong(1)} " +
          s"actual=${r.getLong(2)}").mkString("; "))
    } catch {
      case e: Exception =>
        issues += Issue("df", ok = false,
          s"df table unreadable at gen $gen: ${e.getMessage}")
    }

    // doc-meta sidecar (when present): serving joins it INNER, so every
    // analyzed doc must have exactly one sidecar row — a missing row
    // silently drops that doc from scoring aggregations
    val metaDir = s"$indexDir/docmeta"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(metaDir))) try {
      val dm = graft.sources.TableIO.read(spark, metaDir)
      val dmCnt = dm.count()
      val aCnt = analyzed.count()
      val orphans = analyzed.select(col("docId"))
        .join(dm.select(col("docId")), Seq("docId"), "left_anti").count()
      issues += Issue("docmeta", dmCnt == aCnt && orphans == 0L,
        s"docmeta rows=$dmCnt, analyzed rows=$aCnt, analyzed docs missing " +
          s"from sidecar=$orphans")
    } catch {
      case e: Exception =>
        issues += Issue("docmeta", ok = false,
          s"docmeta sidecar unreadable: ${e.getMessage}")
    }

    issues.toSeq
  }
}
