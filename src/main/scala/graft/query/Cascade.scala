package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cascade rerank pipeline (SURVEY.md §2.1 O9-O14), re-expressed over
  * DataFrames: a sequence of scoring stages; after each non-final stage the
  * candidate set is cut to `topK` (threshold-filtered), the final stage
  * emits `topM`. ≅ CascadeRerankPipeline.cs:74-125 with its config
  * defaults TopK=20, TopM=5, threshold=0.0 (CascadeRerankPipeline.cs:8-13).
  *
  * A stage is any DataFrame => DataFrame that adds/replaces a `score`
  * column — BM25, a mock ranker, or (in production) an LLM-judge stage
  * (O15); the cascade operator itself is scorer-agnostic, exactly like the
  * reference's List<IRanker>.
  *
  * Determinism: cuts order by (round(score,4) desc, tieBreak asc) so stage
  * boundaries are reproducible across engines and runs (SURVEY.md §7.5 D2).
  */
object Cascade {

  final case class Config(topK: Int = 20, topM: Int = 5, threshold: Double = 0.0)

  def run(candidates: DataFrame, stages: Seq[DataFrame => DataFrame],
          cfg: Config, tieBreak: String): DataFrame = {
    require(stages.nonEmpty, "cascade needs at least one stage")
    var cur = candidates
    stages.zipWithIndex.foreach { case (stage, i) =>
      val scored = stage(cur).filter(col("score") >= lit(cfg.threshold))
      val isLast = i == stages.size - 1
      val cut = if (isLast) cfg.topM else cfg.topK
      cur = scored
        .orderBy(round(col("score"), 4).desc, col(tieBreak).asc)
        .limit(cut)
    }
    cur
  }

  /** Per-stage lineage row, ≅ the reference's legacy CascadeRerankResult
    * with stage timings (O13, CascadeRerankPipeline.cs:186-229):
    * candidates in, survivors after threshold, survivors after the cut. */
  final case class StageMetric(stage: Int, nIn: Long, nThreshold: Long,
                               nOut: Long, wallMs: Long)

  /** Like run(), but materializes each stage and reports metrics. Each
    * stage's scored set is persisted before counting so the count, the cut,
    * and the next stage share ONE evaluation instead of recomputing the
    * whole upstream per action; every persisted stage is released before
    * returning (the ≤ topM result recomputes if re-used). */
  def runWithMetrics(candidates: DataFrame, stages: Seq[DataFrame => DataFrame],
                     cfg: Config, tieBreak: String): (DataFrame, Seq[StageMetric]) = {
    require(stages.nonEmpty, "cascade needs at least one stage")
    var cur = candidates
    var nCur = -1L // row count of `cur`, once known (saves the nIn job)
    val metrics = Seq.newBuilder[StageMetric]
    val persisted = Seq.newBuilder[DataFrame]
    stages.zipWithIndex.foreach { case (stage, i) =>
      val t0 = System.nanoTime()
      val nIn = if (nCur >= 0) nCur else cur.count()
      val scored = stage(cur).filter(col("score") >= lit(cfg.threshold))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      persisted += scored
      val nThr = scored.count()
      val cut = if (i == stages.size - 1) cfg.topM else cfg.topK
      cur = scored
        .orderBy(round(col("score"), 4).desc, col(tieBreak).asc)
        .limit(cut)
      nCur = math.min(nThr, cut)
      metrics += StageMetric(i, nIn, nThr, nCur,
        (System.nanoTime() - t0) / 1000000L)
    }
    // all intermediates released — metrics are materialized and the
    // returned frame is a small (≤ topM) plan the caller can recompute;
    // holding the last stage hot would leak one cached table per call
    persisted.result().foreach(_.unpersist(false))
    (cur, metrics.result())
  }
}
