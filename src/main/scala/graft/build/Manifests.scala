package graft.build

import graft.model.StageManifest
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Checkpoint manifests for resumable index builds (north rule: an
  * interrupted build resumes without recomputation, carrying lineage and
  * row-count/byte metrics).
  *
  * One JSON file per stage under `<indexDir>/_manifest/`, committed by
  * write-to-temp + atomic rename so a stage is either fully recorded or
  * absent — a crashed build never leaves a half-written manifest. Stage
  * outputs themselves are idempotent (deterministic content, overwrite
  * mode), so re-running an incomplete stage is safe. In production the
  * same protocol rides on Iceberg snapshot commits (SURVEY.md §7.6).
  */
object Manifests {

  private def dir(indexDir: String): Path = Paths.get(indexDir, "_manifest")

  def isDone(indexDir: String, stage: String): Boolean =
    Files.exists(dir(indexDir).resolve(s"$stage.json"))

  def read(indexDir: String, stage: String): Option[StageManifest] = {
    val p = dir(indexDir).resolve(s"$stage.json")
    if (!Files.exists(p)) return None
    val s = Files.readString(p)
    def field(k: String): String =
      s.split("\"" + k + "\"\\s*:\\s*")(1).takeWhile(c => c != ',' && c != '}').trim.stripPrefix("\"").stripSuffix("\"")
    Some(StageManifest(stage, field("rows").toLong, field("bytes").toLong,
      field("status"), field("wallMs").toLong))
  }

  def write(indexDir: String, m: StageManifest): Unit = {
    val d = dir(indexDir)
    Files.createDirectories(d)
    val tmp = d.resolve(s".${m.stage}.json.tmp")
    val json =
      s"""{"stage":"${m.stage}","rows":${m.rows},"bytes":${m.bytes},"status":"${m.status}","wallMs":${m.wallMs}}"""
    Files.writeString(tmp, json)
    Files.move(tmp, d.resolve(s"${m.stage}.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def clear(indexDir: String, stage: String): Unit =
    Files.deleteIfExists(dir(indexDir).resolve(s"$stage.json"))

  /** Total bytes under a stage output directory (local fs). */
  def dirBytes(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }
  }

  def all(indexDir: String): Seq[StageManifest] = {
    val d = dir(indexDir)
    if (!Files.exists(d)) return Seq.empty
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".json"))
        .flatMap(p => read(indexDir, p.getFileName.toString.stripSuffix(".json")))
    } finally s.close()
  }
}
