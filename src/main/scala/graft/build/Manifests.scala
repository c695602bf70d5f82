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

  // ---- single-writer maintenance lease --------------------------------------
  // Mutating index operations (append/refresh/delete/update/compact/vacuum)
  // are crash-safe individually but not mutually: two concurrent
  // maintainers would both stage generation g+1 and race the postings_gen
  // pointer commit. The lease makes maintenance single-writer: an
  // exclusive-create lock file holds (epochMs, pid); a second maintainer
  // fails fast rather than corrupting, and a lease older than
  // [[LeaseStaleMs]] (a crashed maintainer — the ops themselves run
  // minutes, not hours) is broken and retaken. Re-entrant within a thread
  // so composite ops (update = delete + append + refresh) take it once.
  // In production the same role is played by the catalog's transactional
  // commit (Iceberg optimistic concurrency); this is the standalone-dir
  // equivalent.

  val LeaseStaleMs: Long = 60L * 60L * 1000L
  private val leaseDepth = new ThreadLocal[Integer] { override def initialValue() = 0 }
  private def leasePath(indexDir: String): Path = dir(indexDir).resolve("maintenance.lock")

  def withMaintenanceLease[T](indexDir: String)(f: => T): T = {
    if (leaseDepth.get() > 0) { // re-entrant: composite op already holds it
      leaseDepth.set(leaseDepth.get() + 1)
      try f finally leaseDepth.set(leaseDepth.get() - 1)
    } else {
      Files.createDirectories(dir(indexDir))
      val p = leasePath(indexDir)
      val payload = s"""{"epochMs":${System.currentTimeMillis()},"pid":${ProcessHandle.current().pid()}}"""
      try Files.write(p, payload.getBytes("UTF-8"), java.nio.file.StandardOpenOption.CREATE_NEW)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // Staleness is keyed on the lock file's MTIME, never its payload:
          // the exclusive CREATE_NEW and the payload write are two steps, so
          // a reader racing the holder can observe an empty/partial file —
          // an unreadable payload must mean HELD (fail fast), not stale, or
          // the single-writer guarantee breaks exactly when it matters. The
          // mtime is set atomically with the create and is always readable.
          val heldMs = try {
            System.currentTimeMillis() - Files.getLastModifiedTime(p).toMillis
          } catch {
            // lock vanished between CREATE_NEW failing and the stat: the
            // holder released — fall through to the retake (CREATE_NEW
            // below still fails fast if a third party grabbed it first)
            case _: java.nio.file.NoSuchFileException => Long.MaxValue
          }
          if (heldMs <= LeaseStaleMs)
            throw new IllegalStateException(
              s"another maintainer holds $p (for ${heldMs / 1000}s); " +
                "concurrent maintenance would race the generation commit")
          // Stale lease from a crashed maintainer: break it by ATOMIC_MOVE
          // of the lock file aside — of N concurrent breakers exactly ONE
          // move succeeds (the losers see NoSuchFileException), so a
          // breaker can never delete another breaker's freshly RETAKEN
          // lock (the old delete-then-CREATE_NEW pair could interleave:
          // breaker B's delete removed breaker A's new lock and both
          // CREATE_NEWs succeeded — a double-granted lease).
          val aside = p.resolveSibling(s".maintenance.lock.broken." +
            s"${ProcessHandle.current().pid()}.${System.nanoTime()}")
          val wonBreak =
            try { Files.move(p, aside, StandardCopyOption.ATOMIC_MOVE); true }
            catch { case _: java.nio.file.NoSuchFileException => false }
          if (wonBreak) {
            // stat→move window guard: if the file we moved is in fact
            // FRESH — the stale holder released and a new maintainer
            // acquired between our mtime read and our move — hand it back
            // and fail fast as held.
            val movedAgeMs =
              try System.currentTimeMillis() - Files.getLastModifiedTime(aside).toMillis
              catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }
            if (movedAgeMs <= LeaseStaleMs) {
              try Files.move(aside, p, StandardCopyOption.ATOMIC_MOVE)
              catch { case _: Throwable => Files.deleteIfExists(aside) }
              throw new IllegalStateException(
                s"another maintainer holds $p; " +
                  "concurrent maintenance would race the generation commit")
            }
            Files.deleteIfExists(aside)
          }
          // wonBreak or not, the retake itself is the usual exclusive
          // create: whoever lost any race above fails fast here
          try Files.write(p, payload.getBytes("UTF-8"), java.nio.file.StandardOpenOption.CREATE_NEW)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              throw new IllegalStateException(
                s"another maintainer retook the stale lease $p first; " +
                  "concurrent maintenance would race the generation commit")
          }
      }
      leaseDepth.set(1)
      try f finally {
        leaseDepth.set(0)
        Files.deleteIfExists(p)
      }
    }
  }

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
