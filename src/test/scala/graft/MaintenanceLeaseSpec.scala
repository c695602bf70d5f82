package graft

import graft.build.Manifests
import java.nio.file.{Files, Path}
import java.util.concurrent.CountDownLatch
import org.scalatest.funsuite.AnyFunSuite

/** Single-writer maintenance lease: two concurrent index maintainers must
  * not both stage generation g+1 (they would race the postings_gen commit).
  * Pure-filesystem contract, no Spark session needed. */
class MaintenanceLeaseSpec extends AnyFunSuite {

  private def tmpIndexDir(): String =
    Files.createTempDirectory("graft-lease").toString

  private def lock(indexDir: String): Path =
    java.nio.file.Paths.get(indexDir, "_manifest", "maintenance.lock")

  test("acquire creates the lock, runs the body, and releases it") {
    val dir = tmpIndexDir()
    val out = Manifests.withMaintenanceLease(dir) {
      assert(Files.exists(lock(dir)), "lock must exist while the op runs")
      42
    }
    assert(out == 42)
    assert(!Files.exists(lock(dir)), "lock must be released after the op")
  }

  test("lock is released even when the body throws") {
    val dir = tmpIndexDir()
    intercept[RuntimeException] {
      Manifests.withMaintenanceLease(dir) { throw new RuntimeException("boom") }
    }
    assert(!Files.exists(lock(dir)))
  }

  test("re-entrant within a thread: composite ops take the lease once") {
    val dir = tmpIndexDir()
    val out = Manifests.withMaintenanceLease(dir) {
      Manifests.withMaintenanceLease(dir) {
        assert(Files.exists(lock(dir)))
        "nested"
      }
    }
    assert(out == "nested")
    assert(!Files.exists(lock(dir)))
  }

  test("a fresh foreign lease fails fast instead of racing the commit") {
    val dir = tmpIndexDir()
    Files.createDirectories(lock(dir).getParent)
    Files.writeString(lock(dir),
      s"""{"epochMs":${System.currentTimeMillis()},"pid":999999}""")
    val e = intercept[IllegalStateException] {
      Manifests.withMaintenanceLease(dir) { fail("must not run under a held lease") }
    }
    assert(e.getMessage.contains("another maintainer"))
    assert(Files.exists(lock(dir)), "foreign lease must be left in place")
  }

  test("a stale lease (crashed maintainer) is broken and retaken") {
    val dir = tmpIndexDir()
    Files.createDirectories(lock(dir).getParent)
    val stale = System.currentTimeMillis() - Manifests.LeaseStaleMs - 1000L
    Files.writeString(lock(dir), s"""{"epochMs":$stale,"pid":999999}""")
    // staleness is keyed on the lock's mtime, not its payload
    Files.setLastModifiedTime(lock(dir),
      java.nio.file.attribute.FileTime.fromMillis(stale))
    var ran = false
    Manifests.withMaintenanceLease(dir) { ran = true }
    assert(ran, "stale lease must be broken so maintenance can proceed")
    assert(!Files.exists(lock(dir)))
  }

  test("a fresh lease with an unreadable payload is HELD, not stale") {
    // a reader can race the holder between CREATE_NEW and the payload
    // write and see an empty/garbled file — breaking the lock then would
    // defeat the single-writer guarantee exactly when two maintainers race
    val dir = tmpIndexDir()
    Files.createDirectories(lock(dir).getParent)
    Files.writeString(lock(dir), "not json at all")
    val e = intercept[IllegalStateException] {
      Manifests.withMaintenanceLease(dir) { fail("must not run under a held lease") }
    }
    assert(e.getMessage.contains("another maintainer"))
    assert(Files.exists(lock(dir)), "held lease must be left in place")
  }

  test("an unreadable lease whose mtime is stale is still broken") {
    val dir = tmpIndexDir()
    Files.createDirectories(lock(dir).getParent)
    Files.writeString(lock(dir), "not json at all")
    Files.setLastModifiedTime(lock(dir),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - Manifests.LeaseStaleMs - 1000L))
    var ran = false
    Manifests.withMaintenanceLease(dir) { ran = true }
    assert(ran)
    assert(!Files.exists(lock(dir)))
  }

  test("a second thread contending for the lease fails fast") {
    val dir = tmpIndexDir()
    val held = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() =>
      Manifests.withMaintenanceLease(dir) { held.countDown(); release.await() })
    holder.start()
    held.await()
    try intercept[IllegalStateException] {
      Manifests.withMaintenanceLease(dir) { fail("must not run concurrently") }
    } finally { release.countDown(); holder.join() }
    assert(!Files.exists(lock(dir)), "holder's exit must release the lease")
  }
}
