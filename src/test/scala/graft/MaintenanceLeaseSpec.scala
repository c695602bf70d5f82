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
    var ran = false
    Manifests.withMaintenanceLease(dir) { ran = true }
    assert(ran, "stale lease must be broken so maintenance can proceed")
    assert(!Files.exists(lock(dir)))
  }

  test("an unreadable lease file is treated as stale, not as held forever") {
    val dir = tmpIndexDir()
    Files.createDirectories(lock(dir).getParent)
    Files.writeString(lock(dir), "not json at all")
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
