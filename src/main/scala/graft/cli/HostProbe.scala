package graft.cli

/** Host parallel-scaling probe: separates CPU-core scaling from DRAM
  * bandwidth scaling, to ground the benchmark's efficiency caveat.
  *
  *  - `registerBurn`: pure register arithmetic — scales with real cores.
  *  - `memoryBurn`: streaming sums over a 2 GiB heap array — scales only
  *    as far as the host's memory bandwidth allows.
  *
  * Reported as speedup(32 threads vs 8 threads); ideal is 4.0.
  */
object HostProbe {

  private def runThreads(n: Int)(body: Int => Unit): Double = {
    val ts = (0 until n).map { i => new Thread(() => body(i)) }
    val t0 = System.nanoTime()
    ts.foreach(_.start())
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Each thread does `iters` multiply-add steps in registers. */
  def registerBurn(threads: Int, iters: Long = 2000000000L): Double =
    runThreads(threads) { _ =>
      var x = 1L
      var j = 0L
      while (j < iters) { x = x * 6364136223846793005L + 1442695040888963407L; j += 1 }
      if (x == 42L) println("")
    }

  /** Each thread streams over its slice of a shared 2 GiB array `passes`
    * times, summing. */
  def memoryBurn(threads: Int, arr: Array[Long], passes: Int = 8): Double = {
    val chunk = arr.length / threads
    runThreads(threads) { i =>
      val lo = i * chunk
      val hi = if (i == threads - 1) arr.length else lo + chunk
      var s = 0L
      var p = 0
      while (p < passes) {
        var j = lo
        while (j < hi) { s += arr(j); j += 1 }
        p += 1
      }
      if (s == 42L) println("")
    }
  }

  /** (registerSpeedup, memorySpeedup) from 8 → 32 threads. */
  def measure(): (Double, Double) = {
    val arr = new Array[Long](256 * 1024 * 1024) // 2 GiB
    java.util.Arrays.fill(arr, 3L)
    measureWith(arr)
  }

  /** Like [[measure]] but over a caller-owned (already-filled) buffer, so
    * repeated bracketing probes don't re-pay the 2 GiB alloc+fill. */
  def measureWith(arr: Array[Long]): (Double, Double) = {
    registerBurn(2, 200000000L) // JIT warm
    memoryBurn(2, arr, 1)
    // registerBurn: per-thread work fixed → total work ∝ threads →
    //   throughput speedup = (32/t32)/(8/t8).
    // memoryBurn: the array is SPLIT among threads → total work constant →
    //   speedup = t8/t32.
    val r8 = registerBurn(8); val r32 = registerBurn(32)
    val m8 = memoryBurn(8, arr); val m32 = memoryBurn(32, arr)
    val regSpeed = (32.0 / r32) / (8.0 / r8)
    val memSpeed = m8 / m32
    (regSpeed, memSpeed)
  }
}
