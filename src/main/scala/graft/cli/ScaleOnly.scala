package graft.cli

import graft.Bench

/** Runs ONLY graft.Bench's N-vs-4N build-scaling sampling (skipping the
  * 15-minute query phase) — the iteration loop for protocol work and for
  * re-measuring the scaling number in a quieter window.
  * Usage: runMain graft.cli.ScaleOnly [nTurns]
  */
object ScaleOnly {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    println(s"[scale] lcAvailable=${Bench.lcAvailable} execHeapMb=${Bench.execHeapMb()}")
    val (tpN, tp4N, samples, reg, mem, proto) = Bench.buildThroughputs(n)
    samples.foreach(s => println(
      f"[scale] sample tp_n=${s.tp8}%.0f tp_4n=${s.tp32}%.0f probe_mem_x=${s.probeMemX}%.2f " +
        s"proto_n=${s.proto8} proto_4n=${s.proto32}"))
    println(f"[scale] host probes: register ${reg}%.2fx, memory ${mem}%.2fx; protocol=$proto")
    println(f"""SCALE_JSON {"tp_n":$tpN%.0f,"tp_4n":$tp4N%.0f,"eff":${(tp4N / tpN) / 4.0}%.3f,"protocol":"$proto"}""")
  }
}
