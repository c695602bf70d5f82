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
    println(s"[scale] lcAvailable=${Bench.lcAvailable}")
    val (tp8, tp32, samples, reg, mem) = Bench.buildThroughputs(n)
    samples.foreach(s => println(
      f"[scale] sample tp8=${s.tp8}%.0f tp32=${s.tp32}%.0f probe_mem_x=${s.probeMemX}%.2f"))
    println(f"[scale] host probes: register ${reg}%.2fx, memory ${mem}%.2fx")
    println(f"""SCALE_JSON {"tp8":$tp8%.0f,"tp32":$tp32%.0f,"eff":${(tp32 / tp8) / 4.0}%.3f}""")
  }
}
