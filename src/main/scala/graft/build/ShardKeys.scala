package graft.build

import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Exact shard→partition placement under Spark's HashPartitioning.
  *
  * `repartition(parts, col("shard"))` places shard s at
  * pmod(murmur3(s), parts) — a balls-in-bins assignment that leaves some
  * partitions with 2-3 shards and others empty, so the slowest task runs
  * 2-3× the median (measured on the posting build). Instead we map each
  * shard to a precomputed key whose murmur3 lands EXACTLY on partition
  * (shard mod parts): perfect round-robin balance, still deterministic,
  * still plain HashPartitioning (no custom Partitioner, no RDDs).
  */
object ShardKeys {

  /** keys(s) = an int v with pmod(murmur3Int(v), parts) == s % parts.
    * Spark's HashPartitioning over an int column is Murmur3_x86_32.hashInt
    * with seed 42 (catalyst Murmur3Hash). */
  def keys(nShards: Int, parts: Int): Array[Int] = {
    val firstFor = new Array[Int](parts)
    java.util.Arrays.fill(firstFor, -1)
    var v = 0
    var found = 0
    while (found < parts) {
      val t = math.floorMod(Murmur3_x86_32.hashInt(v, 42), parts)
      if (firstFor(t) < 0) { firstFor(t) = v; found += 1 }
      v += 1
    }
    Array.tabulate(nShards)(s => firstFor(s % parts))
  }
}
