package graft.cli

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing: runMain graft.cli.QBench <sfDir> <q1> [q2 ...]
  * Warm pass then timed pass, like Bench's query section. */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-qbench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    names.foreach { n => qs(n)(spark, sfDir).count() } // warm
    names.foreach { n =>
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).count()
      println(f"QBENCH $n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
