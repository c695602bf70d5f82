package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): times any subset of
  * the declared query surface in isolation with the SAME session shape and
  * methodology as [[Bench]] (warm pass, then best-of-N timed `.count()`s)
  * and optionally dumps each query's `.explain("formatted")` plan for the
  * before/after record. Bench.scala itself is frozen for measurement — this
  * separate main exists so optimization work can measure without touching
  * the driver contract.
  *
  * Usage: `sbt "runMain graft.BenchExtra [query ...]"` (no args = all).
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (as Bench), GRAFT_PLANS_DIR
  * (when set, writes `<dir>/<query>.txt` formatted plans), GRAFT_EXTRA_REPS
  * (timed reps per query, default 2; min is reported, like Bench).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_EXTRA_REPS", "2").toInt
    val plansDir = sys.env.get("GRAFT_PLANS_DIR")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.io.compression.codec",
        sys.env.getOrElse("GRAFT_IO_CODEC", "zstd"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Overhead-vs-compute attribution (guide §1/§7): per timed query,
    // count jobs/stages/tasks and sum executor task time — wall far above
    // task time means scheduling/planning overhead, not compute.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    def counters(): (Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, taskMs.get)
    graft.ops.DocQueries.indexDir(spark, sfDir)
    plansDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    val out = new StringBuilder("{")
    var first = true
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[bench-extra] unknown query $name")
        case Some(fn) =>
          try {
            spark.sparkContext.setJobDescription(s"warmup $name")
            fn(spark, sfDir).count() // warm: JIT, codegen, IO cache, builds
            var stat = (0L, 0L, 0L, 0L)
            val times = (1 to reps).map { r =>
              spark.sparkContext.setJobDescription(s"$name rep$r")
              val before = counters()
              val t0 = System.nanoTime()
              fn(spark, sfDir).count()
              val w = (System.nanoTime() - t0) / 1e9
              Thread.sleep(50) // listener events drain async
              val after = counters()
              stat = (after._1 - before._1, after._2 - before._2,
                after._3 - before._3, after._4 - before._4)
              w
            }
            plansDir.foreach { d =>
              val plan = fn(spark, sfDir).queryExecution.explainString(
                org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
              java.nio.file.Files.write(
                java.nio.file.Paths.get(d, s"$name.txt"),
                plan.getBytes("UTF-8"))
            }
            println(f"[bench-extra] $name%-22s min=${times.min}%.4f  runs=${times.map(t => f"$t%.4f").mkString(",")}  " +
              s"lastrep: jobs=${stat._1} stages=${stat._2} tasks=${stat._3} taskMs=${stat._4}")
            if (!first) out.append(",")
            out.append("\"").append(name).append(f"""":${times.min}%.4f""")
            first = false
          } catch { case e: Throwable =>
            println(s"[bench-extra] $name FAILED: ${e.getMessage}")
          }
      }
    }
    println(out.append("}").toString)
    spark.stop()
  }
}
