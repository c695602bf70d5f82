package graft.cli

import org.apache.spark.sql.SparkSession

/** Probe: can this JVM host an in-process local-cluster master (forked
  * executor JVMs inheriting the parent classpath) and run graft code in
  * the executors? Used to validate graft.Bench's executor-level scaling
  * protocol on this sandbox. */
object LcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,4096]")
      // forked executors resolve Spark from SPARK_HOME (/opt/spark) and
      // graft classes from the build output shipped on their classpath
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.executor.memory", "3g")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // force graft class usage inside executors
    val n = graft.sources.Transcripts.synth(spark, 50000, parallelism = 8)
      .toDF().selectExpr("conv_id", "text").as[(String, String)]
      .mapPartitions { it =>
        val pa = new graft.analysis.PartitionAnalyzer(
          graft.analysis.StopWords.forLang("en"), graft.analysis.Analyzer.Identity)
        it.map { case (_, t) => pa.analyze(t)._1.toLong }
      }.reduce(_ + _)
    println(s"LCPROBE_OK tokens=$n")
    spark.stop()
  }
}
