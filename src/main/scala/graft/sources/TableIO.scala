package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage seam for the index tables (SURVEY.md §7.6): Parquet in this
  * sandbox, an Iceberg (or any catalog-table) implementation as a config
  * swap in production — `TableIO.impl` is the single point the engine
  * reads/writes index tables through. An Iceberg implementation would
  * map `path` to a catalog table identifier and let snapshot commits
  * subsume the _manifest/ protocol.
  */
trait TableIO extends Serializable {
  def read(spark: SparkSession, path: String): DataFrame
  /** Read the union of several same-schema tables (base + delta posting
    * segments). Default is a plan-level union; the Parquet implementation
    * overrides with a single multi-path scan so split planning and
    * pushdown happen once. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    paths.map(read(spark, _)).reduce(_ unionByName _)
  def write(df: DataFrame, path: String, mode: String = "overwrite"): Unit
}

object ParquetTableIO extends TableIO {
  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
  override def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)
  def write(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).parquet(path)
}

object TableIO {
  /** Deployment-configured implementation (default: Parquet files). */
  @volatile var impl: TableIO = ParquetTableIO
  def read(spark: SparkSession, path: String): DataFrame = impl.read(spark, path)
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = impl.read(spark, paths)
  def write(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    impl.write(df, path, mode)
}
