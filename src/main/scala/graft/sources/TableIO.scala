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

/** Iceberg-SHAPED second implementation of the seam (SURVEY.md §7.6; the
  * sandbox has no Iceberg jar, so this is the catalog-table protocol
  * without the format): every engine path maps to a catalog table
  * IDENTIFIER, every write stages its files under a NEW snapshot location
  * and becomes visible only through ONE atomic catalog pointer swap (the
  * analogue of an Iceberg metadata-pointer commit), and readers resolve
  * the identifier to the last COMMITTED snapshot — a crashed or failed
  * write leaves only unreachable staging, never a half-visible table.
  * Appends commit a new snapshot that references the previous snapshot's
  * files plus the new ones (Iceberg fast-append). A real Iceberg
  * implementation swaps the ConcurrentHashMap for a catalog service and
  * `parquet(...)` for the Iceberg writer; nothing in the engine changes —
  * proven by the spec that runs build+query through this class unchanged.
  */
final class CatalogTableIO(warehouse: String) extends TableIO {

  final case class Snapshot(id: Long, dataLocations: Seq[String])

  /** The "catalog": identifier → committed snapshot. The single put below
    * is the commit point. */
  private val catalog = new java.util.concurrent.ConcurrentHashMap[String, Snapshot]()

  /** Path → catalog identifier (namespace `graft`, table name from the
    * path — the mapping an Iceberg deployment would configure). */
  def identifier(path: String): String =
    "graft." + path.replaceAll("[^A-Za-z0-9_]+", "_").replaceAll("^_+|_+$", "")

  /** Committed snapshot id of a table (test/inspection hook). */
  def snapshotId(path: String): Option[Long] =
    Option(catalog.get(identifier(path))).map(_.id)

  def read(spark: SparkSession, path: String): DataFrame = {
    val id = identifier(path)
    val snap = catalog.get(id)
    if (snap == null)
      throw new IllegalStateException(s"catalog table $id does not exist")
    spark.read.parquet(snap.dataLocations: _*)
  }

  override def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val locs = paths.flatMap { p =>
      val snap = catalog.get(identifier(p))
      if (snap == null)
        throw new IllegalStateException(s"catalog table ${identifier(p)} does not exist")
      snap.dataLocations
    }
    spark.read.parquet(locs: _*)
  }

  def write(df: DataFrame, path: String, mode: String = "overwrite"): Unit = {
    val id = identifier(path)
    val prev = catalog.get(id)
    val snapId = (if (prev == null) 0L else prev.id) + 1L
    val loc = s"$warehouse/${id.replace('.', '/')}/snap_$snapId"
    // stage: files land under the new snapshot location — invisible to
    // every reader until the commit below succeeds
    df.write.mode("overwrite").parquet(loc)
    val locations =
      if (mode == "append" && prev != null) prev.dataLocations :+ loc
      else Seq(loc)
    // commit: the single atomic pointer swap
    catalog.put(id, Snapshot(snapId, locations))
  }
}
