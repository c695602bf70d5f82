package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-similarity operators over the embeddings table
  * (vec_id, embedding: array<float>, label).
  *
  * Cosine math runs as Catalyst higher-order functions (zip_with +
  * aggregate), fully codegen-friendly — no UDFs. Floats are cast to double
  * BEFORE any arithmetic so both engines compute in f64.
  *
  *  - cosTopK: brute-force top-k — the exact baseline.
  *  - annIvf: IVF-style ANN — centroids per label cluster, probe the
  *    nearest `nprobe` clusters, exact search inside. The cluster pruning
  *    is the 100-TB path: the probe set is chosen from a tiny centroid
  *    table, and the exact search scans only matching partitions.
  *  - similarPairs: blocked (same-label) pair similarity — the
  *    embedding-cosine near-dup pattern.
  */
object VectorOps {

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"),
        col("label").cast("long").as("label"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force cosine top-k against the vector with vec_id = targetId. */
  def cosTopK(spark: SparkSession, sfDir: String, targetId: Long, k: Int): DataFrame = {
    val v = emb(spark, sfDir)
    val q = v.filter(col("vec_id") === targetId).select(col("e").as("qe"))
    v.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("e"), col("qe")) / (norm(col("e")) * norm(col("qe"))), 4).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** IVF ANN: per-label centroids; probe the nprobe nearest clusters by
    * centroid cosine; exact cosine inside the probed clusters. */
  def annIvf(spark: SparkSession, sfDir: String, targetId: Long, k: Int,
             nprobe: Int): DataFrame = {
    val v = emb(spark, sfDir)
    val cent = v.select(col("label"), posexplode(col("e")).as(Seq("i", "x")))
      .groupBy("label", "i").agg(avg("x").as("c"))
      .groupBy("label").agg(array_sort(collect_list(struct(col("i"), col("c")))).as("ic"))
      .select(col("label"), expr("transform(ic, p -> p.c)").as("ce"))
    val q = v.filter(col("vec_id") === targetId).select(col("e").as("qe"))
    val probed = cent.crossJoin(broadcast(q))
      .select(col("label"),
        round(dot(col("ce"), col("qe")) / (norm(col("ce")) * norm(col("qe"))), 4).as("cc"))
      .orderBy(desc("cc"), asc("label"))
      .limit(nprobe)
      .select("label")
    v.join(broadcast(probed), "label")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("e"), col("qe")) / (norm(col("e")) * norm(col("qe"))), 4).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Top-n most similar same-label pairs (a < b) by cosine. */
  def similarPairs(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val v = emb(spark, sfDir)
    val l = v.select(col("label"), col("vec_id").as("a"), col("e").as("ea"))
    val r = v.select(col("label"), col("vec_id").as("b"), col("e").as("eb"))
    l.join(r, Seq("label"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot(col("ea"), col("eb")) / (norm(col("ea")) * norm(col("eb"))), 4).as("cos"))
      .orderBy(desc("cos"), asc("a"), asc("b"))
      .limit(n)
  }
}
