package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-similarity operators over the embeddings table
  * (vec_id, embedding: array<float>).
  *
  * Cosine math runs as Catalyst higher-order functions (zip_with +
  * aggregate), fully codegen-friendly — no UDFs. Floats are cast to double
  * BEFORE any arithmetic so both engines compute in f64.
  *
  * Every *bucketing/assignment* decision (LSH signatures, k-means
  * distances, centroid updates) is computed in QUANTIZED INTEGER arithmetic
  * (milli-units: round(x·1000) as BIGINT): integer sums are associative, so
  * Spark and the DuckDB oracle make bit-identical decisions regardless of
  * aggregation order — doubles appear only in the final exact-cosine verify
  * step, rounded to 4dp on both sides.
  *
  *  - cosTopK: brute-force top-k — the exact baseline.
  *  - annIvf: IVF ANN with k-means-trained centroids (Lloyd iterations as
  *    DataFrame aggregations, centroids collected per iteration — they are
  *    K·dim values, never corpus-sized). Probe the nearest `nprobe`
  *    clusters, exact cosine inside. Label-free: runs on unlabeled data.
  *  - similarPairs: near-dup pairs via random-hyperplane LSH — signature
  *    band-bucket equi-join for candidates (NEVER an all-pairs join),
  *    exact cosine verify, top-n emit. Mirrors the MinHash-LSH shape used
  *    for text (TextOps.minHashPairs).
  */
object VectorOps {

  val Dim = 64

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Quantized milli-unit vector: round(x·1000) as BIGINT. round() is
    * half-away-from-zero in both Spark (HALF_UP on BigDecimal) and DuckDB. */
  private def quantize(e: Column): Column =
    transform(e, x => round(x * lit(1000), 0).cast("long"))

  // ---- random-hyperplane LSH ------------------------------------------------

  /** Deterministic ±1 hyperplane entries from an LCG mod 2^31-1 — the same
    * closed form is emitted into the oracle SQL, so both engines build the
    * identical hyperplane family. */
  val LshBits = 32
  val LshBands = 4
  val LshRows: Int = LshBits / LshBands // 8 bits per band
  def hpSign(idx: Int): Long = {
    val h = (1103515245L * (idx + 1) + 12345L) % 2147483647L
    if (h % 2 == 1) 1L else -1L
  }

  /** array<struct<band,key>> of the vector's LSH band buckets. */
  private def bandKeys(qv: Column): Column = {
    def bit(i: Int): Column = {
      val hp = lit((0 until Dim).map(j => hpSign(i * Dim + j)).toArray)
      when(aggregate(zip_with(qv, hp, _ * _), lit(0L), _ + _) >= 0, lit(1L)).otherwise(lit(0L))
    }
    def key(b: Int): Column =
      (0 until LshRows).map(r => bit(b * LshRows + r) * lit(1L << (LshRows - 1 - r)))
        .reduce(_ + _)
    array((0 until LshBands).map(b =>
      struct(lit(b).as("band"), key(b).as("key"))): _*)
  }

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

  // ---- IVF ANN with k-means-trained centroids -------------------------------

  val KmeansK = 8
  val KmeansIters = 3

  /** Nearest-centroid id by quantized L2 (ties → smaller k); array_min on
    * (dist, k) structs uses Spark's lexicographic struct ordering. */
  private def assignCol(qv: Column, cents: Array[Array[Long]]): Column = {
    val ds = cents.zipWithIndex.map { case (c, k) =>
      struct(
        aggregate(zip_with(qv, lit(c), (a, b) => (a - b) * (a - b)), lit(0L), _ + _).as("d"),
        lit(k).as("k"))
    }
    array_min(array(ds: _*)).getField("k")
  }

  /** Lloyd-trained centroids in milli-units. Seed: the K smallest vec_ids.
    * Per iteration: integer-L2 assignment, centroid = round(avg) per dim
    * (empty cluster keeps its previous centroid). Only K·dim values ever
    * reach the driver. */
  private[ops] def trainCentroids(vq: DataFrame): Array[Array[Long]] = {
    var cents: Array[Array[Long]] = vq.orderBy("vec_id").limit(KmeansK)
      .select("qv").collect()
      .map(_.getSeq[Long](0).toArray)
    for (_ <- 1 to KmeansIters) {
      val updated = vq.withColumn("k", assignCol(col("qv"), cents))
        .select(col("k"), posexplode(col("qv")).as(Seq("j", "x")))
        .groupBy("k", "j").agg(round(avg("x"), 0).cast("long").as("c"))
        .collect()
        .groupBy(_.getAs[Int]("k"))
        .map { case (k, rows) =>
          val c = new Array[Long](Dim)
          rows.foreach(r => c(r.getAs[Int]("j")) = r.getAs[Long]("c"))
          k -> c
        }
      cents = cents.indices.map(k => updated.getOrElse(k, cents(k))).toArray
    }
    cents
  }

  /** IVF ANN: train K centroids by k-means, probe the `nprobe` clusters
    * nearest to the target (quantized L2, ties → smaller k), exact cosine
    * among members of the probed clusters only. */
  def annIvf(spark: SparkSession, sfDir: String, targetId: Long, k: Int,
             nprobe: Int): DataFrame = {
    val v = emb(spark, sfDir)
    val vq = v.withColumn("qv", quantize(col("e")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = trainCentroids(vq)

    val tq = vq.filter(col("vec_id") === targetId).select("qv")
      .head().getSeq[Long](0).toArray
    val probed = cents.zipWithIndex.map { case (c, kk) =>
      val d = (0 until Dim).map(j => { val g = tq(j) - c(j); g * g }).sum
      (d, kk)
    }.sorted.take(nprobe).map(_._2).toSet

    val q = v.filter(col("vec_id") === targetId).select(col("e").as("qe"))
    vq.withColumn("k", assignCol(col("qv"), cents))
      .filter(col("k").isin(probed.toSeq: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("e"), col("qe")) / (norm(col("e")) * norm(col("qe"))), 4).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Top-n most similar candidate pairs (a < b) by cosine; candidates come
    * from the random-hyperplane band buckets (equi-join on (band, key)) —
    * the 100-TB shape: no label blocking, no all-pairs join anywhere. */
  def similarPairs(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val v = emb(spark, sfDir)
    val bands = v
      .select(col("vec_id"), explode(bandKeys(quantize(col("e")))).as("bk"))
      .select(col("vec_id"), col("bk.band"), col("bk.key"))
    val cand = bands.select(col("band"), col("key"), col("vec_id").as("a"))
      .join(bands.select(col("band"), col("key"), col("vec_id").as("b")), Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    cand
      .join(v.select(col("vec_id").as("a"), col("e").as("ea")), "a")
      .join(v.select(col("vec_id").as("b"), col("e").as("eb")), "b")
      .select(col("a"), col("b"),
        round(dot(col("ea"), col("eb")) / (norm(col("ea")) * norm(col("eb"))), 4).as("cos"))
      .orderBy(desc("cos"), asc("a"), asc("b"))
      .limit(n)
  }
}
