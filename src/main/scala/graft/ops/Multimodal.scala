package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, feature extraction as a batched per-partition pass.
  *
  * The Spark-side shape is real (schema, partitioning, batch iteration);
  * the DECODE STEP IS A STUB: this container ships no image/audio codecs,
  * so `decodeStub` derives deterministic fake dimensions/features from the
  * raw bytes. In production the body of `decodeStub` is replaced by a real
  * decoder (e.g. an ONNX/JNI call, or mapInPandas+Pillow on PySpark) with
  * the identical Dataset contract.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 width: Int, height: Int, feat: Array[Double])

  /** Stand-in media table: the documents' text bytes as the opaque payload
    * (real pipelines read (id, bytes) from Parquet/Iceberg exactly like
    * this). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaRow(id, kind, text.getBytes("UTF-8"))
      }
  }

  /** STUB decoder: deterministic pseudo-metadata from the byte stream. */
  private def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    var h = 7L
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xFF)) & 0x7FFFFFFFL
      sum += (bytes(i) & 0xFF)
      i += 1
    }
    val width = 64 + (h % 512).toInt
    val height = if (kind == "audio") 1 else 64 + ((h >> 9) % 512).toInt
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    (width, height, Array(bytes.length.toDouble, mean, (h % 1000).toDouble, kind.length.toDouble))
  }

  /** Batched feature extraction over partitions — one decoder instance per
    * partition (where a real codec/model would be initialized once). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init point for a real decoder/model session
      rows.map { r =>
        val (w, hgt, feat) = decodeStub(r.kind, r.media)
        MediaFeatures(r.doc_id, r.kind, r.media.length.toLong, w, hgt, feat)
      }
    }
  }

  /** Driver-facing query: media feature table (rows-only check — the
    * decode stub has no SQL analog by design). */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir))
      .toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("width"), col("height"),
        round(element_at(col("feat"), 2), 4).as("byte_mean"))
      .orderBy("doc_id")
}
