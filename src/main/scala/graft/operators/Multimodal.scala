package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.ScalarOps

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode/feature-extraction staged as
  * per-partition batch operators.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake features from the
  * bytes. The Spark-side contract is real — schema, batch shape,
  * partition-parallel execution — so swapping in a real decoder (e.g. a
  * JNI-backed mapPartitions, or `mapInPandas`+PIL on PySpark) changes one
  * function.
  *
  * Scale: binaries ride in parquet as BYTE_ARRAY; select only metadata
  * columns when features suffice (column pruning skips the blobs);
  * repartition by size-class before decode so one executor doesn't get all
  * the 4K videos.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),      // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType),
      StructField("content_hash", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("frame_count", IntegerType))))))

  /** Wrap a documents-shaped DF into the media schema (text bytes stand in
    * for media payloads; deterministic fake dimensions from the content
    * hash).
    */
  def attachBinary(docs: DataFrame): DataFrame = {
    val h = ScalarOps.md5Hash32(col("text"))
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("modality"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        length(encode(col("text"), "UTF-8")).cast(LongType).as("byte_len"),
        h.as("content_hash"),
        (lit(64) + (h % 512)).cast(IntegerType).as("width"),
        (lit(64) + (h % 256)).cast(IntegerType).as("height"),
        (col("n_chars") % 30).cast(IntegerType).as("frame_count")).as("meta"))
  }

  /** STUB decode: real implementation would decode `bytes` with an image
    * library per partition. Here: deterministic per-row features computed
    * from the raw bytes in a mapPartitions batch (mirrors the real decode's
    * execution shape — iterator-in/iterator-out, one JVM call per batch).
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("byte_len", LongType),
      StructField("first_byte", IntegerType),
      StructField("byte_sum_64", LongType)))
    val rdd = media.select("media_id", "modality", "bytes").rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        // ??? real decode goes here (PIL/ffmpeg equivalent); fake features:
        val head = bytes.take(64)
        Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
          bytes.length.toLong,
          if (bytes.nonEmpty) bytes(0).toInt & 0xff else -1,
          head.foldLeft(0L)((a, b) => a + (b & 0xff)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for video-modality rows: emit every `stride`-th frame
    * index as its own row — the explode pattern a real frame extractor
    * would follow.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media
      .filter(col("meta.frame_count") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.frame_count") - 1, lit(stride))))
      .select("media_id", "modality", "frame_idx")
}
