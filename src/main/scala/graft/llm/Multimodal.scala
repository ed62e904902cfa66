package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode/feature-extract implemented as
  * *batched* partition-local transforms (the Scala analogue of
  * `mapInPandas`: one buffer of rows at a time, so a real decoder could
  * amortize codec/model setup per batch).
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB — the Spark-side plumbing (schema,
  * binary handling, batch shape, partitioning) is real and tested.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("declared_w", IntegerType),
      StructField("declared_h", IntegerType))))))

  /** Wrap a text table as a fake media table: payload = UTF-8 bytes.
    * Stands in for `spark.read.format("binaryFile")` output. */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit("image").as("kind"),
             lit(640).as("declared_w"), lit(480).as("declared_h")).as("meta"))

  /** STUB decode kernel: a real implementation would hand `bytes` to an
    * image codec; this derives deterministic pseudo-features from the
    * payload so the pipeline is testable end-to-end. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    // ??? <- real codec goes here (e.g. javax.imageio / ffmpeg binding)
    if (bytes == null || bytes.isEmpty) (0, 0, 0.0)
    else {
      val w = 64 + (math.abs(bytes.head.toInt) % 64) * 16
      val h = 64 + (math.abs(bytes.last.toInt) % 64) * 16
      val mean = bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
      (w, h, math.round(mean * 1e6) / 1e6)
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)))

  /** Batched decode/feature-extract: partitions stream through in
    * `batchSize` buffers (mapInPandas batch shape) — a real decoder
    * initializes once per batch, not once per row. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would go here
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, mean) = decodeStub(bytes)
          Row(id, if (bytes == null) 0 else bytes.length, w, h, mean)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Deterministic frame sampling for video-kind payloads: every
    * `stride`-th frame index up to a stubbed frame count derived from
    * payload size (plumbing for a real demuxer). */
  def sampleFrames(media: DataFrame, stride: Int = 10): DataFrame =
    media
      .withColumn("n_frames", (length(col("payload")) / 16 + 1).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1,
                         lit(stride))))
      .select(col("media_id"), col("frame_idx"), col("n_frames"))
}
