package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode/feature-extract implemented as
  * partition-local transforms. [[extractFeatures]] keeps the *batched*
  * shape (the Scala analogue of `mapInPandas`: one buffer of rows at a
  * time, the slot where codec/model setup would be amortized per
  * batch); [[audioFeatures]]/[[videoFeatures]] are deliberately
  * unbatched — their decode is stateless and their payloads are the
  * largest rows in the system, so a row group would buffer 64 full
  * clips per task for no amortization benefit.
  *
  * The decode kernels are REAL for images (`javax.imageio` —
  * PNG/BMP/JPEG, pure JDK), audio (`javax.sound.sampled` — WAV PCM,
  * pure JDK) and video (YUV4MPEG2/Y4M — plain-text header + raw
  * frames, parsed here directly): payloads are parsed and
  * width/height/mean-channel resp. sample-rate/duration/mean-amplitude
  * resp. geometry/frame-count/mean-luma extracted. Only payloads no
  * pure-JDK parser can read (compressed video containers, exotic
  * codecs) fall back to a clearly-marked deterministic stub, keeping
  * the pipeline shape testable end-to-end for every kind.
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

  /** Materialize real `<id>.png` files for ids [0, n) under a fresh
    * reaper-registered temp directory and return the directory — the
    * fixture side of the `binaryFile` SOURCE probe. The in-memory
    * media tables above deliberately "stand in" for
    * `spark.read.format("binaryFile")`; this closes the loop with the
    * real source format. Driver-side writes: `n` is a fixture bound
    * (tens of tiny files), not corpus scale — in production the files
    * already exist on distributed storage and only the read side runs. */
  def writePngDir(spark: org.apache.spark.sql.SparkSession,
                  n: Int): String = {
    require(n <= 4096, s"fixture bound exceeded: $n")
    val conf = spark.sessionState.newHadoopConf()
    val dir = graft.core.Tables.registerStagedDir(
      graft.core.Tables.tmpDir + "/media_png_" +
        java.util.UUID.randomUUID().toString, conf)
    // write through the Hadoop FileSystem resolved from the SAME conf
    // the reaper will delete with — java.io.File would silently write
    // a bogus local 's3a:…' directory whenever GRAFT_TMP_DIR is a
    // scheme'd path, while the reaper deleted the (never-written)
    // remote one
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p)
    (0L until n.toLong).foreach { id =>
      val out = fs.create(
        new org.apache.hadoop.fs.Path(p, s"$id.png"), true)
      try out.write(encodePng(id)) finally out.close()
    }
    dir
  }

  // ---------- perceptual-hash image fixtures (r10) ----------

  /** Deterministic gradient-pattern image for the perceptual-hash
    * dedup probe: luma(x, y) = (c + x·sx + y·sy) mod 200, with c/sx/sy
    * pure functions of the id. Unlike the two-band [[encodePng]]
    * images (whose 8×8 average-hash collapses to one of three
    * patterns corpus-wide — every cross pair would "match"), the
    * gradient makes the hash diverse across ids while every cell mean
    * stays a closed-form function of the id — so the DuckDB oracle
    * predicts the hash ARITHMETICALLY without decoding PNG (the
    * established multimodal-oracle pattern). Luma ≤ 199 so the +50
    * perturbation below never clamps. */
  def patternBase(id: Long): Int = ((id * 11 + 3) % 200).toInt
  def patternSx(id: Long): Int = 1 + (id % 7).toInt
  def patternSy(id: Long): Int = 1 + (id % 5).toInt
  def patternLuma(id: Long, x: Int, y: Int): Int =
    (patternBase(id) + x * patternSx(id) + y * patternSy(id)) % 200

  /** Variants: 0 = 32×32 original; 1 = 64×64 pixel-doubled resize
    * (identical cell means → Hamming 0); 2 = original with +50 on the
    * top-left 4×4 block (exactly aHash cell (0,0) → a small, exactly
    * predictable Hamming perturbation). */
  def encodePngPattern(id: Long, variant: Int): Array[Byte] = {
    val n = if (variant == 1) 64 else 32
    val img = new BufferedImage(n, n, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        val (ox, oy) = if (variant == 1) (x / 2, y / 2) else (x, y)
        var c = patternLuma(id, ox, oy)
        if (variant == 2 && ox < 4 && oy < 4) c += 50
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Pattern-PNG media table with planted near-duplicates: for each
    * base id, the original (media_id = id), a 2× resize (id + 5000000)
    * and a one-cell perturbation (id + 6000000). Encoded per-partition
    * on the executors. `ids` must be a single LONG column. */
  def asPatternPngTable(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.rdd.flatMap { r =>
      val id = r.getLong(0)
      Seq(0, 1, 2).map { v =>
        val off = v match { case 0 => 0L; case 1 => 5000000L
          case _ => 6000000L }
        val n = if (v == 1) 64 else 32
        Row(id + off, encodePngPattern(id, v), Row("image", n, n))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val aHashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ahash", LongType, nullable = false)))

  /** 64-bit average hash (aHash) over the REAL decoded luma: decode
    * PNG with ImageIO, average-pool to 8×8 cells, set bit (cy·8 + cx)
    * when the cell mean exceeds the global mean of the 64 cell means.
    * Width/height must be divisible by 8 (the fixture contract);
    * undecodable or off-grid payloads are dropped. All means are
    * dyadic rationals (integer sums over power-of-two cells), so the
    * comparisons are EXACT — no float-order sensitivity anywhere,
    * which is what lets the DuckDB oracle reproduce the hash from
    * id arithmetic alone. Decode runs in mapPartitions (ImageIO
    * cannot be a Catalyst expression — the extractFeatures argument);
    * everything downstream (banding, pair join) is DataFrame ops. */
  def imageAHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val imgOpt =
        if (bytes == null || bytes.isEmpty) None
        else try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }
      imgOpt.flatMap { img =>
        val w = img.getWidth; val h = img.getHeight
        if (w % 8 != 0 || h % 8 != 0) None
        else {
          val bw = w / 8; val bh = h / 8
          val means = new Array[Double](64)
          var cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 8) {
              var sum = 0L
              var y = cy * bh
              while (y < (cy + 1) * bh) {
                var x = cx * bw
                while (x < (cx + 1) * bw) {
                  sum += (img.getRGB(x, y) >> 16) & 0xff
                  x += 1
                }
                y += 1
              }
              means(cy * 8 + cx) = sum.toDouble / (bw * bh)
              cx += 1
            }
            cy += 1
          }
          var total = 0.0
          var k = 0
          while (k < 64) { total += means(k); k += 1 }
          val g = total / 64.0
          var hash = 0L
          k = 0
          while (k < 64) {
            if (means(k) > g) hash |= 1L << k
            k += 1
          }
          Some(Row(id, hash))
        }
      }
    }
    spark.createDataFrame(rdd, aHashSchema)
  }

  // ---------- audio (WAV via javax.sound.sampled — pure JDK) ----------

  /** Deterministic synthetic audio parameters, pure functions of the id
    * (the PNG pattern: the oracle predicts decode output from these
    * without being able to parse WAV itself). Signal is 16-bit PCM
    * mono, sign-alternating with amplitude a1 on the first half of the
    * samples and a2 on the second (count even), so mean |sample| is
    * exactly (a1+a2)/2. */
  def wavRate(id: Long): Int =
    Array(8000, 16000, 22050, 44100)((id % 4).toInt)
  def wavSamples(id: Long): Int = 800 + (id % 50).toInt * 16
  def wavAmp1(id: Long): Int = (id % 100).toInt * 250
  def wavAmp2(id: Long): Int = ((id * 7 + 13) % 100).toInt * 250

  /** Encode the deterministic signal for `id` as real WAV bytes
    * (canonical 44-byte RIFF header + PCM, lossless → decode recovers
    * the amplitudes exactly). */
  def encodeWav(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val rate = wavRate(id); val n = wavSamples(id)
    val a1 = wavAmp1(id); val a2 = wavAmp2(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val amp = if (i < n / 2) a1 else a2
      val s = (if (i % 2 == 0) amp else -amp).toShort
      pcm(2 * i) = (s & 0xff).toByte // little-endian per the format below
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Media table with REAL WAV payloads (encoded per-partition on the
    * executors, like [[asPngTable]]). */
  def asWavTable(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.map { r =>
      val id = r.getLong(0)
      Row(id, encodeWav(id), Row("audio", 0, 0))
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Real audio decode: javax.sound.sampled → (sample rate, sample
    * count, mean |amplitude| in raw 16-bit units). None when the
    * payload is not decodable 16-bit mono PCM. */
  private def decodeAudio(bytes: Array[Byte]): Option[(Int, Long, Double)] =
    if (bytes == null || bytes.isEmpty) None
    else
      try {
        import javax.sound.sampled.AudioSystem
        val ais = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.isBigEndian) None
        else {
          val data = ais.readAllBytes()
          val n = data.length / 2
          if (n == 0) None
          else {
            var sum = 0L; var i = 0
            while (i < n) {
              val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff))
              sum += math.abs(s)
              i += 1
            }
            Some((fmt.getSampleRate.toInt, n.toLong, sum.toDouble / n))
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }

  // ---------- perceptual-hash audio fixtures (r10) ----------

  /** Deterministic amplitude-ramp signal for the audio near-dup probe
    * — the WAV twin of [[patternLuma]]: |sample(t)| = (base + t·slope)
    * mod 15000 + 1000, signs alternating. Diverse envelope cells per
    * id, every value a closed-form function of (id, t) so the oracle
    * predicts the envelope hash without an audio decoder; amplitudes
    * stay ≤ 16000 so the +4000 perturbation never clips 16-bit PCM. */
  def audioPatternAmp(id: Long, t: Int): Int =
    (((id * 13 + 7) % 15000).toInt + t * (1 + (id % 9)).toInt) % 15000 +
      1000

  /** Variants: 0 = 1024 samples; 1 = 2048 sample-doubled "resample"
    * (identical envelope-cell means → Hamming 0); 2 = original with
    * +4000 on the first 16 samples (exactly envelope cell 0). */
  def encodeWavPattern(id: Long, variant: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = if (variant == 1) 2048 else 1024
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val ot = if (variant == 1) t / 2 else t
      var amp = audioPatternAmp(id, ot)
      if (variant == 2 && ot < 16) amp += 4000
      val s = (if (t % 2 == 0) amp else -amp).toShort
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Pattern-WAV media table with planted near-duplicates — the audio
    * twin of [[asPatternPngTable]] (same id offsets). */
  def asPatternWavTable(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.rdd.flatMap { r =>
      val id = r.getLong(0)
      Seq(0, 1, 2).map { v =>
        val off = v match { case 0 => 0L; case 1 => 5000000L
          case _ => 6000000L }
        Row(id + off, encodeWavPattern(id, v), Row("audio", 0, 0))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val envHashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ahash", LongType, nullable = false)))

  /** 64-bit envelope average-hash over REAL decoded audio: decode
    * 16-bit mono PCM with javax.sound.sampled, mean |amplitude| over
    * 64 equal time cells, bit k set when cell k's mean exceeds the
    * global mean of the 64 cell means. Sample count must be divisible
    * by 64 (the fixture contract; off-grid/undecodable payloads are
    * dropped). Fixture cells are 16/32 samples — powers of two, so
    * every mean is a dyadic rational and the comparisons are EXACT
    * (the [[imageAHash]] argument), which is what lets the oracle
    * reproduce the hash from id arithmetic. */
  def audioEnvelopeHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val decoded: Option[Array[Int]] =
        if (bytes == null || bytes.isEmpty) None
        else try {
          import javax.sound.sampled.AudioSystem
          val ais = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
              fmt.isBigEndian) None
          else {
            val data = ais.readAllBytes()
            val n = data.length / 2
            if (n == 0 || n % 64 != 0) None
            else {
              val out = new Array[Int](n)
              var i = 0
              while (i < n) {
                out(i) = math.abs(
                  (data(2 * i + 1) << 8) | (data(2 * i) & 0xff))
                i += 1
              }
              Some(out)
            }
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      decoded.map { amps =>
        val cellLen = amps.length / 64
        val means = new Array[Double](64)
        var c = 0
        while (c < 64) {
          var sum = 0L
          var i = c * cellLen
          while (i < (c + 1) * cellLen) { sum += amps(i); i += 1 }
          means(c) = sum.toDouble / cellLen
          c += 1
        }
        var total = 0.0
        var k = 0
        while (k < 64) { total += means(k); k += 1 }
        val g = total / 64.0
        var hash = 0L
        k = 0
        while (k < 64) { if (means(k) > g) hash |= 1L << k; k += 1 }
        Row(id, hash)
      }
    }
    spark.createDataFrame(rdd, envHashSchema)
  }

  // ---------- video temporal-signature near-dup fixtures (r10) ----------

  /** Per-frame luma of the video near-dup fixture: a quadratic ramp
    * (id·31 + k²·7 + k·17) mod 200 — diverse DELTAS across ids (a
    * linear ramp's deltas are a near-constant 17, which would collide
    * half the corpus), closed-form for the oracle, ≤ 199 so the +25
    * brightness shift never clips. */
  def y4mLumaPat(id: Long, k: Int): Int =
    ((id * 31 + k.toLong * k * 7 + k.toLong * 17) % 200).toInt

  def y4mPatFrames(id: Long): Int = 8 + (id % 5).toInt

  /** Variants: 0 = original (32×32 Cmono, constant-luma frames);
    * 1 = byte-level re-encode (an extra X header parameter — different
    * payload bytes, identical parsed content); 2 = every pixel +25
    * (brightness shift — the DELTA signature is invariant to it). */
  def encodeY4mPattern(id: Long, variant: Int): Array[Byte] = {
    val w = 32; val h = 32
    val frames = y4mPatFrames(id)
    val out = new ByteArrayOutputStream()
    val header = "YUV4MPEG2 W32 H32 F25:1 Cmono" +
      (if (variant == 1) " Xreenc" else "") + "\n"
    out.write(header.getBytes("US-ASCII"))
    var k = 0
    while (k < frames) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      val luma = y4mLumaPat(id, k) + (if (variant == 2) 25 else 0)
      val frame = new Array[Byte](w * h)
      java.util.Arrays.fill(frame, luma.toByte)
      out.write(frame)
      k += 1
    }
    out.toByteArray
  }

  /** Pattern-Y4M media table with planted near-duplicates — the video
    * member of the [[asPatternPngTable]]/[[asPatternWavTable]] triad
    * (same id offsets). */
  def asPatternY4mTable(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.rdd.flatMap { r =>
      val id = r.getLong(0)
      Seq(0, 1, 2).map { v =>
        val off = v match { case 0 => 0L; case 1 => 5000000L
          case _ => 6000000L }
        Row(id + off, encodeY4mPattern(id, v), Row("video", 32, 32))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  private val videoSigSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("sig", StringType, nullable = false)))

  /** Temporal near-dup signature over REAL parsed Y4M: the sequence of
    * frame-to-frame mean-luma DELTAS, quantized at 1/8 luma
    * (`Math.round(Δ·8)`) and joined with "," — invariant to a uniform
    * brightness shift and to byte-level re-encoding, which is exactly
    * the near-dup pair a video corpus wants collapsed first. Spatial
    * content is deliberately not hashed here (that is [[imageAHash]]'s
    * job per frame); the signature is the cheap temporal prefilter.
    * Frame means are dyadic (power-of-two fixture frames), so the
    * quantization is exact and the oracle replays it from the
    * closed-form ramp. Undecodable payloads are dropped; single-frame
    * clips sign as "" (no deltas). */
  def videoSignature(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      parseY4m(bytes, sumLuma = true).map { t =>
        val means = t._7
        val sig = (1 until means.length).map { k =>
          Math.round((means(k) - means(k - 1)) * 8.0)
        }.mkString(",")
        Row(id, means.length, sig)
      }
    }
    spark.createDataFrame(rdd, videoSigSchema)
  }

  /** Signature-equality near-dup pairs (id1 < id2, same frame count +
    * same delta signature) — one hash-partitioned equi-join on the
    * signature, never all-pairs. */
  def videoSignatureDedup(media: DataFrame): DataFrame = {
    val sigs = videoSignature(media)
    val a = sigs.alias("a"); val b = sigs.alias("b")
    a.join(b, col("a.sig") === col("b.sig") &&
        col("a.n_frames") === col("b.n_frames") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"),
        col("a.n_frames").as("n_frames"))
  }

  private val audioFeatureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", DoubleType, nullable = false),
    StructField("mean_amp", DoubleType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** Audio decode/feature-extract — the audio twin of
    * [[extractFeatures]]: real `javax.sound.sampled` decode, stub
    * fallback (byte-mean pseudo-features, `decoded=false`) for payloads
    * that are not 16-bit mono PCM WAV. Unbatched for the same reason as
    * [[videoFeatures]]: stateless decode, large payload rows. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (rate, n, mean, real) = decodeAudio(bytes) match {
          case Some((sr, ns, m)) => (sr, ns, m, true)
          case None =>
            val (_, _, m) = decodeStub(bytes); (0, 0L, m, false)
        }
        val durMs =
          if (rate == 0) 0.0
          else math.round(n * 1000.0 / rate * 1e6) / 1e6
        Row(id, if (bytes == null) 0 else bytes.length, rate, n,
          durMs, math.round(mean * 1e6) / 1e6, real)
      }
    }
    spark.createDataFrame(rdd, audioFeatureSchema)
  }

  // ---------- video (Y4M / YUV4MPEG2 — plain-text header + raw
  // frames, parseable with no codec, pure JDK) ----------

  /** Deterministic synthetic video parameters, pure functions of the id
    * (the PNG/WAV pattern: the oracle predicts decode output without a
    * demuxer). Geometry is even-sided (4:2:0 chroma needs it); each
    * frame k is a constant-luma field y4mLuma(id, k), so the mean luma
    * over the clip is exactly avg_k(y4mLuma). Frame rate fixed 25:1. */
  def y4mWidth(id: Long): Int = 16 + 2 * (id % 8).toInt
  def y4mHeight(id: Long): Int = 16 + 2 * (id % 12).toInt
  def y4mFrames(id: Long): Int = 3 + (id % 6).toInt
  def y4mLuma(id: Long, k: Int): Int = ((id * 31 + k * 17) % 256).toInt

  /** Encode the deterministic clip for `id` as real Y4M bytes:
    * `YUV4MPEG2 W.. H.. F25:1 Ip A1:1 C420jpeg\n` then per frame a
    * `FRAME\n` marker + planar 4:2:0 payload (constant-Y plane, neutral
    * 128 chroma). Lossless by construction → decode recovers the
    * per-frame luma exactly. */
  def encodeY4m(id: Long): Array[Byte] = {
    val w = y4mWidth(id); val h = y4mHeight(id); val n = y4mFrames(id)
    val out = new ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n"
      .getBytes("US-ASCII"))
    val chroma = new Array[Byte]((w / 2) * (h / 2))
    java.util.Arrays.fill(chroma, 128.toByte)
    var k = 0
    while (k < n) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      val y = new Array[Byte](w * h)
      java.util.Arrays.fill(y, y4mLuma(id, k).toByte)
      out.write(y)
      out.write(chroma) // U
      out.write(chroma) // V
      k += 1
    }
    out.toByteArray
  }

  /** Media table with REAL Y4M payloads (encoded per-partition on the
    * executors, like [[asPngTable]]/[[asWavTable]]). */
  def asY4mTable(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long")).rdd.map { r =>
      val id = r.getLong(0)
      Row(id, encodeY4m(id), Row("video", y4mWidth(id), y4mHeight(id)))
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Real Y4M parse: stream header + FRAME markers, size each frame
    * from the declared colorspace, accumulate the luma plane. Returns
    * (width, height, n_frames, fps_num, fps_den, mean luma) or None
    * when the payload is not well-formed YUV4MPEG2 (truncated frame,
    * bad header, unknown chroma layout). */
  private def decodeY4m(
      bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int, Double)] =
    parseY4m(bytes, sumLuma = true).map(t =>
      (t._1, t._2, t._3, t._4, t._5, t._6))

  /** Container walk shared by [[decodeY4m]] (full luma accumulation)
    * and [[sampleFrames]] (frame COUNT only — `sumLuma = false` skips
    * the per-pixel loop, so a metadata-only caller pays O(frames)
    * frame-header hops instead of O(payload bytes); mean is 0 then). */
  private def parseY4m(bytes: Array[Byte], sumLuma: Boolean)
      : Option[(Int, Int, Int, Int, Int, Double, Array[Double])] =
    if (bytes == null || bytes.length < 10 ||
        !new String(bytes, 0, 9, "US-ASCII").equals("YUV4MPEG2"))
      None
    else
      try {
        val nl = bytes.indexOf('\n'.toByte)
        if (nl < 0) return None
        val header = new String(bytes, 0, nl, "US-ASCII").split(" ")
        var w = -1; var h = -1; var fn = 25; var fd = 1
        var cs = "C420jpeg" // spec default is 4:2:0
        header.drop(1).foreach { tok =>
          if (tok.nonEmpty) tok.head match {
            case 'W' => w = tok.tail.toInt
            case 'H' => h = tok.tail.toInt
            case 'F' =>
              val p = tok.tail.split(":"); fn = p(0).toInt; fd = p(1).toInt
            case 'C' => cs = tok
            case _   => () // I/A/X params don't affect sizing
          }
        }
        if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
        val frameSize =
          if (cs.startsWith("C420")) w * h + 2 * ((w / 2) * (h / 2))
          else if (cs.startsWith("C422")) w * h + 2 * ((w / 2) * h)
          else if (cs.startsWith("C444")) 3 * w * h
          else if (cs == "Cmono") w * h
          else return None
        var pos = nl + 1
        var frames = 0
        var lumaSum = 0L
        val frameSums = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (pos < bytes.length) {
          // FRAME marker line (may carry parameters before the \n)
          if (pos + 5 > bytes.length ||
              !new String(bytes, pos, 5, "US-ASCII").equals("FRAME"))
            return None
          var eol = pos + 5
          while (eol < bytes.length && bytes(eol) != '\n'.toByte) eol += 1
          if (eol >= bytes.length) return None
          pos = eol + 1
          if (pos + frameSize > bytes.length) return None // truncated
          if (sumLuma) {
            var fSum = 0L
            var i = 0
            while (i < w * h) { fSum += bytes(pos + i) & 0xff; i += 1 }
            lumaSum += fSum
            frameSums += fSum
          }
          pos += frameSize
          frames += 1
        }
        if (frames == 0) None
        else Some((w, h, frames, fn, fd,
          lumaSum.toDouble / (frames.toLong * w * h),
          frameSums.map(_.toDouble / (w.toLong * h)).toArray))
      } catch { case scala.util.control.NonFatal(_) => None }

  private val videoFeatureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("duration_ms", DoubleType, nullable = false),
    StructField("mean_y", DoubleType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** Video decode/feature-extract — the video twin of
    * [[extractFeatures]]/[[audioFeatures]]: real Y4M container parse
    * (geometry, frame count, frame rate, mean luma), stub fallback
    * (byte-mean pseudo-features, `decoded=false`) for payloads that
    * are not well-formed YUV4MPEG2 — compressed containers (MP4 etc.)
    * have no JDK demuxer and land on the stub BY DESIGN.
    *
    * Deliberately UNbatched (plain iterator map): the parse is
    * stateless, and video payloads are the largest rows in the system
    * (w·h·1.5·frames bytes each) — buffering a 64-row group would hold
    * 64 full clips live per task for no amortization benefit. */
  def videoFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, n, durMs, mean, real) = decodeY4m(bytes) match {
          case Some((w, h, n, fn, fd, m)) =>
            (w, h, n, n * 1000.0 * fd / fn, m, true)
          case None =>
            val (w, h, m) = decodeStub(bytes); (w, h, 0, 0.0, m, false)
        }
        Row(id, if (bytes == null) 0 else bytes.length, w, h, n,
          math.round(durMs * 1e6) / 1e6,
          math.round(mean * 1e6) / 1e6, real)
      }
    }
    spark.createDataFrame(rdd, videoFeatureSchema)
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

  /** Deterministic frame sampling: every `stride`-th frame index up to
    * the clip's frame count. The count is REAL for Y4M payloads (the
    * [[videoFeatures]] container parse); payloads no demuxer can read
    * fall back to the size-derived stub count (`len/16 + 1` — loudly a
    * stub, kept so the sampling plumbing stays end-to-end testable for
    * opaque codecs). A null payload yields no rows (null count →
    * sequence → explode drops the row), matching the old column form. */
  def sampleFrames(media: DataFrame, stride: Int = 10): DataFrame = {
    val spark = media.sparkSession
    val countSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = true)))
    val counted = spark.createDataFrame(
      media.select("media_id", "payload").rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val n: Any =
            if (bytes == null) null
            else parseY4m(bytes, sumLuma = false) match {
              case Some((_, _, frames, _, _, _, _)) => frames
              case None => bytes.length / 16 + 1 // labeled stub count
            }
          Row(id, n)
        }
      }, countSchema)
    counted
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_idx"), col("n_frames"))
  }
}
