package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns plus a typed metadata
  * struct — the layout a 100 TB multimodal corpus needs (payload stays
  * columnar/compressed, metadata is prunable without touching bytes).
  * The Spark-side machinery (schema, partitioning, per-partition batch
  * decode, feature schema) is real and tested; the DEFAULT codec is a
  * deterministic stub (clearly marked below) because no third-party
  * image/audio library ships in this container — but the decode seam
  * is injectable and REAL codecs are exercised through it in
  * MultimodalSpec: JDK `javax.imageio` PNG decoding runs distributed
  * inside executor tasks and reproduces driver-side features
  * bit-for-bit, alongside the CRC32 block codec. A production
  * jpeg/opus/av1 decoder drops into the same parameter.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField(
      "meta",
      StructType(Seq(
        StructField("format", StringType),
        StructField("byte_len", IntegerType),
        StructField("content_hash", StringType)
      ))
    )
  ))

  /** Build a media table from any (id, text) source — payload = utf8
    * bytes standing in for encoded media; metadata is computed from the
    * payload exactly as it would be for real media. */
  def toMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("utf8-stub").as("format"),
        octet_length(col(textCol).cast("binary")).as("byte_len"),
        md5(col(textCol).cast("binary")).as("content_hash")
      ).as("meta")
    )

  final case class MediaFeature(media_id: Long, n_frames: Int, feature: Array[Long])

  /** Per-partition batched "decode + feature extract". Shape is the
    * real thing: iterator-in/iterator-out over partitions (so a real
    * codec would amortize model/codec init per partition, the same
    * reason PySpark uses mapInPandas here), fixed-width feature out.
    *
    * The decode step is INJECTABLE: pass any `decode: (bytes, featDim)
    * => Array[Long]` — a real codec + feature extractor drops in
    * without touching the operator (the function is serialized into
    * the task closure like any mapPartitions lambda; construct
    * per-JVM-expensive codec state lazily inside it, or lift it to a
    * per-partition init if needed). The DEFAULT is the deterministic
    * stub below, kept because no image/audio library ships in this
    * container. Integer (not float) accumulation on purpose: the
    * stub's arithmetic is then exactly reproducible by the SQL oracle
    * (associative bigint sums — no IEEE fold-order sensitivity), so
    * the whole mapPartitions plumbing is hash-verified end-to-end, not
    * rows-only. MultimodalSpec injects a real JDK codec (CRC32 per
    * block) to prove the boundary takes real implementations; a real
    * feature vector would be float, but the Spark-side shape (schema,
    * batching, partitioning) is identical.
    */
  def extractFeatures(
      media: DataFrame,
      featDim: Int = 8,
      decode: (Array[Byte], Int) => Array[Long] = fakeDecode
  ): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, payload) =>
        val bytes = if (payload == null) Array.empty[Byte] else payload
        MediaFeature(id, nFrames(bytes), decode(bytes, featDim))
      }
    }
  }

  /** STUB decode (the default): deterministic byte-sum into featDim
    * accumulators (acc(j) = Σ of unsigned bytes at positions ≡ j mod
    * featDim). */
  private[operators] def fakeDecode(bytes: Array[Byte], featDim: Int): Array[Long] = {
    val acc = new Array[Long](featDim)
    var i = 0
    while (i < bytes.length) {
      acc(i % featDim) += (bytes(i) & 0xff).toLong
      i += 1
    }
    acc
  }

  /** STUB frame count: one "frame" per 64-byte block. */
  private def nFrames(bytes: Array[Byte]): Int = (bytes.length + 63) / 64

  /** REAL-codec image ENCODE (JDK `javax.imageio`, PNG — no
    * third-party dependency): a deterministic `side`×`side` grayscale
    * image per row, pixel p (row-major) = the hex digit of `hexCol` at
    * position p mod len, scaled ×16 — a pixel formula plain SQL can
    * replay, which is what lets [[decodeImageFeatures]]' output be
    * hash-verified by a DuckDB oracle even though the bytes in between
    * are a real binary image format (PNG is lossless, so
    * decode∘encode = identity on the pixels). Output is the
    * [[mediaSchema]] shape: (media_id, payload = real PNG bytes, meta).
    * Encoding runs per-partition inside executor tasks — the payload
    * column never exists driver-side, exactly how a 100 TB media
    * ingest must behave. */
  def encodeGrayPng(df: DataFrame, idCol: String, hexCol: String, side: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(hexCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, hx) =>
          val img = new java.awt.image.BufferedImage(
            side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var p = 0
          while (p < side * side) {
            val v = Character.digit(hx.charAt(p % hx.length), 16) * 16
            img.setRGB(p % side, p / side, (v << 16) | (v << 8) | v)
            p += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          (id, baos.toByteArray)
        }
      }
      .toDF("media_id", "payload")
      .select(
        col("media_id"), col("payload"),
        struct(
          lit("png").as("format"),
          octet_length(col("payload")).as("byte_len"),
          md5(col("payload")).as("content_hash")
        ).as("meta"))
  }

  /** REAL-codec image DECODE (JDK `javax.imageio`): per-partition
    * batched decode of the binary payload into (width, height,
    * per-channel pixel sums) — the distributed shape of an image
    * feature-extraction pass (iterator-in/iterator-out, codec runs
    * inside executor tasks, only fixed-width features come out).
    * Null/empty payloads yield a zero row rather than a task failure —
    * corrupt media must never kill a 100 TB job. Integer channel sums
    * on purpose: associative, so the result is independent of
    * partitioning AND replayable by a SQL oracle. */
  def decodeImageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, payload) =>
        if (payload == null || payload.isEmpty) (id, 0, 0, 0L, 0L, 0L)
        else {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          var r = 0L; var g = 0L; var b = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              r += (rgb >> 16) & 0xff
              g += (rgb >> 8) & 0xff
              b += rgb & 0xff
              x += 1
            }
            y += 1
          }
          (id, img.getWidth, img.getHeight, r, g, b)
        }
      }
    }.toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** REAL-codec audio ENCODE (JDK `javax.sound.sampled`, WAV/PCM — no
    * third-party dependency): a deterministic 16-bit mono PCM signal
    * per row, sample i = `((seed·31 + i·2654435761) mod 65536) −
    * 32768` — an integer formula plain SQL replays — wrapped in a real
    * RIFF/WAVE container by `AudioSystem.write`. WAV PCM is lossless,
    * so decode∘encode = identity on the samples, which is what lets
    * [[decodeAudioFeatures]]' output be hash-verified by a DuckDB
    * oracle even though the bytes in between are a genuine audio file
    * format (the audio twin of [[encodeGrayPng]]). Encoding runs
    * per-partition inside executor tasks. */
  def encodePcmWav(df: DataFrame, idCol: String, seedCol: String,
      nSamples: Int = 256, sampleRate: Int = 8000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(seedCol).cast("long")).as[(Long, Long)]
      .mapPartitions { it =>
        val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
        it.map { case (id, seed) =>
          val raw = new Array[Byte](nSamples * 2)
          var i = 0
          while (i < nSamples) {
            val v = (((seed * 31L + i.toLong * 2654435761L) % 65536L).toInt - 32768)
            raw(2 * i) = (v & 0xff).toByte
            raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(raw), fmt, nSamples.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          (id, baos.toByteArray)
        }
      }
      .toDF("media_id", "payload")
      .select(
        col("media_id"), col("payload"),
        struct(
          lit("wav").as("format"),
          octet_length(col("payload")).as("byte_len"),
          md5(col("payload")).as("content_hash")
        ).as("meta"))
  }

  /** REAL-codec audio DECODE (JDK `javax.sound.sampled`): parse the
    * WAV container (header, format, frame count come from the REAL
    * parser, not from trusting the writer), require 16-bit mono PCM,
    * and reduce each payload to (sample_rate, n_samples, four
    * quarter-block sample sums) — integer sums, associative, SQL-
    * replayable. Null/empty payloads yield a zero row rather than a
    * task failure. */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, payload) =>
        if (payload == null || payload.isEmpty) (id, 0, 0, 0L, 0L, 0L, 0L)
        else {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
            s"expected 16-bit mono little-endian PCM, got $fmt")
          val n = ais.getFrameLength.toInt
          val raw = ais.readAllBytes()
          val sums = new Array[Long](4)
          var i = 0
          while (i < n) {
            val v = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort.toLong
            sums(i * 4 / n) += v
            i += 1
          }
          (id, fmt.getSampleRate.toInt, n, sums(0), sums(1), sums(2), sums(3))
        }
      }
    }.toDF("media_id", "sample_rate", "n_samples", "b0", "b1", "b2", "b3")
  }

  /** "Frame sampling": every `stride`-th 64-byte block as its own row —
    * the explode/partition shape of video-frame extraction. */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val bytes = if (payload == null) Array.empty[Byte] else payload
        (0 until nFrames(bytes) by stride).map { f =>
          val start = f * 64
          (id, f, bytes.slice(start, math.min(start + 64, bytes.length)))
        }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }
}
