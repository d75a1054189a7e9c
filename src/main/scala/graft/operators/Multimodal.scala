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
