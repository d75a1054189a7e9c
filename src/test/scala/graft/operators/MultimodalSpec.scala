package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The decode boundary of the multimodal pipeline. The stub path is
  * hash-verified against the DuckDB oracle (q42); what this spec adds
  * is proof the boundary takes a REAL codec: a JDK implementation
  * (CRC32 per 64-byte block — an actual byte-stream decoder, not an
  * arithmetic fake) is injected through the public parameter and runs
  * distributed through the same mapPartitions plumbing. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media() =
    Multimodal.toMediaTable(
      Seq((1L, "hello multimodal world, this is payload one"),
        (2L, "a second, longer payload " + ("x" * 200)),
        (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text")

  test("extractFeatures default path is the deterministic stub (q42 contract unchanged)") {
    val f = Multimodal.extractFeatures(media(), featDim = 4)
      .collect().map(m => m.media_id -> m.feature.toSeq).toMap
    // stub contract: acc(j) = sum of unsigned bytes at positions ≡ j (mod featDim)
    def stub(s: String): Seq[Long] = {
      val acc = new Array[Long](4)
      s.getBytes("UTF-8").zipWithIndex.foreach { case (b, i) => acc(i % 4) += (b & 0xff).toLong }
      acc.toSeq
    }
    assert(f(1L) == stub("hello multimodal world, this is payload one"))
    assert(f(3L) == Seq(0L, 0L, 0L, 0L))
  }

  test("a real JDK codec injects through the decode parameter and runs distributed") {
    val crcPerBlock: (Array[Byte], Int) => Array[Long] = (bytes, featDim) => {
      // real decoding work on the payload bytes: CRC32 of each 64-byte
      // block, folded into featDim lanes (block i -> lane i % featDim)
      val acc = new Array[Long](featDim)
      var i = 0
      while (i * 64 < bytes.length) {
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, i * 64, math.min(64, bytes.length - i * 64))
        acc(i % featDim) ^= crc.getValue
        i += 1
      }
      acc
    }
    val got = Multimodal.extractFeatures(media().repartition(3), featDim = 2, decode = crcPerBlock)
      .collect().map(m => m.media_id -> m.feature.toSeq).toMap
    // reference values computed locally with the same JDK codec
    def local(s: String): Seq[Long] = crcPerBlock(s.getBytes("UTF-8"), 2).toSeq
    assert(got(1L) == local("hello multimodal world, this is payload one"))
    assert(got(2L) == local("a second, longer payload " + ("x" * 200)))
    assert(got(3L) == Seq(0L, 0L))
    // n_frames comes from the operator, not the codec — unchanged by injection
    val frames = Multimodal.extractFeatures(media(), featDim = 2, decode = crcPerBlock)
      .collect().map(m => m.media_id -> m.n_frames).toMap
    assert(frames(2L) == ((25 + 200) + 63) / 64)
  }

  test("a real IMAGE codec (JDK javax.imageio, PNG) decodes distributed through the same boundary") {
    // deterministic 8x8 RGB images, PNG-encoded — an actual image
    // format round-tripping through the binary column and an actual
    // codec running inside executor tasks, JDK-only
    def pngBytes(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, (seed * 1000003 + y * 8 + x) * 2654435761L.toInt)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    // decoder: PNG -> pixels -> per-lane sum of channel values (a
    // luminance-histogram-shaped integer feature)
    val pngDecode = (bytes: Array[Byte], featDim: Int) => {
      val acc = new Array[Long](featDim)
      if (bytes.nonEmpty) {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          acc((y * img.getWidth + x) % featDim) += lum
        }
      }
      acc
    }
    val media = Seq(1L, 2L, 3L).map(i => (i, pngBytes(i.toInt)))
      .toDF("media_id", "payload")
    val got = Multimodal.extractFeatures(media.repartition(3), featDim = 4, decode = pngDecode)
      .collect().map(m => m.media_id -> m.feature.toSeq).toMap
    // PNG is lossless: executor-side decode must reproduce the
    // driver-side features bit-for-bit
    (1 to 3).foreach { i =>
      assert(got(i.toLong) == pngDecode(pngBytes(i), 4).toSeq, s"image $i decoded differently")
    }
    // and the features are non-trivial (codec actually ran)
    assert(got.values.forall(_.exists(_ > 0L)))
  }

  test("encodeGrayPng → decodeImageFeatures round-trips real PNG bytes losslessly") {
    val src = Seq((10L, "00ff"), (11L, "deadbeef"), (12L, "0123456789abcdef0123456789abcdef"))
      .toDF("id", "h")
    val media = Multimodal.encodeGrayPng(src, "id", "h", side = 8).repartition(3)
    // the payload is a REAL PNG (magic bytes) with populated metadata
    val metas = media.select($"media_id", $"meta.format", $"meta.byte_len",
        substring(hex($"payload"), 1, 16).as("magic"))
      .as[(Long, String, Int, String)].collect()
    assert(metas.length == 3)
    metas.foreach { case (_, fmt, len, magic) =>
      assert(fmt == "png" && len > 0 && magic == "89504E470D0A1A0A") // \x89PNG\r\n\x1a\n
    }
    // decode reproduces the pixel formula exactly (PNG is lossless):
    // pixel p = hexdigit(h, p % len(h)) * 16, grayscale
    val got = Multimodal.decodeImageFeatures(media)
      .as[(Long, Int, Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    def expect(h: String): Long =
      (0 until 64).map(p => Character.digit(h.charAt(p % h.length), 16).toLong * 16).sum
    Seq(10L -> "00ff", 11L -> "deadbeef", 12L -> "0123456789abcdef0123456789abcdef").foreach {
      case (id, h) =>
        val (_, w, ht, r, g, b) = got(id)
        assert(w == 8 && ht == 8 && r == expect(h) && g == r && b == r, s"id $id")
    }
    // corrupt/empty payloads degrade to a zero row, never a task failure
    val broken = Seq((99L, Array.empty[Byte])).toDF("media_id", "payload")
    assert(Multimodal.decodeImageFeatures(broken).collect().head.toSeq ==
      Seq(99L, 0, 0, 0L, 0L, 0L))
  }

  test("sampleFrames explodes every stride-th 64-byte block with its bytes") {
    val rows = Multimodal.sampleFrames(media(), stride = 2)
      .select($"media_id", $"frame_idx", octet_length($"frame_bytes").as("len"))
      .as[(Long, Int, Int)].collect().toSet
    val len2 = 25 + 200 // 4 frames (0..3), sampled 0 and 2
    assert(rows.filter(_._1 == 2L).map(_._2) == Set(0, 2))
    assert(rows.contains((2L, 0, 64)))
    assert(rows.contains((2L, 2, math.min(64, len2 - 128))))
    assert(!rows.exists(_._1 == 3L)) // empty payload: no frames
  }

  test("encodePcmWav -> decodeAudioFeatures round-trips real WAV bytes losslessly") {
    val src = Seq(1L, 7L, 42L).toDF("doc_id")
    val media = Multimodal.encodePcmWav(src, "doc_id", "doc_id", nSamples = 128)
    // the payload is a genuine RIFF/WAVE container
    val payloads = media.select("media_id", "payload").as[(Long, Array[Byte])].collect().toMap
    payloads.values.foreach { b =>
      assert(new String(b.take(4), "US-ASCII") == "RIFF")
      assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    }
    val feats = Multimodal.decodeAudioFeatures(media)
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L, 7L, 42L).foreach { seed =>
      val samples = (0 until 128).map(i =>
        ((seed * 31L + i.toLong * 2654435761L) % 65536L).toInt - 32768)
      val r = feats(seed)
      assert(r.getInt(1) == 8000 && r.getInt(2) == 128)
      (0 until 4).foreach { b =>
        val expect = samples.slice(b * 32, (b + 1) * 32).map(_.toLong).sum
        assert(r.getLong(3 + b) == expect, s"seed=$seed block=$b")
      }
    }
    // corrupt payload yields a zero row, not a task failure
    val bad = media.limit(1).select(col("media_id"), lit(null).cast("binary").as("payload"))
    val z = Multimodal.decodeAudioFeatures(bad).collect().head
    assert(z.getInt(2) == 0 && z.getLong(3) == 0L)
  }
}
