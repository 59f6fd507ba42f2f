package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz over the media decoders — closing the decode-bomb
  * FAMILY rather than its instances (the class produced real bugs in
  * two consecutive rounds: Int-space guards bypassed by wrapped
  * products, then Long-space guards bypassed by wrapped factor
  * products). The blackbox contract for an UNTRUSTED blob:
  *
  *  - decode either returns a well-formed result (consistent
  *    dimensions, `data.length == w*h*c`, every byte range inside the
  *    blob) or throws an `Exception` — the shape poison-routing
  *    catches. It must NEVER throw an `Error` (OutOfMemoryError from
  *    an unguarded allocation kills the executor, not the row).
  *  - allocations are blob-proportional: uncompressed formats carry
  *    their payload in the blob (≤ 1× + header); PNG may legitimately
  *    inflate up to deflate's ~1032:1 bound, never beyond.
  *
  * Three generator families: pure random bytes (shallow parsers),
  * magic-prefixed random tails (deep parser paths), and mutated VALID
  * blobs (deepest paths — valid structure with corrupted fields).
  * Raw ScalaCheck with fixed seeds (the scalatestplus bridge is not
  * in the offline cache — the JaccardPropertySpec pattern). */
class MultimodalFuzzSpec extends AnyFunSuite {

  private val params = Gen.Parameters.default

  // ---- invariant checks -------------------------------------------

  /** JPEG is excluded from the proportionality bound: javax.imageio
    * owns that parser, and DCT output is bounded by its own header
    * checks, not ours. All in-repo decoders must obey it. */
  private def checkImage(bytes: Array[Byte]): Unit =
    try {
      val p = MediaCodec.decodeImage(bytes)
      assert(p.width > 0 && p.height > 0 && p.channels > 0,
        s"non-positive dims ${p.width}x${p.height}x${p.channels}")
      assert(p.data.length == p.width * p.height * p.channels,
        s"inconsistent pixel buffer: ${p.data.length} for " +
          s"${p.width}x${p.height}x${p.channels}")
      val isJpeg = bytes.length >= 2 &&
        bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte
      if (!isJpeg)
        assert(p.data.length.toLong <= 1040L * bytes.length + 64,
          s"allocation not blob-proportional: ${p.data.length} pixels " +
            s"from ${bytes.length} blob bytes")
    } catch { case _: Exception => () } // the poison-routable shape

  private def checkAudio(bytes: Array[Byte]): Unit =
    try {
      val (_, samples) = MediaCodec.decodeAudio(bytes)
      // 16-bit samples come FROM the blob: mono keeps ≤ len/2, a
      // multi-channel downmix only shrinks it further
      assert(samples.length.toLong * 2 <= bytes.length,
        s"${samples.length} samples from ${bytes.length} blob bytes")
    } catch { case _: Exception => () }

  private def checkVideo(bytes: Array[Byte]): Unit =
    try {
      val (_, offsets) = MediaCodec.videoFrameOffsets(bytes)
      offsets.foreach { case (off, len) =>
        assert(off >= 0 && len >= 0 && off.toLong + len <= bytes.length,
          s"frame range ($off, $len) escapes the ${bytes.length}-byte blob")
      }
    } catch { case _: Exception => () }

  // ---- generators -------------------------------------------------

  private val rawBlob: Gen[Array[Byte]] = for {
    n <- Gen.frequency(3 -> Gen.choose(0, 64), 2 -> Gen.choose(64, 512))
    bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs.toArray

  private val magics: Seq[Array[Byte]] = Seq(
    "P6".getBytes("US-ASCII"),
    "BM".getBytes("US-ASCII"),
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A),
    "GIMG".getBytes("US-ASCII"),
    "RIFF".getBytes("US-ASCII"),
    "RIFFxxxxWAVE".getBytes("US-ASCII"),
    "GAUD".getBytes("US-ASCII"),
    "GVID".getBytes("US-ASCII"))

  private val magicBlob: Gen[Array[Byte]] = for {
    m <- Gen.oneOf(magics)
    tail <- rawBlob
  } yield m ++ tail

  /** Valid blobs whose deep parser paths the mutator then corrupts. */
  private val validCorpus: Seq[Array[Byte]] = {
    def ppm(w: Int, h: Int): Array[Byte] =
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++
        Array.tabulate(w * h * 3)(i => (i * 7).toByte)
    def bmp(w: Int, h: Int): Array[Byte] = {
      val rowBytes = (w * 3 + 3) / 4 * 4
      val buf = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
        .putInt(0).putInt(54) // reserved, data offset
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      (0 until h * rowBytes).foreach(i => buf.put((i * 3).toByte))
      buf.array()
    }
    def png(w: Int, h: Int, channels: Int): Array[Byte] = {
      val colorType = channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
      val stride = w * channels
      val raw = new Array[Byte]((stride + 1) * h) // filter 0 rows
      for (y <- 0 until h; x <- 0 until stride)
        raw(y * (stride + 1) + 1 + x) = ((x + y) * 11).toByte
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val z = new Array[Byte](raw.length + 128)
      val zLen = deflater.deflate(z); deflater.end()
      def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
        val crc = new java.util.zip.CRC32()
        crc.update(typ.getBytes("US-ASCII")); crc.update(body)
        java.nio.ByteBuffer.allocate(12 + body.length)
          .putInt(body.length).put(typ.getBytes("US-ASCII")).put(body)
          .putInt(crc.getValue.toInt).array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", z.take(zLen)) ++
        chunk("IEND", Array.empty[Byte])
    }
    def wav(nFrames: Int, channels: Int): Array[Byte] = {
      val dataLen = nFrames * channels * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      buf.put("fmt ".getBytes).putInt(16).putShort(1)
        .putShort(channels.toShort).putInt(8000).putInt(8000 * channels * 2)
        .putShort((channels * 2).toShort).putShort(16)
      buf.put("data".getBytes).putInt(dataLen)
      (0 until nFrames * channels).foreach(i => buf.putShort((i * 31).toShort))
      buf.array()
    }
    Seq(
      ppm(5, 4), ppm(1, 1),
      bmp(5, 4), bmp(3, 3),
      png(5, 4, 3), png(4, 4, 1), png(3, 3, 4),
      MediaCodec.encodeFakeImage(6, 5, 3, seed = 7L),
      MediaCodec.encodeFakeAudio(8000, 32, seed = 9L),
      MediaCodec.encodeFakeVideo(12, Seq(
        MediaCodec.encodeFakeImage(2, 2, 3, 1L),
        MediaCodec.encodeFakeImage(2, 2, 3, 2L))),
      wav(16, 1), wav(8, 2))
  }

  /** Mutations: byte flips (header-field corruption), truncation
    * (short reads), extension (trailing garbage). */
  private val mutatedBlob: Gen[Array[Byte]] = for {
    base <- Gen.oneOf(validCorpus)
    kind <- Gen.frequency(5 -> 0, 2 -> 1, 1 -> 2)
    out <- kind match {
      case 0 => // flip 1-8 bytes anywhere (headers are early, so bias there)
        for {
          nFlips <- Gen.choose(1, 8)
          flips <- Gen.listOfN(nFlips, for {
            i <- Gen.frequency(
              2 -> Gen.choose(0, math.min(31, base.length - 1)),
              1 -> Gen.choose(0, base.length - 1))
            b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
          } yield (i, b))
        } yield {
          val c = base.clone()
          flips.foreach { case (i, b) => c(i) = b }
          c
        }
      case 1 => Gen.choose(0, base.length).map(base.take)
      case 2 => rawBlob.map(base ++ _)
    }
  } yield out

  // ---- the properties ---------------------------------------------

  test("image decode under fuzz: well-formed Pixels or a poison-routable exception, never an Error") {
    (0 until 400).foreach { i =>
      checkImage(rawBlob.pureApply(params, Seed(100L + i)))
      checkImage(magicBlob.pureApply(params, Seed(5000L + i)))
      checkImage(mutatedBlob.pureApply(params, Seed(9000L + i)))
    }
  }

  test("audio decode under fuzz: blob-proportional samples or a poison-routable exception") {
    (0 until 400).foreach { i =>
      checkAudio(rawBlob.pureApply(params, Seed(200L + i)))
      checkAudio(magicBlob.pureApply(params, Seed(6000L + i)))
      checkAudio(mutatedBlob.pureApply(params, Seed(10000L + i)))
    }
  }

  test("video frame index under fuzz: every frame range inside the blob or a poison-routable exception") {
    (0 until 400).foreach { i =>
      checkVideo(rawBlob.pureApply(params, Seed(300L + i)))
      checkVideo(magicBlob.pureApply(params, Seed(7000L + i)))
      checkVideo(mutatedBlob.pureApply(params, Seed(11000L + i)))
    }
  }

  test("GVID small-negative frame length throws instead of returning an out-of-blob range") {
    // found by READING under the fuzz lens: a length ≥ −pos keeps
    // ByteBuffer.position() in bounds, so before the guard the decoder
    // silently returned a negative-length range that re-indexed
    // already-walked bytes — the random mutator rarely lands a small
    // negative int, hence this deterministic pin
    val good = MediaCodec.encodeFakeVideo(10, Seq(
      MediaCodec.encodeFakeImage(2, 2, 3, 1L),
      MediaCodec.encodeFakeImage(2, 2, 3, 2L)))
    val bad = good.clone()
    val b = java.nio.ByteBuffer.wrap(bad)
    val f0len = b.getInt(12)
    b.putInt(12 + 4 + f0len, -4) // frame 1's length field
    val e = intercept[IllegalArgumentException](
      MediaCodec.videoFrameOffsets(bad))
    assert(e.getMessage.contains("corrupt GVID frame record"), e.getMessage)
  }

  test("a tiny PNG declaring a 100-megapixel raster throws on the deflate bound before allocating") {
    // (stride+1)*h = 30001 * 10000 ≈ 3.0e8 fits Int — the dimension
    // guard passes — but no ~300-byte IDAT can inflate to it; the
    // deflate-ratio bound must reject BEFORE the 300 MB allocation
    val base = validCorpus(4).clone() // png(5, 4, 3); no CRC re-check needed
    val b = java.nio.ByteBuffer.wrap(base)
    b.putInt(16, 10000) // IHDR width
    b.putInt(20, 10000) // IHDR height
    val e = intercept[IllegalArgumentException](MediaCodec.decodeImage(base))
    assert(e.getMessage.contains("deflate bound"), e.getMessage)
  }

  test("the valid corpus itself decodes clean (the mutator starts from real structure)") {
    validCorpus.take(7).foreach { b => // ppm/bmp/png rows
      val p = MediaCodec.decodeImage(b)
      assert(p.data.length == p.width * p.height * p.channels)
    }
    val (rate, s) = MediaCodec.decodeAudio(validCorpus(10)) // wav(16, 1)
    assert(rate == 8000 && s.length == 16)
  }
}
