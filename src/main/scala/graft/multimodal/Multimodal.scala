package graft.multimodal

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for a training-data
  * pipeline: media ride as opaque BINARY columns with typed metadata;
  * decode / resize / feature-extract / frame-sample run as BATCHED
  * partition-local transforms (`mapPartitions` over row batches — the
  * JVM analogue of an Arrow-batched Python UDF), so blobs never leave
  * executors and the driver only ever sees plan metadata.
  *
  * STUB BOUNDARY — clearly marked: this container has no image/audio
  * codec libraries, so the compressed-format DECODE step
  * ([[MediaCodec.decodeImage]] / [[MediaCodec.decodeAudio]] /
  * [[MediaCodec.videoFrameOffsets]]) parses a deterministic fake
  * container format ("GIMG"/"GAUD"/"GVID") instead of JPEG/WAV/MP4.
  * A production build swaps exactly these three functions for real
  * codecs (ImageIO/JNI); everything downstream — resize, pooling,
  * RMS energy, frame explode, partition packing — is real arithmetic
  * over the decoded arrays and is tested as such.
  */
object MediaCodec {

  // ---- deterministic fake container format (the stub) ----

  /** "GIMG" | width:int | height:int | channels:byte | pixels... */
  def encodeFakeImage(width: Int, height: Int, channels: Int, seed: Long): Array[Byte] = {
    val px = new Array[Byte](width * height * channels)
    var s = seed
    var i = 0
    while (i < px.length) { // xorshift64 — deterministic pixel noise
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      px(i) = (s & 0xff).toByte
      i += 1
    }
    ByteBuffer.allocate(13 + px.length).put("GIMG".getBytes("US-ASCII"))
      .putInt(width).putInt(height).put(channels.toByte).put(px).array()
  }

  /** "GAUD" | sampleRate:int | nSamples:int | samples (int16 LE)... */
  def encodeFakeAudio(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val buf = ByteBuffer.allocate(12 + nSamples * 2)
    buf.put("GAUD".getBytes("US-ASCII")).putInt(sampleRate).putInt(nSamples)
    var s = seed
    (0 until nSamples).foreach { _ =>
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      buf.putShort((s & 0x7fff).toShort)
    }
    buf.array()
  }

  /** "GVID" | fps:int | nFrames:int | frame0(GIMG) | frame1 ... */
  def encodeFakeVideo(fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 12 + frames.map(4 + _.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.put("GVID".getBytes("US-ASCII")).putInt(fps).putInt(frames.length)
    frames.foreach(f => buf.putInt(f.length).put(f))
    buf.array()
  }

  final case class Pixels(width: Int, height: Int, channels: Int, data: Array[Byte])

  /** STUB — swap for a real JPEG/PNG decoder in production. Parses the
    * GIMG fake container; throws on anything else (poison-queue
    * routing handles corrupt blobs upstream). */
  def decodeImage(bytes: Array[Byte]): Pixels = {
    val buf = ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4); buf.get(magic)
    require(new String(magic, "US-ASCII") == "GIMG", "not a GIMG blob (stub decoder)")
    val w = buf.getInt; val h = buf.getInt; val c = buf.get().toInt
    val px = new Array[Byte](w * h * c); buf.get(px)
    Pixels(w, h, c, px)
  }

  /** STUB — swap for a real WAV/FLAC decoder in production. */
  def decodeAudio(bytes: Array[Byte]): (Int, Array[Short]) = {
    val buf = ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4); buf.get(magic)
    require(new String(magic, "US-ASCII") == "GAUD", "not a GAUD blob (stub decoder)")
    val rate = buf.getInt; val n = buf.getInt
    val out = new Array[Short](n)
    var i = 0; while (i < n) { out(i) = buf.getShort; i += 1 }
    (rate, out)
  }

  /** STUB — a real build reads container indexes (mp4 moov). Returns
    * (fps, frame byte ranges) without materializing frames. */
  def videoFrameOffsets(bytes: Array[Byte]): (Int, Seq[(Int, Int)]) = {
    val buf = ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4); buf.get(magic)
    require(new String(magic, "US-ASCII") == "GVID", "not a GVID blob (stub decoder)")
    val fps = buf.getInt; val n = buf.getInt
    val offsets = (0 until n).map { _ =>
      val len = buf.getInt; val pos = buf.position(); buf.position(pos + len)
      (pos, len)
    }
    (fps, offsets)
  }

  // ---- real array arithmetic (NOT stubbed) ----

  /** Nearest-neighbor resample — real implementation. */
  def resizeNearest(p: Pixels, newW: Int, newH: Int): Pixels = {
    val out = new Array[Byte](newW * newH * p.channels)
    var y = 0
    while (y < newH) {
      val sy = (y.toLong * p.height / newH).toInt
      var x = 0
      while (x < newW) {
        val sx = (x.toLong * p.width / newW).toInt
        var c = 0
        while (c < p.channels) {
          out((y * newW + x) * p.channels + c) =
            p.data((sy * p.width + sx) * p.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Pixels(newW, newH, p.channels, out)
  }

  /** Grid mean-pool feature vector (gridDim × gridDim × channels) —
    * real implementation, the classic cheap visual embedding. */
  def gridMeanPool(p: Pixels, gridDim: Int): Array[Float] = {
    val out = new Array[Float](gridDim * gridDim * p.channels)
    val counts = new Array[Int](out.length)
    var y = 0
    while (y < p.height) {
      val gy = math.min(y * gridDim / p.height, gridDim - 1)
      var x = 0
      while (x < p.width) {
        val gx = math.min(x * gridDim / p.width, gridDim - 1)
        var c = 0
        while (c < p.channels) {
          val k = (gy * gridDim + gx) * p.channels + c
          out(k) += (p.data((y * p.width + x) * p.channels + c) & 0xff)
          counts(k) += 1
          c += 1
        }
        x += 1
      }
      y += 1
    }
    var k = 0
    while (k < out.length) { if (counts(k) > 0) out(k) /= counts(k); k += 1 }
    out
  }

  /** Windowed RMS energy over int16 samples — real implementation. */
  def rmsEnergy(samples: Array[Short], windows: Int): Array[Float] = {
    val out = new Array[Float](windows)
    if (samples.isEmpty) return out
    val per = math.max(1, samples.length / windows)
    var w = 0
    while (w < windows) {
      val from = w * per
      val to = math.min(samples.length, from + per)
      var acc = 0.0
      var i = from
      while (i < to) { val v = samples(i).toDouble; acc += v * v; i += 1 }
      out(w) = if (to > from) math.sqrt(acc / (to - from)).toFloat else 0f
      w += 1
    }
    out
  }
}

/** Typed results of the media stages. */
final case class ImageRecord(media_id: Long, width: Int, height: Int,
    channels: Int, n_bytes: Long, embedding: Array[Float])
final case class AudioRecord(media_id: Long, sample_rate: Int,
    n_samples: Int, energy: Array[Float])
final case class FrameRecord(media_id: Long, frame_idx: Int, ts_ms: Long,
    width: Int, height: Int, embedding: Array[Float])

/** The Spark-side plumbing: schemas, batched partition transforms,
  * size-aware partitioning. All stages are `Dataset`-typed
  * `mapPartitions` with an explicit row-batch shape (`batchSize`), the
  * same contract an Arrow-batched UDF gives a Python pipeline.
  */
object Multimodal {

  /** Media envelope for dynamic frames: id + opaque bytes + mime. */
  val mediaSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("media_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("bytes",
      org.apache.spark.sql.types.BinaryType, nullable = true),
    org.apache.spark.sql.types.StructField("mime",
      org.apache.spark.sql.types.StringType, nullable = true)))

  /** Repartition so each partition carries ~targetBytes of blob data:
    * the PARTITION COUNT is derived from total bytes (a 4K-video table
    * and a thumbnail table of equal row count differ by 10^4 in
    * weight), and rows are spread round-robin, which balances bytes in
    * expectation. Rows are not bin-packed individually — a partition
    * that randomly draws several giant blobs can still run heavy; for
    * hard per-row ceilings, split oversized blobs upstream. One cheap
    * agg + one shuffle. */
  def repartitionBySize(df: DataFrame, bytesCol: String, targetBytes: Long): DataFrame = {
    val row = df.agg(sum(length(col(bytesCol)))).collect()(0)
    val total = if (row.isNullAt(0)) 0L else row.getLong(0) // empty frame sums to null
    val parts = math.max(1L, math.min(200000L, (total + targetBytes - 1) / targetBytes)).toInt
    df.repartition(parts)
  }

  /** Decode + embed images in partition-local batches: 1 row in → 1
    * typed record out; corrupt blobs throw (route them via the poison
    * middleware upstream if the feed is dirty). */
  def imageFeatures(df: DataFrame, idCol: String = "media_id",
      bytesCol: String = "bytes", gridDim: Int = 4,
      batchSize: Int = 32): Dataset[ImageRecord] = {
    val idc = idCol; val bc = bytesCol
    df.select(col(idc).cast("long"), col(bc))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch => // explicit batch shape
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val px = MediaCodec.decodeImage(bytes) // STUB boundary
            ImageRecord(id, px.width, px.height, px.channels,
              bytes.length.toLong, MediaCodec.gridMeanPool(px, gridDim))
          }
        }
      }(Encoders.product[ImageRecord])
  }

  /** Decode + resize + embed: the resize-then-embed variant. */
  def imageFeaturesResized(df: DataFrame, newW: Int, newH: Int,
      idCol: String = "media_id", bytesCol: String = "bytes",
      gridDim: Int = 4, batchSize: Int = 32): Dataset[ImageRecord] = {
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]](1)
            val px = MediaCodec.resizeNearest(MediaCodec.decodeImage(bytes), newW, newH)
            ImageRecord(r.getLong(0), px.width, px.height, px.channels,
              bytes.length.toLong, MediaCodec.gridMeanPool(px, gridDim))
          }
        }
      }(Encoders.product[ImageRecord])
  }

  /** Audio → windowed RMS energy features. */
  def audioFeatures(df: DataFrame, windows: Int = 16,
      idCol: String = "media_id", bytesCol: String = "bytes",
      batchSize: Int = 32): Dataset[AudioRecord] =
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val (rate, samples) = MediaCodec.decodeAudio(r.getAs[Array[Byte]](1))
            AudioRecord(r.getLong(0), rate, samples.length,
              MediaCodec.rmsEnergy(samples, windows))
          }
        }
      }(Encoders.product[AudioRecord])

  /** Video frame sampling: 1 video row → N frame rows (every
    * `everyMs`), each decoded + embedded. The 1→N explode happens
    * executor-side inside the iterator — frames of one video never
    * gather anywhere. */
  def sampleFrames(df: DataFrame, everyMs: Long,
      idCol: String = "media_id", bytesCol: String = "bytes",
      gridDim: Int = 4): Dataset[FrameRecord] =
    df.select(col(idCol).cast("long"), col(bytesCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (fps, offsets) = MediaCodec.videoFrameOffsets(bytes) // STUB boundary
          val frameMs = 1000L / math.max(1, fps)
          val stride = math.max(1, (everyMs / frameMs).toInt)
          offsets.zipWithIndex.iterator
            .filter { case (_, i) => i % stride == 0 }
            .map { case ((pos, len), i) =>
              val frame = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
              val px = MediaCodec.decodeImage(frame)
              FrameRecord(id, i, i * frameMs, px.width, px.height,
                MediaCodec.gridMeanPool(px, gridDim))
            }
        }
      }(Encoders.product[FrameRecord])
}
