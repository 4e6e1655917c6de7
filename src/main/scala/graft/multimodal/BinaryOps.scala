package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Hashing

/** Multimodal column plumbing for training-data pipelines: media as
  * opaque `binary` columns + typed metadata, batched per-partition
  * feature extraction.
  *
  * The Spark-side mechanics (schema, partition-size control, batch
  * shape, deterministic outputs) are real and tested. Codecs: **PNG and
  * WAV are REAL** (JDK `javax.imageio` / `javax.sound.sampled` — encode
  * in the synthetic corpus, decode + content-derived features in
  * extraction; no external jar); video remains STUBBED behind
  * `StubDecoder` (no container codec ships with the JDK) — swap in a
  * real decoder (JNI/javacv) without touching the pipeline. In PySpark
  * the equivalent surface is
  * `mapInPandas`; in Scala the per-partition batched iterator below is
  * the same execution shape (one decoder init per partition, vectorized
  * batches, bounded memory).
  */
object BinaryOps {

  final case class MediaMeta(mediaType: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      checksum: Long,
      // fixed-size feature vector (stub: deterministic projection of
      // the payload; real impl: CNN embedding / mel spectrogram stats)
      features: Array[Float]
  )

  val FeatureDim = 16

  /** STUB decoder (audio/video only — PNG uses [[PngCodec]]): a real
    * implementation would decode the codec and compute content
    * features. The stub derives a deterministic feature vector from
    * payload bytes so tests can assert exact values end-to-end. Marked
    * intentionally — do NOT ship as a real decoder.
    */
  object StubDecoder {
    def decodeAndFeaturize(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** REAL PNG codec on the JDK's ImageIO — no external jar. Encode is
    * used by the synthetic corpus; decode extracts pixel-derived
    * features: 12 quadrant-mean RGB channels (normalized to [0,1]),
    * global mean luminance (Rec.601), and width/height scaled by 256.
    * ImageIO's PNG writer emits no timestamps/ancillary chunks for a
    * TYPE_INT_RGB image, so encode is byte-deterministic.
    */
  object PngCodec {
    def encode(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb(x, y) & 0xffffff); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** None when the payload is not decodable as an image. */
    def decodeAndFeaturize(payload: Array[Byte]): Option[Array[Float]] = {
      // ImageIO plugin readers can throw RuntimeExceptions (not just
      // IOException) on malformed payloads; any decode failure must fall
      // back to the stub rather than failing the Spark task.
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = Array.ofDim[Double](4, 3)
        val counts = new Array[Long](4)
        var lum = 0.0
        var y = 0
        while (y < h) {
          val qy = if (y * 2 >= h) 1 else 0
          var x = 0
          while (x < w) {
            val q = qy * 2 + (if (x * 2 >= w) 1 else 0)
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff
            val g = (p >> 8) & 0xff
            val b = p & 0xff
            sums(q)(0) += r; sums(q)(1) += g; sums(q)(2) += b
            counts(q) += 1
            lum += 0.299 * r + 0.587 * g + 0.114 * b
            x += 1
          }
          y += 1
        }
        val out = new Array[Float](FeatureDim)
        var q = 0
        while (q < 4) {
          var c = 0
          while (c < 3) {
            out(q * 3 + c) =
              if (counts(q) == 0) 0f else (sums(q)(c) / (255.0 * counts(q))).toFloat
            c += 1
          }
          q += 1
        }
        out(12) = (lum / (255.0 * w * h)).toFloat
        out(13) = w / 256.0f
        out(14) = h / 256.0f
        out(15) = 1.0f // real-decode marker (stub features never set it)
        Some(out)
      }
    }
  }

  def checksum64(payload: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) { h ^= payload(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** REAL WAV codec on the JDK's javax.sound.sampled — no external jar.
    * Encode writes a RIFF/PCM16LE container (44-byte canonical header);
    * decode parses it back through AudioSystem and extracts
    * time-domain features: per-quarter RMS (4) and zero-crossing rate
    * (4), global RMS / ZCR / peak / mean-abs, sample-count and
    * sample-rate scaled, channel count, and a real-decode marker.
    * (No FFT in the JDK — spectral features belong to the
    * real-codec swap slot like the video decoder.)
    */
  object WavCodec {
    def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer
        .allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** None when the payload is not a decodable audio container. */
    def decodeAndFeaturize(payload: Array[Byte]): Option[Array[Float]] = {
      val in =
        try javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (in == null) None
      else {
        // Never interpret raw bytes under an assumed PCM16 layout: route
        // every decodable container through an explicit conversion to
        // 16-bit signed little-endian PCM (8-bit / float / a-law inputs
        // convert; genuinely unconvertible ones fall back to the stub),
        // then de-interleave multi-channel frames by averaging to mono.
        val srcFmt = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          srcFmt.getSampleRate, 16, srcFmt.getChannels,
          srcFmt.getChannels * 2, srcFmt.getSampleRate, false)
        val pcm =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
          catch { case scala.util.control.NonFatal(_) => null }
        if (pcm == null) { in.close(); return None }
        val fmt = pcm.getFormat
        val bytes = pcm.readAllBytes()
        pcm.close()
        in.close()
        val ch = math.max(1, fmt.getChannels)
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = bytes.length / (2 * ch)
        if (n == 0) return None
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          var acc = 0
          var c = 0
          while (c < ch) { acc += bb.getShort((i * ch + c) * 2); c += 1 }
          samples(i) = (acc / ch).toShort
          i += 1
        }

        val out = new Array[Float](FeatureDim)
        var q = 0
        while (q < 4) {
          val s = n * q / 4
          val e = math.max(s + 1, n * (q + 1) / 4)
          var sq = 0.0
          var zc = 0L
          var j = s
          while (j < e) {
            val v = samples(j) / 32768.0
            sq += v * v
            if (j > s && (samples(j) >= 0) != (samples(j - 1) >= 0)) zc += 1
            j += 1
          }
          out(q) = math.sqrt(sq / (e - s)).toFloat
          out(4 + q) = zc.toFloat / (e - s)
          q += 1
        }
        var sq = 0.0
        var zc = 0L
        var peak = 0.0
        var meanAbs = 0.0
        var j = 0
        while (j < n) {
          val v = samples(j) / 32768.0
          sq += v * v
          meanAbs += math.abs(v)
          if (math.abs(v) > peak) peak = math.abs(v)
          if (j > 0 && (samples(j) >= 0) != (samples(j - 1) >= 0)) zc += 1
          j += 1
        }
        out(8) = math.sqrt(sq / n).toFloat
        out(9) = zc.toFloat / n
        out(10) = peak.toFloat
        out(11) = (meanAbs / n).toFloat
        out(12) = math.min(1.0f, n / 65536.0f)
        out(13) = fmt.getSampleRate / 48000.0f
        out(14) = fmt.getChannels.toFloat
        out(15) = 1.0f // real-decode marker
        Some(out)
      }
    }
  }

  /** Deterministic synthetic media corpus (payloads are a pure function
    * of media_id) — the fixture for the plumbing tests. image/png rows
    * carry a REAL 16x16 PNG (pixel colors derived from the id);
    * audio/wav rows carry a REAL PCM16 WAV (id-derived sine tone);
    * video rows carry opaque stub bytes (no container codec in the JDK).
    */
  def syntheticMedia(spark: SparkSession, n: Int, bytesPer: Int = 1024): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val tpe = Seq("image/png", "audio/wav", "video/mp4")(Hashing.toRange(Hashing.mix2(id, 99L), 3))
      tpe match {
        case "image/png" =>
          val png = PngCodec.encode(16, 16, (x, y) => Hashing.mix3(id, x.toLong, y.toLong).toInt)
          MediaRow(id, png, MediaMeta(tpe, 16, 16, 0L))
        case "audio/wav" =>
          val sr = 8000
          val nSamples = 400
          val freq = 200.0 + Hashing.toRange(Hashing.mix2(id, 7L), 1800)
          val wav = WavCodec.encode(
            Array.tabulate(nSamples)(i =>
              (math.sin(2 * math.Pi * freq * i / sr) * 12000).toShort),
            sr
          )
          MediaRow(id, wav, MediaMeta(tpe, 0, 0, nSamples * 1000L / sr))
        case _ =>
          val payload = Array.tabulate(bytesPer)(i => Hashing.mix2(id, i.toLong).toByte)
          MediaRow(id, payload, MediaMeta(tpe, 64, 64, 1000L))
      }
    }
  }

  /** Batched per-partition feature extraction: decoder state is
    * initialized once per partition (the expensive part with a real
    * codec), rows stream through without collecting the partition.
    * Control executor memory via partition sizing upstream
    * (`spark.sql.files.maxPartitionBytes` / repartition on ingest) —
    * payloads never concentrate in one task.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init slot (ImageIO is stateless/static;
      // a JNI codec for audio/video would initialize here, once)
      it.map { row =>
        // REAL decode for the JDK-covered codecs; undecodable bytes
        // under those labels fall back to the stub instead of failing
        // the batch. Video stays stubbed (no container codec in-JVM).
        val feats = row.meta.mediaType match {
          case "image/png" =>
            PngCodec.decodeAndFeaturize(row.payload)
              .getOrElse(StubDecoder.decodeAndFeaturize(row.payload))
          case "audio/wav" =>
            WavCodec.decodeAndFeaturize(row.payload)
              .getOrElse(StubDecoder.decodeAndFeaturize(row.payload))
          case _ => StubDecoder.decodeAndFeaturize(row.payload)
        }
        MediaFeatures(row.media_id, row.payload.length, checksum64(row.payload), feats)
      }
    }
  }

  /** One sampled video frame (frame payload stubbed like the decoder —
    * real impl: decoded + re-encoded frame bytes).
    */
  final case class FrameRow(media_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** Resize plumbing: per-partition batched transform emitting a new
    * payload + updated metadata. The pixel work is stubbed (a
    * deterministic byte projection scaled by the area ratio — real
    * impl: decoded resample); the pipeline mechanics (meta rewrite,
    * payload replacement, batch shape, memory bound) are real.
    */
  def resize(spark: SparkSession, media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: val codec = HeavyCodec.init()  (once per partition)
      it.map { row =>
        // spatial resize only applies to media WITH spatial dims; audio
        // rows (width*height == 0) pass through untouched
        if (row.meta.width.toLong * row.meta.height == 0L) row
        else {
          val ratio = (targetW.toLong * targetH).toDouble /
            (row.meta.width.toLong * row.meta.height)
          val outLen = math.max(1, (row.payload.length * ratio).toInt)
          val out = Array.tabulate(outLen) { i =>
            // deterministic stub "resample": stride through source bytes
            row.payload(((i.toLong * row.payload.length) / outLen).toInt)
          }
          MediaRow(row.media_id, out, row.meta.copy(width = targetW, height = targetH))
        }
      }
    }
  }

  /** Frame-sampling plumbing for video rows: one output row per sampled
    * timestamp (`everyMs` stride, capped at `maxFrames` per video —
    * the cap bounds the explode's fan-out, the usual skew control for
    * hour-long outlier videos). Non-video rows are dropped. Frame
    * extraction is stubbed deterministically (real impl: keyframe
    * seek + decode).
    */
  def sampleFrames(
      spark: SparkSession,
      media: Dataset[MediaRow],
      everyMs: Long,
      maxFrames: Int
  ): Dataset[FrameRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.filter(_.meta.mediaType.startsWith("video/")).flatMap { row =>
        val n = math.min(maxFrames.toLong, row.meta.durationMs / math.max(1L, everyMs) + 1).toInt
        Iterator.tabulate(n) { f =>
          val ts = f * everyMs
          // stub frame bytes: deterministic slice keyed by (id, frame)
          val frame = Array.tabulate(32)(i => Hashing.mix3(row.media_id, f.toLong, i.toLong).toByte)
          FrameRow(row.media_id, f, ts, frame)
        }
      }
    }
  }

  /** Join features back to metadata and aggregate per media type —
    * the downstream-consumer shape (feature table + typed dims).
    */
  def featureStatsByType(media: Dataset[MediaRow], features: Dataset[MediaFeatures]): DataFrame = {
    val m = media.toDF().select(col("media_id"), col("meta.mediaType").as("media_type"))
    features.toDF()
      .join(m, Seq("media_id"))
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        round(avg(col("n_bytes")), 2).as("avg_bytes"),
        round(avg(element_at(col("features"), 1)), 6).as("avg_f0")
      )
  }
}
