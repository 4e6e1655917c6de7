package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Hashing

/** Multimodal column plumbing for training-data pipelines: media as
  * opaque `binary` columns + typed metadata, batched per-partition
  * feature extraction.
  *
  * The Spark-side mechanics (schema, partition-size control, batch
  * shape, deterministic outputs) are real and tested. Codecs: **PNG,
  * WAV, and MJPEG-AVI video are REAL** (JDK `javax.imageio` /
  * `javax.sound.sampled` / hand-parsed RIFF container + ImageIO JPEG —
  * encode in the synthetic corpus, decode + content-derived features in
  * extraction; no external jar). Containers the JDK genuinely cannot
  * decode (mp4/h264/vp9 — native codecs required) fall back to the
  * labeled `StubDecoder` — swap in a real decoder (JNI/javacv) without
  * touching the pipeline. In PySpark the equivalent surface is
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

  /** Decode-or-None for any ImageIO-readable payload. ImageIO plugin
    * readers can throw RuntimeExceptions (not just IOException) on
    * malformed bytes; every decode site must fall back to the stub
    * rather than failing the Spark task, so the guard lives here once.
    */
  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img)
  }

  /** STUB decoder — the fallback for payloads whose codec the JDK
    * cannot decode (mp4/h264/vp9 etc.; PNG/WAV/MJPEG-AVI use the real
    * codecs above/below): derives a deterministic feature vector from
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
      val img = readImage(payload).orNull
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

  /** REAL video codec for MJPEG-in-AVI, pure JDK: the RIFF/AVI
    * container is hand-parsed (it's a plain chunk format — fourcc +
    * little-endian size, 'movi' LIST holds one '00dc' chunk per frame)
    * and the per-frame JPEG payloads go through ImageIO's built-in JPEG
    * codec. No external jar. This de-stubs the video path for the one
    * container/codec pair the JDK can actually decode; other containers
    * (mp4/h264 etc. — genuinely impossible without native codecs) still
    * fall back to [[StubDecoder]], documented.
    *
    * Encode writes: RIFF('AVI ') { LIST(hdrl){ avih, LIST(strl){ strh
    * 'vids'/'MJPG', strf BITMAPINFOHEADER } }, LIST(movi){ 00dc* },
    * idx1 } — the canonical minimal MJPEG AVI; ImageIO's JPEG writer is
    * deterministic for a given image + default quality, so the synthetic
    * corpus stays a pure function of media_id.
    */
  object AviMjpegCodec {
    private val Ascii = "US-ASCII"

    /** Deterministic JPEG frame bytes via ImageIO (quality defaults). */
    def encodeJpegFrame(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb(x, y) & 0xffffff); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    def encode(jpegFrames: Seq[Array[Byte]], width: Int, height: Int, fps: Int): Array[Byte] = {
      require(jpegFrames.nonEmpty && fps > 0)
      // RIFF sizes are u32 and this builder addresses with Ints: refuse
      // inputs that would wrap (a >2 GiB clip belongs in a chunked
      // container, not a single in-memory AVI). Per frame: payload +
      // pad byte + 8-byte movi chunk header + 16-byte idx1 entry.
      require(
        jpegFrames.map(f => f.length.toLong + 25).sum + 4096 <= Int.MaxValue,
        "total frame payload too large for a single RIFF/AVI container")
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      def fourcc(s: String): Unit = out.write(s.getBytes(Ascii))
      def u32(v: Long): Unit = {
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
      }
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }

      val padded = jpegFrames.map(f => if (f.length % 2 == 0) f else f :+ 0.toByte)
      val maxFrame = padded.map(_.length).max
      val moviBody = padded.map(_.length + 8).sum // 00dc + size per frame
      val idx1Size = 16 * padded.length
      // sizes: hdrl list = 4(type) + (8+56 avih) + (8 + strlBody) where
      // strlBody = 4 + (8+56 strh) + (8+40 strf)
      val strlBody = 4 + 64 + 48
      val hdrlBody = 4 + 64 + 8 + strlBody
      val riffBody = 4 + (8 + hdrlBody) + (8 + 4 + moviBody) + (8 + idx1Size)

      fourcc("RIFF"); u32(riffBody); fourcc("AVI ")
      fourcc("LIST"); u32(hdrlBody); fourcc("hdrl")
      fourcc("avih"); u32(56)
      u32(1000000L / fps) // dwMicroSecPerFrame
      u32(0); u32(0); u32(0x10) // maxBytesPerSec, padding, AVIF_HASINDEX
      u32(padded.length); u32(0); u32(1); u32(maxFrame.toLong)
      u32(width.toLong); u32(height.toLong)
      u32(0); u32(0); u32(0); u32(0) // reserved
      fourcc("LIST"); u32(strlBody); fourcc("strl")
      fourcc("strh"); u32(56)
      fourcc("vids"); fourcc("MJPG")
      u32(0); u16(0); u16(0); u32(0) // flags, priority, language, initialFrames
      u32(1); u32(fps.toLong) // scale, rate -> fps
      u32(0); u32(padded.length) // start, length (frames)
      u32(maxFrame.toLong); u32(0xffffffffL); u32(0) // bufSize, quality, sampleSize
      u16(0); u16(0); u16(width); u16(height) // rcFrame
      fourcc("strf"); u32(40)
      u32(40); u32(width.toLong); u32(height.toLong)
      u16(1); u16(24); fourcc("MJPG")
      u32(width.toLong * height * 3); u32(0); u32(0); u32(0); u32(0)
      fourcc("LIST"); u32(4 + moviBody); fourcc("movi")
      padded.foreach { f => fourcc("00dc"); u32(f.length.toLong); out.write(f) }
      fourcc("idx1"); u32(idx1Size.toLong)
      var off = 4L // offsets are relative to the 'movi' fourcc
      padded.foreach { f =>
        fourcc("00dc"); u32(0x10) // AVIIF_KEYFRAME
        u32(off); u32(f.length.toLong)
        off += 8 + f.length
      }
      out.flush()
      bos.toByteArray
    }

    /** Parsed container: (width, height, fps, jpeg frame payloads).
      * None when the payload is not a well-formed MJPEG AVI. The walk is
      * bounds-checked everywhere — malformed sizes return None rather
      * than throwing (the extractFeatures contract).
      */
    def decodeFrames(payload: Array[Byte]): Option[(Int, Int, Int, Seq[Array[Byte]])] =
      try {
        def str(off: Int) = new String(payload, off, 4, Ascii)
        def u32(off: Int): Long =
          (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
            ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
        if (payload.length < 12 || str(0) != "RIFF" || str(8) != "AVI ") return None
        var width = 0
        var height = 0
        var fps = 0
        val frames = Seq.newBuilder[Array[Byte]]
        def walk(start: Int, end: Int): Unit = {
          var p = start
          while (p + 8 <= end) {
            val cc = str(p)
            val size = u32(p + 4)
            if (size < 0 || p + 8 + size > end) return // malformed: stop
            if (cc == "LIST" && size >= 4) {
              walk(p + 12, p + 8 + size.toInt) // recurse past the list type
            } else if (cc == "avih" && size >= 40) {
              val usPerFrame = u32(p + 8)
              if (usPerFrame > 0) fps = math.max(1, (1000000L / usPerFrame).toInt)
              width = u32(p + 8 + 32).toInt
              height = u32(p + 8 + 36).toInt
            } else if ((cc.endsWith("dc") || cc.endsWith("db")) && size > 0) {
              frames += java.util.Arrays.copyOfRange(payload, p + 8, p + 8 + size.toInt)
            }
            p += 8 + size.toInt + (size.toInt & 1) // chunks are even-aligned
          }
        }
        walk(12, payload.length)
        val fs = frames.result()
        if (fs.isEmpty || width <= 0 || height <= 0) None
        else Some((width, height, math.max(1, fps), fs))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** None when the payload is not a decodable MJPEG AVI. Features:
      * quadrant RGB means averaged over up to 3 sampled frames
      * (first/middle/last), mean luminance, width/256, frameCount/256,
      * real-decode marker — the video sibling of [[PngCodec]]'s layout.
      */
    def decodeAndFeaturize(payload: Array[Byte]): Option[Array[Float]] =
      decodeFrames(payload).flatMap { case (_, _, _, frames) =>
        val picks =
          if (frames.length <= 3) frames
          else Seq(frames.head, frames(frames.length / 2), frames.last)
        val sums = Array.ofDim[Double](4, 3)
        val counts = new Array[Long](4)
        var lum = 0.0
        var lumCount = 0L
        var w = 0
        var h = 0
        var decoded = 0
        picks.foreach { jb =>
          val img = readImage(jb).orNull
          if (img != null) {
            decoded += 1
            w = img.getWidth
            h = img.getHeight
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
                lumCount += 1
                x += 1
              }
              y += 1
            }
          }
        }
        if (decoded == 0) None
        else {
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
          out(12) = if (lumCount == 0) 0f else (lum / (255.0 * lumCount)).toFloat
          out(13) = w / 256.0f
          out(14) = frames.length / 256.0f
          out(15) = 1.0f // real-decode marker
          Some(out)
        }
      }
  }

  /** Deterministic synthetic media corpus (payloads are a pure function
    * of media_id) — the fixture for the plumbing tests. image/png rows
    * carry a REAL 16x16 PNG (pixel colors derived from the id);
    * audio/wav rows carry a REAL PCM16 WAV (id-derived sine tone);
    * video/avi rows carry a REAL 4-frame 16x16 MJPEG AVI (frame pixels
    * derived from (id, frame)) — all three types round-trip through
    * real JDK codecs.
    */
  def syntheticMedia(spark: SparkSession, n: Int, bytesPer: Int = 1024): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val tpe = Seq("image/png", "audio/wav", "video/avi")(Hashing.toRange(Hashing.mix2(id, 99L), 3))
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
          val fps = 4
          val frames = Seq.tabulate(4)(f =>
            AviMjpegCodec.encodeJpegFrame(16, 16,
              (x, y) => Hashing.mix3(id, f.toLong, (x * 16 + y).toLong).toInt))
          val avi = AviMjpegCodec.encode(frames, 16, 16, fps)
          MediaRow(id, avi, MediaMeta(tpe, 16, 16, frames.length * 1000L / fps))
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
        // REAL decode for the JDK-covered codecs (PNG, WAV, MJPEG-AVI);
        // undecodable bytes under those labels — and containers the JDK
        // genuinely cannot decode (mp4/h264) — fall back to the stub
        // instead of failing the batch.
        val feats = row.meta.mediaType match {
          case "image/png" =>
            PngCodec.decodeAndFeaturize(row.payload)
              .getOrElse(StubDecoder.decodeAndFeaturize(row.payload))
          case "audio/wav" =>
            WavCodec.decodeAndFeaturize(row.payload)
              .getOrElse(StubDecoder.decodeAndFeaturize(row.payload))
          case t if t.startsWith("video/") =>
            AviMjpegCodec.decodeAndFeaturize(row.payload)
              .getOrElse(StubDecoder.decodeAndFeaturize(row.payload))
          case _ => StubDecoder.decodeAndFeaturize(row.payload)
        }
        MediaFeatures(row.media_id, row.payload.length, checksum64(row.payload), feats)
      }
    }
  }

  /** One sampled video frame: `frame` is the REAL source frame payload
    * (JPEG bytes for MJPEG-AVI inputs; labeled stub bytes when the
    * container is not JDK-decodable).
    */
  final case class FrameRow(media_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** Deterministic nearest-neighbor resample (integer source-index map;
    * no interpolation rounding to drift across JVMs).
    */
  private def resampleImage(
      img: java.awt.image.BufferedImage, tw: Int, th: Int): java.awt.image.BufferedImage = {
    val dst = new java.awt.image.BufferedImage(tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.getHeight / th).toInt
      var x = 0
      while (x < tw) {
        dst.setRGB(x, y, img.getRGB((x.toLong * img.getWidth / tw).toInt, sy))
        x += 1
      }
      y += 1
    }
    dst
  }

  /** Resize: per-partition batched transform emitting a new payload +
    * updated metadata. REAL pixel resample for the JDK-decodable types —
    * PNG (decode, nearest-neighbor, re-encode) and MJPEG-AVI (per-frame
    * decode/resample/re-encode, container rebuilt at the same fps).
    * Spatial rows whose payload is NOT decodable fall back to the
    * labeled deterministic byte-projection stub (the swap slot for
    * native codecs); audio rows (no spatial dims) pass through.
    */
  def resize(spark: SparkSession, media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init slot (ImageIO is static; a JNI codec for
      // other containers would initialize here, once)
      it.map { row =>
        // spatial resize only applies to media WITH spatial dims; audio
        // rows (width*height == 0) pass through untouched
        if (row.meta.width.toLong * row.meta.height == 0L) row
        else {
          val real: Option[Array[Byte]] = row.meta.mediaType match {
            case "image/png" =>
              val img = readImage(row.payload).orNull
              if (img == null) None
              else {
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(resampleImage(img, targetW, targetH), "png", bos)
                Some(bos.toByteArray)
              }
            case t if t.startsWith("video/") =>
              AviMjpegCodec.decodeFrames(row.payload).flatMap { case (_, _, fps, frames) =>
                val resized = frames.flatMap { jb =>
                  val img = readImage(jb).orNull
                  if (img == null) None
                  else {
                    val s = resampleImage(img, targetW, targetH)
                    val bos = new java.io.ByteArrayOutputStream()
                    javax.imageio.ImageIO.write(s, "jpg", bos)
                    Some(bos.toByteArray)
                  }
                }
                if (resized.length == frames.length)
                  Some(AviMjpegCodec.encode(resized, targetW, targetH, fps))
                else None
              }
            case _ => None
          }
          val out = real.getOrElse {
            // labeled stub resample for non-JDK codecs: deterministic
            // byte stride scaled by the area ratio
            val ratio = (targetW.toLong * targetH).toDouble /
              (row.meta.width.toLong * row.meta.height)
            val outLen = math.max(1, (row.payload.length * ratio).toInt)
            Array.tabulate(outLen) { i =>
              row.payload(((i.toLong * row.payload.length) / outLen).toInt)
            }
          }
          MediaRow(row.media_id, out, row.meta.copy(width = targetW, height = targetH))
        }
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled
    * timestamp (`everyMs` stride, capped at `maxFrames` per video —
    * the cap bounds the explode's fan-out, the usual skew control for
    * hour-long outlier videos). Non-video rows are dropped. For
    * MJPEG-AVI payloads each sampled timestamp maps to its source frame
    * (ts / frame-duration) and the REAL JPEG bytes are emitted;
    * undecodable containers fall back to labeled deterministic stub
    * bytes (the native-codec swap slot).
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
        val decoded = AviMjpegCodec.decodeFrames(row.payload)
        Iterator.tabulate(n) { f =>
          val ts = f * everyMs
          val frame = decoded match {
            case Some((_, _, fps, frames)) =>
              val frameDurMs = math.max(1L, 1000L / fps)
              frames(math.min(frames.length - 1L, ts / frameDurMs).toInt)
            case None =>
              // stub frame bytes: deterministic slice keyed by (id, frame)
              Array.tabulate(32)(i => Hashing.mix3(row.media_id, f.toLong, i.toLong).toByte)
          }
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
