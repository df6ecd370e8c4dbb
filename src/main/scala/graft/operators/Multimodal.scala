package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata structs, plus decode / feature-extract / thumbnail-resize /
  * frame-sample stages.
  *
  * IMAGE decode is REAL: [[decodeImage]] runs the JDK's `javax.imageio` PNG
  * codec executor-side over the binary payload ([[synthPngTable]] builds the
  * corpus as genuine PNG bytes whose content is pure integer arithmetic of
  * the id, so the decoded output is independently derivable by the DuckDB
  * oracle — an actual encode→decode round trip through a production
  * codec). AUDIO decode is REAL too ([[decodeAudio]]: the JDK's
  * `javax.sound.sampled` WAV/PCM reader, with [[synthWavTable]] as its
  * integer-derivable corpus). VIDEO and compressed-audio codecs are not
  * in the JDK, so that seam stays a clearly marked STUB ([[decodeStub]],
  * a deterministic fake derived from the bytes). Either way the
  * Spark-side shape is what matters at 100 TB:
  * binary+struct schema, per-partition batched processing via
  * `mapPartitions` (the Scala analog of `mapInPandas`: one iterator per
  * partition, nothing per-row on the driver), column pruning around the
  * opaque payload, and deterministic output schemas a downstream training
  * pipeline can bank on.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("checksum", StringType))))))

  /** Wrap any text table into a media-shaped table (payload = UTF-8 bytes) —
    * the stand-in corpus for the plumbing tests/benchmarks.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("format"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("checksum")).as("meta"))

  /** Deterministic synthetic PNG corpus: REAL PNG bytes encoded
    * executor-side with the JDK's lossless `ImageIO` codec. Dimensions
    * (1–16 × 1–16) and a two-tone vertical-split fill are pure integer
    * arithmetic of the id, so the decode stage's expected output —
    * width, height, per-channel pixel sums — is independently derivable
    * from the id alone (the property the `mm_decode_features` oracle
    * uses). Encoding is per-partition batched; one image is a few hundred
    * bytes, so the corpus stays payload-bounded like any media table.
    */
  def synthPngTable(ids: DataFrame, idCol: String = "media_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val w = 1 + (id % 16).toInt
        val h = 1 + ((id / 16) % 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val wA = w / 2 // left tone covers the floor(w/2) columns (may be 0)
        val rgbA = (((id * 3) % 256).toInt << 16) |
          (((id * 7) % 256).toInt << 8) | ((id * 13) % 256).toInt
        val rgbB = (((id * 5) % 256).toInt << 16) |
          (((id * 11) % 256).toInt << 8) | ((id * 17) % 256).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, if (x < wA) rgbA else rgbB)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val bytes = bos.toByteArray
        md.reset()
        val sum = md.digest(bytes).map("%02x".format(_)).mkString
        Row(id, bytes, Row("image/png", bytes.length.toLong, sum))
      }
    }(enc)
  }

  /** REAL image decode: the JDK `javax.imageio` codec over the binary
    * payload, per-partition batched (the mapInPandas shape — one codec
    * instance per partition iterator, never per row on the driver). Output
    * is the decoded dimensions plus a bounded 3-element feature vector
    * (mean R/G/B, normalized) — NEVER the full pixel buffer, so output
    * rows stay O(1) regardless of image size. Undecodable payloads yield
    * null features instead of failing the stage (the lenient-COPY
    * discipline applied to media).
    */
  def decodeImage(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", ArrayType(DoubleType))))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]]("payload")
        val img =
          if (payload == null) null
          else
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case _: java.io.IOException => null }
        if (img == null) Row(id, null, null, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xFF
              sg += (rgb >> 8) & 0xFF
              sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          Row(id, w, h, Seq(sr / n / 255.0, sg / n / 255.0, sb / n / 255.0))
        }
      }
    }(enc)
  }

  /** Deterministic synthetic WAV corpus: REAL RIFF/WAVE bytes encoded
    * executor-side with the JDK's `javax.sound.sampled` writer (16-bit
    * signed little-endian mono PCM at 8 kHz). Sample values and length are
    * pure integer arithmetic of the id — `n = 400 + (id % 5)·80` samples,
    * `s_j = ((id·31 + j·7) mod 2001) − 1000` — so the decode stage's
    * expected output (length, integer sample sum, peak amplitude) is
    * independently derivable from the id alone, the same
    * encode→decode-through-a-production-codec property `synthPngTable`
    * gives images. Per-partition batched; one clip is ~1 KB.
    */
  def synthWavTable(ids: DataFrame, idCol: String = "media_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val fmt = new javax.sound.sampled.AudioFormat(
        8000f, 16, 1, true /*signed*/, false /*little-endian*/)
      rows.map { r =>
        val id = r.getLong(0)
        val n = (400 + (id % 5) * 80).toInt
        val raw = new Array[Byte](n * 2)
        var j = 0
        while (j < n) {
          val s = (((id * 31 + j.toLong * 7) % 2001) - 1000).toInt
          raw(2 * j) = (s & 0xFF).toByte
          raw(2 * j + 1) = ((s >> 8) & 0xFF).toByte
          j += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val bytes = bos.toByteArray
        md.reset()
        val sum = md.digest(bytes).map("%02x".format(_)).mkString
        Row(id, bytes, Row("audio/wav", bytes.length.toLong, sum))
      }
    }(enc)
  }

  /** REAL audio decode: the JDK `javax.sound.sampled` WAV reader over the
    * binary payload, per-partition batched like [[decodeImage]]. Output is
    * the stream's declared format plus bounded integer features — sample
    * count, exact integer sample sum, peak |amplitude| — NEVER the sample
    * buffer itself, so rows stay O(1) regardless of clip length. Integer
    * features on purpose: they hash identically in any engine, where a
    * float RMS would be summation-order-dependent. Undecodable or
    * non-16-bit-PCM payloads yield null features (lenient-COPY, same as
    * [[decodeImage]]); the compressed-codec seam (MP3/AAC — genuinely
    * absent from the JDK) remains [[decodeStub]]'s.
    *
    * Channel contract: `n_samples` counts FRAMES (interleaved sample
    * groups, i.e. raw samples / channels — the duration unit), while
    * `sum_samples` and `peak_abs` fold over EVERY interleaved channel
    * sample. On mono input (the synthetic corpus) the two views coincide;
    * on multi-channel PCM the fold is deliberately all-channel (a
    * cross-channel sum and global peak are well-defined and
    * order-independent), so `sum_samples` is NOT `n_samples` rows of one
    * channel — consumers wanting per-channel stats must de-interleave
    * upstream.
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", LongType),
      StructField("n_channels", LongType),
      StructField("n_samples", LongType),
      StructField("sum_samples", LongType),
      StructField("peak_abs", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]]("payload")
        val decoded: Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
          if (payload == null) None
          else
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
                  fmt.getEncoding !=
                    javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
              else Some((fmt, ais.readAllBytes()))
            } catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException => None
              case _: java.io.IOException => None
            }
        decoded match {
          case None => Row(id, null, null, null, null, null)
          case Some((fmt, data)) =>
            val channels = fmt.getChannels
            val n = data.length / 2
            var sum = 0L; var peak = 0L; var i = 0
            while (i < n) {
              val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xFF)).toLong
              sum += s
              val a = math.abs(s)
              if (a > peak) peak = a
              i += 1
            }
            Row(id, fmt.getSampleRate.toLong, channels.toLong,
              (n / channels).toLong, sum, peak)
        }
      }
    }(enc)
  }

  /** Deterministic synthetic AVI corpus: REAL RIFF/AVI container bytes
    * (Microsoft's public AVI 1.0 layout: `RIFF('AVI ' LIST('hdrl' avih
    * LIST('strl' strh strf)) LIST('movi' 00db…))`) assembled executor-side.
    * Geometry and timing are pure integer arithmetic of the id —
    * `width = 16·(1 + id mod 9)`, `height = 16·(1 + id mod 7)`,
    * `n_frames = 10 + id mod 20`, `us_per_frame = 20000 + (id mod 5)·10000`
    * — so the container-parse stage's expected output is independently
    * derivable from the id alone, the same property the PNG and WAV
    * corpora carry. Frame payloads are uncompressed placeholder chunks
    * (8 bytes each): the container structure is real, frame PIXELS are
    * not — pixel decode is exactly the [[decodeStub]] seam.
    */
  def synthAviTable(ids: DataFrame, idCol: String = "media_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val width = 16 * (1 + (id % 9)).toInt
        val height = 16 * (1 + (id % 7)).toInt
        val nFrames = (10 + id % 20).toInt
        val usPerFrame = (20000 + (id % 5) * 10000).toInt
        val bytes = buildAvi(id, width, height, nFrames, usPerFrame)
        md.reset()
        val sum = md.digest(bytes).map("%02x".format(_)).mkString
        Row(id, bytes, Row("video/x-msvideo", bytes.length.toLong, sum))
      }
    }(enc)
  }

  private def buildAvi(id: Long, width: Int, height: Int, nFrames: Int,
                       usPerFrame: Int,
                       codec: String = "DIB ",
                       frameBytes: Int => Array[Byte] = null): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] =
      fourcc(cc) ++ u32(payload.length.toLong) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    def list(subtype: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(subtype) ++ children)
    // avih: MainAVIHeader — 14 little-endian u32s (public layout)
    val avih = chunk("avih",
      u32(usPerFrame.toLong) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++
        u32(nFrames.toLong) ++ u32(0L) ++ u32(1L) ++ u32(0L) ++
        u32(width.toLong) ++ u32(height.toLong) ++
        u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(0L))
    // strh (AVIStreamHeader, 'vids'/codec) + strf (BITMAPINFOHEADER —
    // biCompression carries the codec fourcc for compressed streams, 0 for
    // uncompressed DIB, per the public VFW layout)
    val strh = chunk("strh",
      fourcc("vids") ++ fourcc(codec) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++
        u32(usPerFrame.toLong) /*dwScale*/ ++ u32(1000000L) /*dwRate*/ ++
        u32(0L) ++ u32(nFrames.toLong) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++
        u32(0L) ++ Array.fill(8)(0.toByte) /*rcFrame*/)
    val strf = chunk("strf",
      u32(40L) ++ u32(width.toLong) ++ u32(height.toLong) ++
        Array((1 & 0xFF).toByte, 0.toByte) ++ Array((24 & 0xFF).toByte, 0.toByte) ++
        (if (codec == "DIB ") u32(0L) else fourcc(codec)) ++
        u32((width.toLong * height * 3)) ++
        u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(0L))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    // '00db' = uncompressed frame, '00dc' = compressed frame (VFW chunk ids)
    val frames = (0 until nFrames).flatMap { f =>
      if (frameBytes == null) chunk("00db", u32(id * 31 + f) ++ u32(id * 7 + f))
      else chunk("00dc", frameBytes(f))
    }.toArray
    val movi = list("movi", frames)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    bb.write(fourcc("RIFF")); bb.write(u32(body.length.toLong)); bb.write(body)
    bb.toByteArray
  }

  /** Deterministic synthetic MJPEG corpus (r14 — closes the frame-pixel
    * seam for the one compressed codec the JDK ships): same container
    * geometry as [[synthAviTable]], but the stream is 'MJPG' and every
    * `00dc` chunk is a REAL baseline JPEG (the MJPEG "codec" IS
    * one-JPEG-per-frame, which is why `javax.imageio` can decode it) of a
    * UNIFORM gray level `v_f = (id·31 + f·7) mod 256`.
    *
    * Why uniform gray makes the decode oracle-exact: grayscale JPEG skips
    * the RGB↔YCbCr rounding, and at compression quality 1.0 the
    * quantization tables are all ones, so a uniform block's DCT (DC term
    * only, integer-valued) round-trips bit-exactly — verified over all
    * 256 gray levels × aligned and non-aligned dimensions. The decoded
    * per-frame mean gray is therefore pure integer arithmetic of the id,
    * the same independently-derivable property the PNG/WAV corpora carry.
    */
  def synthMjpegAviTable(ids: DataFrame, idCol: String = "media_id"): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      // ONE writer per partition, reused across every frame of every clip
      // (ImageIO registry lookup + writer construction per frame was the
      // measured hot spot — ~3× the actual encode work); disposed with the
      // iterator
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      def jpegGray(width: Int, height: Int, v: Int): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) { img.getRaster.setSample(x, y, 0, v); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try {
          w.setOutput(ios)
          w.write(null, new javax.imageio.IIOImage(img, null, null), p)
        } finally ios.close()
        bos.toByteArray
      }
      val out = rows.map { r =>
        val id = r.getLong(0)
        val width = 16 * (1 + (id % 9)).toInt
        val height = 16 * (1 + (id % 7)).toInt
        val nFrames = (10 + id % 20).toInt
        val usPerFrame = (20000 + (id % 5) * 10000).toInt
        val bytes = buildAvi(id, width, height, nFrames, usPerFrame,
          codec = "MJPG",
          frameBytes = f => jpegGray(width, height,
            ((id * 31 + f * 7) % 256).toInt))
        md.reset()
        val sum = md.digest(bytes).map("%02x".format(_)).mkString
        Row(id, bytes, Row("video/x-msvideo", bytes.length.toLong, sum))
      }
      new Iterator[Row] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) w.dispose(); h }
        def next(): Row = out.next()
      }
    }(enc)
  }

  /** REAL video-container metadata parse: a generic RIFF chunk walk (the
    * container format is a public Microsoft spec) that locates the `avih`
    * header inside the `hdrl` list and reads the little-endian geometry
    * and timing words — width, height, frame count, µs-per-frame, derived
    * duration. Per-partition batched like the other decoders, O(1) output
    * per clip, and the walk never materializes frame data (it SKIPS the
    * `movi` list wholesale — at 100 TB the movi payload is the file; the
    * parse touches only the few-hundred-byte header). Non-RIFF /
    * truncated / avih-less payloads yield null features (lenient-COPY).
    * Frame pixel decode stays the documented [[decodeStub]] seam.
    */
  def parseVideoMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("n_frames", LongType),
      StructField("us_per_frame", LongType),
      StructField("duration_us", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]]("payload")
        def le32(off: Int): Long =
          (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
            ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
        def cc(off: Int): String =
          if (off + 4 <= b.length)
            new String(b, off, 4, "US-ASCII") else ""
        // depth-first chunk walk over [from, until); returns the avih
        // payload offset or -1. Descends into LISTs only — never copies.
        def findAvih(from: Int, until: Int): Int = {
          var off = from
          while (off + 8 <= until) {
            val id4 = cc(off); val szL = le32(off + 4)
            val payloadEnd = off + 8L + szL
            if (szL > Int.MaxValue || payloadEnd > until) return -1
            val sz = szL.toInt
            if (id4 == "avih" && sz >= 40) return off + 8
            if (id4 == "LIST" && cc(off + 8) != "movi") {
              val hit = findAvih(off + 12, payloadEnd.toInt)
              if (hit >= 0) return hit
            }
            off = payloadEnd.toInt + (sz & 1)
          }
          -1
        }
        // try-wrapped like the codec decoders: ANY malformed byte pattern
        // must degrade to null features, never fail the task
        try {
          val avih =
            if (b == null || b.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") -1
            else findAvih(12,
              math.min(b.length.toLong, 12L + le32(4)).toInt)
          if (avih < 0 || avih + 40 > b.length) Row(id, null, null, null, null, null)
          else {
            val usPerFrame = le32(avih)
            val nFrames = le32(avih + 16)
            val w = le32(avih + 32); val h = le32(avih + 36)
            Row(id, w, h, nFrames, usPerFrame, nFrames * usPerFrame)
          }
        } catch {
          case _: RuntimeException => Row(id, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** REAL per-frame video pixel decode (r14): a RIFF walk to the `movi`
    * list, then `javax.imageio` over each `00dc`/`00db` frame chunk — for
    * MJPEG streams every frame IS a baseline JPEG, so the one compressed
    * video codec the JDK can decode is decoded for real. Output is O(1)
    * per frame (decoded dimensions + mean gray level), NEVER pixel
    * buffers; per-partition batched with one codec lookup per task, and
    * the walk streams the payload without copying frame bytes (the
    * `ByteArrayInputStream` wraps the payload range in place). Frames the
    * codec rejects yield null features (lenient-COPY, same contract as
    * [[decodeImage]]). At 100 TB the movi payload is the file — this is
    * the stage that must be distributed, and it is: one task decodes one
    * partition's clips, nothing returns to the driver.
    */
  def decodeVideoFrames(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("gray_level", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      // ONE reader per partition (same reuse rationale as the writer in
      // [[synthMjpegAviTable]]: per-frame ImageIO registry lookups were
      // the measured hot spot, not the decode itself)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("jpg").next()
      def readFrame(buf: Array[Byte], off: Int, len: Int): java.awt.image.BufferedImage = {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(buf, off, len))
        try { reader.setInput(iis, true, true); reader.read(0) }
        catch { case _: java.io.IOException => null }
        finally iis.close()
      }
      val it = rows.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]]("payload")
        def le32(off: Int): Long =
          (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
            ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
        def cc(off: Int): String =
          if (off + 4 <= b.length) new String(b, off, 4, "US-ASCII") else ""
        // locate the movi list's payload range [start, end)
        def findMovi(from: Int, until: Int): (Int, Int) = {
          var off = from
          while (off + 8 <= until) {
            val id4 = cc(off); val szL = le32(off + 4)
            val payloadEnd = off + 8L + szL
            if (szL > Int.MaxValue || payloadEnd > until) return (-1, -1)
            if (id4 == "LIST") {
              if (cc(off + 8) == "movi") return (off + 12, payloadEnd.toInt)
              val hit = findMovi(off + 12, payloadEnd.toInt)
              if (hit._1 >= 0) return hit
            }
            off = payloadEnd.toInt + (szL.toInt & 1)
          }
          (-1, -1)
        }
        try {
          val (start, end) =
            if (b == null || b.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") (-1, -1)
            else findMovi(12, math.min(b.length.toLong, 12L + le32(4)).toInt)
          if (start < 0) Iterator.empty
          else {
            var off = start
            var idx = 0
            val out = scala.collection.mutable.ArrayBuffer.empty[Row]
            while (off + 8 <= end) {
              val id4 = cc(off); val sz = le32(off + 4).toInt
              if (off + 8 + sz > end) { off = end } // truncated: stop
              else {
                if (id4.endsWith("dc") || id4.endsWith("db")) {
                  val img = readFrame(b, off + 8, sz)
                  if (img == null) out += Row(id, idx, null, null, null)
                  else {
                    val w = img.getWidth; val h = img.getHeight
                    var sum = 0L
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        sum += img.getRaster.getSample(x, y, 0); x += 1
                      }
                      y += 1
                    }
                    out += Row(id, idx, w, h,
                      math.round(sum.toDouble / (w.toLong * h)).toInt)
                  }
                  idx += 1
                }
                off += 8 + sz + (sz & 1)
              }
            }
            out.iterator
          }
        } catch {
          case _: RuntimeException => Iterator.empty
        }
      }
      new Iterator[Row] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) reader.dispose(); h }
        def next(): Row = it.next()
      }
    }(enc)
  }

  /** STUB decode for the codec-less media kinds (inter-frame video codecs,
    * compressed audio — no JDK codec exists; images go through the REAL
    * [[decodeImage]], PCM/WAV audio through the REAL [[decodeAudio]], AVI
    * container METADATA through the REAL [[parseVideoMeta]], and MJPEG
    * frame PIXELS through the REAL [[decodeVideoFrames]] — the seam now
    * covers only inter-frame codecs like H.264/VP9): a real
    * deployment plugs a codec in here (JNI/javacv/etc.); the fake derives
    * deterministic "dimensions" and a tiny "pixel" vector from the payload
    * bytes so downstream stages are exercised end-to-end. Runs
    * per-partition (batched, executor-side) — the mapInPandas shape.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", ArrayType(DoubleType))))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        // STUB: ??? ← codec goes here. Deterministic fake below.
        val bytes = if (payload == null) Array.emptyByteArray else payload
        val n = bytes.length
        val width = math.max(1, n % 64)
        val height = math.max(1, (n / 64) % 64 + 1)
        // tight primitive loop — this stub is benched, so no boxed foldLeft
        var h = 17L; var bi = 0
        while (bi < n) { h = h * 31 + bytes(bi); bi += 1 }
        val pixels = (0 until 8).map(i => Math.floorMod(h + i, 256L).toDouble / 255.0)
        Row.fromSeq(r.toSeq ++ Seq(width, height, pixels))
      }
    }(enc)
  }

  /** Feature extraction over decoded media — pure column math on the decoded
    * shape (codegen'd), e.g. aspect ratio + mean "pixel".
    */
  def extractFeatures(decoded: DataFrame): DataFrame =
    decoded.select(
      col("media_id"),
      round(col("width").cast("double") / col("height"), 4).as("aspect_ratio"),
      round(aggregate(col("pixels"), lit(0.0), _ + _) / size(col("pixels")), 4)
        .as("mean_pixel"))

  /** Thumbnail plan: target box while preserving aspect — arithmetic only,
    * the actual resample lives in the decode stub's seam.
    */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded.withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")).cast("double")))
      .select(col("media_id"), col("width"), col("height"),
        ceil(col("width") * col("scale")).cast("int").as("out_width"),
        ceil(col("height") * col("scale")).cast("int").as("out_height"))

  /** Frame sampling for video-shaped media: every k-th index up to n frames —
    * `sequence` + `explode`, fully distributed.
    */
  def frameSample(media: DataFrame, nFrames: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
        explode(sequence(lit(0), lit((nFrames - 1) * stride), lit(stride))).as("frame_idx"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary payload + metadata struct (oracle checks n_bytes/checksum)
    "mm_media_metadata" -> ((s, dir) => {
      asMediaTable(graft.Tables(s, dir, "documents"))
        .select(col("media_id"), col("meta.format").as("format"),
          col("meta.n_bytes").as("n_bytes"), col("meta.checksum").as("checksum"))
    }),
    // REAL PNG encode → javax.imageio decode → feature extraction, all
    // per-partition batched; oracle-gated because the synthetic corpus's
    // pixel content is integer arithmetic of the id (see synthPngTable)
    "mm_decode_features" -> ((s, dir) => {
      extractFeatures(decodeImage(synthPngTable(
        graft.Tables(s, dir, "documents"), idCol = "doc_id")))
    }),
    // resize planning on decoded dimensions (oracle-gated: the stub's
    // width/height are pure arithmetic over octet_length(text))
    "mm_resize_plan" -> ((s, dir) => {
      resizePlan(decodeStub(asMediaTable(graft.Tables(s, dir, "documents"))), maxSide = 32)
    }),
    // frame sampling plumbing (oracle: pure arithmetic cross product)
    "mm_frame_sample" -> ((s, dir) => {
      frameSample(asMediaTable(graft.Tables(s, dir, "documents")), nFrames = 4, stride = 10)
    }),
    // REAL WAV encode → javax.sound.sampled decode → integer features,
    // per-partition batched; oracle-gated because the synthetic corpus's
    // sample values are integer arithmetic of the id (see synthWavTable) —
    // the audio twin of mm_decode_features
    "mm_audio_features" -> ((s, dir) => {
      decodeAudio(synthWavTable(
        graft.Tables(s, dir, "documents"), idCol = "doc_id"))
    }),
    // REAL AVI container assembly → RIFF chunk-walk metadata parse,
    // per-partition batched; oracle-gated because the synthetic corpus's
    // header words are integer arithmetic of the id (see synthAviTable) —
    // the video-container twin of mm_decode/mm_audio (frame pixels stay
    // the documented stub seam)
    "mm_video_meta" -> ((s, dir) => {
      parseVideoMeta(synthAviTable(
        graft.Tables(s, dir, "documents"), idCol = "doc_id"))
    }),
    // REAL MJPEG assembly → RIFF movi walk → javax.imageio per-frame pixel
    // decode; oracle-gated because uniform-gray JPEG at quality 1.0
    // round-trips bit-exactly (see synthMjpegAviTable) — the decoded mean
    // gray of every frame is integer arithmetic of the id. Every 4th doc:
    // the entry prices in-entry JPEG ENCODE of the synthetic corpus (a real
    // pipeline receives frames already encoded), and the full corpus made
    // this the single most expensive battery entry (~10 s at sf0.1 even
    // with per-partition codec reuse) — the quarter slice still decodes
    // ~24k real frames at sf0.1
    "mm_video_frames" -> ((s, dir) => {
      decodeVideoFrames(synthMjpegAviTable(
        graft.Tables(s, dir, "documents").filter(col("doc_id") % 4 === 0),
        idCol = "doc_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "mm_media_metadata" ->
      """SELECT doc_id AS media_id, 'text/plain' AS format,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  MD5(text) AS checksum
        |FROM documents""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx
        |FROM documents, (SELECT unnest([0, 10, 20, 30]) AS f)""".stripMargin,
    // independently derives what the REAL WAV round trip must produce:
    // synthWavTable's PCM samples are integer arithmetic of the id, so the
    // sum/peak fold in exact BIGINT — no float ever enters the compare
    "mm_audio_features" ->
      """WITH ids AS (SELECT doc_id AS media_id,
        |              400 + (doc_id % 5) * 80 AS n FROM documents),
        |s AS (SELECT media_id, n, UNNEST(generate_series(0, n - 1)) AS j FROM ids),
        |v AS (SELECT media_id, n,
        |        (media_id * 31 + j * 7) % 2001 - 1000 AS smp FROM s)
        |SELECT media_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS n_channels,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(SUM(smp) AS BIGINT) AS sum_samples,
        |  CAST(MAX(ABS(smp)) AS BIGINT) AS peak_abs
        |FROM v GROUP BY media_id, n""".stripMargin,
    // independently derives what the RIFF walk must read back out of the
    // assembled container: every header word is integer arithmetic of the id
    "mm_video_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(16 * (1 + doc_id % 9) AS BIGINT) AS width,
        |  CAST(16 * (1 + doc_id % 7) AS BIGINT) AS height,
        |  CAST(10 + doc_id % 20 AS BIGINT) AS n_frames,
        |  CAST(20000 + (doc_id % 5) * 10000 AS BIGINT) AS us_per_frame,
        |  CAST((10 + doc_id % 20) * (20000 + (doc_id % 5) * 10000) AS BIGINT)
        |    AS duration_us
        |FROM documents""".stripMargin,
    // independently derives what the REAL MJPEG round trip must produce:
    // every frame is a uniform-gray JPEG whose decoded mean is exact
    // integer arithmetic of the id (see synthMjpegAviTable)
    "mm_video_frames" ->
      """WITH ids AS (
        |  SELECT doc_id AS media_id,
        |    10 + doc_id % 20 AS nf,
        |    16 * (1 + doc_id % 9) AS w,
        |    16 * (1 + doc_id % 7) AS h
        |  FROM documents WHERE doc_id % 4 = 0),
        |f AS (SELECT media_id, w, h,
        |        UNNEST(generate_series(0, nf - 1)) AS frame_idx FROM ids)
        |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST((media_id * 31 + frame_idx * 7) % 256 AS INT) AS gray_level
        |FROM f""".stripMargin,
    // independently derives what the REAL PNG round trip must produce:
    // synthPngTable's two-tone fill is integer arithmetic of the id, and
    // the double expressions mirror decodeImage/extractFeatures' operation
    // order exactly (sum/n/255, then (0 + r + g + b)/3)
    "mm_decode_features" ->
      """WITH geo AS (
        |  SELECT doc_id AS media_id,
        |    1 + doc_id % 16 AS w,
        |    1 + (doc_id // 16) % 16 AS h,
        |    (1 + doc_id % 16) // 2 AS wa
        |  FROM documents),
        |sums AS (
        |  SELECT media_id, w, h,
        |    h * (wa * ((media_id * 3) % 256) + (w - wa) * ((media_id * 5) % 256)) AS sr,
        |    h * (wa * ((media_id * 7) % 256) + (w - wa) * ((media_id * 11) % 256)) AS sg,
        |    h * (wa * ((media_id * 13) % 256) + (w - wa) * ((media_id * 17) % 256)) AS sb
        |  FROM geo),
        |px AS (
        |  SELECT media_id, w, h,
        |    CAST(sr AS DOUBLE) / CAST(w * h AS DOUBLE) / 255.0 AS pr,
        |    CAST(sg AS DOUBLE) / CAST(w * h AS DOUBLE) / 255.0 AS pg,
        |    CAST(sb AS DOUBLE) / CAST(w * h AS DOUBLE) / 255.0 AS pb
        |  FROM sums)
        |SELECT media_id,
        |  ROUND(CAST(w AS DOUBLE) / h, 4) AS aspect_ratio,
        |  ROUND((0.0 + pr + pg + pb) / 3, 4) AS mean_pixel
        |FROM px""".stripMargin,
    // replicates decodeStub's width/height arithmetic + resizePlan's scaling
    "mm_resize_plan" ->
      """WITH wh AS (
        |  SELECT doc_id AS media_id,
        |    GREATEST(1, octet_length(encode(text)) % 64) AS width,
        |    GREATEST(1, (octet_length(encode(text)) // 64) % 64 + 1) AS height
        |  FROM documents)
        |SELECT media_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
        |  CAST(CEIL(width * LEAST(CAST(1.0 AS DOUBLE), CAST(32.0 AS DOUBLE) / GREATEST(width, height))) AS INT) AS out_width,
        |  CAST(CEIL(height * LEAST(CAST(1.0 AS DOUBLE), CAST(32.0 AS DOUBLE) / GREATEST(width, height))) AS INT) AS out_height
        |FROM wh""".stripMargin
  )
}
