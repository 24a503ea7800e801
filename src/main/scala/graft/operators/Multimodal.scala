package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (engine extension — builder brief): treat
  * image/audio/video payloads as opaque `binary` columns with typed metadata,
  * and run decode / feature-extraction as *batched per-partition* functions —
  * the Scala analogue of `mapInPandas` (one iterator of rows per partition,
  * amortized setup per batch, no per-row UDF dispatch).
  *
  * Two decoders live behind the seam:
  *  - `FakeDecoder` — deterministic features from the raw bytes, so the
  *    oracle gates (x10/x25/x26) replay the exact math in SQL over the
  *    text-payload test tables;
  *  - the REAL image path ([[decodeImages]]/[[resizeImages]], JDK ImageIO:
  *    PNG/BMP/GIF/JPEG) — actual decode → scale → re-encode on the same
  *    row-iterator plumbing, spec-verified against in-test constructed
  *    images (re-encoded bytes are codec-version artifacts, so the real
  *    path is gated by specs, not the SQL oracle);
  *  - the REAL audio path ([[decodeAudio]], `javax.sound.sampled`:
  *    WAV/AIFF/AU containers, integer PCM) — header facts + streaming
  *    RMS, spec-verified against in-test synthesized waveforms.
  *  - the REAL video path ([[decodeVideo]]/[[sampleVideoFrames]], a
  *    from-scratch YUV4MPEG2 demuxer — Y4M is a published plain-header +
  *    raw-planar-frames container, so a full parser needs no external
  *    codec) — header facts, frame segmentation, and an exact integer
  *    Y-plane byte sum; sampled frames re-encode as gray PNG and chain
  *    into [[decodeImages]]. Compressed-codec video (H.264 etc.) remains
  *    environment-bounded; a JNI demuxer swaps in behind the same shape.
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed metadata. */
  case class MediaBlob(doc_id: Long, payload: Array[Byte], media_type: String, lang: String)

  /** Extracted features — what a real decoder would emit (dimensions, frame
    * counts, …); the fake decoder derives them deterministically. */
  case class MediaFeatures(doc_id: Long, payload_bytes: Long, fake_width: Long,
                           payload_sha256: String, lang: String)

  /** STUB decoder: deterministic fake features in place of a real decode —
    * the ORACLE side (DuckDB replays bytes%640 and sha256 exactly). The
    * real decoders are [[decodeImages]] (ImageIO), [[decodeAudio]]
    * (javax.sound WAV/AIFF/AU PCM), and [[decodeVideo]] (from-scratch
    * Y4M demuxer); only compressed-codec media (H.264, MP3, …) remains
    * behind this stub per the builder brief (no codecs in this
    * container). */
  object FakeDecoder {
    def decode(blob: MediaBlob): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val sha = md.digest(blob.payload).map("%02x".format(_)).mkString
      MediaFeatures(
        doc_id = blob.doc_id,
        payload_bytes = blob.payload.length.toLong,
        fake_width = blob.payload.length.toLong % 640L, // stand-in for decoded width
        payload_sha256 = sha,
        lang = blob.lang)
    }
  }

  /** Wrap a text table as a multimodal table: payload = utf-8 bytes. At 100 TB
    * the payload column stays columnar parquet binary; metadata columns allow
    * predicate pushdown without touching payload bytes. */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").cast("long").as("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("media_type"),
      col("lang"))

  /** Batched per-partition feature extraction — the mapInPandas-shaped hot
    * path. One decoder instance per partition, rows streamed through it. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      // per-partition (per-batch) setup would init the real codec here
      rows.map(FakeDecoder.decode)
    }
  }

  /** Features from a REAL image decode; `decoded=false` rows carry the
    * payload-level facts only (corrupt media is a data-quality signal to
    * surface downstream, not an exception to kill a 100 TB scan over). */
  case class ImageFeatures(doc_id: Long, payload_bytes: Long,
                           width: Option[Int], height: Option[Int],
                           format: Option[String], payload_sha256: String,
                           decoded: Boolean)

  /** REAL image feature extraction over the opaque payload column — JDK
    * ImageIO (PNG/BMP/GIF/JPEG), no external codecs — on the identical
    * batched per-partition iterator as [[extractFeatures]]: schema,
    * partitioning, and batch shape are shared with the stub path, which
    * is the whole point of the seam. Undecodable payloads (wrong format,
    * truncated file, non-image bytes) come back `decoded=false` instead
    * of throwing: at corpus scale a poison payload must quarantine, not
    * fail the job. Headless-safe (raster ops only, no display). */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { blob =>
        val sha = md.digest(blob.payload).map("%02x".format(_)).mkString
        val decoded =
          try {
            val in = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(blob.payload))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(in)
              if (!readers.hasNext) None
              else {
                val r = readers.next()
                try {
                  r.setInput(in)
                  Some((r.read(0), r.getFormatName.toLowerCase))
                } finally r.dispose()
              }
            } finally if (in != null) in.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some((img, fmt)) =>
            ImageFeatures(blob.doc_id, blob.payload.length.toLong,
              Some(img.getWidth), Some(img.getHeight), Some(fmt), sha,
              decoded = true)
          case None =>
            ImageFeatures(blob.doc_id, blob.payload.length.toLong,
              None, None, None, sha, decoded = false)
        }
      }
    }
  }

  /** Features from a REAL audio decode; `decoded=false` rows quarantine
    * corrupt payloads exactly like [[ImageFeatures]]. `rms` is the
    * full-scale-normalized root-mean-square over all channels — None when
    * the encoding is not integer PCM (header facts still reported). */
  case class AudioFeatures(doc_id: Long, payload_bytes: Long,
                           sample_rate: Option[Int], channels: Option[Int],
                           bits_per_sample: Option[Int], n_frames: Option[Long],
                           duration_ms: Option[Long], rms: Option[Double],
                           payload_sha256: String, decoded: Boolean)

  /** REAL audio feature extraction — `javax.sound.sampled` (WAV/AIFF/AU
    * containers, integer PCM payloads; pure JDK, no external codec) on the
    * same batched per-partition iterator as [[decodeImages]]: header facts
    * (rate, channels, bit depth, frame count, duration) plus a one-pass
    * full-scale RMS over the samples — the level statistic an audio
    * curation filter keys on (silence / clipping detection). Undecodable
    * payloads quarantine as `decoded=false`; decodable containers with a
    * non-integer-PCM encoding keep their header facts and a None rms.
    * Spec-gated on constructed WAV payloads (sample count, RMS,
    * corrupt-payload quarantine) — a synthesized waveform's decode is
    * deterministic, but there is no SQL image of a WAV parser, so the
    * oracle side keeps the stub, the real-image precedent. */
  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { blob =>
        val sha = md.digest(blob.payload).map("%02x".format(_)).mkString
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(blob.payload))
          try {
            val f = ais.getFormat
            val frames = ais.getFrameLength
            val durationMs =
              if (f.getSampleRate > 0 && frames >= 0)
                Some((frames * 1000L / f.getSampleRate.toLong))
              else None
            val rms = audioRms(ais, f)
            AudioFeatures(blob.doc_id, blob.payload.length.toLong,
              Some(f.getSampleRate.toInt), Some(f.getChannels),
              Some(f.getSampleSizeInBits),
              if (frames >= 0) Some(frames) else None,
              durationMs, rms, sha, decoded = true)
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) =>
          AudioFeatures(blob.doc_id, blob.payload.length.toLong,
            None, None, None, None, None, None, sha, decoded = false)
        }
      }
    }
  }

  /** Full-scale-normalized RMS over every sample of an integer-PCM
    * stream (8-bit signed/unsigned, 16-bit signed either endianness);
    * None for other encodings. One streaming pass — never buffers more
    * than a 64 KiB read block, so a long clip costs no executor memory. */
  private def audioRms(ais: javax.sound.sampled.AudioInputStream,
                       f: javax.sound.sampled.AudioFormat): Option[Double] = {
    import javax.sound.sampled.AudioFormat.Encoding
    val bits = f.getSampleSizeInBits
    val supported =
      (f.getEncoding == Encoding.PCM_SIGNED && (bits == 16 || bits == 8)) ||
        (f.getEncoding == Encoding.PCM_UNSIGNED && bits == 8)
    if (!supported) return None
    val signed = f.getEncoding == Encoding.PCM_SIGNED
    val bigEndian = f.isBigEndian
    var sumSq = 0.0
    var n = 0L
    val buf = new Array[Byte](65536)
    var carry = -1 // pending first byte of a split 16-bit sample
    var read = ais.read(buf)
    while (read > 0) {
      var i = 0
      if (bits == 8) {
        while (i < read) {
          val s =
            if (signed) buf(i).toDouble / 128.0
            else ((buf(i) & 0xff) - 128).toDouble / 128.0
          sumSq += s * s; n += 1; i += 1
        }
      } else {
        if (carry >= 0 && read > 0) {
          val s16 =
            if (bigEndian) ((carry << 8) | (buf(0) & 0xff)).toShort
            else (((buf(0) & 0xff) << 8) | (carry & 0xff)).toShort
          val s = s16.toDouble / 32768.0
          sumSq += s * s; n += 1; carry = -1; i = 1
        }
        while (i + 1 < read) {
          val s16 =
            if (bigEndian) (((buf(i) & 0xff) << 8) | (buf(i + 1) & 0xff)).toShort
            else (((buf(i + 1) & 0xff) << 8) | (buf(i) & 0xff)).toShort
          val s = s16.toDouble / 32768.0
          sumSq += s * s; n += 1; i += 2
        }
        if (i < read) carry = buf(i) & 0xff
      }
      read = ais.read(buf)
    }
    if (n == 0) None else Some(math.sqrt(sumSq / n))
  }

  /** A resized media payload (decode → scale → re-encode in a real codec). */
  case class ResizedMedia(doc_id: Long, payload: Array[Byte], media_type: String,
                          width: Long, height: Long)

  /** REAL resize: ImageIO decode → bilinear Graphics2D scale to
    * width×height → PNG re-encode, per partition on the same iterator
    * shape as the stub [[resize]]. Undecodable payloads are DROPPED
    * (flatMap) — the quarantine split belongs to [[decodeImages]]'
    * `decoded` flag upstream. Output bytes are deterministic for a fixed
    * JDK but not across codec versions, so this path is spec-gated
    * against in-test constructed images; the SQL oracle keeps the stub. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   width: Int, height: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(width > 0 && height > 0, s"invalid target size ${width}x$height")
    media.as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { blob =>
        try {
          val src = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(blob.payload))
          if (src == null) None
          else {
            val dst = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(src, 0, 0, width, height, null)
            } finally g.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", out)
            Some(ResizedMedia(blob.doc_id, out.toByteArray, "image/png",
              width.toLong, height.toLong))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** Resize plumbing: batched per-partition transform preserving the opaque
    * payload column. The pixel scaling itself is STUBBED (no codecs in this
    * container) — the fake deterministically truncates the payload to
    * width*height bytes so output sizes are checkable; a real codec swaps in
    * behind the same row iterator without touching schema or partitioning. */
  def resize(spark: SparkSession, media: DataFrame, width: Int, height: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(width > 0 && height > 0, s"invalid target size ${width}x$height")
    media.as[MediaBlob].mapPartitions { rows =>
      rows.map { blob =>
        // long product: width*height in Int overflows at 46341^2 and would
        // silently truncate every payload to empty
        val n = math.min(blob.payload.length.toLong, width.toLong * height).toInt
        ResizedMedia(blob.doc_id, blob.payload.take(n), blob.media_type,
          width.toLong, height.toLong)
      }
    }
  }

  // ------------------------------------------------------------------ video

  /** A parsed YUV4MPEG2 stream: header facts plus the byte offset of each
    * frame's planar data (Y plane first — `width*height` bytes at each
    * offset). Offsets let [[decodeVideo]] and [[sampleVideoFrames]] share
    * one strict parse without re-walking the payload. */
  private[graft] case class Y4mStream(width: Int, height: Int,
                                      fpsNum: Int, fpsDen: Int,
                                      colorspace: String,
                                      frameOffsets: Array[Int]) {
    def frameDataLen: Int = Y4m.frameDataLen(width, height, colorspace)
  }

  /** From-scratch YUV4MPEG2 parser — the container mjpegtools/ffmpeg
    * publish: an ASCII stream header `YUV4MPEG2 W<w> H<h> F<num>:<den>
    * [I?] [A?] [C<cs>]\n`, then per frame an ASCII `FRAME[ params]\n`
    * marker followed by one raw planar picture (Y then Cb then Cr; plane
    * sizes fixed by the colorspace tag). Strict: any malformed header,
    * unknown colorspace, bad marker, or truncated frame fails the WHOLE
    * payload (None) — at corpus scale a half-parsed video is a quarantine
    * signal, not a partial result. */
  private[graft] object Y4m {
    private val Magic = "YUV4MPEG2"

    /** Bytes of one frame's planar data, or -1 for an unsupported tag.
      * 4:2:0 variants quarter the chroma planes (odd dims round up, the
      * lenient reading — real 4:2:0 requires even dims anyway); 422
      * halves horizontally; 444 and mono are full/absent chroma. */
    def frameDataLen(w: Int, h: Int, cs: String): Int = {
      val y = w * h
      cs match {
        case "C420" | "C420jpeg" | "C420paldv" | "C420mpeg2" =>
          y + 2 * (((w + 1) / 2) * ((h + 1) / 2))
        case "C422" => y + 2 * (((w + 1) / 2) * h)
        case "C444" => y + 2 * y
        case "Cmono" => y
        case _ => -1
      }
    }

    def parse(payload: Array[Byte]): Option[Y4mStream] = {
      val nl0 = indexOfNl(payload, 0, 512)
      if (nl0 < 0) return None
      val header = new String(payload, 0, nl0, "ISO-8859-1")
      val toks = header.split(' ')
      if (toks.isEmpty || toks(0) != Magic) return None
      var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "C420jpeg"
      try {
        toks.iterator.drop(1).filter(_.nonEmpty).foreach { t =>
          t.charAt(0) match {
            case 'W' => w = t.substring(1).toInt
            case 'H' => h = t.substring(1).toInt
            case 'F' =>
              val p = t.substring(1).split(':')
              if (p.length != 2) return None
              fn = p(0).toInt; fd = p(1).toInt
            case 'C' => cs = t
            case _ => () // I (interlace), A (aspect), X (comment): not needed
          }
        }
      } catch { case _: NumberFormatException => return None }
      if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
      val flen = frameDataLen(w, h, cs)
      if (flen < 0) return None
      val offs = Array.newBuilder[Int]
      var pos = nl0 + 1
      while (pos < payload.length) {
        // FRAME marker, optional parameters up to the newline
        if (pos + 5 > payload.length ||
            payload(pos) != 'F' || payload(pos + 1) != 'R' ||
            payload(pos + 2) != 'A' || payload(pos + 3) != 'M' ||
            payload(pos + 4) != 'E') return None
        val nl = indexOfNl(payload, pos + 5, 512)
        if (nl < 0 || (nl > pos + 5 && payload(pos + 5) != ' ')) return None
        if (nl + 1 + flen > payload.length) return None // truncated frame
        offs += (nl + 1)
        pos = nl + 1 + flen
      }
      Some(Y4mStream(w, h, fn, fd, cs, offs.result()))
    }

    private def indexOfNl(a: Array[Byte], from: Int, maxScan: Int): Int = {
      var i = from
      val end = math.min(a.length, from + maxScan)
      while (i < end) { if (a(i) == '\n') return i; i += 1 }
      -1
    }
  }

  /** Features from a REAL video demux; `decoded=false` quarantines corrupt
    * payloads exactly like images/audio. `y_sum` is the exact integer sum
    * of every Y-plane byte over all frames — unlike a float mean it is
    * oracle-replayable bit-for-bit, which is how the x96 gate checks the
    * demuxer actually reads frame bytes, not just counts markers. */
  case class VideoFeatures(doc_id: Long, payload_bytes: Long,
                           width: Option[Int], height: Option[Int],
                           fps_num: Option[Int], fps_den: Option[Int],
                           colorspace: Option[String], n_frames: Option[Long],
                           duration_ms: Option[Long], y_sum: Option[Long],
                           mean_luma: Option[Double],
                           payload_sha256: String, decoded: Boolean)

  /** REAL video feature extraction — the [[Y4m]] demuxer on the same
    * batched per-partition iterator as [[decodeImages]]/[[decodeAudio]]:
    * header facts (dimensions, frame rate, colorspace), strict frame
    * segmentation, duration, and a one-pass Y-plane luma statistic
    * (integer sum + normalized mean). Spec-gated on constructed Y4M
    * payloads; oracle-gated by x96 over deterministically synthesized
    * videos, where frame count and `y_sum` replay as pure byte
    * arithmetic in SQL. */
  def decodeVideo(spark: SparkSession, media: DataFrame): Dataset[VideoFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { blob =>
        val sha = md.digest(blob.payload).map("%02x".format(_)).mkString
        Y4m.parse(blob.payload) match {
          case Some(st) =>
            val yLen = st.width * st.height
            var ySum = 0L
            st.frameOffsets.foreach { off =>
              var i = off
              val end = off + yLen
              while (i < end) { ySum += (blob.payload(i) & 0xff); i += 1 }
            }
            val n = st.frameOffsets.length.toLong
            VideoFeatures(blob.doc_id, blob.payload.length.toLong,
              Some(st.width), Some(st.height), Some(st.fpsNum), Some(st.fpsDen),
              Some(st.colorspace), Some(n),
              Some(n * 1000L * st.fpsDen / st.fpsNum), Some(ySum),
              if (n > 0) Some(ySum.toDouble / (n * yLen * 255.0)) else None,
              sha, decoded = true)
          case None =>
            VideoFeatures(blob.doc_id, blob.payload.length.toLong,
              None, None, None, None, None, None, None, None, None,
              sha, decoded = false)
        }
      }
    }
  }

  /** One sampled REAL video frame: the Y (luma) plane re-encoded as a
    * gray PNG — a decodable image payload, so the video tier chains into
    * [[decodeImages]]/[[resizeImages]] downstream (demux → per-frame
    * image ops, the training-data video shape). */
  case class VideoFrame(doc_id: Long, frame_index: Long, width: Int,
                        height: Int, mean_luma: Double, png: Array[Byte])

  /** REAL frame sampling: every `stride`-th frame of each Y4M payload,
    * streamed (iterator-to-iterator flatMap, one row in → N frame rows
    * out, no per-partition buffering beyond one frame's pixels).
    * Undecodable payloads are DROPPED — the quarantine split belongs to
    * [[decodeVideo]]'s `decoded` flag upstream, the [[resizeImages]]
    * precedent. */
  def sampleVideoFrames(spark: SparkSession, media: DataFrame,
                        stride: Int): Dataset[VideoFrame] = {
    import spark.implicits._
    require(stride > 0, s"invalid stride $stride")
    media.as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { blob =>
        Y4m.parse(blob.payload).iterator.flatMap { st =>
          val yLen = st.width * st.height
          st.frameOffsets.iterator.zipWithIndex
            .collect { case (off, i) if i % stride == 0 =>
              val img = new java.awt.image.BufferedImage(
                st.width, st.height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val raster = img.getRaster
              var ySum = 0L
              var p = 0
              while (p < yLen) {
                val v = blob.payload(off + p) & 0xff
                ySum += v
                raster.setSample(p % st.width, p / st.width, 0, v)
                p += 1
              }
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", out)
              VideoFrame(blob.doc_id, i.toLong, st.width, st.height,
                ySum.toDouble / (yLen * 255.0), out.toByteArray)
            }
        }
      }
    }
  }

  /** Wrap a text table as synthetic Y4M videos for the x96 gate: each
    * document becomes a `width`×`height` C420 stream whose frames are
    * consecutive slices of the utf-8 text bytes — up to `maxFrames`
    * complete frames (`frameDataLen` bytes each; shorter docs get fewer,
    * possibly zero — a header-only stream is valid Y4M). Deterministic by
    * construction, so the REAL demuxer's output replays in SQL as byte
    * arithmetic over `encode(text)`. */
  def asVideoTable(spark: SparkSession, documents: DataFrame,
                   width: Int, height: Int, maxFrames: Int): DataFrame = {
    import spark.implicits._
    require(width > 0 && height > 0 && maxFrames >= 0)
    val flen = Y4m.frameDataLen(width, height, "C420")
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420\n"
      .getBytes("ISO-8859-1")
    val marker = "FRAME\n".getBytes("ISO-8859-1")
    documents.select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang) =>
          val bytes = text.getBytes("UTF-8")
          val k = math.min(maxFrames.toLong, bytes.length.toLong / flen).toInt
          val out = new java.io.ByteArrayOutputStream(
            header.length + k * (marker.length + flen))
          out.write(header)
          var i = 0
          while (i < k) {
            out.write(marker)
            out.write(bytes, i * flen, flen)
            i += 1
          }
          MediaBlob(id, out.toByteArray, "video/x-yuv4mpeg", lang)
        }
      }.toDF()
  }

  // ------------------------------------------------------------------- avi

  /** A parsed RIFF/AVI file: header facts plus (offset, length) of each
    * movi frame chunk's payload — the MJPEG interchange container
    * (Microsoft RIFF/AVI, a published pure-container format: fourcc-tagged
    * little-endian chunks, so a full demuxer needs no codec). */
  private[graft] case class AviFile(width: Int, height: Int,
                                    usecPerFrame: Int, totalFramesHdr: Int,
                                    frames: Array[(Int, Int)])

  /** From-scratch RIFF/AVI muxer + demuxer. STRICT parse like [[Y4m]]:
    * bad magic, a chunk running past its parent, or a missing avih
    * header quarantines the whole payload — at corpus scale a half-read
    * video is a data-quality signal, not a partial result. Covers the
    * MJPEG shape (one 'vids' stream, frame payloads in '##dc'/'##db'
    * movi chunks, word-aligned); the muxer exists so specs can build
    * REAL MJPEG files (ImageIO JPEG frames) and the x123 gate can build
    * deterministic synthetic ones from text bytes. */
  private[graft] object Avi {
    private def u16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
    }
    private def u32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff)
      b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
    }
    private def fcc(b: java.io.ByteArrayOutputStream, s: String): Unit = {
      require(s.length == 4); s.foreach(c => b.write(c.toInt & 0xff))
    }

    /** Build a minimal standards-shaped MJPEG AVI: RIFF(AVI ) →
      * LIST(hdrl){avih, LIST(strl){strh('vids'/'MJPG'), strf(BMIH)}} →
      * LIST(movi){00dc…} — every chunk word-aligned per the RIFF rule. */
    def mux(frames: Seq[Array[Byte]], width: Int, height: Int,
            usecPerFrame: Int): Array[Byte] = {
      val maxF = if (frames.isEmpty) 0 else frames.map(_.length).max
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream(8 + body.length + 1)
        fcc(b, id); u32(b, body.length); b.write(body)
        if ((body.length & 1) == 1) b.write(0) // word alignment pad
        b.toByteArray
      }
      def list(typ: String, body: Array[Byte]): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream(12 + body.length)
        fcc(b, "LIST"); u32(b, 4 + body.length); fcc(b, typ); b.write(body)
        b.toByteArray
      }
      val avih = {
        val b = new java.io.ByteArrayOutputStream(56)
        u32(b, usecPerFrame); u32(b, 0); u32(b, 0); u32(b, 0)
        u32(b, frames.length); u32(b, 0); u32(b, 1); u32(b, maxF)
        u32(b, width); u32(b, height)
        (0 until 4).foreach(_ => u32(b, 0))
        b.toByteArray
      }
      val strh = {
        val b = new java.io.ByteArrayOutputStream(56)
        fcc(b, "vids"); fcc(b, "MJPG"); u32(b, 0); u16(b, 0); u16(b, 0)
        u32(b, 0); u32(b, usecPerFrame); u32(b, 1000000); u32(b, 0)
        u32(b, frames.length); u32(b, maxF); u32(b, 0); u32(b, 0)
        u16(b, 0); u16(b, 0); u16(b, width); u16(b, height)
        b.toByteArray
      }
      val strf = {
        val b = new java.io.ByteArrayOutputStream(40)
        u32(b, 40); u32(b, width); u32(b, height); u16(b, 1); u16(b, 24)
        fcc(b, "MJPG"); u32(b, width * height * 3)
        u32(b, 0); u32(b, 0); u32(b, 0); u32(b, 0)
        b.toByteArray
      }
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++
          chunk("strf", strf)))
      val movi = list("movi", {
        // linear assembly — an array foldLeft recopies the accumulated
        // body once per frame (quadratic in file size for long videos)
        val b = new java.io.ByteArrayOutputStream()
        frames.foreach(f => b.write(chunk("00dc", f)))
        b.toByteArray
      })
      val body = hdrl ++ movi
      val out = new java.io.ByteArrayOutputStream(12 + body.length)
      fcc(out, "RIFF"); u32(out, 4 + body.length); fcc(out, "AVI ")
      out.write(body)
      out.toByteArray
    }

    private def ru32(a: Array[Byte], off: Int): Long =
      ((a(off) & 0xffL)) | ((a(off + 1) & 0xffL) << 8) |
        ((a(off + 2) & 0xffL) << 16) | ((a(off + 3) & 0xffL) << 24)
    private def rfcc(a: Array[Byte], off: Int): String =
      new String(a, off, 4, "ISO-8859-1")

    /** Frame-payload chunk ids: '<2-digit stream>dc' (compressed) or
      * 'db' (uncompressed) per the published movi naming. */
    private def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        ((id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')))

    def parse(payload: Array[Byte]): Option[AviFile] = {
      if (payload.length < 12 || rfcc(payload, 0) != "RIFF" ||
          rfcc(payload, 8) != "AVI ") return None
      val riffEnd = 8L + ru32(payload, 4)
      if (riffEnd > payload.length) return None
      var width = -1; var height = -1
      var usec = -1; var totalHdr = -1
      val frames = Array.newBuilder[(Int, Int)]
      // one recursive strict walk; LIST children are scanned for the two
      // list types that matter, unknown chunks are skipped by size
      def walk(from: Long, to: Long, inMovi: Boolean): Boolean = {
        var pos = from
        while (pos < to) {
          if (pos + 8 > to) return false
          val id = rfcc(payload, pos.toInt)
          val size = ru32(payload, pos.toInt + 4)
          val dataStart = pos + 8
          if (dataStart + size > to) return false // chunk past its parent
          if (id == "LIST") {
            if (size < 4) return false
            val typ = rfcc(payload, dataStart.toInt)
            val ok = walk(dataStart + 4, dataStart + size,
              inMovi || typ == "movi")
            if (!ok) return false
          } else if (id == "avih") {
            if (size < 40) return false
            val d = dataStart.toInt
            usec = ru32(payload, d).toInt
            totalHdr = ru32(payload, d + 16).toInt
            width = ru32(payload, d + 32).toInt
            height = ru32(payload, d + 36).toInt
          } else if (inMovi && isFrameChunk(id)) {
            frames += ((dataStart.toInt, size.toInt))
          }
          pos = dataStart + size + (size & 1) // word alignment
        }
        true
      }
      if (!walk(12L, riffEnd, inMovi = false)) return None
      if (width <= 0 || height <= 0 || usec <= 0) return None
      Some(AviFile(width, height, usec, totalHdr, frames.result()))
    }
  }

  /** Features from a REAL AVI demux; `byte_sum` is the exact integer sum
    * of every frame-payload byte — the x96 discipline: it proves the
    * walker reads the actual chunk bytes, not just counts fourcc tags. */
  case class AviFeatures(doc_id: Long, payload_bytes: Long,
                         width: Option[Int], height: Option[Int],
                         n_frames: Option[Long], duration_ms: Option[Long],
                         byte_sum: Option[Long],
                         payload_sha256: String, decoded: Boolean)

  /** REAL AVI feature extraction — the [[Avi]] demuxer on the shared
    * batched per-partition iterator: header facts, strict chunk walk,
    * duration from the avih frame interval, and the exact frame-byte
    * sum. Oracle-gated by x123 over deterministically synthesized AVIs;
    * spec-gated on real MJPEG files whose frames chain into
    * [[decodeImages]]. */
  def demuxAvi(spark: SparkSession, media: DataFrame): Dataset[AviFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { blob =>
        val sha = md.digest(blob.payload).map("%02x".format(_)).mkString
        Avi.parse(blob.payload) match {
          case Some(f) =>
            var s = 0L
            f.frames.foreach { case (off, len) =>
              var i = off
              val end = off + len
              while (i < end) { s += (blob.payload(i) & 0xff); i += 1 }
            }
            val n = f.frames.length.toLong
            AviFeatures(blob.doc_id, blob.payload.length.toLong,
              Some(f.width), Some(f.height), Some(n),
              Some(n * f.usecPerFrame / 1000L), Some(s), sha, decoded = true)
          case None =>
            AviFeatures(blob.doc_id, blob.payload.length.toLong,
              None, None, None, None, None, sha, decoded = false)
        }
      }
    }
  }

  /** REAL AVI frame sampling: every `stride`-th movi frame payload,
    * streamed — for MJPEG files each row is a standalone JPEG, so this
    * chains directly into [[decodeImages]]/[[resizeImages]]: container
    * demux → codec decode, the compressed-media column path end to end
    * (spec-proven with ImageIO-encoded JPEG frames). */
  def sampleAviFrames(spark: SparkSession, media: DataFrame,
                      stride: Int): Dataset[Frame] = {
    import spark.implicits._
    require(stride > 0, s"invalid stride $stride")
    media.as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { blob =>
        Avi.parse(blob.payload).iterator.flatMap { f =>
          f.frames.iterator.zipWithIndex
            .collect { case ((off, len), i) if i % stride == 0 =>
              Frame(blob.doc_id, i.toLong,
                java.util.Arrays.copyOfRange(blob.payload, off, off + len))
            }
        }
      }
    }
  }

  /** Wrap a text table as synthetic MJPEG-shaped AVIs for the x123 gate:
    * each document becomes a real RIFF/AVI container whose frame chunks
    * are consecutive `frameLen`-byte slices of the utf-8 text (up to
    * `maxFrames`) — deterministic by construction, so the REAL demuxer's
    * output replays in SQL as byte arithmetic over `encode(text)`, the
    * [[asVideoTable]] discipline applied to the chunked container. */
  def asAviTable(spark: SparkSession, documents: DataFrame, width: Int,
                 height: Int, frameLen: Int, maxFrames: Int,
                 usecPerFrame: Int): DataFrame = {
    import spark.implicits._
    require(width > 0 && height > 0 && frameLen > 0 && maxFrames >= 0)
    documents.select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang) =>
          val bytes = text.getBytes("UTF-8")
          val k = math.min(maxFrames.toLong, bytes.length.toLong / frameLen).toInt
          val frames = (0 until k).map(i =>
            java.util.Arrays.copyOfRange(bytes, i * frameLen,
              (i + 1) * frameLen))
          MediaBlob(id, Avi.mux(frames, width, height, usecPerFrame),
            "video/x-msvideo", lang)
        }
      }.toDF()
  }

  // ------------------------------------------------------------------ gzip

  /** A decoded gzip MEMBER stream: per-member decompressed sizes plus
    * the decompressed concatenation's digest. Concatenated gzip members
    * are the WARC/CommonCrawl record shape (RFC 1952 §2.2: "a gzip file
    * consists of a series of members"): each crawl record is its own
    * member, so a reader can seek to a record without inflating the
    * whole file — the ingestion container a 100 TB text pipeline reads
    * FIRST, before any of the text tier runs. */
  case class GzipFeatures(doc_id: Long, payload_bytes: Long,
                          n_members: Option[Long], total_bytes: Option[Long],
                          member_bytes: Option[Seq[Long]],
                          content_sha256: Option[String], decoded: Boolean)

  /** From-scratch gzip member walker: per member, parse the RFC 1952
    * header (magic, CM=8, FLG with FEXTRA/FNAME/FCOMMENT handled and
    * FHCRC VERIFIED against the header bytes' CRC32 low half — a
    * corrupted header with FHCRC set must not pass a strict walker),
    * raw-inflate via the JDK `Inflater` (the real DEFLATE
    * codec — zlib, not a stub), then VERIFY the trailer's CRC32 and
    * ISIZE before trusting the bytes; repeat until the payload is
    * exhausted. Strict like [[Y4m]]/[[Avi]]: any bad magic, truncation,
    * CRC or length mismatch quarantines the whole payload —
    * `java.util.zip.GZIPInputStream` would silently STOP at the first
    * garbage byte between members, which at corpus scale converts
    * corruption into silent record loss. */
  private[graft] object GzipMembers {
    def parse(payload: Array[Byte]): Option[(Seq[Long], Array[Byte])] = {
      val out = new java.io.ByteArrayOutputStream()
      val sizes = Seq.newBuilder[Long]
      var pos = 0
      val n = payload.length
      def u32le(p: Int): Long =
        (payload(p) & 0xffL) | ((payload(p + 1) & 0xffL) << 8) |
          ((payload(p + 2) & 0xffL) << 16) | ((payload(p + 3) & 0xffL) << 24)
      while (pos < n) {
        // ---- RFC 1952 member header
        if (pos + 10 > n || (payload(pos) & 0xff) != 0x1f ||
            (payload(pos + 1) & 0xff) != 0x8b || payload(pos + 2) != 8)
          return None
        val flg = payload(pos + 3) & 0xff
        var p = pos + 10
        if ((flg & 4) != 0) { // FEXTRA: u16le length + bytes
          if (p + 2 > n) return None
          p += 2 + ((payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8))
        }
        def skipZeroTerminated(): Boolean = {
          while (p < n && payload(p) != 0) p += 1
          if (p >= n) false else { p += 1; true }
        }
        if ((flg & 8) != 0 && !skipZeroTerminated()) return None  // FNAME
        if ((flg & 16) != 0 && !skipZeroTerminated()) return None // FCOMMENT
        if ((flg & 2) != 0) { // FHCRC: low 16 bits of the header bytes' CRC32
          if (p + 2 > n) return None
          val hcrc = new java.util.zip.CRC32()
          hcrc.update(payload, pos, p - pos)
          val stored = (payload(p) & 0xff) | ((payload(p + 1) & 0xff) << 8)
          if ((hcrc.getValue & 0xffffL).toInt != stored) return None
          p += 2
        }
        if (p > n) return None
        // ---- raw DEFLATE body
        val inf = new java.util.zip.Inflater(true)
        val crc = new java.util.zip.CRC32()
        var memberLen = 0L
        try {
          inf.setInput(payload, p, n - p)
          val buf = new Array[Byte](65536)
          while (!inf.finished()) {
            val k =
              try inf.inflate(buf)
              catch { case _: java.util.zip.DataFormatException => return None }
            if (k == 0 && !inf.finished()) return None // truncated body
            out.write(buf, 0, k)
            crc.update(buf, 0, k)
            memberLen += k
          }
          p = n - inf.getRemaining
        } finally inf.end()
        // ---- trailer: CRC32 + ISIZE (mod 2^32), both VERIFIED
        if (p + 8 > n) return None
        if (u32le(p) != crc.getValue) return None
        if (u32le(p + 4) != (memberLen & 0xffffffffL)) return None
        sizes += memberLen
        pos = p + 8
      }
      Some((sizes.result(), out.toByteArray))
    }

    /** One member per chunk, built with the real JDK gzip WRITER — the
      * mux side of the pair (specs and the x125 table derivation). */
    def gzipMember(chunk: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(chunk); gz.close()
      bos.toByteArray
    }
  }

  /** REAL concatenated-gzip decode on the shared batched per-partition
    * iterator: member walk, inflate, CRC/ISIZE verification, per-member
    * decompressed sizes, and the decompressed content's sha256 — which
    * for the x125 construction is exactly sha256(text), so the oracle
    * replays the whole decode chain without a SQL DEFLATE. */
  def decodeGzipMembers(spark: SparkSession,
                        media: DataFrame): Dataset[GzipFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { blob =>
        GzipMembers.parse(blob.payload) match {
          case Some((sizes, content)) =>
            val sha = md.digest(content).map("%02x".format(_)).mkString
            GzipFeatures(blob.doc_id, blob.payload.length.toLong,
              Some(sizes.length.toLong), Some(sizes.sum),
              Some(sizes), Some(sha), decoded = true)
          case None =>
            GzipFeatures(blob.doc_id, blob.payload.length.toLong,
              None, None, None, None, decoded = false)
        }
      }
    }
  }

  /** A recovered crawl record stream: the decompressed, CRC-verified
    * member concatenation decoded as utf-8 text. */
  case class RecoveredDoc(doc_id: Long, text: String, lang: String)

  /** Inflate WARC-shaped payloads back to text rows — the FIRST stage of
    * a crawl-ingest pipeline (pl17): strict member walk + verify
    * ([[GzipMembers]]), then utf-8 decode; quarantined payloads are
    * DROPPED here (the quarantine accounting belongs to
    * [[decodeGzipMembers]]' `decoded` flag, the resizeImages precedent).
    * Iterator-to-iterator, one row in → at most one row out — at 100 TB
    * the inflate runs inside the scan partition, no extra exchange. */
  def inflateWarcText(spark: SparkSession,
                      media: DataFrame): Dataset[RecoveredDoc] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { blob =>
        GzipMembers.parse(blob.payload).map { case (_, content) =>
          RecoveredDoc(blob.doc_id, new String(content, "UTF-8"), blob.lang)
        }
      }
    }
  }

  /** Wrap a text table as WARC-shaped payloads for the x125 gate: the
    * utf-8 text split into `chunkLen`-byte records, each its own gzip
    * member, members concatenated — so member count and sizes are pure
    * byte arithmetic over `encode(text)` and the decompressed content
    * is the text itself. Empty docs are valid zero-member payloads. */
  def asWarcTable(spark: SparkSession, documents: DataFrame,
                  chunkLen: Int): DataFrame = {
    import spark.implicits._
    require(chunkLen > 0)
    documents.select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang) =>
          val bytes = text.getBytes("UTF-8")
          val out = new java.io.ByteArrayOutputStream()
          var i = 0
          while (i < bytes.length) {
            val end = math.min(i + chunkLen, bytes.length)
            out.write(GzipMembers.gzipMember(
              java.util.Arrays.copyOfRange(bytes, i, end)))
            i = end
          }
          MediaBlob(id, out.toByteArray, "application/gzip", lang)
        }
      }.toDF()
  }

  /** One sampled frame of a media payload. */
  case class Frame(doc_id: Long, frame_index: Long, frame_bytes: Array[Byte])

  /** Frame-sampling plumbing: each payload fans out to every `stride`-th
    * fixed-size chunk — the iterator-to-iterator flatMap shape a real video
    * demuxer needs (one row in, N frame rows out, streamed; no
    * per-partition buffering). The chunking stands in for frame decode. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int, stride: Int): Dataset[Frame] = {
    import spark.implicits._
    require(frameBytes > 0 && stride > 0)
    media.as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { blob =>
        blob.payload.grouped(frameBytes).zipWithIndex
          .collect { case (chunk, i) if i % stride == 0 =>
            Frame(blob.doc_id, i.toLong, chunk)
          }
      }
    }
  }
  // ------------------------------------------------------------------ WARC

  /** One parsed WARC record (ISO 28500 / WARC 1.0). `http_*`/`payload_*`
    * populate only for `application/http` response records; a payload
    * that fails the STRICT parse anywhere (bad version line, missing
    * mandatory header, short block, missing record trailer, bad gzip
    * member) quarantines as a single `warc_type = "quarantined"` row —
    * loud, never silent record loss. */
  case class WarcRecord(doc_id: Long, rec_index: Long, warc_type: String,
                        record_id: String, target_uri: Option[String],
                        content_length: Long, http_status: Option[Int],
                        payload_len: Option[Long],
                        payload_sha256: Option[String], lang: String)

  /** WARC 1.0 record framing — mux + strict parse, from scratch (spec:
    * ISO 28500; the CommonCrawl container). A record is
    * `WARC/1.0\r\n` + named headers + `\r\n\r\n` + exactly
    * `Content-Length` block bytes + `\r\n\r\n`; response records carry
    * an HTTP envelope (status line + headers + `\r\n\r\n` + body) as
    * their block. One gzip member per record — the standard `.warc.gz`
    * convention [[GzipMembers]] walks, so readers can seek to a record
    * without inflating the file. */
  private[graft] object Warc {
    val Version = "WARC/1.0"
    /** Fixed, deterministic date: gates replay byte-for-byte. */
    val Date = "2024-01-01T00:00:00Z"
    val InfoBlock: Array[Byte] = "software: graft\r\n".getBytes("US-ASCII")
    def targetUri(id: Long, i: Long): String =
      s"https://example.org/doc/$id/$i"

    private val Crlf2 = "\r\n\r\n".getBytes("US-ASCII")

    def httpEnvelope(payload: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
        payload

    def record(headers: Seq[(String, String)],
               block: Array[Byte]): Array[Byte] = {
      val head = (Version +: headers.map { case (k, v) => s"$k: $v" })
        .mkString("", "\r\n", "\r\n\r\n").getBytes("US-ASCII")
      head ++ block ++ Crlf2
    }

    private def indexOf(hay: Array[Byte], needle: Array[Byte],
                        from: Int): Int = {
      var i = from
      val n = hay.length - needle.length
      while (i <= n) {
        var j = 0
        while (j < needle.length && hay(i + j) == needle(j)) j += 1
        if (j == needle.length) return i
        i += 1
      }
      -1
    }

    case class Parsed(warcType: String, recordId: String,
                      targetUri: Option[String], contentLength: Long,
                      httpStatus: Option[Int], payload: Option[Array[Byte]])

    /** STRICT parse of one record's bytes (one gzip member = one
      * record): version line pinned, mandatory headers required, block
      * length exact, record trailer required, nothing after it. Any
      * violation → None (the caller quarantines the payload). */
    def parseRecord(bytes: Array[Byte]): Option[Parsed] = {
      val split = indexOf(bytes, Crlf2, 0)
      if (split < 0) return None
      val head = new String(bytes, 0, split, "US-ASCII")
      val lines = head.split("\r\n", -1)
      if (lines.isEmpty || lines(0) != Version) return None
      val hdrs = lines.drop(1).map { l =>
        val c = l.indexOf(':')
        if (c < 0) return None
        l.substring(0, c).trim -> l.substring(c + 1).trim
      }.toMap
      val warcType = hdrs.getOrElse("WARC-Type", return None)
      val recordId = hdrs.getOrElse("WARC-Record-ID", return None)
      val len =
        try hdrs.getOrElse("Content-Length", return None).toLong
        catch { case _: NumberFormatException => return None }
      val blockStart = split + 4
      if (blockStart + len + 4 != bytes.length.toLong) return None
      val trailerAt = blockStart + len.toInt
      if (indexOf(bytes, Crlf2, trailerAt) != trailerAt) return None
      val isHttp = hdrs.get("Content-Type")
        .exists(_.startsWith("application/http"))
      val (status, payload) =
        if (!isHttp) {
          // a `resource` record's block IS the captured payload (ISO
          // 28500 §6.4 — the non-HTTP capture shape, e.g. binary media);
          // warcinfo/metadata blocks stay opaque
          if (warcType == "resource")
            (None, Some(java.util.Arrays.copyOfRange(bytes, blockStart,
              trailerAt)))
          else (None, None)
        }
        else {
          val block = java.util.Arrays.copyOfRange(bytes, blockStart,
            trailerAt)
          val hs = indexOf(block, Crlf2, 0)
          if (hs < 0) return None
          val statusLine = new String(block, 0, block.indexOf('\r'.toByte)
            match { case -1 => return None; case k => k }, "US-ASCII")
          val parts = statusLine.split(" ")
          if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
          val code =
            try parts(1).toInt
            catch { case _: NumberFormatException => return None }
          (Some(code),
            Some(java.util.Arrays.copyOfRange(block, hs + 4, block.length)))
        }
      Some(Parsed(warcType, recordId, hdrs.get("WARC-Target-URI"), len,
        status, payload))
    }
  }

  /** Wrap a text table as REAL `.warc.gz` bytes: per document one
    * `warcinfo` record, then one `response` record per `chunkChars`
    * CODE-POINT slice of the text (code points, not bytes — SQL
    * `substring`/`length` count code points, so the oracle's slice
    * arithmetic holds for any content, not just ASCII; the record's
    * Content-Length is still the slice's utf-8 BYTE count, as WARC
    * requires), each response's block a full HTTP envelope, EVERY
    * record its own gzip member. Deterministic by construction (fixed
    * date, arithmetic record ids/URIs), so the x127 gate replays header
    * facts and payload digests as string arithmetic over `documents`. */
  def asWarcRecordsTable(spark: SparkSession, documents: DataFrame,
                         chunkChars: Int): DataFrame = {
    import spark.implicits._
    require(chunkChars > 0)
    documents.select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang) =>
          val cps = text.codePoints().toArray
          val out = new java.io.ByteArrayOutputStream()
          out.write(GzipMembers.gzipMember(Warc.record(Seq(
            "WARC-Type" -> "warcinfo",
            "WARC-Record-ID" -> s"<urn:graft:$id:info>",
            "WARC-Date" -> Warc.Date,
            "Content-Type" -> "application/warc-fields",
            "Content-Length" -> Warc.InfoBlock.length.toString),
            Warc.InfoBlock)))
          var i = 0; var rec = 0L
          while (i < cps.length) {
            val end = math.min(i + chunkChars, cps.length)
            val envelope = Warc.httpEnvelope(
              new String(cps, i, end - i).getBytes("UTF-8"))
            out.write(GzipMembers.gzipMember(Warc.record(Seq(
              "WARC-Type" -> "response",
              "WARC-Record-ID" -> s"<urn:graft:$id:$rec>",
              "WARC-Date" -> Warc.Date,
              "WARC-Target-URI" -> Warc.targetUri(id, rec),
              "Content-Type" -> "application/http; msgtype=response",
              "Content-Length" -> envelope.length.toString),
              envelope)))
            i = end; rec += 1
          }
          MediaBlob(id, out.toByteArray, "application/warc", lang)
        }
      }.toDF()
  }

  /** Parse `.warc.gz` payloads to record rows: strict gzip member walk
    * ([[GzipMembers]] — CRC32/ISIZE verified), one record per member,
    * strict WARC framing per record ([[Warc.parseRecord]]). A payload
    * failing ANYWHERE emits one quarantine row. Iterator-to-iterator —
    * the demux runs inside the scan partition, no exchange added. */
  def parseWarcRecords(spark: SparkSession,
                       media: DataFrame): Dataset[WarcRecord] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      rows.flatMap { blob =>
        parseAll(blob) match {
          case Some(recs) =>
            recs.zipWithIndex.map { case (r, i) =>
              WarcRecord(blob.doc_id, i.toLong, r.warcType, r.recordId,
                r.targetUri, r.contentLength, r.httpStatus,
                r.payload.map(_.length.toLong),
                r.payload.map(p =>
                  md.digest(p).map("%02x".format(_)).mkString),
                blob.lang)
            }
          case None =>
            Seq(WarcRecord(blob.doc_id, -1L, "quarantined", "", None, -1L,
              None, None, None, blob.lang))
        }
      }
    }
  }

  /** All records of one payload, or None on any malformation. */
  private def parseAll(blob: MediaBlob): Option[Seq[Warc.Parsed]] =
    GzipMembers.parse(blob.payload).flatMap { case (sizes, content) =>
      var off = 0L
      val recs = Seq.newBuilder[Warc.Parsed]
      for (sz <- sizes) {
        val bytes = java.util.Arrays.copyOfRange(content, off.toInt,
          (off + sz).toInt)
        Warc.parseRecord(bytes) match {
          case Some(r) => recs += r
          case None => return None
        }
        off += sz
      }
      Some(recs.result())
    }

  /** Write the payloads as `.warc.gz` FILES, ONE PER PARTITION — the
    * real crawl-archive layout (a CommonCrawl file is ~1 GB of MANY
    * documents' records; per-document files drown in create/close
    * overhead — measured 46s for 5k docs at sf0.1, 4.6× at 10×, versus
    * per-partition files amortizing to the partition count). Gzip
    * members concatenate trivially, so a partition's payloads append
    * into one strict `.warc.gz`; document identity travels IN the
    * records (WARC-Record-ID), never in file names. Distributed — each
    * partition writes its own file through the Hadoop FS API (local FS
    * here; HDFS/S3 in production), nothing through the driver. */
  def writeWarcFiles(media: DataFrame, dir: String,
                     prefix: String = "part"): Unit =
    media.select(col("payload")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val conf = new org.apache.hadoop.conf.Configuration()
          val p = new org.apache.hadoop.fs.Path(
            f"$dir/$prefix-$pid%05d.warc.gz")
          val fs = p.getFileSystem(conf)
          val out = fs.create(p, true)
          try it.foreach(r => out.write(r.getAs[Array[Byte]](0)))
          finally out.close()
        }
    }

  /** Scan a directory of `.warc.gz` FILES back to the media-blob shape —
    * the CommonCrawl ingestion source: Spark's `binaryFile` reader
    * (whole-file rows, glob-filtered, driver never touches payload
    * bytes). A file is an opaque multi-document container; per-record
    * identity comes from the parsed WARC-Record-IDs downstream
    * (`doc_id` here is the file ordinal, a debugging handle only). With
    * one gzip member per record ([[asWarcRecordsTable]]'s layout), a
    * production reader can also range-request individual records; here
    * the demuxers consume whole payloads. */
  def readWarcFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(dir)
      .select(
        regexp_extract(col("path"), "-([0-9]+)\\.warc\\.gz$", 1)
          .cast("long").as("doc_id"),
        col("content").as("payload"),
        lit("application/warc").as("media_type"),
        lit("").as("lang"))

  /** Per-DOCUMENT text recovery from MULTI-document `.warc.gz` payloads
    * ([[writeWarcFiles]]' layout — pl19's first stage): records parse
    * strictly, and each response's body appends to its OWN document —
    * identity is the record id's urn doc component and order its record
    * ordinal, never file position — so recovery is exact under any
    * record interleaving a writer produced. Records under a foreign id
    * scheme are skipped (this recoverer is the mux's inverse);
    * quarantined payloads drop whole (the accounting lives in
    * [[parseWarcRecords]]' quarantine rows). Per-partition memory is
    * bounded by the partition's own text bytes — the same rows a plain
    * scan holds. */
  def recoverWarcDocs(spark: SparkSession,
                      media: DataFrame): Dataset[RecoveredDoc] = {
    import spark.implicits._
    val RecId = """<urn:graft:(\d+):(\d+)>""".r
    val InfoId = """<urn:graft:(\d+):info>""".r
    media.as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { blob =>
        parseAll(blob) match {
          case None => Iterator.empty
          case Some(recs) =>
            val byDoc = new java.util.LinkedHashMap[
              Long, scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]]()
            def bucket(id: Long) = {
              if (!byDoc.containsKey(id))
                byDoc.put(id,
                  scala.collection.mutable.ArrayBuffer
                    .empty[(Long, Array[Byte])]): Unit
              byDoc.get(id)
            }
            recs.foreach { r =>
              r.recordId match {
                case InfoId(id) => bucket(id.toLong): Unit
                case RecId(id, ord) =>
                  r.payload.foreach(p => bucket(id.toLong) += ((ord.toLong, p)))
                case _ => // foreign record-id scheme: not ours to rebuild
              }
            }
            import scala.jdk.CollectionConverters._
            byDoc.entrySet().iterator().asScala.map { e =>
              val out = new java.io.ByteArrayOutputStream()
              e.getValue.sortBy(_._1).foreach(p => out.write(p._2))
              RecoveredDoc(e.getKey, new String(out.toByteArray, "UTF-8"), "")
            }
        }
      }
    }
  }

  /** The crawl-ingest text recovery THROUGH the record framing (pl17's
    * first stage since round 18): parse records, keep the `response`
    * records' HTTP payload bodies in record order, concatenate back to
    * the document text. Quarantined payloads drop here (the accounting
    * lives in [[parseWarcRecords]]' quarantine rows). */
  def recoverWarcResponseText(spark: SparkSession,
                              media: DataFrame): Dataset[RecoveredDoc] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { blob =>
        parseAll(blob).map { recs =>
          val out = new java.io.ByteArrayOutputStream()
          recs.foreach { r =>
            if (r.warcType == "response") r.payload.foreach(out.write)
          }
          RecoveredDoc(blob.doc_id, new String(out.toByteArray, "UTF-8"),
            blob.lang)
        }
      }
    }
  }

  // ------------------------------------------------------------------ flac

  /** Features from a REAL FLAC decode ([[Flac]], the from-scratch RFC 9639
    * codec): header facts plus the exact integer sum over every decoded
    * sample — lossless, so unlike the PCM-container RMS the statistic is
    * oracle-EXACT. `decoded=false` quarantines malformed payloads (bad
    * sync, CRC-8/CRC-16, MD5, framing). */
  case class FlacFeatures(doc_id: Long, payload_bytes: Long,
                          sample_rate: Option[Int], channels: Option[Int],
                          bits_per_sample: Option[Int], n_frames: Option[Long],
                          n_samples: Option[Long], sample_sum: Option[Long],
                          decoded: Boolean)

  /** REAL compressed-audio decode on the shared batched per-partition
    * iterator: the [[Flac]] decoder (rice residuals, fixed + LPC
    * predictors, CRC/MD5 verification) over opaque payloads. The decode
    * runs inside the scan partition — no exchange on the 100 TB read
    * path; a corrupt column value quarantines its row, never the task. */
  def decodeFlac(spark: SparkSession, media: DataFrame): Dataset[FlacFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      rows.map { blob =>
        Flac.decode(blob.payload) match {
          case Some(st) =>
            var sum = 0L
            st.samples.foreach { ch => var i = 0; while (i < ch.length) { sum += ch(i); i += 1 } }
            val n = if (st.samples.isEmpty) 0L else st.samples(0).length.toLong
            FlacFeatures(blob.doc_id, blob.payload.length.toLong,
              Some(st.sampleRate), Some(st.channels), Some(st.bps),
              Some(st.nFrames.toLong), Some(n), Some(sum), decoded = true)
          case None =>
            FlacFeatures(blob.doc_id, blob.payload.length.toLong,
              None, None, None, None, None, None, decoded = false)
        }
      }
    }
  }

  /** Wrap a text table as real FLAC streams for the x134 gate: each
    * document's utf-8 bytes become a deterministic 16-bit mono waveform
    * (sample i = (byte_i − 80) · 129 — negatives exercise the zigzag
    * path, the ·129 varies rice remainder bits, and text's small
    * byte-to-byte deltas make the fixed predictors genuinely compress),
    * capped at `maxSamples` and encoded at `blockSize` samples per frame
    * — so the cap NOT dividing the block size pins the short-last-frame
    * path. The REAL decoder's sample sum then replays in SQL as byte
    * arithmetic over `encode(text)`, the [[asVideoTable]] discipline
    * applied through a compression layer. */
  def asFlacTable(spark: SparkSession, documents: DataFrame, blockSize: Int,
                  maxSamples: Int, sampleRate: Int): DataFrame = {
    import spark.implicits._
    require(blockSize >= 16 && maxSamples >= 0)
    documents.select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang) =>
          val bytes = text.getBytes("UTF-8")
          val n = math.min(maxSamples, bytes.length)
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) { samples(i) = ((bytes(i) & 0xff) - 80) * 129; i += 1 }
          MediaBlob(id, Flac.encode(Array(samples), sampleRate, 16, blockSize),
            "audio/flac", lang)
        }
      }.toDF()
  }

  /** Wrap a text table as STEREO mid/side FLAC streams for the x137 gate:
    * left channel from even text bytes, right from odd (the channels are
    * correlated the way real stereo is — mostly-similar text bytes — so
    * mid/side decorrelation genuinely engages), encoded with
    * `midSide = true`. The decoder's sample sum over BOTH channels is the
    * transform summed over the first 2·n text bytes, so the oracle pins
    * the mid/side reconstruction and the side channel's bps+1 coding
    * wire-exactly. */
  def asFlacStereoTable(spark: SparkSession, documents: DataFrame,
                        blockSize: Int, maxSamplesPerCh: Int,
                        sampleRate: Int): DataFrame = {
    import spark.implicits._
    require(blockSize >= 16 && maxSamplesPerCh >= 0)
    documents.select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang) =>
          val bytes = text.getBytes("UTF-8")
          val n = math.min(maxSamplesPerCh, bytes.length / 2)
          val l = new Array[Int](n); val r = new Array[Int](n)
          var i = 0
          while (i < n) {
            l(i) = ((bytes(2 * i) & 0xff) - 80) * 129
            r(i) = ((bytes(2 * i + 1) & 0xff) - 80) * 129
            i += 1
          }
          MediaBlob(id,
            Flac.encode(Array(l, r), sampleRate, 16, blockSize, midSide = true),
            "audio/flac", lang)
        }
      }.toDF()
  }

  // ------------------------------------------------------------------- mp3

  /** A parsed MP3 elementary stream: header facts plus (offset, length)
    * of each frame's content region (the bytes after the 4-byte header
    * and, when protected, the CRC-16). */
  case class Mp3File(version: Int, layer: Int, bitrateKbps: Int,
                     sampleRate: Int, channels: Int,
                     frames: Seq[(Long, Int)])

  /** From-scratch MPEG audio FRAME walker (ISO/IEC 11172-3 §2.4 framing;
    * the layer a crawl pipeline runs to triage audio columns — codec
    * facts, duration, tag skipping — without a synthesis filterbank,
    * which stays a declared stub). STRICT like [[GzipMembers]]:
    * 11-bit sync + no reserved version/layer/bitrate/samplerate/emphasis
    * values, the exact slot-arithmetic frame length per layer, EVERY
    * frame's sync re-verified at its computed offset, protected frames'
    * CRC-16 (poly 0x8005, init 0xFFFF, over the header's last two bytes
    * + the side-info region per the spec) actually VERIFIED, ID3v2
    * (syncsafe length) and ID3v1 tags skipped, and truncation anywhere →
    * quarantine. Constant-rate streams only (the mux's shape): bitrate /
    * samplerate pinned by the first frame; a mid-stream change
    * quarantines rather than mis-times. */
  private[graft] object Mp3 {
    // MPEG1 bitrate tables (kbps) per layer, index 1..14; 0=free, 15=bad
    private val brL1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
    private val brL2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
    private val brL3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    // MPEG2/2.5 Layer III
    private val brL3v2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    private val ratesV1 = Array(44100, 48000, 32000)

    private def crc16(a: Array[Byte], from: Int, until: Int, init: Int): Int = {
      var c = init; var i = from
      while (i < until) {
        var r = c ^ ((a(i) & 0xff) << 8)
        var b = 0
        while (b < 8) { r = if ((r & 0x8000) != 0) ((r << 1) ^ 0x8005) & 0xffff else (r << 1) & 0xffff; b += 1 }
        c = r; i += 1
      }
      c & 0xffff
    }

    /** Side-info bytes of a Layer III frame (ISO 11172-3 §2.4.1.7 /
      * 13818-3): MPEG1 mono 17 / stereo 32; MPEG2 mono 9 / stereo 17. */
    def sideInfoLen(version: Int, mono: Boolean): Int =
      if (version == 1) { if (mono) 17 else 32 } else { if (mono) 9 else 17 }

    /** Frame length in bytes from the header fields (slot arithmetic):
      * Layer I: (12·br/rate + pad)·4; Layers II/III: 144·br/rate + pad
      * (72 for MPEG2 Layer III — half the samples per frame). */
    def frameLen(version: Int, layer: Int, brBps: Int, rate: Int, pad: Int): Int =
      layer match {
        case 1 => (12 * brBps / rate + pad) * 4
        case _ =>
          val factor = if (layer == 3 && version != 1) 72 else 144
          factor * brBps / rate + pad
      }

    /** Samples per frame (duration arithmetic). */
    def samplesPerFrame(version: Int, layer: Int): Int = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (version == 1) 1152 else 576
    }

    /** Build a PROTECTED (CRC-carrying) constant-rate MPEG1 Layer III
      * mono stream: ID3v2 tag (body `id3v2Body` bytes of zeros) + one
      * frame per content chunk (side info + main data both from the
      * chunk — the walker's facts must not depend on which is which) +
      * an ID3v1 trailer. Each chunk must be exactly frameLen−6 bytes. */
    def mux(chunks: Seq[Array[Byte]], bitrateKbps: Int, rate: Int,
            id3v2Body: Int): Array[Byte] = {
      val rateIdx = ratesV1.indexOf(rate)
      val brIdx = brL3.indexOf(bitrateKbps)
      require(rateIdx >= 0 && brIdx > 0, s"unsupported $bitrateKbps kbps/$rate Hz")
      val fLen = frameLen(1, 3, bitrateKbps * 1000, rate, 0)
      val out = new java.io.ByteArrayOutputStream()
      // ID3v2.3 header: "ID3", version 3.0, flags 0, syncsafe body size
      out.write('I'); out.write('D'); out.write('3'); out.write(3); out.write(0); out.write(0)
      out.write((id3v2Body >> 21) & 0x7f); out.write((id3v2Body >> 14) & 0x7f)
      out.write((id3v2Body >> 7) & 0x7f); out.write(id3v2Body & 0x7f)
      out.write(new Array[Byte](id3v2Body))
      chunks.foreach { chunk =>
        require(chunk.length == fLen - 6, s"chunk must be ${fLen - 6} bytes")
        val h = new Array[Byte](4)
        h(0) = 0xff.toByte
        h(1) = 0xfa.toByte // 111 11 01 0: sync, MPEG1, Layer III, protected
        h(2) = ((brIdx << 4) | (rateIdx << 2)).toByte // padding 0, private 0
        h(3) = 0xc0.toByte // mono, no mode ext, no (c), not original, no emphasis
        out.write(h)
        // CRC-16 over header bytes 2..3 + the side-info region
        val si = java.util.Arrays.copyOfRange(chunk, 0, sideInfoLen(1, mono = true))
        val covered = Array(h(2), h(3)) ++ si
        val crc = crc16(covered, 0, covered.length, 0xffff)
        out.write((crc >> 8) & 0xff); out.write(crc & 0xff)
        out.write(chunk)
      }
      // ID3v1 trailer: 128 bytes starting "TAG"
      val tag = new Array[Byte](128)
      tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
      out.write(tag)
      out.toByteArray
    }

    def parse(payload: Array[Byte]): Option[Mp3File] = {
      var p = 0
      val n = payload.length
      // leading ID3v2: syncsafe 28-bit body length after the 10-byte header
      if (n >= 10 && payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') {
        val len = ((payload(6) & 0x7f) << 21) | ((payload(7) & 0x7f) << 14) |
          ((payload(8) & 0x7f) << 7) | (payload(9) & 0x7f)
        if ((payload(6) | payload(7) | payload(8) | payload(9)) < 0) return None
        p = 10 + len
        if (p > n) return None
      }
      // trailing ID3v1
      var end = n
      if (end - p >= 128 && payload(end - 128) == 'T' &&
          payload(end - 127) == 'A' && payload(end - 126) == 'G') end -= 128
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      var version = 0; var layer = 0; var brKbps = 0; var rate = 0; var ch = 0
      while (p < end) {
        if (p + 4 > end) return None
        val h0 = payload(p) & 0xff; val h1 = payload(p + 1) & 0xff
        val h2 = payload(p + 2) & 0xff; val h3 = payload(p + 3) & 0xff
        if (h0 != 0xff || (h1 & 0xe0) != 0xe0) return None
        val ver = (h1 >> 3) & 3 match {
          case 3 => 1; case 2 => 2; case 0 => 25; case _ => return None
        }
        val lay = (h1 >> 1) & 3 match {
          case 1 => 3; case 2 => 2; case 3 => 1; case _ => return None
        }
        val protectedCrc = (h1 & 1) == 0
        val brIdx = (h2 >> 4) & 0xf
        if (brIdx == 0 || brIdx == 15) return None // free/bad rate: unsupported
        val rateIdx = (h2 >> 2) & 3
        if (rateIdx == 3) return None
        val pad = (h2 >> 1) & 1
        val mode = (h3 >> 6) & 3
        if ((h3 & 3) == 2) return None // reserved emphasis
        val br = (ver, lay) match {
          case (1, 1) => brL1(brIdx); case (1, 2) => brL2(brIdx)
          case (1, 3) => brL3(brIdx); case (_, 3) => brL3v2(brIdx)
          case _ => return None // MPEG2 Layers I/II out of scope, loudly
        }
        val rt = ver match {
          case 1 => ratesV1(rateIdx)
          case 2 => ratesV1(rateIdx) / 2
          case _ => ratesV1(rateIdx) / 4
        }
        if (frames.isEmpty) {
          version = ver; layer = lay; brKbps = br; rate = rt
          ch = if (mode == 3) 1 else 2
        } else if (ver != version || lay != layer || br != brKbps || rt != rate)
          return None // VBR/mid-stream change: not this walker's contract
        val fLen = frameLen(ver, lay, br * 1000, rt, pad)
        if (fLen <= 4 || p + fLen > end) return None
        var contentFrom = p + 4
        if (protectedCrc) {
          // the Layer I/II CRC-16 covers the bit-allocation (+scfsi)
          // tables this walker does not parse — refuse loudly rather
          // than skip the 2 CRC bytes and pass corruption as verified
          // (the STRICT contract: protected frames' CRC is VERIFIED,
          // so a layer whose coverage we cannot compute is quarantined)
          if (lay != 3) return None
          locally {
            val siLen = sideInfoLen(ver, mono = mode == 3)
            if (contentFrom + 2 + siLen > p + fLen) return None
            val covered = Array(payload(p + 2), payload(p + 3)) ++
              java.util.Arrays.copyOfRange(payload, contentFrom + 2,
                contentFrom + 2 + siLen)
            val want = ((payload(contentFrom) & 0xff) << 8) |
              (payload(contentFrom + 1) & 0xff)
            if (crc16(covered, 0, covered.length, 0xffff) != want) return None
          }
          contentFrom += 2
        }
        frames += ((contentFrom.toLong, p + fLen - contentFrom))
        p += fLen
      }
      if (p != end) return None
      Some(Mp3File(version, layer, brKbps, rate, ch, frames.toSeq))
    }
  }

  // ------------------------------------------------------------------ h264

  /** A parsed H.264 Annex-B stream: SPS facts plus per-NAL type and the
    * de-escaped slice payload regions. */
  case class H264File(profileIdc: Int, levelIdc: Int, width: Int, height: Int,
                      nNalus: Int, nIdr: Int, nNonIdr: Int,
                      slicePayloads: Seq[Array[Byte]])

  /** From-scratch H.264 Annex-B NAL walker (ITU-T H.264 §7.3/§B.1 — the
    * TRIAGE layer for compressed video columns: stream validity, codec
    * profile/level, real dimensions out of the SPS, access-unit counts;
    * macroblock decode stays the declared stub). Real bit-level work,
    * STRICT like [[Mp3]]:
    *   - start-code framing (both 3- and 4-byte forms),
    *   - EMULATION PREVENTION (§7.4.1.1): 00 00 03 unescapes to 00 00,
    *     and an unescaped 00 00 00/01/02 inside a NAL is malformed,
    *   - forbidden_zero_bit, reserved nal_ref_idc/type rules,
    *   - SPS parsed field-for-field with Exp-Golomb (ue/se): profile,
    *     level, frame_num/POC bounds, MB dimensions → pixel dimensions
    *     (frame_mbs_only + optional cropping), trailing-bits check,
    *   - slices must follow an SPS+PPS (no orphan slice data).
    * Any violation quarantines the payload. */
  private[graft] object H264 {
    private final class BitReader(a: Array[Byte]) {
      var pos = 0
      def u(n: Int): Int = {
        var v = 0; var i = 0
        while (i < n) {
          val by = pos >> 3
          if (by >= a.length) throw new java.io.EOFException()
          v = (v << 1) | ((a(by) >> (7 - (pos & 7))) & 1)
          pos += 1; i += 1
        }
        v
      }
      /** Exp-Golomb ue(v): leadingZeros zeros, 1, then leadingZeros bits. */
      def ue(): Int = {
        var zeros = 0
        while (u(1) == 0) {
          zeros += 1
          if (zeros > 31) throw new java.io.IOException("ue overflow")
        }
        (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
      }
      def se(): Int = { val k = ue(); if ((k & 1) == 1) (k + 1) / 2 else -(k / 2) }
      /** rbsp_trailing_bits: a 1 then zero-pad to the byte boundary. */
      def trailing(): Boolean =
        u(1) == 1 && { while ((pos & 7) != 0) { if (u(1) != 0) return false }; true }
    }

    private final class BitWriter {
      private val out = new java.io.ByteArrayOutputStream()
      private var acc = 0; private var n = 0
      def u(v: Int, bits: Int): this.type = {
        var i = bits - 1
        while (i >= 0) {
          acc = (acc << 1) | ((v >> i) & 1); n += 1
          if (n == 8) { out.write(acc); acc = 0; n = 0 }
          i -= 1
        }
        this
      }
      def ue(v: Int): this.type = {
        val k = v + 1
        val bits = 32 - Integer.numberOfLeadingZeros(k)
        u(0, bits - 1); u(k, bits)
      }
      def se(v: Int): this.type = ue(if (v > 0) 2 * v - 1 else -2 * v)
      def trailing(): this.type = { u(1, 1); while (n != 0) u(0, 1); this }
      def bytes: Array[Byte] = out.toByteArray
    }

    /** Insert emulation-prevention bytes (raw RBSP → NAL payload). The
      * standard algorithm's tail rule included: an RBSP ending 00 00
      * gets a final 03, so the wire NAL never ends in 0x00 — the
      * property that makes trailing_zero_8bits stripping (parse) safe. */
    private[graft] def escape(rbsp: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
      var zeros = 0
      rbsp.foreach { b =>
        if (zeros == 2 && (b & 0xff) <= 3) { out.write(3); zeros = 0 }
        out.write(b & 0xff)
        zeros = if (b == 0) zeros + 1 else 0
      }
      if (zeros >= 2) out.write(3)
      out.toByteArray
    }

    /** Strict inverse of [[escape]]; None on an illegal 00 00 0x run. */
    private[graft] def unescape(nal: Array[Byte]): Option[Array[Byte]] = {
      val out = new java.io.ByteArrayOutputStream(nal.length)
      var zeros = 0; var i = 0
      while (i < nal.length) {
        val b = nal(i) & 0xff
        if (zeros == 2) {
          if (b <= 2) return None       // unescaped start-code-ish run
          if (b == 3) zeros = 0        // emulation byte: drop it
          else { out.write(b); zeros = 0 }
          i += 1
        } else { out.write(b); zeros = if (b == 0) zeros + 1 else 0; i += 1 }
      }
      Some(out.toByteArray)
    }

    /** Minimal baseline SPS for `width`×`height` (multiples of 16). */
    def buildSps(width: Int, height: Int, profileIdc: Int = 66,
                 levelIdc: Int = 30): Array[Byte] = {
      require(width % 16 == 0 && height % 16 == 0 && width > 0 && height > 0)
      val bw = new BitWriter
      bw.u(profileIdc, 8).u(0, 8).u(levelIdc, 8) // profile, constraints, level
      bw.ue(0)          // seq_parameter_set_id
      bw.ue(0)          // log2_max_frame_num_minus4
      bw.ue(2)          // pic_order_cnt_type
      bw.ue(1)          // max_num_ref_frames
      bw.u(0, 1)        // gaps_in_frame_num_value_allowed
      bw.ue(width / 16 - 1)
      bw.ue(height / 16 - 1)
      bw.u(1, 1)        // frame_mbs_only_flag
      bw.u(1, 1)        // direct_8x8_inference_flag
      bw.u(0, 1)        // frame_cropping_flag
      bw.u(0, 1)        // vui_parameters_present_flag
      bw.trailing().bytes
    }

    /** Minimal PPS referencing SPS 0. */
    def buildPps(): Array[Byte] = {
      val bw = new BitWriter
      bw.ue(0).ue(0)    // pps id, sps id
      bw.u(0, 1)        // entropy_coding_mode (CAVLC)
      bw.u(0, 1)        // bottom_field_pic_order_in_frame_present
      bw.ue(0)          // num_slice_groups_minus1
      bw.ue(0).ue(0)    // num_ref_idx_l{0,1}_default_active_minus1
      bw.u(0, 1).u(0, 2) // weighted_pred, weighted_bipred_idc
      bw.se(0).se(0).se(0) // qp, qs, chroma_qp offsets
      bw.u(1, 1).u(0, 1).u(0, 1) // deblocking_present, constrained_intra, redundant
      bw.trailing().bytes
    }

    private def startCode(out: java.io.ByteArrayOutputStream, long: Boolean): Unit = {
      if (long) out.write(0)
      out.write(0); out.write(0); out.write(1)
    }

    /** The rbsp_trailing_bits byte for byte-aligned payload data: the
      * stop bit then zero padding — also what makes a raw chunk a
      * CONFORMING RBSP (one that cannot end in a lone 0x00, which would
      * be indistinguishable from trailing_zero_8bits on the wire). */
    val TrailingBits: Byte = 0x80.toByte

    /** Annex-B mux: [long]SPS, PPS, then one IDR slice NAL per chunk
      * (slice RBSP = chunk bytes + [[TrailingBits]], emulation-prevention
      * applied). */
    def mux(chunks: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      startCode(out, long = true)
      out.write(0x67); out.write(escape(buildSps(width, height))) // nal_ref_idc 3, type 7
      startCode(out, long = true)
      out.write(0x68); out.write(escape(buildPps()))              // type 8
      chunks.foreach { c =>
        startCode(out, long = false)
        out.write(0x65)                                           // IDR slice
        out.write(escape(c :+ TrailingBits))
      }
      out.toByteArray
    }

    def parse(payload: Array[Byte]): Option[H264File] = {
      try {
        val n = payload.length
        // split on start codes
        val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i + 2 < n) {
          if (payload(i) == 0 && payload(i + 1) == 0 && payload(i + 2) == 1) {
            starts += i + 3; i += 3
          } else i += 1
        }
        if (starts.isEmpty) return None
        // bytes before the first start code must be 0 or 1 zeros (the
        // 4-byte form's extra zero), never data
        val lead = starts.head - 3
        if (lead > 1 || (0 until lead).exists(payload(_) != 0)) return None
        var profile = -1; var level = -1; var w = -1; var h = -1
        var sawSps = false; var sawPps = false
        var nIdr = 0; var nNonIdr = 0
        val slices = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        starts.indices.foreach { k =>
          val from = starts(k)
          var until = if (k + 1 < starts.length) starts(k + 1) - 3 else n
          // trailing_zero_8bits (B.1.1): zeros between a NAL and the next
          // start code are padding, and a CONFORMING NAL never ends in
          // 0x00 (rbsp_trailing_bits / the escape algorithm's trailing
          // 03), so stripping every one of them is lossless
          while (until > from && payload(until - 1) == 0) until -= 1
          if (until <= from) return None
          val hdr = payload(from) & 0xff
          if ((hdr & 0x80) != 0) return None // forbidden_zero_bit
          val refIdc = (hdr >> 5) & 3
          val typ = hdr & 0x1f
          val rbsp = unescape(
            java.util.Arrays.copyOfRange(payload, from + 1, until))
            .getOrElse(return None)
          typ match {
            case 7 => // SPS
              val br = new BitReader(rbsp)
              profile = br.u(8); br.u(8); level = br.u(8)
              if (br.ue() != 0) return None // one SPS id in scope
              // profiles carrying the chroma_format_idc extension block
              // (§7.3.2.1.1 lists 100,110,122,244,44,83,86,118,128,138,
              // 139,134,135): a different SPS layout — unsupported,
              // loudly. `>= 100` alone would parse 44/83/86 field-for-
              // field against the WRONG layout; a lucky bit pattern
              // could then yield confidently wrong dimensions.
              if (profile >= 100 || profile == 44 || profile == 83 ||
                  profile == 86) return None
              br.ue()                       // log2_max_frame_num_minus4
              val poc = br.ue()
              if (poc == 0) br.ue()
              else if (poc == 1) return None // delta POC lists unsupported
              br.ue(); br.u(1)              // max_num_ref_frames, gaps allowed
              val wMbs = br.ue() + 1
              val hMbs = br.ue() + 1
              val frameMbsOnly = br.u(1)
              if (frameMbsOnly == 0) br.u(1) // mb_adaptive_frame_field
              br.u(1)                        // direct_8x8_inference
              var cropL = 0; var cropR = 0; var cropT = 0; var cropB = 0
              if (br.u(1) == 1) { cropL = br.ue(); cropR = br.ue(); cropT = br.ue(); cropB = br.ue() }
              if (br.u(1) == 1) return None  // VUI unsupported, loudly
              if (!br.trailing()) return None
              w = wMbs * 16 - 2 * (cropL + cropR)
              h = hMbs * 16 * (2 - frameMbsOnly) - 2 * (cropT + cropB)
              sawSps = true
            case 8 =>
              if (!sawSps) return None
              sawPps = true
            case 5 =>
              if (!sawSps || !sawPps || refIdc == 0) return None
              nIdr += 1; slices += rbsp
            case 1 =>
              if (!sawSps || !sawPps) return None
              nNonIdr += 1; slices += rbsp
            case t if t >= 1 && t <= 12 => () // other valid NAL types: skipped
            case _ => return None
          }
        }
        if (!sawSps) return None
        Some(H264File(profile, level, w, h, starts.length, nIdr, nNonIdr,
          slices.toSeq))
      } catch {
        case _: java.io.EOFException | _: java.io.IOException => None
      }
    }
  }

  /** Features from a REAL H.264 Annex-B walk; `slice_byte_sum` is the
    * exact integer sum over the DE-ESCAPED slice RBSPs (emulation
    * prevention removed — the bytes a decoder would consume, including
    * each slice's rbsp_trailing_bits byte). */
  case class H264Features(doc_id: Long, payload_bytes: Long,
                          profile_idc: Option[Int], level_idc: Option[Int],
                          width: Option[Int], height: Option[Int],
                          n_nalus: Option[Long], n_idr: Option[Long],
                          slice_byte_sum: Option[Long], decoded: Boolean)

  /** REAL H.264 stream triage on the shared batched per-partition
    * iterator; malformed payloads quarantine as `decoded=false`. */
  def demuxH264(spark: SparkSession, media: DataFrame): Dataset[H264Features] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      rows.map { blob =>
        H264.parse(blob.payload) match {
          case Some(f) =>
            var sum = 0L
            f.slicePayloads.foreach { p =>
              var i = 0
              while (i < p.length) { sum += p(i) & 0xff; i += 1 }
            }
            H264Features(blob.doc_id, blob.payload.length.toLong,
              Some(f.profileIdc), Some(f.levelIdc), Some(f.width),
              Some(f.height), Some(f.nNalus.toLong), Some(f.nIdr.toLong),
              Some(sum), decoded = true)
          case None =>
            H264Features(blob.doc_id, blob.payload.length.toLong,
              None, None, None, None, None, None, None, decoded = false)
        }
      }
    }
  }

  /** Wrap a MEDIA table as real `.warc.gz` bytes — the binary-capture
    * twin of [[asWarcRecordsTable]]: one `resource` record per blob (ISO
    * 28500 §6.4, the non-HTTP capture shape), raw payload as the record
    * block, identity in WARC-Record-ID. One gzip member per record, so
    * the archive layer is byte-transparent for ARBITRARY binary payloads
    * — the property [[recoverWarcMedia]] must prove. */
  def mediaToWarc(spark: SparkSession, media: DataFrame): Dataset[MediaBlob] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      rows.map { b =>
        val rec = Warc.record(Seq(
          "WARC-Type" -> "resource",
          "WARC-Record-ID" -> s"<urn:graft:${b.doc_id}:media>",
          "WARC-Date" -> Warc.Date,
          "WARC-Target-URI" -> Warc.targetUri(b.doc_id, 0L),
          "Content-Type" -> "application/octet-stream",
          "Content-Length" -> b.payload.length.toString), b.payload)
        MediaBlob(b.doc_id, GzipMembers.gzipMember(rec),
          "application/warc", b.lang)
      }
    }
  }

  /** Inverse of [[mediaToWarc]]: strict member walk + record parse, one
    * rebuilt blob per `resource` record, identity from the parsed
    * WARC-Record-ID (never file position). Quarantined payloads drop
    * whole — the caller's funnel accounting surfaces them. */
  def recoverWarcMedia(spark: SparkSession, media: DataFrame): Dataset[MediaBlob] = {
    import spark.implicits._
    val idRe = "<urn:graft:(\\d+):media>".r
    media.as[MediaBlob].mapPartitions { rows =>
      rows.flatMap { blob =>
        parseAll(blob).toSeq.flatMap { recs =>
          recs.collect {
            case r if r.warcType == "resource" =>
              val id = r.recordId match {
                case idRe(d) => d.toLong
                case _ => -1L
              }
              MediaBlob(id, r.payload.getOrElse(Array.empty),
                "application/octet-stream", blob.lang)
          }
        }
      }
    }
  }

  /** Magic-byte media sniffer — a crawl's media columns arrive UNLABELED
    * (or mislabeled: Content-Type lies), so the triage funnel's first
    * stage classifies by leading bytes, never by the carried type tag:
    * `fLaC`, ID3v2 / an MPEG sync word, an Annex-B start code; anything
    * else is `unknown` and skips every decoder. Pure per-row projection
    * inside the scan partition. */
  def sniffKind(payload: Array[Byte]): String = {
    def at(i: Int): Int = payload(i) & 0xff
    if (payload.length >= 4 && at(0) == 'f' && at(1) == 'L' && at(2) == 'a' &&
      at(3) == 'C') "flac"
    else if (payload.length >= 3 && at(0) == 'I' && at(1) == 'D' && at(2) == '3')
      "mp3"
    else if (payload.length >= 2 && at(0) == 0xff && (at(1) & 0xe0) == 0xe0)
      "mp3"
    else if (payload.length >= 4 && at(0) == 0 && at(1) == 0 &&
      (at(2) == 1 || (at(2) == 0 && at(3) == 1))) "h264"
    else "unknown"
  }

  /** Re-tag a media table by [[sniffKind]] of the payload bytes. */
  def sniffMedia(spark: SparkSession, media: DataFrame): Dataset[MediaBlob] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      rows.map(b => b.copy(media_type = sniffKind(b.payload)))
    }
  }

  /** Deterministically corrupt selected rows (XOR the first payload byte)
    * — the gate's stand-in for transit corruption: every codec's magic is
    * in byte 0, so a corrupted blob sniffs `unknown` by construction. */
  def corruptFirstByte(spark: SparkSession, media: DataFrame,
                       predicate: Long => Boolean): Dataset[MediaBlob] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      rows.map { b =>
        if (predicate(b.doc_id) && b.payload.nonEmpty) {
          val p = b.payload.clone()
          p(0) = (p(0) ^ 0x55).toByte
          b.copy(payload = p)
        } else b
      }
    }
  }

  /** Wrap a text table as H.264 Annex-B streams for the x136 gate: slice
    * payloads are consecutive `chunkLen`-byte slices of the utf-8 text
    * (up to `maxChunks`), escaped through emulation prevention and
    * recovered exactly by the walker — so the de-escaped slice byte sum
    * replays in SQL as byte arithmetic over `encode(text)`. */
  def asH264Table(spark: SparkSession, documents: DataFrame, width: Int,
                  height: Int, chunkLen: Int, maxChunks: Int): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang) =>
          val bytes = text.getBytes("UTF-8")
          val k = math.min(maxChunks.toLong, bytes.length.toLong / chunkLen).toInt
          val chunks = (0 until k).map(i =>
            java.util.Arrays.copyOfRange(bytes, i * chunkLen, (i + 1) * chunkLen))
          MediaBlob(id, H264.mux(chunks, width, height), "video/h264", lang)
        }
      }.toDF()
  }

  /** Features from a REAL MP3 frame walk; `byte_sum` is the exact integer
    * sum over every frame's content bytes (post-header, post-CRC), the
    * [[AviFeatures]] discipline on the MPEG framing. */
  case class Mp3Features(doc_id: Long, payload_bytes: Long,
                         version: Option[Int], layer: Option[Int],
                         bitrate_kbps: Option[Int], sample_rate: Option[Int],
                         n_frames: Option[Long], duration_ms: Option[Long],
                         byte_sum: Option[Long], decoded: Boolean)

  /** REAL MPEG-audio frame extraction — the [[Mp3]] walker on the shared
    * batched per-partition iterator; corrupt/truncated/VBR payloads
    * quarantine as `decoded=false`. */
  def demuxMp3(spark: SparkSession, media: DataFrame): Dataset[Mp3Features] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { rows =>
      rows.map { blob =>
        Mp3.parse(blob.payload) match {
          case Some(f) if f.frames.isEmpty =>
            // a tags-only stream is valid but carries no header facts
            Mp3Features(blob.doc_id, blob.payload.length.toLong,
              None, None, None, None, Some(0L), Some(0L), Some(0L),
              decoded = true)
          case Some(f) =>
            var sum = 0L
            f.frames.foreach { case (off, len) =>
              var i = off.toInt
              while (i < off + len) { sum += blob.payload(i) & 0xff; i += 1 }
            }
            val spf = Mp3.samplesPerFrame(f.version, f.layer)
            Mp3Features(blob.doc_id, blob.payload.length.toLong,
              Some(f.version), Some(f.layer), Some(f.bitrateKbps),
              Some(f.sampleRate), Some(f.frames.length.toLong),
              Some(f.frames.length.toLong * spf * 1000L / f.sampleRate),
              Some(sum), decoded = true)
          case None =>
            Mp3Features(blob.doc_id, blob.payload.length.toLong,
              None, None, None, None, None, None, None, decoded = false)
        }
      }
    }
  }

  /** Wrap a text table as protected constant-rate MP3 streams for the
    * x135 gate: frame contents are consecutive `frameLen−6`-byte slices
    * of the utf-8 text (up to `maxFrames`), bracketed by real ID3v2/v1
    * tags the walker must skip — deterministic, so the walker's facts
    * replay in SQL as byte arithmetic over `encode(text)`. */
  def asMp3Table(spark: SparkSession, documents: DataFrame, bitrateKbps: Int,
                 rate: Int, maxFrames: Int, id3v2Body: Int): DataFrame = {
    import spark.implicits._
    val chunkLen = Mp3.frameLen(1, 3, bitrateKbps * 1000, rate, 0) - 6
    documents.select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang) =>
          val bytes = text.getBytes("UTF-8")
          val k = math.min(maxFrames.toLong, bytes.length.toLong / chunkLen).toInt
          val chunks = (0 until k).map(i =>
            java.util.Arrays.copyOfRange(bytes, i * chunkLen, (i + 1) * chunkLen))
          MediaBlob(id, Mp3.mux(chunks, bitrateKbps, rate, id3v2Body),
            "audio/mpeg", lang)
        }
      }.toDF()
  }
}
