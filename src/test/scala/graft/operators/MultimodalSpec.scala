package graft.operators

import graft.SparkSpec

/** Multimodal plumbing: schema shaping and batched per-partition feature
  * extraction (decode step is a declared stub — the plumbing is real). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asMediaTable wraps text as opaque binary payload with metadata") {
    val docs = Seq((1L, "hello", "en", "src", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.asMediaTable(docs)
    assert(media.columns.toSeq === Seq("doc_id", "payload", "media_type", "lang"))
    val row = media.head
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8") === "hello")
    assert(row.getAs[String]("media_type") === "text/plain")
  }

  test("resize preserves schema and bounds payload size") {
    val docs = Seq((1L, "a" * 100, "en", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.resize(spark, Multimodal.asMediaTable(docs), 8, 8).collect()
    assert(out.length === 1)
    assert(out(0).payload.length === 64)   // truncated to width*height
    assert(out(0).width === 8L && out(0).height === 8L)
  }

  test("sampleFrames fans one payload out to strided fixed-size chunks") {
    val docs = Seq((1L, "x" * 100, "en", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.sampleFrames(spark, Multimodal.asMediaTable(docs),
      frameBytes = 10, stride = 2).collect().sortBy(_.frame_index)
    // 10 chunks of 10 bytes, every 2nd kept → indices 0,2,4,6,8
    assert(frames.map(_.frame_index).toSeq === Seq(0L, 2L, 4L, 6L, 8L))
    assert(frames.forall(_.frame_bytes.length === 10))
  }

  // ------------------------------------------------------- real image path

  /** An actual encoded image: solid-color RGB, any ImageIO format. */
  private def imageBytes(w: Int, h: Int, fmt: String, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  private def mediaFrame(rows: Seq[(Long, Array[Byte], String)]) =
    rows.map { case (id, bytes, mt) => (id, bytes, mt, "en") }
      .toDF("doc_id", "payload", "media_type", "lang")

  test("decodeImages: real ImageIO decode recovers true dimensions and format") {
    val media = mediaFrame(Seq(
      (1L, imageBytes(20, 10, "bmp", 0xff0000), "image/bmp"),
      (2L, imageBytes(7, 5, "png", 0x00ff00), "image/png"),
      (3L, "not an image at all".getBytes("UTF-8"), "image/png"))) // corrupt
      .repartition(2)
    val feats = Multimodal.decodeImages(spark, media).collect()
      .sortBy(_.doc_id).toSeq
    assert(feats.map(_.decoded) === Seq(true, true, false))
    assert(feats(0).width === Some(20) && feats(0).height === Some(10))
    assert(feats(0).format === Some("bmp"))
    assert(feats(1).width === Some(7) && feats(1).height === Some(5))
    assert(feats(1).format === Some("png"))
    // the quarantine row still carries the payload-level facts
    assert(feats(2).width.isEmpty && feats(2).format.isEmpty)
    assert(feats(2).payload_bytes === 19L)
    assert(feats(2).payload_sha256.length === 64)
  }

  test("resizeImages: decode -> scale -> re-encode lands on the target size") {
    val media = mediaFrame(Seq(
      (1L, imageBytes(32, 16, "png", 0x0000ff), "image/png"),
      (2L, "garbage".getBytes("UTF-8"), "image/png")))
    val out = Multimodal.resizeImages(spark, media, 8, 8).collect()
    assert(out.length === 1, "undecodable payloads are dropped, not fatal")
    assert(out(0).doc_id === 1L)
    assert(out(0).width === 8L && out(0).height === 8L)
    // the re-encoded payload is itself a valid image of the target size
    val round = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).payload))
    assert(round.getWidth === 8 && round.getHeight === 8)
    // solid blue survives bilinear scaling exactly
    assert((round.getRGB(4, 4) & 0xffffff) === 0x0000ff)
  }

  // ------------------------------------------------------- real audio path

  /** A WAV payload: `n` 16-bit little-endian PCM samples at `rate` Hz,
    * sample i = round(amp * 32767 * sin(2π·f·i/rate)) — or a constant
    * when f = 0 (constant c has RMS exactly |c|, the cleanest pin). */
  private def wavBytes(n: Int, rate: Float, amp: Double, freq: Double): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val x =
        if (freq == 0.0) amp
        else amp * math.sin(2 * math.Pi * freq * i / rate)
      val s = math.round(x * 32767).toInt.max(-32768).min(32767)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeAudio: real WAV decode recovers header facts and sample RMS; " +
       "corrupt payloads quarantine") {
    val half = math.round(0.5 * 32767) / 32768.0 // the constant the encoder lands on
    val media = mediaFrame(Seq(
      (1L, wavBytes(8000, 8000f, 0.5, 0.0), "audio/wav"),   // constant half-scale
      (2L, wavBytes(4410, 44100f, 0.9, 441.0), "audio/wav"), // 441 Hz sine, 100 ms
      (3L, "definitely not audio".getBytes("UTF-8"), "audio/wav"),
      (4L, wavBytes(100, 8000f, 0.5, 0.0).take(20), "audio/wav"))) // truncated header
      .repartition(2)
    val feats = Multimodal.decodeAudio(spark, media).collect()
      .sortBy(_.doc_id).toSeq
    assert(feats.map(_.decoded) === Seq(true, true, false, false))
    assert(feats(0).sample_rate === Some(8000) && feats(0).channels === Some(1))
    assert(feats(0).bits_per_sample === Some(16))
    assert(feats(0).n_frames === Some(8000L))
    assert(feats(0).duration_ms === Some(1000L))
    // constant signal: RMS is the constant itself, to encoder rounding
    assert(math.abs(feats(0).rms.get - half) < 1e-9,
      s"rms=${feats(0).rms}")
    // sine of amplitude A over whole periods: RMS → A/√2 (quantization +
    // finite-length tolerance)
    assert(feats(1).n_frames === Some(4410L))
    assert(math.abs(feats(1).rms.get - 0.9 / math.sqrt(2)) < 1e-3,
      s"rms=${feats(1).rms}")
    // quarantine rows keep payload-level facts, decode fields empty
    assert(feats(2).sample_rate.isEmpty && feats(2).rms.isEmpty)
    assert(feats(2).payload_sha256.length === 64)
    assert(feats(3).sample_rate.isEmpty, "truncated header must not decode")
  }

  test("decodeAudio RMS is read-block-boundary-invariant (split 16-bit " +
       "samples carry across reads)") {
    // 40000 samples = 80000 PCM bytes: crosses the 64 KiB read block, so
    // one sample straddles the boundary — the carry path must reassemble
    // it; a dropped/mangled boundary sample shifts every later sample by
    // one byte and destroys the RMS.
    val media = mediaFrame(Seq(
      (1L, wavBytes(40000, 8000f, 0.25, 0.0), "audio/wav")))
    val f = Multimodal.decodeAudio(spark, media).collect().head
    val q = math.round(0.25 * 32767) / 32768.0
    assert(f.n_frames === Some(40000L))
    assert(math.abs(f.rms.get - q) < 1e-9, s"rms=${f.rms}")
  }

  // ------------------------------------------------------- real video path

  /** A YUV4MPEG2 payload: `lumas(i)` fills frame i's whole Y plane (C420
    * chroma planes fill with 128 — neutral). The cleanest pin: frame i's
    * mean luma is exactly lumas(i)/255. */
  private def y4mBytes(w: Int, h: Int, lumas: Seq[Int],
                       header: String = ""): Array[Byte] = {
    val hdr = if (header.nonEmpty) header
              else s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(hdr.getBytes("ISO-8859-1"))
    val chroma = 2 * (((w + 1) / 2) * ((h + 1) / 2))
    lumas.foreach { l =>
      out.write("FRAME\n".getBytes("ISO-8859-1"))
      for (_ <- 0 until w * h) out.write(l)
      for (_ <- 0 until chroma) out.write(128)
    }
    out.toByteArray
  }

  test("decodeVideo: real Y4M demux recovers header facts, frame count, " +
       "and exact Y-plane sums; corrupt payloads quarantine") {
    val v1 = y4mBytes(16, 8, Seq(0, 51, 255)) // 3 frames, known lumas
    val media = mediaFrame(Seq(
      (1L, v1, "video/x-yuv4mpeg"),
      (2L, y4mBytes(4, 4, Seq(), // header-only stream: valid, 0 frames
        header = "YUV4MPEG2 W4 H4 F30000:1001 C420mpeg2\n"), "video/x-yuv4mpeg"),
      (3L, "not a video".getBytes("UTF-8"), "video/x-yuv4mpeg"),
      (4L, v1.dropRight(10), "video/x-yuv4mpeg"), // truncated final frame
      (5L, y4mBytes(16, 8, Seq(7),               // unknown colorspace tag
        header = "YUV4MPEG2 W16 H8 F25:1 C999\n"), "video/x-yuv4mpeg")))
      .repartition(2)
    val feats = Multimodal.decodeVideo(spark, media).collect()
      .sortBy(_.doc_id).toSeq
    assert(feats.map(_.decoded) === Seq(true, true, false, false, false))
    assert(feats(0).width === Some(16) && feats(0).height === Some(8))
    assert(feats(0).fps_num === Some(25) && feats(0).fps_den === Some(1))
    assert(feats(0).colorspace === Some("C420"))
    assert(feats(0).n_frames === Some(3L))
    assert(feats(0).duration_ms === Some(120L)) // 3 frames at 25 fps
    assert(feats(0).y_sum === Some(128L * (0 + 51 + 255)))
    assert(math.abs(feats(0).mean_luma.get - (0 + 51 + 255) / (3 * 255.0)) < 1e-12)
    // header-only stream: decoded, zero frames, fractional fps parsed
    assert(feats(1).n_frames === Some(0L) && feats(1).y_sum === Some(0L))
    assert(feats(1).fps_num === Some(30000) && feats(1).fps_den === Some(1001))
    assert(feats(1).mean_luma.isEmpty)
    // quarantine rows keep payload-level facts
    assert(feats(2).width.isEmpty && feats(2).payload_sha256.length === 64)
    assert(feats(3).width.isEmpty, "truncated frame must fail the payload")
    assert(feats(4).width.isEmpty, "unknown colorspace must quarantine")
  }

  test("sampleVideoFrames: strided demux emits real gray PNGs that chain " +
       "into decodeImages") {
    val media = mediaFrame(Seq(
      (1L, y4mBytes(16, 8, Seq(10, 20, 30, 40, 50)), "video/x-yuv4mpeg"),
      (2L, "garbage".getBytes("UTF-8"), "video/x-yuv4mpeg")))
    val frames = Multimodal.sampleVideoFrames(spark, media, stride = 2)
      .collect().sortBy(_.frame_index)
    assert(frames.map(_.doc_id).distinct.toSeq === Seq(1L),
      "undecodable payloads are dropped, not fatal")
    assert(frames.map(_.frame_index).toSeq === Seq(0L, 2L, 4L))
    assert(frames.forall(f => f.width === 16 && f.height === 8))
    // constant-luma frames: mean is the fill value / 255 exactly
    assert(frames.map(f => math.round(f.mean_luma * 255).toInt).toSeq
      === Seq(10, 30, 50))
    // each emitted frame is a decodable image of the frame geometry, so
    // the video tier chains into the image tier's real decoder
    val asImages = frames.map(f => (f.doc_id * 100 + f.frame_index,
      f.png, "image/png"))
    val decoded = Multimodal.decodeImages(spark, mediaFrame(asImages.toSeq))
      .collect().sortBy(_.doc_id)
    assert(decoded.forall(_.decoded))
    assert(decoded.forall(d => d.width === Some(16) && d.height === Some(8)))
    assert(decoded.forall(_.format === Some("png")))
    // pixel round-trip: the PNG's raw gray samples ARE the Y plane
    // (raster samples, not getRGB — the latter applies gray→sRGB gamma)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frames(1).png))
    assert(img.getRaster.getSample(3, 3, 0) === 30)
  }

  test("asVideoTable: synthetic Y4M from text demuxes to the arithmetic " +
       "frame count (the x96 construction)") {
    // 16×8 C420 → 192 bytes/frame: 500 bytes → 2 complete frames; 100
    // bytes → header-only; maxFrames caps a long doc at 4
    val docs = Seq(
      (1L, "a" * 500, "en", "s", 500L),
      (2L, "b" * 100, "en", "s", 100L),
      (3L, "c" * 2000, "en", "s", 2000L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val vids = Multimodal.asVideoTable(spark, docs, 16, 8, 4)
    assert(vids.columns.toSeq === Seq("doc_id", "payload", "media_type", "lang"))
    val feats = Multimodal.decodeVideo(spark, vids).collect().sortBy(_.doc_id)
    assert(feats.forall(_.decoded), "constructed streams must always parse")
    assert(feats.map(_.n_frames.get).toSeq === Seq(2L, 0L, 4L))
    // frame bytes are the text bytes: 'a' = 97, Y plane = first 128 of
    // each 192-byte slice
    assert(feats(0).y_sum === Some(2L * 128L * 97L))
    assert(feats(2).y_sum === Some(4L * 128L * 99L))
  }

  // ---------------------------------------------------------- real avi path

  test("demuxAvi: real RIFF walk recovers header facts, frame count, and " +
       "the exact frame-byte sum; corrupt payloads quarantine") {
    val f1 = Array.tabulate[Byte](100)(i => (i % 7).toByte)
    val f2 = Array.tabulate[Byte](33)(i => (i % 5).toByte) // odd → pad byte
    val avi = Multimodal.Avi.mux(Seq(f1, f2), 32, 24, 40000)
    val media = mediaFrame(Seq(
      (1L, avi, "video/x-msvideo"),
      (2L, Multimodal.Avi.mux(Seq.empty, 8, 8, 33367), "video/x-msvideo"),
      (3L, "RIFFgarbage".getBytes("UTF-8"), "video/x-msvideo"),
      (4L, avi.take(avi.length - 5), "video/x-msvideo"))) // truncated chunk
    val feats = Multimodal.demuxAvi(spark, media).collect().sortBy(_.doc_id)
    assert(feats(0).decoded)
    assert(feats(0).width === Some(32) && feats(0).height === Some(24))
    assert(feats(0).n_frames === Some(2L))
    assert(feats(0).duration_ms === Some(80L))
    // pad bytes are container framing, never payload: the sum is exactly
    // the muxed frame bytes
    val want = (f1 ++ f2).map(b => (b & 0xff).toLong).sum
    assert(feats(0).byte_sum === Some(want))
    // empty movi list is a valid zero-frame file
    assert(feats(1).decoded && feats(1).n_frames === Some(0L)
      && feats(1).byte_sum === Some(0L))
    assert(!feats(2).decoded, "bad magic must quarantine")
    assert(!feats(3).decoded, "a chunk past its parent must quarantine")
  }

  test("MJPEG end to end: real JPEG frames in a real AVI container demux " +
       "byte-exact and decode through the image tier") {
    val jpegs = Seq(0xff0000, 0x00ff00, 0x0000ff, 0x808080)
      .map(c => imageBytes(24, 16, "jpeg", c))
    val avi = Multimodal.Avi.mux(jpegs, 24, 16, 40000)
    val media = mediaFrame(Seq((7L, avi, "video/x-msvideo")))
    val feats = Multimodal.demuxAvi(spark, media).collect()
    assert(feats(0).decoded && feats(0).n_frames === Some(4L))
    val frames = Multimodal.sampleAviFrames(spark, media, stride = 1)
      .collect().sortBy(_.frame_index)
    assert(frames.length === 4)
    assert(frames.zip(jpegs).forall { case (f, j) =>
      f.frame_bytes.sameElements(j) },
      "demuxed chunks must be byte-identical to the muxed JPEGs")
    val decoded = Multimodal.decodeImages(spark, mediaFrame(
      frames.map(f => (f.frame_index, f.frame_bytes, "image/jpeg")).toSeq))
      .collect()
    assert(decoded.forall(_.decoded))
    assert(decoded.forall(d => d.width === Some(24) && d.height === Some(16)))
    assert(decoded.forall(_.format === Some("jpeg")))
    // strided sampling keeps every 2nd frame
    val strided = Multimodal.sampleAviFrames(spark, media, stride = 2)
      .collect().sortBy(_.frame_index)
    assert(strided.map(_.frame_index).toSeq === Seq(0L, 2L))
  }

  test("asAviTable: synthetic AVI from text demuxes to the arithmetic " +
       "frame count and prefix byte sum (the x123 construction)") {
    val docs = Seq(
      (1L, "a" * 500, "en", "s", 500L),
      (2L, "b" * 100, "en", "s", 100L),
      (3L, "c" * 2000, "en", "s", 2000L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val avis = Multimodal.asAviTable(spark, docs, 16, 8, 192, 4, 40000)
    assert(avis.columns.toSeq === Seq("doc_id", "payload", "media_type", "lang"))
    val feats = Multimodal.demuxAvi(spark, avis).collect().sortBy(_.doc_id)
    assert(feats.forall(_.decoded), "constructed containers must always parse")
    assert(feats.map(_.n_frames.get).toSeq === Seq(2L, 0L, 4L))
    assert(feats(0).byte_sum === Some(2L * 192L * 97L))
    assert(feats(2).byte_sum === Some(4L * 192L * 99L))
  }

  // --------------------------------------------------------- real gzip path

  test("decodeGzipMembers: real member walk inflates, verifies CRC/ISIZE, " +
       "and reports per-member sizes; corruption quarantines instead of " +
       "silently truncating") {
    def member(s: String) =
      Multimodal.GzipMembers.gzipMember(s.getBytes("UTF-8"))
    val good = member("hello ") ++ member("world, ") ++ member("gzip!")
    // garbage BETWEEN members: GZIPInputStream would silently stop after
    // member 1 — the strict walker must quarantine
    val midGarbage = member("hello ") ++
      "NOT A GZIP HEADER".getBytes("UTF-8") ++ member("world")
    // flipped byte inside the DEFLATE body (CRC must catch it even when
    // the stream still inflates)
    val crcBroken = {
      val b = member("some payload that is long enough to damage")
      b(b.length - 12) = (b(b.length - 12) ^ 0x41).toByte; b
    }
    val truncated = good.dropRight(3)
    val media = mediaFrame(Seq(
      (1L, good, "application/gzip"),
      (2L, Array.emptyByteArray, "application/gzip"), // zero members: valid
      (3L, midGarbage, "application/gzip"),
      (4L, crcBroken, "application/gzip"),
      (5L, truncated, "application/gzip")))
    val feats = Multimodal.decodeGzipMembers(spark, media)
      .collect().sortBy(_.doc_id)
    assert(feats(0).decoded)
    assert(feats(0).n_members === Some(3L))
    assert(feats(0).member_bytes === Some(Seq(6L, 7L, 5L)))
    assert(feats(0).total_bytes === Some(18L))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val wantSha = md.digest("hello world, gzip!".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(feats(0).content_sha256 === Some(wantSha),
      "decompressed concatenation must be the original records in order")
    assert(feats(1).decoded && feats(1).n_members === Some(0L))
    assert(!feats(2).decoded, "garbage between members must quarantine")
    assert(!feats(3).decoded, "a CRC mismatch must quarantine")
    assert(!feats(4).decoded, "a truncated trailer must quarantine")
  }

  test("gzip member walk handles FNAME/FEXTRA/FCOMMENT header flags " +
       "(RFC 1952 optional fields real encoders emit)") {
    // hand-build a member with FNAME + FEXTRA: header, fields, raw
    // deflate body, CRC32 + ISIZE trailer
    val content = "flagged member".getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8).toByte, // FEXTRA|FNAME
      0, 0, 0, 0, 0, 0))
    out.write(Array[Byte](3, 0)) // FEXTRA: 3 bytes follow
    out.write(Array[Byte](1, 2, 3))
    out.write("name.txt".getBytes("UTF-8")); out.write(0) // FNAME, NUL-ended
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(content); d.finish()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new java.util.zip.CRC32(); crc.update(content)
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    out.write(u32(crc.getValue)); out.write(u32(content.length.toLong))
    val feats = Multimodal.decodeGzipMembers(spark,
      mediaFrame(Seq((1L, out.toByteArray, "application/gzip"))))
      .collect()
    assert(feats(0).decoded, "optional header fields must parse")
    assert(feats(0).member_bytes === Some(Seq(content.length.toLong)))
  }

  test("gzip member walk VERIFIES FHCRC: a good header CRC16 parses, a " +
       "corrupted header with FHCRC set quarantines") {
    val content = "hcrc member".getBytes("UTF-8")
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def withFhcrc(poisonHeader: Boolean): Array[Byte] = {
      val hdr = new java.io.ByteArrayOutputStream()
      hdr.write(Array[Byte](0x1f, 0x8b.toByte, 8, (2 | 8).toByte, // FHCRC|FNAME
        0, 0, 0, 0, 0, 0))
      hdr.write("n.txt".getBytes("UTF-8")); hdr.write(0)
      val hbytes = hdr.toByteArray
      val hcrc = new java.util.zip.CRC32(); hcrc.update(hbytes)
      // corrupt a header byte AFTER computing the CRC — the on-wire
      // header then disagrees with the stored CRC16 exactly like real
      // transit corruption (the byte is MTIME, covered by FHCRC only,
      // so nothing else in the parse would catch it)
      if (poisonHeader) hbytes(5) = 0x7f
      val out = new java.io.ByteArrayOutputStream()
      out.write(hbytes)
      val stored = hcrc.getValue
      out.write((stored & 0xff).toInt); out.write(((stored >> 8) & 0xff).toInt)
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(content); d.finish()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      val crc = new java.util.zip.CRC32(); crc.update(content)
      out.write(u32(crc.getValue)); out.write(u32(content.length.toLong))
      out.toByteArray
    }
    val feats = Multimodal.decodeGzipMembers(spark, mediaFrame(Seq(
        (1L, withFhcrc(poisonHeader = false), "application/gzip"),
        (2L, withFhcrc(poisonHeader = true), "application/gzip"))))
      .collect().sortBy(_.doc_id)
    assert(feats(0).decoded, "valid FHCRC must parse")
    assert(feats(0).member_bytes === Some(Seq(content.length.toLong)))
    assert(!feats(1).decoded,
      "corrupted header under FHCRC must quarantine, not pass silently")
  }

  test("asWarcTable: text splits into 256-byte gzip members that decode " +
       "back to the text (the x125 construction)") {
    val docs = Seq(
      (1L, "a" * 600, "en", "s", 600L),
      (2L, "", "en", "s", 0L),
      (3L, "short", "en", "s", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val warc = Multimodal.asWarcTable(spark, docs, 256)
    val feats = Multimodal.decodeGzipMembers(spark, warc)
      .collect().sortBy(_.doc_id)
    assert(feats.forall(_.decoded))
    assert(feats.map(_.n_members.get).toSeq === Seq(3L, 0L, 1L))
    assert(feats(0).member_bytes === Some(Seq(256L, 256L, 88L)))
    assert(feats(0).total_bytes === Some(600L))
  }

  test("extractFeatures runs batched per-partition and is deterministic") {
    val docs = Seq(
      (1L, "hello", "en", "s", 5L), (2L, "world!", "de", "s", 6L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.extractFeatures(spark, Multimodal.asMediaTable(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.length === 2)
    assert(feats(0).payload_bytes === 5L)
    assert(feats(1).payload_bytes === 6L)
    assert(feats(0).payload_sha256.length === 64)
    // deterministic across runs
    val again = Multimodal.extractFeatures(spark, Multimodal.asMediaTable(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.toSeq === again.toSeq)
  }
  // ----------------------------------------------------------- WARC records

  test("WARC record framing round-trips: mux -> strict parse recovers " +
       "types, ids, URIs, envelope facts; response bodies rebuild the text") {
    val docs = Seq(
      (1L, "a" * 600, "en", "s", 600L),
      (2L, "", "en", "s", 0L),
      (3L, "short doc", "en", "s", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val warc = Multimodal.asWarcRecordsTable(spark, docs, 256)
    val recs = Multimodal.parseWarcRecords(spark, warc)
      .collect().sortBy(r => (r.doc_id, r.rec_index))
    // doc 1: warcinfo + 3 responses; doc 2: warcinfo only; doc 3: +1
    assert(recs.map(r => (r.doc_id, r.warc_type)).toSeq ==
      Seq((1L, "warcinfo"), (1L, "response"), (1L, "response"),
        (1L, "response"), (2L, "warcinfo"), (3L, "warcinfo"),
        (3L, "response")))
    val r11 = recs.find(r => r.doc_id == 1L && r.rec_index == 1L).get
    assert(r11.record_id == "<urn:graft:1:0>")
    assert(r11.target_uri.contains("https://example.org/doc/1/0"))
    assert(r11.http_status.contains(200))
    assert(r11.payload_len.contains(256L))
    // envelope: 78 fixed header bytes + digits("256") + 256
    assert(r11.content_length == 78 + 3 + 256)
    val back = Multimodal.recoverWarcResponseText(spark, warc)
      .collect().sortBy(_.doc_id)
    assert(back.map(_.text).toSeq == Seq("a" * 600, "", "short doc"))
  }

  test("WARC record framing quarantines loudly on every malformation " +
       "class: version line, missing header, short block, bad trailer, " +
       "corrupt member") {
    val docs = Seq((7L, "payload text here", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val good = Multimodal.asWarcRecordsTable(spark, docs, 256)
      .select("payload").collect()(0).getAs[Array[Byte]](0)
    def member(bytes: Array[Byte]): Array[Byte] =
      Multimodal.GzipMembers.gzipMember(bytes)
    def rawRecord(version: String, headers: Seq[(String, String)],
                  block: Array[Byte], trailer: String): Array[Byte] = {
      val head = (version +: headers.map { case (k, v) => s"$k: $v" })
        .mkString("", "\r\n", "\r\n\r\n").getBytes("US-ASCII")
      head ++ block ++ trailer.getBytes("US-ASCII")
    }
    val block = "software: x\r\n".getBytes("US-ASCII")
    val okHdrs = Seq("WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:x:1>",
      "Content-Type" -> "application/warc-fields",
      "Content-Length" -> block.length.toString)
    val cases = Seq(
      member(rawRecord("WARC/0.9", okHdrs, block, "\r\n\r\n")), // version
      member(rawRecord("WARC/1.0", // Content-Length missing
        okHdrs.filterNot(_._1 == "Content-Length"), block, "\r\n\r\n")),
      member(rawRecord("WARC/1.0", // block shorter than declared
        okHdrs.map { case ("Content-Length", _) =>
          "Content-Length" -> (block.length + 50).toString
          case kv => kv }, block, "\r\n\r\n")),
      member(rawRecord("WARC/1.0", okHdrs, block, "XXXX")), // trailer
      { val c = good.clone(); c(c.length / 2) =
          (c(c.length / 2) ^ 0x5a).toByte; c } // corrupt gzip byte
    )
    val media = mediaFrame(
      (good +: cases).zipWithIndex.map { case (b, i) =>
        (i.toLong, b, "application/warc") })
    val recs = Multimodal.parseWarcRecords(spark, media).collect()
    val byDoc = recs.groupBy(_.doc_id)
    assert(byDoc(0L).forall(_.warc_type != "quarantined"),
      "the well-formed payload must parse")
    (1L to 5L).foreach { id =>
      assert(byDoc(id).map(_.warc_type).toSeq == Seq("quarantined"),
        s"malformation case $id must quarantine as one loud row")
    }
  }
  test("recoverWarcDocs rebuilds per-document text from MULTI-document " +
       "payloads by record identity, not file position") {
    val docs = Seq(
      (10L, "a" * 300, "en", "s", 300L),
      (11L, "brief", "en", "s", 5L),
      (12L, "", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // concatenate all three docs' records into ONE payload (the
    // per-partition file shape)
    val payloads = Multimodal.asWarcRecordsTable(spark, docs, 128)
      .select("payload").collect().map(_.getAs[Array[Byte]](0))
    val combined = payloads.reduce(_ ++ _)
    val media = mediaFrame(Seq((0L, combined, "application/warc")))
    val got = Multimodal.recoverWarcDocs(spark, media)
      .collect().sortBy(_.doc_id)
    assert(got.map(r => (r.doc_id, r.text)).toSeq ==
      Seq((10L, "a" * 300), (11L, "brief"), (12L, "")),
      "every document must rebuild exactly, including the record-less one")
    // a quarantined (corrupt) payload drops whole, never partial text
    val poisoned = combined.clone()
    poisoned(poisoned.length / 2) =
      (poisoned(poisoned.length / 2) ^ 0x11).toByte
    val bad = Multimodal.recoverWarcDocs(spark,
      mediaFrame(Seq((0L, poisoned, "application/warc")))).collect()
    assert(bad.isEmpty)
  }

  // ------------------------------------------------------------- mp3 walker

  test("mp3: mux/parse roundtrip recovers exact frame content regions " +
       "and the CRC/sync/length strictness quarantines every corruption") {
    val chunkLen = Multimodal.Mp3.frameLen(1, 3, 128000, 44100, 0) - 6
    val chunks = (0 until 3).map(i => Array.fill(chunkLen)((i + 40).toByte))
    val good = Multimodal.Mp3.mux(chunks, 128, 44100, id3v2Body = 64)
    val f = Multimodal.Mp3.parse(good).get
    assert(f.version === 1 && f.layer === 3 && f.bitrateKbps === 128 &&
      f.sampleRate === 44100 && f.channels === 1)
    assert(f.frames.length === 3)
    f.frames.zipWithIndex.foreach { case ((off, len), i) =>
      assert(len === chunkLen)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(good, off.toInt, off.toInt + len),
        chunks(i)), s"frame $i content region")
    }
    // CRC flip (a side-info byte), sync break, truncation → quarantine
    val crcBad = good.clone()
    crcBad(10 + 64 + 6 + 3) = (crcBad(10 + 64 + 6 + 3) ^ 0x01).toByte
    assert(Multimodal.Mp3.parse(crcBad).isEmpty, "flipped side-info byte")
    val syncBad = good.clone()
    val frame2 = 10 + 64 + 417 // second frame header offset
    syncBad(frame2) = 0x00
    assert(Multimodal.Mp3.parse(syncBad).isEmpty, "broken sync")
    assert(Multimodal.Mp3.parse(good.dropRight(130)).isEmpty,
      "truncated final frame") // drops ID3v1 + 2 bytes of the last frame
    assert(Multimodal.Mp3.parse("garbage".getBytes).isEmpty)
    // a mid-stream bitrate change (VBR) is outside the walker's contract
    val vbr = good.clone()
    vbr(frame2 + 2) = ((0x08 << 4) | (0 << 2)).toByte // 64 kbps, 44100
    assert(Multimodal.Mp3.parse(vbr).isEmpty, "VBR must refuse, not mis-time")
  }

  test("mp3: a CRC-protected Layer I/II frame quarantines — its CRC covers " +
       "allocation tables the walker does not parse, so it cannot verify") {
    // the same 96-byte Layer I frame as the next test but with the
    // protection bit SET (h1 0xfe): skipping the 2 CRC bytes unverified
    // would report silent corruption as decoded=true, breaking the STRICT
    // contract ("protected frames' CRC-16 actually VERIFIED") — refuse
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xfe) // sync, MPEG1, Layer I, CRC-protected
    out.write((2 << 4) | (2 << 2)); out.write(0xc0)
    out.write(Array.fill(92)(7.toByte)) // 2 CRC + 90 data bytes, any content
    assert(Multimodal.Mp3.parse(out.toByteArray).isEmpty)
  }

  test("mp3: an unprotected Layer I frame walks by its own slot arithmetic") {
    // 64 kbps / 32000 Hz Layer I: (12·64000/32000)·4 = 96-byte frames
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xff) // sync, MPEG1, Layer I, no CRC
    out.write((2 << 4) | (2 << 2))   // bitrate idx 2 (64k), rate idx 2 (32000)
    out.write(0xc0)                  // mono
    out.write(Array.fill(92)(7.toByte))
    val f = Multimodal.Mp3.parse(out.toByteArray).get
    assert(f.layer === 1 && f.bitrateKbps === 64 && f.sampleRate === 32000)
    assert(f.frames === Seq((4L, 92)))
    assert(Multimodal.Mp3.samplesPerFrame(1, 1) === 384)
  }

  // ------------------------------------------------------------ h264 walker

  test("h264: emulation prevention roundtrips start-code-shaped payloads " +
       "byte-exactly, and the SPS yields the true dimensions") {
    // payloads stuffed with the byte runs §7.4.1.1 exists to protect
    val nasty = Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 7, 0, 0) ++
      Array.fill(20)(0.toByte)
    val escaped = Multimodal.H264.escape(nasty)
    assert(Multimodal.H264.unescape(escaped).get.toSeq === nasty.toSeq)
    // no unescaped 00 00 0x survives in the wire form
    (0 until escaped.length - 2).foreach { i =>
      assert(!(escaped(i) == 0 && escaped(i + 1) == 0 &&
        (escaped(i + 2) & 0xff) <= 2), s"naked start-code run at $i")
    }
    val chunks = Seq(nasty, Array.fill(16)(65.toByte))
    val stream = Multimodal.H264.mux(chunks, 320, 192)
    val f = Multimodal.H264.parse(stream).get
    assert(f.profileIdc === 66 && f.levelIdc === 30)
    assert(f.width === 320 && f.height === 192)
    assert(f.nNalus === 4 && f.nIdr === 2)
    // slice RBSP = chunk + its rbsp_trailing_bits byte
    assert(f.slicePayloads(0).toSeq ===
      (nasty :+ Multimodal.H264.TrailingBits).toSeq)
    assert(f.slicePayloads(1).toSeq ===
      (chunks(1) :+ Multimodal.H264.TrailingBits).toSeq)
  }

  test("h264: SPS cropping subtracts from the macroblock dimensions") {
    // hand-build an SPS body with frame_cropping_flag = 1 from the spec
    // text with an independent bit-string assembler: 21×12 MBs (336×192)
    // cropped right/bottom by ue(2) crop units = 4 luma px each (4:2:0
    // crop units are 2 px)
    def bits(s: String): Array[Byte] = {
      val clean = s.replace(" ", "")
      val padded = clean + "0" * ((8 - clean.length % 8) % 8)
      padded.grouped(8).map(g => Integer.parseInt(g, 2).toByte).toArray
    }
    val body = bits(
      "01000010" + "00000000" + "00011110" + // profile 66, constraints, level 30
        "1" +              // sps id ue(0)
        "1" +              // log2_max_frame_num_minus4 ue(0)
        "011" +            // pic_order_cnt_type ue(2)
        "010" +            // max_num_ref_frames ue(1)
        "0" +              // gaps_in_frame_num
        "000010101" +      // ue(20): 21 MBs wide = 336
        "0001100" +        // ue(11): 12 MBs high = 192
        "1" + "1" +        // frame_mbs_only, direct_8x8
        "1" +              // frame_cropping_flag = 1
        "1" +              // crop_left ue(0)
        "011" +            // crop_right ue(2) → 4 px
        "1" +              // crop_top ue(0)
        "011" +            // crop_bottom ue(2) → 4 px
        "0" +              // vui_present
        "1")               // rbsp_stop_bit (assembler pads zeros)
    val stream = Array[Byte](0, 0, 0, 1, 0x67) ++
      Multimodal.H264.escape(body) ++
      (Array[Byte](0, 0, 0, 1, 0x68) ++
        Multimodal.H264.escape(Multimodal.H264.buildPps()))
    val f = Multimodal.H264.parse(stream).get
    assert(f.width === 336 - 4 && f.height === 192 - 4)
  }

  test("h264: strictness — forbidden bit, orphan slice, naked runs, " +
       "truncation all quarantine") {
    val good = Multimodal.H264.mux(Seq(Array.fill(32)(9.toByte)), 64, 32)
    assert(Multimodal.H264.parse(good).isDefined)
    val forbidden = good.clone()
    forbidden(4) = (forbidden(4) | 0x80).toByte // SPS header forbidden bit
    assert(Multimodal.H264.parse(forbidden).isEmpty)
    // a slice with no SPS/PPS in scope
    val orphan = Array[Byte](0, 0, 0, 1, 0x65, 10, 11, 12)
    assert(Multimodal.H264.parse(orphan).isEmpty)
    // an unescaped 00 00 01 INSIDE a NAL body splits it; the tail then
    // parses as a bogus NAL — craft 00 00 02 instead (never a start
    // code, still illegal unescaped)
    val naked = good ++ Array[Byte](0, 0, 1, 0x65, 0, 0, 2, 5)
    assert(Multimodal.H264.parse(naked).isEmpty)
    assert(Multimodal.H264.parse(good.take(10)).isEmpty) // truncated SPS
    assert(Multimodal.H264.parse("junk".getBytes).isEmpty)
    assert(Multimodal.H264.parse(Array[Byte](0, 0, 1)).isEmpty)
  }

  test("h264: profiles 44/83/86 carry the chroma extension block " +
       "(§7.3.2.1.1) — quarantined like >=100, never parsed against the " +
       "baseline SPS layout") {
    val good = Multimodal.H264.mux(Seq(Array.fill(16)(3.toByte)), 64, 32)
    assert(Multimodal.H264.parse(good).isDefined)
    Seq(44, 83, 86, 100, 110, 122, 134, 244).foreach { p =>
      val s = good.clone()
      s(5) = p.toByte // profile_idc is the first SPS payload byte
      assert(Multimodal.H264.parse(s).isEmpty, s"profile $p must quarantine")
    }
  }

  test("h264: demuxH264 facts and per-row quarantine") {
    import spark.implicits._
    val docs = Seq(
      (1L, "z" * 700, "en", "s", 700L),  // 2 slices (700/300)
      (2L, "short", "en", "s", 5L))      // SPS+PPS only
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.demuxH264(spark,
        Multimodal.asH264Table(spark, docs, 320, 192, 300, 4))
      .collect().sortBy(_.doc_id)
    assert(out.forall(_.decoded))
    assert(out(0).n_idr === Some(2L) && out(0).n_nalus === Some(4L))
    assert(out(0).slice_byte_sum === Some(600L * 'z'.toInt + 2 * 128))
    assert(out(0).width === Some(320) && out(0).height === Some(192))
    assert(out(1).n_idr === Some(0L) && out(1).n_nalus === Some(2L) &&
      out(1).slice_byte_sum === Some(0L))
    val bad = Multimodal.demuxH264(spark,
      mediaFrame(Seq((9L, "not h264".getBytes, "video/h264")))).collect()
    assert(bad.length === 1 && !bad(0).decoded)
  }

  test("mp3: demuxMp3 facts — duration arithmetic, tags-only, quarantine") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x" * 900, "en", "s", 900L),   // 2 frames (900/411)
      (2L, "tiny", "en", "s", 4L),        // tags-only: 0 frames
      (3L, "y" * 500, "en", "s", 500L))   // 1 frame
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.asMp3Table(spark, docs, 128, 44100, 4, 64)
    val out = Multimodal.demuxMp3(spark, media).collect().sortBy(_.doc_id)
    assert(out.forall(_.decoded))
    assert(out(0).n_frames === Some(2L))
    assert(out(0).duration_ms === Some(2L * 1152 * 1000 / 44100))
    assert(out(0).byte_sum === Some(2L * 411 * 'x'.toInt))
    assert(out(1).n_frames === Some(0L) && out(1).version === None &&
      out(1).byte_sum === Some(0L))
    assert(out(2).n_frames === Some(1L))
    // corrupt payload quarantines its row only
    val poisoned = mediaFrame(Seq((9L, "not an mp3".getBytes, "audio/mpeg")))
    val bad = Multimodal.demuxMp3(spark, poisoned).collect()
    assert(bad.length === 1 && !bad(0).decoded)
  }
}
