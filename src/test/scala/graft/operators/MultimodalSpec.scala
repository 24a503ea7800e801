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
}
