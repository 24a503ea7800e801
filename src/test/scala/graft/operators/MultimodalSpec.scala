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
