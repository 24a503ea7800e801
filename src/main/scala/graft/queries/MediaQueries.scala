package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Oracle-checked queries for the multimodal plumbing (engine extension —
  * builder brief): the decode step is a declared stub ([[Multimodal.FakeDecoder]],
  * no codecs in this container), but its deterministic features — payload
  * byte length and sha256 — ARE replayable in DuckDB over `encode(text)`,
  * so the whole mapPartitions path (schema, encoders, batch shape, feature
  * columns) is verified end-to-end, not just spec-tested.
  */
object MediaQueries {
  type Q = (SparkSession, String) => DataFrame

  val FrameBytes = 64
  val FrameStride = 2
  val ResizeW = 16
  val ResizeH = 16
  // x96 synthetic-video geometry: 16×8 C420 → 128 Y bytes + 64 chroma
  // bytes = 192 bytes of frame data per frame, up to 4 frames per doc.
  val VideoW = 16
  val VideoH = 8
  val VideoMaxFrames = 4
  val VideoFrameData: Int = VideoW * VideoH * 3 / 2
  val VideoYBytes: Int = VideoW * VideoH
  // x123 synthetic-AVI geometry: 192-byte frame chunks (x96's slice
  // size), up to 4 per doc, 25 fps (40 000 µs/frame).
  val AviFrameLen = 192
  val AviMaxFrames = 4
  val AviUsecPerFrame = 40000
  // x125: one gzip member per 256-byte text record (the WARC shape).
  val WarcChunkLen = 256
  // x134 synthetic-FLAC geometry: 192-sample frames, samples capped at
  // 600 = 3·192 + 24, so any doc ≥600 bytes pins the short-last-frame
  // path; 8 kHz 16-bit mono.
  val FlacBlock = 192
  val FlacMaxSamples = 600
  val FlacRate = 8000
  // x137 stereo-FLAC geometry: 300 samples per channel (left from even
  // text bytes, right from odd), mid/side decorrelation on.
  val FlacStereoMaxPerCh = 300
  // x135 synthetic-MP3 geometry: protected MPEG1 Layer III mono at
  // 128 kbps / 44100 Hz → 417-byte frames, 411 content bytes each
  // (4 header + 2 CRC), up to 4 per doc, 64-byte ID3v2 body.
  val Mp3Bitrate = 128
  val Mp3Rate = 44100
  val Mp3MaxFrames = 4
  val Mp3Id3Body = 64
  val Mp3ChunkLen: Int = 144 * Mp3Bitrate * 1000 / Mp3Rate - 6
  // x136 synthetic-H.264 geometry: 320×192 baseline SPS, 300-byte IDR
  // slice payloads (pre-escape), up to 4 per doc.
  val H264W = 320
  val H264H = 192
  val H264ChunkLen = 300
  val H264MaxChunks = 4

  def queries: Map[String, Q] = Map(
    // ----------------------------------------------------------------- x10
    // Media feature extraction: documents → opaque binary payload table →
    // batched per-partition decode (stubbed) → typed feature rows.
    "x10_media_features" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.extractFeatures(s, Multimodal.asMediaTable(t.documents))
        .toDF()
        .select("doc_id", "payload_bytes", "fake_width", "payload_sha256", "lang")
        .orderBy("doc_id")
    }),

    // ----------------------------------------------------------------- x25
    // Frame sampling: every 2nd 64-byte chunk of each payload, streamed
    // through the iterator-to-iterator flatMap a real demuxer needs. Frame
    // bytes are compared as hex strings — exact binary equality, no
    // hash-function availability assumptions on the oracle side.
    "x25_frame_sample" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.sampleFrames(s, Multimodal.asMediaTable(t.documents),
          FrameBytes, FrameStride)
        .toDF()
        .select(col("doc_id"), col("frame_index"),
          length(col("frame_bytes")).cast("long").as("frame_len"),
          upper(hex(col("frame_bytes"))).as("frame_hex"))
        .orderBy("doc_id", "frame_index")
    }),

    // ----------------------------------------------------------------- x26
    // Resize plumbing: payload truncated to width×height bytes (the stub
    // for decode→scale→re-encode), verified byte-exact via hex.
    "x26_media_resize" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.resize(s, Multimodal.asMediaTable(t.documents), ResizeW, ResizeH)
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          length(col("payload")).cast("long").as("out_bytes"),
          upper(hex(col("payload"))).as("payload_hex"))
        .orderBy("doc_id")
    }),

    // ----------------------------------------------------------------- x96
    // REAL video demux, oracle-gated: each document becomes a synthetic
    // YUV4MPEG2 stream (frames = consecutive 192-byte slices of the utf-8
    // text), the from-scratch Y4m parser demuxes it, and frame count,
    // duration, and the exact integer Y-plane byte sum replay in DuckDB
    // as pure byte arithmetic over encode(text) — proving the parser
    // segments frames correctly AND reads the actual frame bytes.
    "x96_video_demux" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.decodeVideo(s,
          Multimodal.asVideoTable(s, t.documents, VideoW, VideoH, VideoMaxFrames))
        .toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("fps_num").cast("long").as("fps_num"),
          col("fps_den").cast("long").as("fps_den"),
          col("n_frames"), col("duration_ms"), col("y_sum"))
        .orderBy("doc_id")
    }),

    // ---------------------------------------------------------------- x123
    // REAL RIFF/AVI demux, oracle-gated: each document becomes a real
    // AVI container (fourcc chunk tree, word alignment, avih/strh/strf
    // headers) whose MJPEG frame chunks are consecutive 192-byte slices
    // of the utf-8 text; the from-scratch chunk walker extracts header
    // facts and the exact frame-byte sum, which replay in DuckDB as
    // byte arithmetic over encode(text) — proving the walker segments
    // the container correctly AND reads the actual chunk payloads. The
    // compressed-codec half (the frames being real JPEGs decoded by
    // ImageIO through sampleAviFrames → decodeImages) is spec-gated —
    // re-encoded JPEG bytes are codec-version artifacts, the
    // decodeImages precedent.
    "x123_avi_demux" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.demuxAvi(s,
          Multimodal.asAviTable(s, t.documents, VideoW, VideoH,
            AviFrameLen, AviMaxFrames, AviUsecPerFrame))
        .toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames"), col("duration_ms"), col("byte_sum"))
        .orderBy("doc_id")
    }),

    // ---------------------------------------------------------------- x124
    // REAL container frame sampling, oracle-gated — x25's byte-exact
    // hex discipline applied to the AVI walker instead of the fixed-
    // stride stub: every 2nd movi chunk of each synthetic container,
    // compared as hex strings against the text slices the muxer framed.
    // Proves the sampler returns the exact chunk payloads (offsets,
    // lengths, pad-byte exclusion) — the property the MJPEG chain into
    // decodeImages rests on.
    "x124_avi_frames" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.sampleAviFrames(s,
          Multimodal.asAviTable(s, t.documents, VideoW, VideoH,
            AviFrameLen, AviMaxFrames, AviUsecPerFrame), FrameStride)
        .toDF()
        .select(col("doc_id"), col("frame_index"),
          upper(hex(col("frame_bytes"))).as("frame_hex"))
        .orderBy("doc_id", "frame_index")
    }),

    // ---------------------------------------------------------------- x134
    // REAL compressed-audio codec, oracle-gated: each document's utf-8
    // bytes become a deterministic 16-bit waveform, ENCODED to real FLAC
    // (fixed/LPC predictors + rice residuals + CRC-8/CRC-16/MD5) and
    // decoded by the from-scratch strict decoder — lossless, so the
    // exact integer sample sum replays in DuckDB as byte arithmetic over
    // encode(text). A wrong rice polarity, predictor sign, warmup
    // offset, or frame boundary anywhere flips the sum; a CRC/framing
    // slip quarantines the row and fails the row-count match.
    "x134_flac_roundtrip" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.decodeFlac(s,
          Multimodal.asFlacTable(s, t.documents, FlacBlock, FlacMaxSamples,
            FlacRate))
        .toDF()
        .select(col("doc_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("bits_per_sample").cast("long").as("bits_per_sample"),
          col("n_frames"), col("n_samples"), col("sample_sum"))
        .orderBy("doc_id")
    }),

    // ---------------------------------------------------------------- x137
    // STEREO mid/side FLAC, oracle-gated: x134's discipline with the
    // decorrelation path load-bearing — left/right channels from
    // even/odd text bytes, mid = (l+r)>>1 with the carried low bit,
    // side = l−r at bps+1 — so a reconstruction slip in either channel
    // or a side-channel width error flips the total sample sum.
    "x137_flac_stereo" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.decodeFlac(s,
          Multimodal.asFlacStereoTable(s, t.documents, FlacBlock,
            FlacStereoMaxPerCh, FlacRate))
        .toDF()
        .select(col("doc_id"),
          col("channels").cast("long").as("channels"),
          col("n_frames"), col("n_samples"), col("sample_sum"))
        .orderBy("doc_id")
    }),

    // ---------------------------------------------------------------- x135
    // REAL MPEG-audio framing, oracle-gated: each document becomes a
    // protected constant-rate MP3 stream (real ID3v2/v1 tags bracketing
    // frames whose content bytes are consecutive text slices), and the
    // strict walker — sync re-verified at every computed offset, frame
    // CRC-16 actually checked over header+side-info, slot-arithmetic
    // lengths — extracts codec facts, duration, and the exact content
    // byte sum, replayed in DuckDB as byte arithmetic over encode(text).
    // A wrong frame-length formula, CRC coverage, or tag skip flips a
    // fact; full PCM synthesis stays the declared stub.
    "x135_mp3_framing" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.demuxMp3(s,
          Multimodal.asMp3Table(s, t.documents, Mp3Bitrate, Mp3Rate,
            Mp3MaxFrames, Mp3Id3Body))
        .toDF()
        .select(col("doc_id"),
          col("version").cast("long").as("version"),
          col("layer").cast("long").as("layer"),
          col("bitrate_kbps").cast("long").as("bitrate_kbps"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_frames"), col("duration_ms"), col("byte_sum"))
        .orderBy("doc_id")
    }),

    // ---------------------------------------------------------------- x136
    // REAL H.264 Annex-B triage, oracle-gated: each document becomes a
    // valid baseline stream (hand-built SPS/PPS via Exp-Golomb writers,
    // IDR slice NALs whose payloads are consecutive text slices run
    // through EMULATION PREVENTION), and the strict walker — start-code
    // framing, forbidden bits, field-for-field SPS parse recovering the
    // true pixel dimensions, de-escape with illegal-run detection —
    // replays profile/level/width/height/NAL counts and the de-escaped
    // slice byte sum as byte arithmetic over encode(text). A de-escape
    // slip on a text byte run like 00 00 01 flips the sum; macroblock
    // decode stays the declared stub.
    "x136_h264_nalu" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.demuxH264(s,
          Multimodal.asH264Table(s, t.documents, H264W, H264H,
            H264ChunkLen, H264MaxChunks))
        .toDF()
        .select(col("doc_id"),
          col("profile_idc").cast("long").as("profile_idc"),
          col("level_idc").cast("long").as("level_idc"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_nalus"), col("n_idr"), col("slice_byte_sum"))
        .orderBy("doc_id")
    }),

    // ---------------------------------------------------------------- pl21
    // MEDIA TRIAGE FUNNEL: the compressed-media tier composed the way a
    // crawl actually presents it — UNLABELED mixed blobs. Documents
    // become FLAC / MP3 / H.264 payloads by doc_id class, a slice is
    // deterministically corrupted in transit (first byte XOR — every
    // codec's magic lives there), the magic-byte sniffer classifies
    // WITHOUT trusting any carried type tag, each class dispatches to
    // its strict decoder, and one report aggregates per sniffed kind:
    // row count, decoded count, and the codec's headline integer fact
    // (FLAC sample sum / MP3 content-byte sum / H.264 de-escaped slice
    // sum) — all replayed in DuckDB as byte arithmetic over
    // encode(text), with corrupted rows pinned to the `unknown` bucket.
    // Every stage is scan-local; the only exchange is the final 4-group
    // aggregation.
    "pl21_media_triage" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val mixed = Multimodal
        .asFlacTable(s, docs.filter(col("doc_id") % 3 === 0),
          FlacBlock, FlacMaxSamples, FlacRate)
        .unionByName(Multimodal.asMp3Table(s,
          docs.filter(col("doc_id") % 3 === 1),
          Mp3Bitrate, Mp3Rate, Mp3MaxFrames, Mp3Id3Body))
        .unionByName(Multimodal.asH264Table(s,
          docs.filter(col("doc_id") % 3 === 2),
          H264W, H264H, H264ChunkLen, H264MaxChunks))
      val sniffed = Multimodal.sniffMedia(s,
        Multimodal.corruptFirstByte(s, mixed, _ % 37 == 0).toDF()).toDF()
      def branch(kind: String, decode: DataFrame => DataFrame,
                 fact: Column): DataFrame =
        decode(sniffed.filter(col("media_type") === kind))
          .select(col("doc_id"), lit(kind).as("kind"), col("decoded"),
            coalesce(fact, lit(0L)).as("fact"))
      val rows = branch("flac", df => Multimodal.decodeFlac(s, df).toDF(),
          col("sample_sum"))
        .unionByName(branch("mp3", df => Multimodal.demuxMp3(s, df).toDF(),
          col("byte_sum")))
        .unionByName(branch("h264", df => Multimodal.demuxH264(s, df).toDF(),
          col("slice_byte_sum")))
        .unionByName(sniffed.filter(col("media_type") === "unknown")
          .select(col("doc_id"), lit("unknown").as("kind"),
            lit(false).as("decoded"), lit(0L).as("fact")))
      rows.groupBy("kind")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"),
          sum("fact").as("fact_total"))
        .orderBy("kind")
    }),

    // ---------------------------------------------------------------- pl22
    // BINARY CRAWL INGEST, end to end: pl21's mixed media blobs travel
    // through the REAL archive layer — each blob becomes a WARC
    // `resource` record (raw binary block, identity in WARC-Record-ID)
    // in its own gzip member, a slice of archives is corrupted in
    // transit (gzip magic byte), the strict member walk + record parse
    // recovers the surviving payloads BYTE-TRANSPARENTLY, and the
    // sniff→decode triage runs on what came back. The `_total` row pins
    // the quarantine accounting (shipped vs recovered); the per-kind
    // facts equal pl21's arithmetic minus the corrupted class — so a
    // single flipped bit anywhere in the archive→recover→decode chain
    // moves a number. Scan-local except the final aggregation.
    "pl22_crawl_media_triage" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val mixed = Multimodal
        .asFlacTable(s, docs.filter(col("doc_id") % 3 === 0),
          FlacBlock, FlacMaxSamples, FlacRate)
        .unionByName(Multimodal.asMp3Table(s,
          docs.filter(col("doc_id") % 3 === 1),
          Mp3Bitrate, Mp3Rate, Mp3MaxFrames, Mp3Id3Body))
        .unionByName(Multimodal.asH264Table(s,
          docs.filter(col("doc_id") % 3 === 2),
          H264W, H264H, H264ChunkLen, H264MaxChunks))
      val shipped = Multimodal.mediaToWarc(s, mixed).toDF()
      val recovered = Multimodal.recoverWarcMedia(s,
        Multimodal.corruptFirstByte(s, shipped, _ % 37 == 0).toDF()).toDF()
      val sniffed = Multimodal.sniffMedia(s, recovered).toDF()
      def branch(kind: String, decode: DataFrame => DataFrame,
                 fact: Column): DataFrame =
        decode(sniffed.filter(col("media_type") === kind))
          .select(col("doc_id"), lit(kind).as("kind"), col("decoded"),
            coalesce(fact, lit(0L)).as("fact"))
      val kinds = branch("flac", df => Multimodal.decodeFlac(s, df).toDF(),
          col("sample_sum"))
        .unionByName(branch("mp3", df => Multimodal.demuxMp3(s, df).toDF(),
          col("byte_sum")))
        .unionByName(branch("h264", df => Multimodal.demuxH264(s, df).toDF(),
          col("slice_byte_sum")))
        .groupBy("kind")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"),
          sum("fact").as("fact_total"))
      val total = shipped.agg(count(lit(1)).as("n_docs"))
        .crossJoin(recovered.agg(count(lit(1)).as("n_decoded")))
        .select(lit("_total").as("kind"), col("n_docs"), col("n_decoded"),
          lit(0L).as("fact_total"))
      total.unionByName(kinds).orderBy("kind")
    }),

    // ---------------------------------------------------------------- pl17
    // Crawl-ingest pipeline, since round 18 through FULL WARC record
    // framing (x127's layer, not just x125's gzip members): real
    // .warc.gz payloads (warcinfo + per-chunk HTTP response records,
    // one gzip member each) → strict member walk + record parse + HTTP
    // envelope split → response bodies concatenated back to text → the
    // curation ladder (x2 quality gate, x0 exact dedup with canonical
    // keepers) → one funnel report. The recovery is oracle-invisible by
    // construction (parse ∘ mux = id), so the DuckDB replay runs the
    // ladder straight on documents — a wrong member walk, a dropped or
    // misframed record, or a mis-split envelope anywhere surfaces as a
    // funnel-count or token-mass mismatch. Every stage is scan-local or
    // keyed aggregation; the demux runs inside the scan partition (no
    // exchange added to the 100 TB read path).
    "pl17_warc_ingest" -> ((s, dir) => {
      val t = Tables(s, dir)
      val recovered = Multimodal.recoverWarcResponseText(s,
        Multimodal.asWarcRecordsTable(s, t.documents, WarcChunkLen)).toDF()
      val q = graft.operators.TextOps.qualityMetrics(recovered, "text")
        .select("doc_id", "n_tokens", "quality_ok")
      val fp = recovered.select(col("doc_id"),
        graft.operators.TextOps.fingerprint(col("text")).as("fp"))
      val per = q.join(fp, "doc_id")
      val qual = per.filter(col("quality_ok"))
      val keep = qual.groupBy("fp")
        .agg(min_by(col("n_tokens"), col("doc_id")).as("kt"))
      recovered.agg(count(lit(1)).as("n_recovered"),
          sum(length(col("text")).cast("long")).as("n_chars"))
        .crossJoin(broadcast(
          qual.agg(count(lit(1)).as("n_quality"))))
        .crossJoin(broadcast(
          keep.agg(count(lit(1)).as("n_unique"),
            coalesce(sum("kt"), lit(0L)).as("n_tokens_kept"))))
    }),

    // ---------------------------------------------------------------- x125
    // REAL concatenated-gzip decode (the WARC/CommonCrawl record
    // container — RFC 1952 members, one per record): each document
    // becomes text split into 256-byte records, each its own gzip
    // member; the from-scratch member walker parses every header,
    // raw-inflates through the real zlib codec, VERIFIES each trailer's
    // CRC32+ISIZE, and reports member count, decompressed size, and the
    // content digest — which by construction replay in DuckDB as byte
    // arithmetic and sha256(text), so the whole decode chain is
    // oracle-checked without a SQL DEFLATE. The quarantine/corruption
    // half is spec-gated (constructed corrupt members).
    "x125_warc_gzip" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.decodeGzipMembers(s,
          Multimodal.asWarcTable(s, t.documents, WarcChunkLen))
        .toDF()
        .select(col("doc_id"), col("n_members"), col("total_bytes"),
          col("content_sha256"))
        .orderBy("doc_id")
    }),

    // ---------------------------------------------------------------- x127
    // WARC RECORD framing over the gzip member walk (round-17 verdict
    // #6 — x125 stops at the member layer; real CommonCrawl ingestion
    // parses WARC headers and the HTTP envelope to reach the payload):
    // real .warc.gz bytes (warcinfo + response records, one member
    // each), strictly parsed — version line pinned, mandatory headers
    // required, Content-Length framing exact, record trailer required,
    // HTTP status/headers/body split — and replayed as pure byte/string
    // arithmetic over documents: record ids, target URIs, envelope
    // lengths (78 + digits(len) + len), and per-record payload sha256
    // over the exact byte slice. Malformed payloads quarantine loudly
    // (spec-gated with constructed corruption).
    "x127_warc_records" -> ((s, dir) => {
      val t = Tables(s, dir)
      Multimodal.parseWarcRecords(s,
          Multimodal.asWarcRecordsTable(s, t.documents, WarcChunkLen))
        .toDF()
        .select(col("doc_id"), col("rec_index"), col("warc_type"),
          col("record_id"), col("target_uri"), col("content_length"),
          col("http_status"), col("payload_len"), col("payload_sha256"))
        .orderBy("doc_id", "rec_index")
    }),

    // ---------------------------------------------------------------- pl19
    // The FLAGSHIP crawl-to-corpus funnel — the engine end to end on the
    // CommonCrawl shape: real multi-document .warc.gz FILES (s23's mux)
    // → binaryFile scan → strict record demux + per-document text
    // recovery keyed by the record ids (never file position) → quality
    // gate (x2) → exact dedup with canonical keepers (x0/x69) → shard-
    // local token-budget packing (x24) → manifest-committed export
    // (s20), replay-proof. Funnel stages pin every leg's row and token
    // conservation; the oracle replays the ladder straight on documents
    // (recovery is identity by construction) plus the pack arithmetic
    // and the export counts.
    "pl19_crawl_to_shards" -> ((s, dir) => {
      val t = Tables(s, dir)
      val files = SinkQueries.sinkDir("pl19_warc_files")
      val export = SinkQueries.sinkDir("pl19_export")
      SinkQueries.clean(files); SinkQueries.clean(export)
      Multimodal.writeWarcFiles(
        Multimodal.asWarcRecordsTable(s, t.documents, WarcChunkLen), files)
      val recovered = graft.GraftCache.persist(
        Multimodal.recoverWarcDocs(s, Multimodal.readWarcFiles(s, files))
          .toDF())
      val q = graft.operators.TextOps.qualityMetrics(recovered, "text")
        .select("doc_id", "n_tokens", "quality_ok")
      val fp = recovered.select(col("doc_id"),
        graft.operators.TextOps.fingerprint(col("text")).as("fp"))
      val qual = graft.GraftCache.persist(
        q.join(fp, "doc_id").filter(col("quality_ok")))
      val kept = graft.GraftCache.persist(qual.groupBy("fp")
        .agg(min(col("doc_id")).as("doc_id"),
          min_by(col("n_tokens"), col("doc_id")).as("n_tokens"))
        .drop("fp"))
      val packed = graft.operators.Curation.packSequences(kept, "doc_id",
        "n_tokens", CurationQueries.PackBudget, CurationQueries.PackShards)
      graft.sinks.LayoutSink.appendExactlyOnceManifest(packed, export, 0L)
      // replayed nightly job: the same batch id must short-circuit
      val replayed = graft.sinks.LayoutSink.appendExactlyOnceManifest(
        packed, export, 0L)
      val back = graft.sinks.LayoutSink.readManifested(s, export)
      import s.implicits._
      Seq(
        ("1_recovered", recovered.count()),
        ("2_chars",
          recovered.agg(sum(length(col("text")).cast("long")))
            .head.getLong(0)),
        ("3_quality", qual.count()),
        ("4_unique", kept.count()),
        ("5_kept_tokens", kept.agg(coalesce(sum("n_tokens"), lit(0L)))
          .head.getLong(0)),
        ("6_bins", packed.select("shard", "bin").distinct().count()),
        ("7_export", back.count()),
        ("8_export_tokens", back.agg(coalesce(sum("n_tokens"), lit(0L)))
          .head.getLong(0)),
        ("9_replay_noop", if (replayed) 0L else 1L)
      ).toDF("stage", "n").orderBy("stage")
    }),

    // ----------------------------------------------------------------- s23
    // The FILE-based crawl ingestion seam: real multi-document `.warc.gz`
    // FILES, one per partition (the CommonCrawl layout — identity lives
    // in the RECORDS, files are opaque bulk containers; per-document
    // files measured 46s/5k docs in create/close overhead), written
    // distributed, scanned back with Spark's binaryFile source
    // (whole-file rows, glob filter), demuxed through the x127 record
    // parser, and re-keyed from the parsed WARC-Record-IDs. Shares
    // x127's oracle verbatim: the file-system round trip must be
    // result-invisible.
    "s23_warc_file_scan" -> ((s, dir) => {
      val t = Tables(s, dir)
      val files = SinkQueries.sinkDir("s23_warc_files")
      SinkQueries.clean(files)
      Multimodal.writeWarcFiles(
        Multimodal.asWarcRecordsTable(s, t.documents, WarcChunkLen), files)
      Multimodal.parseWarcRecords(s, Multimodal.readWarcFiles(s, files))
        .toDF()
        .select(
          regexp_extract(col("record_id"), "urn:graft:([0-9]+):", 1)
            .cast("long").as("doc_id"),
          when(col("record_id").endsWith(":info>"), lit(0L))
            .otherwise(regexp_extract(col("record_id"), ":([0-9]+)>$", 1)
              .cast("long") + 1).as("rec_index"),
          col("warc_type"), col("record_id"), col("target_uri"),
          col("content_length"), col("http_status"), col("payload_len"),
          col("payload_sha256"))
        .orderBy("doc_id", "rec_index")
    })
  )

  def oracles: Map[String, String] = Map(
    // FakeDecoder features over utf-8 payload bytes: octet_length(encode(..))
    // = payload.length, sha256 hex matches the %02x-formatted digest,
    // fake_width = bytes % 640 (the stand-in for decoded width).
    "x10_media_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
        |  sha256(text) AS payload_sha256, lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Byte slicing replayed over hex(payload): 2 hex chars per byte, so
    // frame i covers hex chars [i·2F+1, 2F] (F = frame bytes). DuckDB 1.0
    // has no BLOB substring, hex round-trips exactly.
    "x25_frame_sample" ->
      s"""WITH m AS (SELECT doc_id, hex(encode(text)) AS ph FROM documents),
         |f AS (
         |  SELECT doc_id, u.i AS frame_index,
         |    upper(substring(ph, (u.i * ${2 * FrameBytes} + 1)::BIGINT, ${2 * FrameBytes})) AS fh
         |  FROM m, UNNEST(range(0, CASE WHEN length(ph) = 0 THEN 0
         |    ELSE ((length(ph) - 1) // ${2 * FrameBytes}) + 1 END)) u(i)
         |  WHERE u.i % $FrameStride = 0)
         |SELECT doc_id, frame_index,
         |  CAST(length(fh) // 2 AS BIGINT) AS frame_len, fh AS frame_hex
         |FROM f ORDER BY doc_id, frame_index""".stripMargin,
    "x26_media_resize" ->
      s"""SELECT doc_id, CAST($ResizeW AS BIGINT) AS width,
         |  CAST($ResizeH AS BIGINT) AS height,
         |  CAST(length(ph) // 2 AS BIGINT) AS out_bytes,
         |  upper(ph) AS payload_hex
         |FROM (SELECT doc_id,
         |  substring(hex(encode(text)), 1, ${2 * ResizeW * ResizeH}) AS ph
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,
    // The demuxer's frame segmentation and Y-plane sum replayed as byte
    // arithmetic: k = min(4, bytes//192) complete frames; frame i's Y
    // plane is text bytes [i*192, i*192+128) (chroma fills the rest);
    // each byte recovered from 2 hex chars via strpos on the hex
    // alphabet. Docs too short for one frame are valid header-only
    // streams: 0 frames, 0 sum.
    "x96_video_demux" ->
      s"""WITH m AS (
         |  SELECT doc_id, upper(hex(encode(text))) AS ph,
         |    least($VideoMaxFrames,
         |          octet_length(encode(text)) // $VideoFrameData) AS k
         |  FROM documents),
         |b AS (
         |  SELECT m.doc_id,
         |    (strpos('0123456789ABCDEF',
         |       substring(ph, (u.i * $VideoFrameData + v.j) * 2 + 1, 1)) - 1) * 16
         |    + (strpos('0123456789ABCDEF',
         |       substring(ph, (u.i * $VideoFrameData + v.j) * 2 + 2, 1)) - 1) AS bv
         |  FROM m, UNNEST(range(0, m.k)) u(i), UNNEST(range(0, $VideoYBytes)) v(j)),
         |s AS (SELECT doc_id, CAST(sum(bv) AS BIGINT) AS ys FROM b GROUP BY doc_id)
         |SELECT m.doc_id,
         |  CAST($VideoW AS BIGINT) AS width, CAST($VideoH AS BIGINT) AS height,
         |  CAST(25 AS BIGINT) AS fps_num, CAST(1 AS BIGINT) AS fps_den,
         |  CAST(m.k AS BIGINT) AS n_frames,
         |  CAST(m.k * 40 AS BIGINT) AS duration_ms,
         |  COALESCE(s.ys, 0) AS y_sum
         |FROM m LEFT JOIN s USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // The AVI walker's segmentation and byte sum replayed as arithmetic:
    // k = min(4, bytes//192) frame chunks, whose payloads are exactly
    // the first k·192 text bytes — so byte_sum is the hex-recovered sum
    // over that prefix; duration = k·40 ms at 40 000 µs/frame.
    "x123_avi_demux" ->
      s"""WITH m AS (
         |  SELECT doc_id, upper(hex(encode(text))) AS ph,
         |    least($AviMaxFrames,
         |          octet_length(encode(text)) // $AviFrameLen) AS k
         |  FROM documents),
         |b AS (
         |  SELECT m.doc_id,
         |    (strpos('0123456789ABCDEF',
         |       substring(ph, v.j * 2 + 1, 1)) - 1) * 16
         |    + (strpos('0123456789ABCDEF',
         |       substring(ph, v.j * 2 + 2, 1)) - 1) AS bv
         |  FROM m, UNNEST(range(0, m.k * $AviFrameLen)) v(j)),
         |s AS (SELECT doc_id, CAST(sum(bv) AS BIGINT) AS bs FROM b GROUP BY doc_id)
         |SELECT m.doc_id,
         |  CAST($VideoW AS BIGINT) AS width, CAST($VideoH AS BIGINT) AS height,
         |  CAST(m.k AS BIGINT) AS n_frames,
         |  CAST(m.k * ${AviUsecPerFrame / 1000} AS BIGINT) AS duration_ms,
         |  COALESCE(s.bs, 0) AS byte_sum
         |FROM m LEFT JOIN s USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // The sampler's chunks replayed as hex slices: frame i of the
    // synthetic container is text bytes [i·192, (i+1)·192) — 2 hex chars
    // per byte; only COMPLETE frames were framed (k = min(4, bytes//192))
    // and every 2nd is kept. Byte-exact: a pad byte leaking into a
    // payload or an off-by-one chunk offset flips the hex.
    "x124_avi_frames" ->
      s"""WITH m AS (
         |  SELECT doc_id, upper(hex(encode(text))) AS ph,
         |    least($AviMaxFrames,
         |          octet_length(encode(text)) // $AviFrameLen) AS k
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, u.i AS frame_index,
         |    substring(ph, (u.i * ${2 * AviFrameLen})::BIGINT + 1,
         |      ${2 * AviFrameLen}) AS frame_hex
         |  FROM m, UNNEST(range(0, m.k)) u(i)
         |  WHERE u.i % $FrameStride = 0)
         |SELECT doc_id, frame_index, frame_hex
         |FROM f ORDER BY doc_id, frame_index""".stripMargin,
    // The FLAC roundtrip replayed as byte arithmetic: sample j of doc d
    // is (byte_j − 80)·129 over the first k = min(600, bytes) text
    // bytes; the codec is lossless, so the decoder's sample sum must
    // equal the synthesizer's arithmetic exactly — through the rice
    // coding, predictors, and frame segmentation. n_frames is the
    // fixed-block count ceil(k/192) including the short last frame.
    "x134_flac_roundtrip" ->
      s"""WITH m AS (
         |  SELECT doc_id, upper(hex(encode(text))) AS ph,
         |    least($FlacMaxSamples, octet_length(encode(text))) AS k
         |  FROM documents),
         |b AS (
         |  SELECT m.doc_id,
         |    (((strpos('0123456789ABCDEF',
         |         substring(ph, v.j * 2 + 1, 1)) - 1) * 16
         |      + (strpos('0123456789ABCDEF',
         |         substring(ph, v.j * 2 + 2, 1)) - 1)) - 80) * 129 AS sv
         |  FROM m, UNNEST(range(0, m.k)) v(j)),
         |s AS (SELECT doc_id, CAST(sum(sv) AS BIGINT) AS ss FROM b GROUP BY doc_id)
         |SELECT m.doc_id,
         |  CAST($FlacRate AS BIGINT) AS sample_rate,
         |  CAST(1 AS BIGINT) AS channels,
         |  CAST(16 AS BIGINT) AS bits_per_sample,
         |  CAST((m.k + ${FlacBlock - 1}) // $FlacBlock AS BIGINT) AS n_frames,
         |  CAST(m.k AS BIGINT) AS n_samples,
         |  COALESCE(s.ss, 0) AS sample_sum
         |FROM m LEFT JOIN s USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // x137: sum(left)+sum(right) = the transform summed over the first
    // 2·k text bytes (k samples per channel); frames count per channel.
    "x137_flac_stereo" ->
      s"""WITH m AS (
         |  SELECT doc_id, upper(hex(encode(text))) AS ph,
         |    least($FlacStereoMaxPerCh, octet_length(encode(text)) // 2) AS k
         |  FROM documents),
         |b AS (
         |  SELECT m.doc_id,
         |    (((strpos('0123456789ABCDEF',
         |         substring(ph, v.j * 2 + 1, 1)) - 1) * 16
         |      + (strpos('0123456789ABCDEF',
         |         substring(ph, v.j * 2 + 2, 1)) - 1)) - 80) * 129 AS sv
         |  FROM m, UNNEST(range(0, m.k * 2)) v(j)),
         |s AS (SELECT doc_id, CAST(sum(sv) AS BIGINT) AS ss FROM b GROUP BY doc_id)
         |SELECT m.doc_id,
         |  CAST(2 AS BIGINT) AS channels,
         |  CAST((m.k + ${FlacBlock - 1}) // $FlacBlock AS BIGINT) AS n_frames,
         |  CAST(m.k AS BIGINT) AS n_samples,
         |  COALESCE(s.ss, 0) AS sample_sum
         |FROM m LEFT JOIN s USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // The MP3 walker's facts replayed as byte arithmetic: k =
    // min(4, bytes//411) frames whose content is the first k·411 text
    // bytes; duration = k·1152 samples at 44100 Hz in integer ms;
    // header facts are NULL for tags-only streams (k = 0).
    "x135_mp3_framing" ->
      s"""WITH m AS (
         |  SELECT doc_id, upper(hex(encode(text))) AS ph,
         |    least($Mp3MaxFrames,
         |          octet_length(encode(text)) // $Mp3ChunkLen) AS k
         |  FROM documents),
         |b AS (
         |  SELECT m.doc_id,
         |    (strpos('0123456789ABCDEF',
         |       substring(ph, v.j * 2 + 1, 1)) - 1) * 16
         |    + (strpos('0123456789ABCDEF',
         |       substring(ph, v.j * 2 + 2, 1)) - 1) AS bv
         |  FROM m, UNNEST(range(0, m.k * $Mp3ChunkLen)) v(j)),
         |s AS (SELECT doc_id, CAST(sum(bv) AS BIGINT) AS bs FROM b GROUP BY doc_id)
         |SELECT m.doc_id,
         |  CASE WHEN m.k > 0 THEN CAST(1 AS BIGINT) END AS version,
         |  CASE WHEN m.k > 0 THEN CAST(3 AS BIGINT) END AS layer,
         |  CASE WHEN m.k > 0 THEN CAST($Mp3Bitrate AS BIGINT) END AS bitrate_kbps,
         |  CASE WHEN m.k > 0 THEN CAST($Mp3Rate AS BIGINT) END AS sample_rate,
         |  CAST(m.k AS BIGINT) AS n_frames,
         |  CAST(m.k * ${1152 * 1000} // $Mp3Rate AS BIGINT) AS duration_ms,
         |  COALESCE(s.bs, 0) AS byte_sum
         |FROM m LEFT JOIN s USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // The H.264 walk replayed as byte arithmetic: k = min(4, bytes//300)
    // IDR slices whose DE-ESCAPED RBSPs are exactly the first k·300
    // text bytes plus one rbsp_trailing_bits byte (0x80) each
    // (escape ∘ unescape = id); NALs = SPS + PPS + k. Every doc's
    // stream carries the same 320×192 baseline SPS.
    "x136_h264_nalu" ->
      s"""WITH m AS (
         |  SELECT doc_id, upper(hex(encode(text))) AS ph,
         |    least($H264MaxChunks,
         |          octet_length(encode(text)) // $H264ChunkLen) AS k
         |  FROM documents),
         |b AS (
         |  SELECT m.doc_id,
         |    (strpos('0123456789ABCDEF',
         |       substring(ph, v.j * 2 + 1, 1)) - 1) * 16
         |    + (strpos('0123456789ABCDEF',
         |       substring(ph, v.j * 2 + 2, 1)) - 1) AS bv
         |  FROM m, UNNEST(range(0, m.k * $H264ChunkLen)) v(j)),
         |s AS (SELECT doc_id, CAST(sum(bv) AS BIGINT) AS bs FROM b GROUP BY doc_id)
         |SELECT m.doc_id,
         |  CAST(66 AS BIGINT) AS profile_idc,
         |  CAST(30 AS BIGINT) AS level_idc,
         |  CAST($H264W AS BIGINT) AS width,
         |  CAST($H264H AS BIGINT) AS height,
         |  CAST(m.k + 2 AS BIGINT) AS n_nalus,
         |  CAST(m.k AS BIGINT) AS n_idr,
         |  COALESCE(s.bs, 0) + m.k * 128 AS slice_byte_sum
         |FROM m LEFT JOIN s USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // pl21: the funnel replayed per doc_id class — corruption routes a
    // doc to 'unknown' regardless of its class; each kind's fact total
    // is the class's byte arithmetic (flac transform, raw mp3 content
    // bytes, h264 content + one 0x80 trailing-bits byte per slice).
    "pl21_media_triage" -> {
      def byteAt(j: String) =
        s"""((strpos('0123456789ABCDEF', substring(ph, ($j) * 2 + 1, 1)) - 1) * 16
           | + (strpos('0123456789ABCDEF', substring(ph, ($j) * 2 + 2, 1)) - 1))""".stripMargin
      s"""WITH cls AS MATERIALIZED (
         |  SELECT doc_id, upper(hex(encode(text))) AS ph,
         |    octet_length(encode(text)) AS len,
         |    CASE WHEN doc_id % 37 = 0 THEN 'unknown'
         |         WHEN doc_id % 3 = 0 THEN 'flac'
         |         WHEN doc_id % 3 = 1 THEN 'mp3' ELSE 'h264' END AS kind
         |  FROM documents)
         |SELECT kind, n_docs, n_decoded, fact_total FROM (
         |  SELECT 'flac' AS kind,
         |    (SELECT count(*) FROM cls WHERE kind = 'flac') AS n_docs,
         |    (SELECT count(*) FROM cls WHERE kind = 'flac') AS n_decoded,
         |    COALESCE((SELECT CAST(sum((${byteAt("u.j")} - 80) * 129) AS BIGINT)
         |      FROM cls c, UNNEST(range(0, least($FlacMaxSamples, c.len))) u(j)
         |      WHERE c.kind = 'flac'), 0) AS fact_total
         |  UNION ALL
         |  SELECT 'mp3',
         |    (SELECT count(*) FROM cls WHERE kind = 'mp3'),
         |    (SELECT count(*) FROM cls WHERE kind = 'mp3'),
         |    COALESCE((SELECT CAST(sum(${byteAt("u.j")}) AS BIGINT)
         |      FROM cls c,
         |        UNNEST(range(0, least($Mp3MaxFrames, c.len // $Mp3ChunkLen)
         |          * $Mp3ChunkLen)) u(j)
         |      WHERE c.kind = 'mp3'), 0)
         |  UNION ALL
         |  SELECT 'h264',
         |    (SELECT count(*) FROM cls WHERE kind = 'h264'),
         |    (SELECT count(*) FROM cls WHERE kind = 'h264'),
         |    COALESCE((SELECT CAST(sum(${byteAt("u.j")}) AS BIGINT)
         |      FROM cls c,
         |        UNNEST(range(0, least($H264MaxChunks, c.len // $H264ChunkLen)
         |          * $H264ChunkLen)) u(j)
         |      WHERE c.kind = 'h264'), 0)
         |    + COALESCE((SELECT CAST(sum(
         |        least($H264MaxChunks, len // $H264ChunkLen) * 128) AS BIGINT)
         |      FROM cls WHERE kind = 'h264'), 0)
         |  UNION ALL
         |  SELECT 'unknown',
         |    (SELECT count(*) FROM cls WHERE kind = 'unknown'),
         |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |) ORDER BY kind""".stripMargin
    },
    // pl22: archive ∘ recover = id on the survivors, so each kind's
    // facts are pl21's arithmetic restricted to doc_id % 37 <> 0; the
    // _total row is shipped (all docs) vs recovered (survivors).
    "pl22_crawl_media_triage" -> {
      def byteAt(j: String) =
        s"""((strpos('0123456789ABCDEF', substring(ph, ($j) * 2 + 1, 1)) - 1) * 16
           | + (strpos('0123456789ABCDEF', substring(ph, ($j) * 2 + 2, 1)) - 1))""".stripMargin
      s"""WITH cls AS MATERIALIZED (
         |  SELECT doc_id, upper(hex(encode(text))) AS ph,
         |    octet_length(encode(text)) AS len,
         |    CASE WHEN doc_id % 3 = 0 THEN 'flac'
         |         WHEN doc_id % 3 = 1 THEN 'mp3' ELSE 'h264' END AS kind
         |  FROM documents WHERE doc_id % 37 <> 0)
         |SELECT kind, n_docs, n_decoded, fact_total FROM (
         |  SELECT '_total' AS kind,
         |    (SELECT count(*) FROM documents) AS n_docs,
         |    (SELECT count(*) FROM cls) AS n_decoded,
         |    CAST(0 AS BIGINT) AS fact_total
         |  UNION ALL
         |  SELECT 'flac',
         |    (SELECT count(*) FROM cls WHERE kind = 'flac'),
         |    (SELECT count(*) FROM cls WHERE kind = 'flac'),
         |    COALESCE((SELECT CAST(sum((${byteAt("u.j")} - 80) * 129) AS BIGINT)
         |      FROM cls c, UNNEST(range(0, least($FlacMaxSamples, c.len))) u(j)
         |      WHERE c.kind = 'flac'), 0)
         |  UNION ALL
         |  SELECT 'mp3',
         |    (SELECT count(*) FROM cls WHERE kind = 'mp3'),
         |    (SELECT count(*) FROM cls WHERE kind = 'mp3'),
         |    COALESCE((SELECT CAST(sum(${byteAt("u.j")}) AS BIGINT)
         |      FROM cls c,
         |        UNNEST(range(0, least($Mp3MaxFrames, c.len // $Mp3ChunkLen)
         |          * $Mp3ChunkLen)) u(j)
         |      WHERE c.kind = 'mp3'), 0)
         |  UNION ALL
         |  SELECT 'h264',
         |    (SELECT count(*) FROM cls WHERE kind = 'h264'),
         |    (SELECT count(*) FROM cls WHERE kind = 'h264'),
         |    COALESCE((SELECT CAST(sum(${byteAt("u.j")}) AS BIGINT)
         |      FROM cls c,
         |        UNNEST(range(0, least($H264MaxChunks, c.len // $H264ChunkLen)
         |          * $H264ChunkLen)) u(j)
         |      WHERE c.kind = 'h264'), 0)
         |    + COALESCE((SELECT CAST(sum(
         |        least($H264MaxChunks, len // $H264ChunkLen) * 128) AS BIGINT)
         |      FROM cls WHERE kind = 'h264'), 0)
         |) ORDER BY kind""".stripMargin
    },
    // pl17: inflate ∘ mux = identity, so the ladder replays straight on
    // documents — x2's quality image, x1's fingerprint, arg_min keepers.
    "pl17_warc_ingest" ->
      s"""WITH toked AS (
         |  SELECT doc_id, text, ${TextQueries.toksSql} AS toks FROM documents),
         |qm AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    ${TextQueries.punctRatioSql("text")} AS punct_ratio,
         |    ${TextQueries.stopRatioSql("toks")} AS stopword_ratio
         |  FROM toked),
         |q AS (
         |  SELECT doc_id, n_tokens,
         |    ${TextQueries.qualityOkSql("n_tokens", "punct_ratio", "stopword_ratio")}
         |      AS quality_ok
         |  FROM qm),
         |f AS (
         |  SELECT doc_id,
         |    sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |qual AS (
         |  SELECT q.doc_id, q.n_tokens, f.fp
         |  FROM q JOIN f USING (doc_id) WHERE q.quality_ok),
         |keep AS (SELECT fp, arg_min(n_tokens, doc_id) AS kt
         |  FROM qual GROUP BY 1)
         |SELECT
         |  (SELECT count(*) FROM documents) AS n_recovered,
         |  (SELECT CAST(sum(length(text)) AS BIGINT) FROM documents) AS n_chars,
         |  (SELECT count(*) FROM qual) AS n_quality,
         |  (SELECT count(*) FROM keep) AS n_unique,
         |  (SELECT coalesce(CAST(sum(kt) AS BIGINT), 0) FROM keep)
         |    AS n_tokens_kept""".stripMargin,
    // The gzip member walk replayed arithmetically: ceil(bytes/256)
    // members, total = the byte length, content = the text itself (the
    // decode is verified by the digest — a wrong inflate anywhere
    // changes the sha).
    "x125_warc_gzip" ->
      s"""SELECT doc_id,
         |  CAST((octet_length(encode(text)) + ${WarcChunkLen - 1})
         |    // $WarcChunkLen AS BIGINT) AS n_members,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes,
         |  sha256(text) AS content_sha256
         |FROM documents ORDER BY doc_id""".stripMargin,
    // x127: the whole record-framing chain replayed arithmetically —
    // one warcinfo (block = "software: graft\r\n", 17 bytes) + one
    // response per 256-byte slice; the response's Content-Length is the
    // HTTP envelope (fixed 78 header bytes + the Content-Length value's
    // digits + the body), and the payload digest is sha256 over the
    // exact byte slice — a misframed record, an off-by-one in the
    // Content-Length consumption, or a wrong envelope split all shift a
    // row here.
    "x127_warc_records" -> warcRecordsSql,
    // s23 is the identical record stream through the file round trip
    "s23_warc_file_scan" -> warcRecordsSql,
    // pl19: recovery is identity, so the ladder replays on documents;
    // the export is exactly-once, so export counts equal the keeper
    // counts; pack arithmetic is x24's.
    "pl19_crawl_to_shards" ->
      s"""WITH toked AS (
         |  SELECT doc_id, text, ${TextQueries.toksSql} AS toks FROM documents),
         |qm AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    ${TextQueries.punctRatioSql("text")} AS punct_ratio,
         |    ${TextQueries.stopRatioSql("toks")} AS stopword_ratio
         |  FROM toked),
         |q AS (
         |  SELECT doc_id, n_tokens,
         |    ${TextQueries.qualityOkSql(
                 "n_tokens", "punct_ratio", "stopword_ratio")} AS quality_ok
         |  FROM qm),
         |f AS (
         |  SELECT doc_id,
         |    sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |qual AS (
         |  SELECT q.doc_id, q.n_tokens, f.fp
         |  FROM q JOIN f USING (doc_id) WHERE q.quality_ok),
         |keep AS MATERIALIZED (
         |  SELECT min(doc_id) AS doc_id, arg_min(n_tokens, doc_id) AS n_tokens
         |  FROM qual GROUP BY fp),
         |packed AS (
         |  SELECT CAST(h % ${CurationQueries.PackShards} AS INT) AS shard,
         |    doc_id, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY h % ${CurationQueries.PackShards}
         |      ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM (SELECT doc_id, n_tokens,
         |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h
         |    FROM keep)),
         |bins AS (
         |  SELECT DISTINCT shard,
         |    CAST((cum - n_tokens) // ${CurationQueries.PackBudget} AS BIGINT)
         |      AS bin
         |  FROM packed)
         |SELECT stage, n FROM (
         |  SELECT '1_recovered' AS stage, count(*) AS n FROM documents
         |  UNION ALL SELECT '2_chars',
         |    CAST(sum(length(text)) AS BIGINT) FROM documents
         |  UNION ALL SELECT '3_quality', count(*) FROM qual
         |  UNION ALL SELECT '4_unique', count(*) FROM keep
         |  UNION ALL SELECT '5_kept_tokens',
         |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM keep
         |  UNION ALL SELECT '6_bins', count(*) FROM bins
         |  UNION ALL SELECT '7_export', count(*) FROM keep
         |  UNION ALL SELECT '8_export_tokens',
         |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM keep
         |  UNION ALL SELECT '9_replay_noop', CAST(1 AS BIGINT)
         |) ORDER BY stage""".stripMargin,
  )

  private lazy val warcRecordsSql: String =
      s"""WITH m AS (
         |  SELECT doc_id, text, length(text) AS n FROM documents),
         |info AS (
         |  SELECT doc_id, CAST(0 AS BIGINT) AS rec_index,
         |    'warcinfo' AS warc_type,
         |    '<urn:graft:' || doc_id || ':info>' AS record_id,
         |    CAST(NULL AS VARCHAR) AS target_uri,
         |    CAST(17 AS BIGINT) AS content_length,
         |    CAST(NULL AS INT) AS http_status,
         |    CAST(NULL AS BIGINT) AS payload_len,
         |    CAST(NULL AS VARCHAR) AS payload_sha256
         |  FROM m),
         |sl AS (
         |  SELECT doc_id, u.i,
         |    substring(text, CAST(u.i * $WarcChunkLen + 1 AS BIGINT),
         |      $WarcChunkLen) AS s
         |  FROM m, UNNEST(range(0,
         |    (n + ${WarcChunkLen - 1}) // $WarcChunkLen)) u(i)),
         |resp AS (
         |  SELECT doc_id, CAST(i + 1 AS BIGINT) AS rec_index,
         |    'response' AS warc_type,
         |    '<urn:graft:' || doc_id || ':' || i || '>' AS record_id,
         |    'https://example.org/doc/' || doc_id || '/' || i AS target_uri,
         |    CAST(78 + length(CAST(octet_length(encode(s)) AS VARCHAR))
         |      + octet_length(encode(s)) AS BIGINT) AS content_length,
         |    200 AS http_status,
         |    CAST(octet_length(encode(s)) AS BIGINT) AS payload_len,
         |    sha256(s) AS payload_sha256
         |  FROM sl)
         |SELECT * FROM (SELECT * FROM info UNION ALL SELECT * FROM resp)
         |ORDER BY doc_id, rec_index""".stripMargin
}
