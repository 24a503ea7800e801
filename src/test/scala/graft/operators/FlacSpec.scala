package graft.operators

import graft.SparkSpec

/** The from-scratch FLAC codec. Roundtrips alone would let a symmetric
  * wire-format error self-cancel (encoder and decoder share Flac.scala),
  * so this spec also pins KNOWN-ANSWER bytes — streams assembled bit by
  * bit from the spec text with an independent string-of-bits builder and
  * bitwise (non-table) CRCs — in both directions: the encoder must emit
  * exactly those bytes, and the decoder must accept hand-built streams
  * exercising paths the encoder never emits (rice partitions, the 5-bit
  * rice method, wasted bits). */
class FlacSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------ independent assemblers

  /** MSB-first bit-string builder: "1111 1111 1111 10…" → bytes. */
  private final class Bits {
    private val sb = new StringBuilder
    def b(s: String): this.type = { sb ++= s.replace(" ", ""); this }
    def n(v: Long, w: Int): this.type = {
      sb ++= (0 until w).map(i => (v >> (w - 1 - i)) & 1L).mkString; this
    }
    def pad(): this.type = { while (sb.length % 8 != 0) sb += '0'; this }
    def bytes: Array[Byte] = {
      require(sb.length % 8 == 0, s"unaligned ${sb.length}")
      sb.toString.grouped(8).map(g => Integer.parseInt(g, 2).toByte).toArray
    }
  }

  /** Bitwise (non-table) CRC-8 poly 0x07, init 0 — the spec's arithmetic. */
  private def crc8ref(bs: Array[Byte]): Int = bs.foldLeft(0) { (c, x) =>
    var r = c ^ (x & 0xff)
    (0 until 8).foreach { _ => r = if ((r & 0x80) != 0) ((r << 1) ^ 0x07) & 0xff else (r << 1) & 0xff }
    r
  }

  /** Bitwise CRC-16 poly 0x8005, init 0. */
  private def crc16ref(bs: Array[Byte]): Int = bs.foldLeft(0) { (c, x) =>
    var r = c ^ ((x & 0xff) << 8)
    (0 until 8).foreach { _ => r = if ((r & 0x8000) != 0) ((r << 1) ^ 0x8005) & 0xffff else (r << 1) & 0xffff }
    r
  }

  /** Hand-assemble a complete one-frame stream around `frameBody` (the
    * bits after the frame header's CRC-8), for decoder-path tests. */
  private def handStream(nSamples: Int, frameBody: Bits => Unit,
                         md5: Array[Byte] = new Array[Byte](16)): Array[Byte] = {
    val si = new Bits
    si.b("01100110 01001100 01100001 01000011") // fLaC
    si.b("1 0000000").n(34, 24)                 // last, STREAMINFO, len
    si.n(16, 16).n(16, 16)                      // min/max block
    si.n(0, 24).n(0, 24)                        // min/max frame: unknown
    si.n(8000, 20).n(0, 3).n(15, 5)             // rate, 1ch, 16-bit
    si.n(nSamples.toLong, 36)
    md5.foreach(b => si.n(b & 0xff, 8))
    val head = new Bits
    head.b("11111111 111110 0 0")               // sync, reserved, fixed
    head.n(7, 4).n(0, 4)                        // 16-bit blocksize at end; rate from SI
    head.n(0, 4).b("100").b("0")                // mono, 16-bit, reserved
    head.n(0, 8)                                // frame number 0
    head.n(nSamples - 1, 16)
    val hb = head.bytes
    val body = new Bits
    hb.foreach(b => body.n(b & 0xff, 8))
    body.n(crc8ref(hb), 8)
    frameBody(body)
    body.pad()
    val bb = body.bytes
    val full = new Bits
    bb.foreach(b => full.n(b & 0xff, 8))
    full.n(crc16ref(bb), 16)
    si.bytes ++ full.bytes
  }

  // ----------------------------------------------------------- known answer

  test("known-answer: encoder emits the hand-assembled bytes of a constant stream") {
    val samples = Array.fill(16)(5)
    val md = java.security.MessageDigest.getInstance("MD5")
    samples.foreach { v => md.update((v & 0xff).toByte); md.update(((v >> 8) & 0xff).toByte) }
    val md5 = md.digest()

    // frame, assembled from the spec text
    val fh = new Bits
    fh.b("11111111 111110 0 0").n(7, 4).n(0, 4).n(0, 4).b("100 0").n(0, 8).n(15, 16)
    val fhB = fh.bytes
    val fr = new Bits
    fhB.foreach(b => fr.n(b & 0xff, 8))
    fr.n(crc8ref(fhB), 8)
    fr.b("0 000000 0").n(5, 16) // CONSTANT subframe, value 5
    val frB = fr.bytes
    val frame = new Bits
    frB.foreach(b => frame.n(b & 0xff, 8))
    frame.n(crc16ref(frB), 16)
    val frameBytes = frame.bytes
    assert(frameBytes.length === 13)

    val si = new Bits
    si.b("01100110 01001100 01100001 01000011") // "fLaC"
    si.b("1 0000000").n(34, 24)
    si.n(16, 16).n(16, 16)                      // min = max block = 16
    si.n(13, 24).n(13, 24)                      // min = max frame = 13
    si.n(8000, 20).n(0, 3).n(15, 5).n(16, 36)
    md5.foreach(b => si.n(b & 0xff, 8))
    val expected = si.bytes ++ frameBytes

    val got = Flac.encode(Array(samples), 8000, 16, 16)
    assert(got.toSeq === expected.toSeq)

    val st = Flac.decode(expected).get
    assert(st.samples(0).toSeq === samples.toSeq)
    assert(st.subframeTypes.toSeq === Seq(0))
    assert(st.nFrames === 1 && st.sampleRate === 8000 && st.bps === 16)
  }

  // ------------------------------------------- decoder-only wire paths

  test("decoder: rice partitions (order 1) reconstruct across the partition seam") {
    // FIXED order 0, partition order 1: two partitions of 8. First: rice
    // k=0 over zeros (zigzag 0 → unary "1"). Second: escape, 4-bit raw.
    val raw = Array(1, 2, 3, -1, -2, -3, 7, -8)
    val payload = handStream(16, { b =>
      b.b("0 001000 0")       // subframe: FIXED order 0
      b.n(0, 2).n(1, 4)       // 4-bit rice method, partition order 1
      b.n(0, 4)               // partition 1: k = 0
      (0 until 8).foreach(_ => b.b("1"))
      b.n(15, 4).n(4, 5)      // partition 2: escape, 4 raw bits
      raw.foreach(v => b.n(v.toLong & 0xf, 4))
    })
    val st = Flac.decode(payload).get
    assert(st.samples(0).toSeq === (Seq.fill(8)(0) ++ raw.toSeq))
    assert(st.subframeTypes.toSeq === Seq(8))
  }

  test("decoder: 5-bit rice method and wasted bits") {
    // CONSTANT with 1 wasted bit: stored 3 in 15 bits → sample 6 …
    val p1 = handStream(16, { b =>
      b.b("0 000000 1").b("1") // wasted flag, unary 0 → 1 wasted bit
      b.n(3, 15)
    })
    val st1 = Flac.decode(p1).get
    assert(st1.samples(0).toSeq === Seq.fill(16)(6))
    // … and FIXED order 1 under the 5-bit rice method (method 01).
    val p2 = handStream(16, { b =>
      b.b("0 001001 0")       // FIXED order 1
      b.n(9, 16)              // warmup sample 9
      b.n(1, 2).n(0, 4)       // 5-bit rice method, partition order 0
      b.n(0, 5)               // k = 0
      (0 until 15).foreach(_ => b.b("01")) // zigzag 1 → +… rice(0): "0","1" → u=1 → v=-1
    })
    val st2 = Flac.decode(p2).get
    // residual −1 each step from warmup 9 → 9,8,7,…
    assert(st2.samples(0).toSeq === (9 to -6 by -1).toSeq)
  }

  // ------------------------------------------------------------ roundtrips

  private def roundtrip(chs: Array[Array[Int]], bps: Int = 16, block: Int = 64,
                        midSide: Boolean = false): Flac.FlacStream = {
    val enc = Flac.encode(chs, 8000, bps, block, midSide)
    val st = Flac.decode(enc).get
    assert(st.channels === chs.length)
    chs.indices.foreach(c => assert(st.samples(c).toSeq === chs(c).toSeq, s"channel $c"))
    st
  }

  test("roundtrip: ramp compresses through a fixed predictor") {
    val s = Array.tabulate(300)(i => 100 + 3 * i)
    val st = roundtrip(Array(s))
    assert(st.nFrames === 5) // 300 = 4·64 + 44: short last frame
    assert(st.subframeTypes.forall(t => t >= 8 && t <= 12))
    assert(Flac.encode(Array(s), 8000, 16, 64).length < 300 * 2) // beats raw PCM
  }

  test("roundtrip: damped sine picks the LPC path") {
    // ω=0.9 so the integer fixed predictors face real oscillation (order-2
    // residual ≈ 0.76·A) while the order-2 LPC pole matches it near-exactly
    val s = Array.tabulate(512)(i =>
      (12000.0 * math.pow(0.995, i) * math.sin(0.9 * i)).round.toInt)
    val st = roundtrip(Array(s), block = 256)
    assert(st.subframeTypes.exists(_ >= 32), s"wanted LPC in ${st.subframeTypes.toSeq}")
  }

  test("roundtrip: full-range noise survives (verbatim or escaped rice)") {
    val rnd = new scala.util.Random(7)
    val s = Array.fill(200)(rnd.nextInt(65536) - 32768)
    roundtrip(Array(s))
  }

  test("roundtrip: extremes, empty, and sub-block streams") {
    roundtrip(Array(Array(32767, -32768, 32767, -32768, 0, -1, 1)))
    roundtrip(Array(Array[Int]()))       // header-only stream
    roundtrip(Array(Array(42)))          // one sample, one short frame
    val st = roundtrip(Array(Array.fill(500)(-7)))
    assert(st.subframeTypes.forall(_ == 0)) // all CONSTANT
  }

  test("roundtrip: stereo, independent and mid/side") {
    val l = Array.tabulate(200)(i => 500 + 7 * i + (i % 3))
    val r = Array.tabulate(200)(i => 480 + 7 * i - (i % 5))
    roundtrip(Array(l, r))
    roundtrip(Array(l, r), midSide = true)
    // odd l+r exercises the mid reconstruction's carried low bit
    roundtrip(Array(Array(3, -5, 11), Array(2, 4, -8)), midSide = true, block = 16)
  }

  // ----------------------------------------------------------- strictness

  test("corrupt payloads quarantine: flipped bits, truncation, garbage") {
    val good = Flac.encode(Array(Array.tabulate(100)(i => 10 * i)), 8000, 16, 64)
    assert(Flac.decode(good).isDefined)
    // flip one bit in the metadata framing (5), the sample MD5 (27), frame
    // data (mid), or the frame CRC-16 (tail) → each layer's check catches
    // it. (STREAMINFO fields that frames don't re-state — the sample rate
    // under rate-code 0 — are unprotected in the published format itself:
    // no header CRC exists, so that flip is undetectable by ANY decoder.)
    Seq(5, 27, good.length / 2, good.length - 3).foreach { pos =>
      val bad = good.clone(); bad(pos) = (bad(pos) ^ 0x10).toByte
      assert(Flac.decode(bad).isEmpty, s"flip at $pos")
    }
    assert(Flac.decode(good.dropRight(4)).isEmpty)   // truncated frame
    assert(Flac.decode(good.take(30)).isEmpty)       // truncated STREAMINFO
    assert(Flac.decode("not flac".getBytes).isEmpty)
    assert(Flac.decode(Array[Byte]()).isEmpty)
  }

  // ------------------------------------------------------------- wav chain

  test("flacToWav chains into decodeAudio: container swap preserves the RMS") {
    val s = Array.tabulate(400)(i => (8000 * math.sin(0.2 * i)).round.toInt)
    val wav = Flac.flacToWav(Flac.encode(Array(s), 8000, 16, 128)).get
    val media = Seq((1L, wav, "audio/wav", "en"))
      .toDF("doc_id", "payload", "media_type", "lang")
    val f = Multimodal.decodeAudio(spark, media).collect().head
    assert(f.decoded && f.n_frames === Some(400L) && f.channels === Some(1))
    val want = math.sqrt(s.map(v => (v / 32768.0) * (v / 32768.0)).sum / s.length)
    assert(math.abs(f.rms.get - want) < 1e-9)
  }

  // --------------------------------------------------------- spark wrappers

  test("asFlacTable → decodeFlac: gate facts match the synthesizing arithmetic") {
    val docs = Seq(
      (1L, "a" * 700, "en", "s", 700L),          // capped at 600 → 4 frames
      (2L, "hello FLAC", "en", "s", 10L),        // 10 samples, 1 short frame
      (3L, "", "en", "s", 0L))                   // empty → header-only
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.decodeFlac(spark,
        Multimodal.asFlacTable(spark, docs, 192, 600, 8000))
      .collect().sortBy(_.doc_id)
    assert(out.forall(_.decoded))
    val d1 = out(0)
    assert(d1.n_samples === Some(600L) && d1.n_frames === Some(4L))
    assert(d1.sample_sum === Some(600L * ('a'.toInt - 80) * 129))
    val d2 = out(1)
    val want2 = "hello FLAC".getBytes("UTF-8").map(b => ((b & 0xff) - 80L) * 129).sum
    assert(d2.n_samples === Some(10L) && d2.sample_sum === Some(want2))
    val d3 = out(2)
    assert(d3.n_samples === Some(0L) && d3.n_frames === Some(0L) &&
      d3.sample_sum === Some(0L))
  }
}
