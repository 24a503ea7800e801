package graft.operators

import java.security.MessageDigest

/** From-scratch FLAC codec (RFC 9639 / the published flac format spec) —
  * the COMPRESSED-audio half the media tier had declared a stub since
  * round 14 (`decodeAudio` handles PCM containers only; the reference's
  * crawl-shaped corpora carry compressed audio columns). Lossless, so the
  * decode-of-encode is oracle-EXACT: integer sample facts replay in DuckDB
  * as byte arithmetic over the synthesizing text, the x96/x123 precedent.
  *
  * Scope, stated precisely:
  *   - encoder: 16-bit (any bps 4..24) mono/stereo, fixed block size,
  *     CONSTANT / VERBATIM / FIXED(0..4) / LPC(order 2) subframes chosen
  *     per block by coded size, rice residuals (4-bit params, escape to
  *     raw), optional mid/side stereo decorrelation, STREAMINFO with the
  *     sample MD5.
  *   - decoder: STRICT like [[Multimodal.GzipMembers]] — sync + reserved
  *     bits, header CRC-8, frame CRC-16, the full block-size / sample-rate
  *     / sample-size code tables, UTF-8-coded frame numbers checked
  *     against position, CONSTANT/VERBATIM/FIXED(0..4)/LPC(1..32)
  *     subframes, wasted bits, 4- and 5-bit rice methods with nonzero
  *     partition orders, independent + left/right/mid-side channel
  *     assignments, and the STREAMINFO MD5 recomputed over the decoded
  *     samples. Any violation quarantines the payload (None), never a
  *     silently-wrong sample.
  *
  * Honesty note (the SSH-stack precedent): encoder and decoder share this
  * file, so roundtrip specs alone would let a symmetric wire-format error
  * self-cancel. FlacSpec therefore pins KNOWN-ANSWER bytes: tiny streams
  * hand-assembled bit-by-bit from the spec text with an independent
  * string-of-bits builder must equal the encoder's output byte-for-byte,
  * and decode from those literal bytes — cross-implementation interop
  * (reference libFLAC) stays unexercisable in a zero-egress sandbox.
  */
object Flac {

  // ------------------------------------------------------------- checksums

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame-header checksum. */
  private val crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i; var b = 0
      while (b < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; b += 1 }
      t(i) = c & 0xff; i += 1
    }
    t
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — whole-frame checksum. */
  private val crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8; var b = 0
      while (b < 8) { c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1; b += 1 }
      t(i) = c & 0xffff; i += 1
    }
    t
  }

  private def crc8(a: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc8Table((c ^ a(i)) & 0xff); i += 1 }
    c
  }

  private def crc16(a: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc16Table(((c >>> 8) ^ (a(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c & 0xffff
  }

  // ------------------------------------------------------------ bit writer

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nAcc = 0
    def bits(v: Long, n: Int): Unit = {
      var left = n
      while (left > 0) {
        val take = math.min(8 - nAcc, left)
        val chunk = (v >>> (left - take)) & ((1L << take) - 1)
        acc = (acc << take) | chunk
        nAcc += take; left -= take
        if (nAcc == 8) { out.write(acc.toInt & 0xff); acc = 0; nAcc = 0 }
      }
    }
    def unary(q: Int): Unit = { var i = 0; while (i < q) { bits(0, 1); i += 1 }; bits(1, 1) }
    def align(): Unit = if (nAcc > 0) bits(0, 8 - nAcc)
    def size: Int = out.size()
    def toBytes: Array[Byte] = { require(nAcc == 0, "unaligned"); out.toByteArray }
  }

  // ------------------------------------------------------------ bit reader

  /** Strict MSB-first reader; any over-read throws (caught at decode()). */
  private final class BitReader(a: Array[Byte]) {
    private var bit = 0L
    def bytePos: Int = { require(bit % 8 == 0); (bit / 8).toInt }
    def seekByte(p: Int): Unit = bit = p.toLong * 8
    def eof: Boolean = bit >= a.length.toLong * 8
    def bits(n: Int): Long = {
      var v = 0L; var left = n
      while (left > 0) {
        val by = (bit / 8).toInt
        if (by >= a.length) throw new java.io.EOFException()
        val off = (bit % 8).toInt
        val take = math.min(8 - off, left)
        val chunk = ((a(by) >> (8 - off - take)) & ((1 << take) - 1)).toLong
        v = (v << take) | chunk
        bit += take; left -= take
      }
      v
    }
    def signed(n: Int): Long = { val v = bits(n); (v << (64 - n)) >> (64 - n) }
    def unary(): Int = {
      var q = 0
      while (bits(1) == 0L) {
        q += 1
        if (q > (1 << 24)) throw new java.io.IOException("runaway unary")
      }
      q
    }
    def align(): Unit = if (bit % 8 != 0) { val pad = 8 - (bit % 8).toInt; if (bits(pad) != 0) throw new java.io.IOException("nonzero pad") }
  }

  // --------------------------------------------- UTF-8-style coded numbers

  /** The frame-number coding: UTF-8's length-prefix scheme extended to 36
    * bits (RFC 9639 §9.1.5). */
  private def writeCoded(bw: BitWriter, n: Long): Unit = {
    if (n < 0x80) bw.bits(n, 8)
    else {
      val nBytes =
        if (n < 0x800) 2 else if (n < 0x10000) 3 else if (n < 0x200000) 4
        else if (n < 0x4000000) 5 else if (n < 0x80000000L) 6 else 7
      // lead byte: nBytes ones, a zero, then the high payload bits
      val payloadBits = 6 * (nBytes - 1)
      if (nBytes < 7) {
        val lead = ((0xff << (8 - nBytes)) & 0xff) | ((n >>> payloadBits) & ((1 << (7 - nBytes)) - 1)).toInt
        bw.bits(lead.toLong, 8)
      } else bw.bits(0xfe, 8) // 36-bit form carries all payload in continuations
      var i = nBytes - 2
      while (i >= 0) { bw.bits(0x80L | ((n >>> (6 * i)) & 0x3f), 8); i -= 1 }
    }
  }

  private def readCoded(br: BitReader): Long = {
    val lead = br.bits(8).toInt
    if ((lead & 0x80) == 0) return lead.toLong
    var nBytes = 0
    var m = 0x80
    while ((lead & m) != 0 && nBytes < 8) { nBytes += 1; m >>= 1 }
    if (nBytes < 2 || nBytes > 7) throw new java.io.IOException("bad coded number")
    var v: Long = if (nBytes < 7) (lead & ((1 << (7 - nBytes)) - 1)).toLong else 0L
    var i = 1
    while (i < nBytes) {
      val c = br.bits(8).toInt
      if ((c & 0xc0) != 0x80) throw new java.io.IOException("bad continuation")
      v = (v << 6) | (c & 0x3f); i += 1
    }
    v
  }

  // -------------------------------------------------------------- encoding

  /** Residual of the order-`o` fixed predictor at position i (i >= o). */
  private def fixedResidual(s: Array[Int], i: Int, o: Int): Long = o match {
    case 0 => s(i)
    case 1 => s(i).toLong - s(i - 1)
    case 2 => s(i).toLong - 2L * s(i - 1) + s(i - 2)
    case 3 => s(i).toLong - 3L * s(i - 1) + 3L * s(i - 2) - s(i - 3)
    case _ => s(i).toLong - 4L * s(i - 1) + 6L * s(i - 2) - 4L * s(i - 3) + s(i - 4)
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Coded size in bits of a rice-parameter-k residual block. */
  private def riceSize(res: Array[Long], k: Int): Long = {
    var bitsN = 0L; var i = 0
    while (i < res.length) { bitsN += (zigzag(res(i)) >>> k) + 1 + k; i += 1 }
    bitsN
  }

  /** Pick the cheapest 4-bit rice parameter (≤14; 15 is the escape). */
  private def bestRice(res: Array[Long]): (Int, Long) = {
    var bestK = 0; var bestBits = Long.MaxValue; var k = 0
    while (k <= 14) {
      val b = riceSize(res, k)
      if (b < bestBits) { bestBits = b; bestK = k }
      k += 1
    }
    (bestK, bestBits)
  }

  private def bitsNeededSigned(v: Long): Int = {
    val u = if (v < 0) -(v + 1) else v
    64 - java.lang.Long.numberOfLeadingZeros(u) + 1
  }

  /** Write one residual section: method 00 (4-bit rice), partition order 0,
    * escaping to raw n-bit residuals when rice loses. */
  private def writeResidual(bw: BitWriter, res: Array[Long]): Unit = {
    bw.bits(0, 2) // coding method: 4-bit rice
    bw.bits(0, 4) // partition order 0: one partition
    val (k, riceBits) = bestRice(res)
    val rawBits = math.max(1, res.foldLeft(0)((m, r) => math.max(m, bitsNeededSigned(r))))
    if (rawBits <= 31 && rawBits.toLong * res.length < riceBits) {
      bw.bits(15, 4); bw.bits(rawBits.toLong, 5)
      res.foreach(r => bw.bits(r & ((1L << rawBits) - 1), rawBits))
    } else {
      bw.bits(k.toLong, 4)
      res.foreach { r => val u = zigzag(r); bw.unary((u >>> k).toInt); bw.bits(u & ((1L << k) - 1), k) }
    }
  }

  /** Quantized order-2 LPC fit (Levinson on the order-2 normal equations),
    * or None when the block is too short / degenerate. Real coefficients,
    * precision 12, non-negative shift — the path FlacSpec roundtrips; the
    * per-block encoder picks it only when it beats every fixed order. */
  private def lpc2(s: Array[Int]): Option[(Array[Int], Int, Int)] = {
    val n = s.length
    if (n < 8) return None
    var r0 = 0.0; var r1 = 0.0; var r2 = 0.0
    var i = 0
    while (i < n) {
      r0 += s(i).toDouble * s(i)
      if (i + 1 < n) r1 += s(i).toDouble * s(i + 1)
      if (i + 2 < n) r2 += s(i).toDouble * s(i + 2)
      i += 1
    }
    if (r0 <= 0) return None
    val det = r0 * r0 - r1 * r1
    if (math.abs(det) < 1e-9) return None
    val a1 = (r1 * r0 - r1 * r2) / det
    val a2 = (r2 * r0 - r1 * r1) / det
    if (a1.isNaN || a2.isNaN || math.abs(a1) >= 32 || math.abs(a2) >= 32) return None
    val precision = 12
    val maxC = math.max(math.abs(a1), math.abs(a2))
    var shift = precision - 1 - math.max(0, math.ceil(math.log(maxC + 1e-12) / math.log(2)).toInt) - 1
    shift = math.max(0, math.min(15, shift))
    val q1 = math.round(a1 * (1L << shift)).toInt
    val q2 = math.round(a2 * (1L << shift)).toInt
    val lim = 1 << (precision - 1)
    if (q1 >= lim || q1 < -lim || q2 >= lim || q2 < -lim) None
    else Some((Array(q1, q2), precision, shift))
  }

  private def lpcResiduals(s: Array[Int], coefs: Array[Int], shift: Int): Array[Long] = {
    val o = coefs.length
    val res = new Array[Long](s.length - o)
    var i = o
    while (i < s.length) {
      var p = 0L; var j = 0
      while (j < o) { p += coefs(j).toLong * s(i - 1 - j); j += 1 }
      res(i - o) = s(i) - (p >> shift)
      i += 1
    }
    res
  }

  /** Encode one subframe, choosing the cheapest of CONSTANT / FIXED(0..4)
    * / LPC(2) / VERBATIM by exact coded size. `bps` is the subframe bit
    * depth (base depth +1 for a side channel). */
  private def writeSubframe(bw: BitWriter, s: Array[Int], bps: Int): Unit = {
    val n = s.length
    val const = n > 0 && s.forall(_ == s(0))
    if (const) {
      bw.bits(0, 1); bw.bits(0, 6); bw.bits(0, 1)
      bw.bits(s(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    // candidate fixed orders: coded cost = warmup + residual
    val maxOrder = math.min(4, n - 1)
    var bestOrder = 0
    var bestCost = Long.MaxValue
    var o = 0
    while (o <= maxOrder) {
      val res = new Array[Long](n - o)
      var i = o
      while (i < n) { res(i - o) = fixedResidual(s, i, o); i += 1 }
      val (_, riceBits) = bestRice(res)
      val rawBits = math.max(1, res.foldLeft(0)((m, r) => math.max(m, bitsNeededSigned(r))))
      val resBits = math.min(riceBits, if (rawBits <= 31) rawBits.toLong * res.length + 5 else Long.MaxValue)
      val cost = o.toLong * bps + 2 + 4 + 4 + resBits
      if (cost < bestCost) { bestCost = cost; bestOrder = o }
      o += 1
    }
    val lpcFit = lpc2(s).map { case (coefs, prec, shift) =>
      val res = lpcResiduals(s, coefs, shift)
      val (_, riceBits) = bestRice(res)
      val cost = 2L * bps + 4 + 5 + 2L * prec + 2 + 4 + 4 + riceBits
      (coefs, prec, shift, cost)
    }.filter(_._4 < bestCost)
    val verbatimCost = n.toLong * bps
    lpcFit match {
      case Some((coefs, prec, shift, cost)) if cost < verbatimCost =>
        bw.bits(0, 1); bw.bits(32L | (coefs.length - 1), 6); bw.bits(0, 1)
        s.take(coefs.length).foreach(w => bw.bits(w.toLong & ((1L << bps) - 1), bps))
        bw.bits((prec - 1).toLong, 4)
        bw.bits(shift.toLong & 0x1f, 5)
        coefs.foreach(c => bw.bits(c.toLong & ((1L << prec) - 1), prec))
        writeResidual(bw, lpcResiduals(s, coefs, shift))
      case _ if bestCost < verbatimCost =>
        bw.bits(0, 1); bw.bits(8L | bestOrder, 6); bw.bits(0, 1)
        s.take(bestOrder).foreach(w => bw.bits(w.toLong & ((1L << bps) - 1), bps))
        val res = new Array[Long](n - bestOrder)
        var i = bestOrder
        while (i < n) { res(i - bestOrder) = fixedResidual(s, i, bestOrder); i += 1 }
        writeResidual(bw, res)
      case _ =>
        bw.bits(0, 1); bw.bits(1, 6); bw.bits(0, 1)
        s.foreach(v => bw.bits(v.toLong & ((1L << bps) - 1), bps))
    }
  }

  private def sampleSizeCode(bps: Int): Int = bps match {
    case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6; case 32 => 7
    case _ => throw new IllegalArgumentException(s"uncodable bps $bps")
  }

  /** Encode `channels` (equal-length sample arrays, values in the signed
    * `bps`-bit range) as a complete FLAC stream. Mid/side decorrelation is
    * applied for stereo when `midSide` (the stereo gate FlacSpec pins). */
  def encode(channels: Array[Array[Int]], sampleRate: Int, bps: Int,
             blockSize: Int, midSide: Boolean = false): Array[Byte] = {
    require(channels.nonEmpty && channels.length <= 8, "1..8 channels")
    require(channels.forall(_.length == channels(0).length), "ragged channels")
    require(blockSize >= 16 && blockSize <= 65535, "block size 16..65535")
    val nSamples = channels(0).length.toLong
    val useMs = midSide && channels.length == 2

    // frames
    val frames = new java.io.ByteArrayOutputStream()
    var minFrame = Int.MaxValue; var maxFrame = 0
    var frameIdx = 0L
    var pos = 0
    while (pos < nSamples) {
      val len = math.min(blockSize.toLong, nSamples - pos).toInt
      val bw = new BitWriter
      bw.bits(0x3ffe, 14); bw.bits(0, 1); bw.bits(0, 1) // sync, reserved, fixed strategy
      bw.bits(7, 4)                                     // block size: 16-bit at end
      bw.bits(0, 4)                                     // sample rate: STREAMINFO
      bw.bits(if (useMs) 10L else (channels.length - 1).toLong, 4)
      bw.bits(sampleSizeCode(bps).toLong, 3); bw.bits(0, 1)
      writeCoded(bw, frameIdx)
      bw.bits((len - 1).toLong, 16)
      val headBytes = { bw.align(); bw.toBytes } // header is byte-aligned here
      val bw2 = new BitWriter
      headBytes.foreach(b => bw2.bits(b & 0xff, 8))
      bw2.bits(crc8(headBytes, 0, headBytes.length).toLong, 8)
      if (useMs) {
        val mid = new Array[Int](len); val side = new Array[Int](len)
        var i = 0
        while (i < len) {
          val l = channels(0)(pos + i); val r = channels(1)(pos + i)
          mid(i) = (l + r) >> 1; side(i) = l - r; i += 1
        }
        writeSubframe(bw2, mid, bps)
        writeSubframe(bw2, side, bps + 1)
      } else {
        channels.foreach { ch =>
          val s = new Array[Int](len)
          System.arraycopy(ch, pos, s, 0, len)
          writeSubframe(bw2, s, bps)
        }
      }
      bw2.align()
      val body = bw2.toBytes
      val bw3 = new BitWriter
      body.foreach(b => bw3.bits(b & 0xff, 8))
      bw3.bits(crc16(body, 0, body.length).toLong, 16)
      val frame = bw3.toBytes
      frames.write(frame, 0, frame.length)
      minFrame = math.min(minFrame, frame.length); maxFrame = math.max(maxFrame, frame.length)
      frameIdx += 1; pos += len
    }
    if (frameIdx == 0L) { minFrame = 0; maxFrame = 0 }

    // MD5 over little-endian interleaved samples at bps/8 bytes (bps mult of 8)
    val md = MessageDigest.getInstance("MD5")
    val bytesPer = (bps + 7) / 8
    var i = 0
    while (i < nSamples) {
      var c = 0
      while (c < channels.length) {
        var v = channels(c)(i.toInt); var b = 0
        while (b < bytesPer) { md.update((v & 0xff).toByte); v >>= 8; b += 1 }
        c += 1
      }
      i += 1
    }
    val md5 = md.digest()

    val head = new BitWriter
    head.bits(0x664c6143L, 32) // "fLaC"
    head.bits(1, 1); head.bits(0, 7); head.bits(34, 24) // last-block STREAMINFO
    head.bits(blockSize.toLong, 16); head.bits(blockSize.toLong, 16)
    head.bits(minFrame.toLong, 24); head.bits(maxFrame.toLong, 24)
    head.bits(sampleRate.toLong, 20)
    head.bits((channels.length - 1).toLong, 3)
    head.bits((bps - 1).toLong, 5)
    head.bits(nSamples, 36)
    md5.foreach(b => head.bits(b & 0xff, 8))
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.toBytes); out.write(frames.toByteArray)
    out.toByteArray
  }

  // -------------------------------------------------------------- decoding

  /** A fully-decoded stream: header facts plus every sample per channel.
    * `subframeTypes` records each decoded subframe's 6-bit type code in
    * stream order (0 CONSTANT, 1 VERBATIM, 8+o FIXED, 32+o−1 LPC) — how
    * FlacSpec pins WHICH codec path a waveform actually exercised. */
  final case class FlacStream(sampleRate: Int, channels: Int, bps: Int,
                              totalSamples: Long, nFrames: Int,
                              samples: Array[Array[Int]],
                              subframeTypes: Array[Int])

  private val blockSizeTable = Array(-1, 192, 576, 1152, 2304, 4608, -2, -3,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  private val sampleRateTable = Array(-1, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000, -2, -3, -4, -5)
  private val sampleSizeTable = Array(0, 8, 12, -1, 16, 20, 24, 32)

  /** Strict whole-stream decode; None quarantines any malformation. */
  def decode(payload: Array[Byte]): Option[FlacStream] = {
    try {
      val br = new BitReader(payload)
      if (br.bits(32) != 0x664c6143L) return None
      // metadata: STREAMINFO must come first; skip any trailing blocks
      var last = br.bits(1) == 1L
      if (br.bits(7) != 0L) return None
      if (br.bits(24) != 34L) return None
      val minBlock = br.bits(16).toInt; val maxBlock = br.bits(16).toInt
      br.bits(24); br.bits(24) // min/max frame size (informational)
      val rate = br.bits(20).toInt
      val nCh = br.bits(3).toInt + 1
      val bps = br.bits(5).toInt + 1
      val total = br.bits(36)
      val md5Stored = new Array[Byte](16)
      var i = 0
      while (i < 16) { md5Stored(i) = br.bits(8).toByte; i += 1 }
      if (minBlock < 16 || maxBlock < minBlock) return None
      while (!last) {
        last = br.bits(1) == 1L
        br.bits(7)
        val len = br.bits(24).toInt
        br.align(); br.seekByte(br.bytePos + len)
      }

      val chans = Array.fill(nCh)(new java.io.ByteArrayOutputStream())
      // decoded samples accumulate as 4-byte ints per channel
      def push(c: Int, v: Int): Unit = {
        val o = chans(c)
        o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
      }
      val md = MessageDigest.getInstance("MD5")
      val bytesPer = (bps + 7) / 8
      val types = scala.collection.mutable.ArrayBuffer.empty[Int]
      var got = 0L
      var nFrames = 0
      while (!br.eof) {
        val frameStart = br.bytePos
        if (br.bits(14) != 0x3ffeL) return None
        if (br.bits(1) != 0L) return None
        val variableStrategy = br.bits(1) == 1L
        val bsCode = br.bits(4).toInt
        val srCode = br.bits(4).toInt
        val chanAsg = br.bits(4).toInt
        val ssCode = br.bits(3).toInt
        if (br.bits(1) != 0L) return None
        val coded = readCoded(br)
        if (!variableStrategy && coded != nFrames.toLong) return None
        if (variableStrategy && coded != got) return None
        val blockLen = bsCode match {
          case 0 => return None
          case 6 => br.bits(8).toInt + 1
          case 7 => br.bits(16).toInt + 1
          case c => blockSizeTable(c)
        }
        val frameRate = srCode match {
          case 0 => rate
          case 12 => br.bits(8).toInt * 1000
          case 13 => br.bits(16).toInt
          case 14 => br.bits(16).toInt * 10
          case 15 => return None
          case c => sampleRateTable(c)
        }
        if (frameRate != rate) return None
        val frameBps = ssCode match {
          case 0 => bps
          case 3 => return None
          case c => sampleSizeTable(c)
        }
        if (frameBps != bps) return None
        val frameCh = if (chanAsg < 8) chanAsg + 1 else if (chanAsg <= 10) 2 else return None
        if (frameCh != nCh) return None
        val headerEnd = br.bytePos
        if (br.bits(8).toInt != crc8(payload, frameStart, headerEnd)) return None

        val decoded = Array.ofDim[Array[Int]](frameCh)
        var c = 0
        while (c < frameCh) {
          val subBps = chanAsg match {
            case 8 => if (c == 1) bps + 1 else bps  // left/side
            case 9 => if (c == 0) bps + 1 else bps  // side/right
            case 10 => if (c == 1) bps + 1 else bps // mid/side
            case _ => bps
          }
          decoded(c) = readSubframe(br, blockLen, subBps, types)
          c += 1
        }
        br.align()
        val bodyEnd = br.bytePos
        if (br.bits(16).toInt != crc16(payload, frameStart, bodyEnd)) return None

        val out: Array[Array[Int]] = chanAsg match {
          case 8 => // left/side: right = left - side
            val l = decoded(0); val s = decoded(1)
            Array(l, Array.tabulate(blockLen)(i => l(i) - s(i)))
          case 9 => // side/right: left = right + side
            val s = decoded(0); val r = decoded(1)
            Array(Array.tabulate(blockLen)(i => r(i) + s(i)), r)
          case 10 => // mid/side
            val m = decoded(0); val s = decoded(1)
            val l = new Array[Int](blockLen); val r = new Array[Int](blockLen)
            var i = 0
            while (i < blockLen) {
              val mm = (m(i) << 1) | (s(i) & 1)
              l(i) = (mm + s(i)) >> 1; r(i) = (mm - s(i)) >> 1; i += 1
            }
            Array(l, r)
          case _ => decoded
        }
        var i2 = 0
        while (i2 < blockLen) {
          var c2 = 0
          while (c2 < nCh) {
            push(c2, out(c2)(i2))
            var v = out(c2)(i2); var b = 0
            while (b < bytesPer) { md.update((v & 0xff).toByte); v >>= 8; b += 1 }
            c2 += 1
          }
          i2 += 1
        }
        got += blockLen
        nFrames += 1
      }
      if (total != 0L && got != total) return None
      if (total != 0L && !md5Stored.forall(_ == 0) &&
        !java.util.Arrays.equals(md.digest(), md5Stored)) return None
      val samples = chans.map { o =>
        val b = o.toByteArray
        Array.tabulate(b.length / 4) { i =>
          (b(4 * i) & 0xff) | ((b(4 * i + 1) & 0xff) << 8) |
            ((b(4 * i + 2) & 0xff) << 16) | ((b(4 * i + 3) & 0xff) << 24)
        }
      }
      Some(FlacStream(rate, nCh, bps, total, nFrames, samples, types.toArray))
    } catch {
      case _: java.io.EOFException | _: java.io.IOException |
           _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None
    }
  }

  private def readSubframe(br: BitReader, n: Int, bps: Int,
                           types: scala.collection.mutable.ArrayBuffer[Int]): Array[Int] = {
    if (br.bits(1) != 0L) throw new java.io.IOException("subframe pad bit")
    val typ = br.bits(6).toInt
    types += typ
    val wasted = if (br.bits(1) == 1L) br.unary() + 1 else 0
    val eff = bps - wasted
    if (eff <= 0) throw new java.io.IOException("wasted bits exceed bps")
    val s: Array[Int] = typ match {
      case 0 =>                                                           // CONSTANT
        val v = br.signed(eff).toInt
        Array.fill(n)(v)
      case 1 => Array.fill(n)(br.signed(eff).toInt)                       // VERBATIM
      case t if t >= 8 && t <= 12 =>                                      // FIXED
        val o = t - 8
        if (o > n) throw new java.io.IOException("order exceeds block")
        val s = new Array[Int](n)
        var i = 0
        while (i < o) { s(i) = br.signed(eff).toInt; i += 1 }
        val res = readResidual(br, n, o)
        while (i < n) {
          val p: Long = o match {
            case 0 => 0L
            case 1 => s(i - 1)
            case 2 => 2L * s(i - 1) - s(i - 2)
            case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
            case _ => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
          }
          s(i) = (p + res(i - o)).toInt; i += 1
        }
        s
      case t if t >= 32 =>                                                // LPC
        val o = t - 32 + 1
        if (o > n) throw new java.io.IOException("order exceeds block")
        val s = new Array[Int](n)
        var i = 0
        while (i < o) { s(i) = br.signed(eff).toInt; i += 1 }
        val prec = br.bits(4).toInt + 1
        if (prec == 16) throw new java.io.IOException("invalid lpc precision")
        val shift = br.signed(5).toInt
        if (shift < 0) throw new java.io.IOException("negative lpc shift")
        val coefs = Array.fill(o)(br.signed(prec).toInt)
        val res = readResidual(br, n, o)
        while (i < n) {
          var p = 0L; var j = 0
          while (j < o) { p += coefs(j).toLong * s(i - 1 - j); j += 1 }
          s(i) = ((p >> shift) + res(i - o)).toInt; i += 1
        }
        s
      case _ => throw new java.io.IOException(s"reserved subframe type $typ")
    }
    if (wasted > 0) { var i = 0; while (i < n) { s(i) = s(i) << wasted; i += 1 } }
    s
  }

  private def readResidual(br: BitReader, n: Int, order: Int): Array[Long] = {
    val method = br.bits(2).toInt
    if (method > 1) throw new java.io.IOException("reserved residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val pOrder = br.bits(4).toInt
    val nPart = 1 << pOrder
    if (pOrder > 0 && n % nPart != 0)
      throw new java.io.IOException("block not divisible into partitions")
    val res = new Array[Long](n - order)
    var idx = 0
    var part = 0
    while (part < nPart) {
      val cnt = (if (pOrder == 0) n else n >> pOrder) - (if (part == 0) order else 0)
      if (cnt < 0) throw new java.io.IOException("partition underflow")
      val k = br.bits(pBits).toInt
      if (k == escape) {
        val raw = br.bits(5).toInt
        var i = 0
        while (i < cnt) { res(idx) = if (raw == 0) 0L else br.signed(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val q = br.unary().toLong
          val u = (q << k) | br.bits(k)
          res(idx) = (u >>> 1) ^ -(u & 1L)
          idx += 1; i += 1
        }
      }
      part += 1
    }
    if (idx != n - order) throw new java.io.IOException("residual count mismatch")
    res
  }

  // ------------------------------------------------------------- wav chain

  /** Re-container a decoded stream as 16-bit PCM WAV so the EXISTING audio
    * feature path ([[Multimodal.decodeAudio]]) consumes FLAC payloads —
    * the codec chained into the curation tier the way AVI MJPEG frames
    * chain into decodeImages. 16-bit streams only (the engine's gate
    * depth); others return None rather than quantize silently. */
  def flacToWav(payload: Array[Byte]): Option[Array[Byte]] =
    decode(payload).filter(_.bps == 16).map { st =>
      val n = if (st.samples.isEmpty) 0 else st.samples(0).length
      val dataLen = n * st.channels * 2
      val out = new java.io.ByteArrayOutputStream(44 + dataLen)
      def u32(v: Long): Unit = { out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt) }
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("RIFF".getBytes("US-ASCII")); u32(36L + dataLen)
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("fmt ".getBytes("US-ASCII")); u32(16L); u16(1); u16(st.channels)
      u32(st.sampleRate.toLong); u32(st.sampleRate.toLong * st.channels * 2)
      u16(st.channels * 2); u16(16)
      out.write("data".getBytes("US-ASCII")); u32(dataLen.toLong)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < st.channels) { u16(st.samples(c)(i) & 0xffff); c += 1 }
        i += 1
      }
      out.toByteArray
    }
}
