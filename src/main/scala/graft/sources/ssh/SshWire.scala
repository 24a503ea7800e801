package graft.sources.ssh

import java.math.BigInteger
import java.nio.charset.StandardCharsets.UTF_8

/** SSH-2 wire-format primitives (RFC 4251 §5): byte, boolean, uint32,
  * string (length-prefixed bytes), mpint (two's-complement big-endian —
  * `BigInteger.toByteArray` IS that encoding for the positive values SSH
  * uses, leading sign byte included), and comma-separated name-lists.
  * Used by every layer of the [[SshTransport]]/[[SshClient]] stack and
  * the in-spec server fixture. */
object SshWire {

  /** Append-only payload writer. */
  final class W {
    private val out = new java.io.ByteArrayOutputStream()
    def putByte(b: Int): W = { out.write(b & 0xff); this }
    def putBoolean(b: Boolean): W = putByte(if (b) 1 else 0)
    def putUInt32(v: Long): W = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      this
    }
    def putRaw(b: Array[Byte]): W = { out.write(b, 0, b.length); this }
    def putString(b: Array[Byte]): W = { putUInt32(b.length.toLong); putRaw(b) }
    def putString(s: String): W = putString(s.getBytes(UTF_8))
    def putMpint(v: BigInteger): W = {
      require(v.signum >= 0, "ssh mpint here is always non-negative")
      putString(if (v.signum == 0) Array.emptyByteArray else v.toByteArray)
    }
    def putNameList(names: Seq[String]): W = putString(names.mkString(","))
    def bytes: Array[Byte] = out.toByteArray
  }

  /** Sequential payload reader; every under-run is an explicit protocol
    * error rather than an index exception. */
  final class R(buf: Array[Byte]) {
    private var pos = 0
    private def need(n: Int): Unit =
      if (pos + n > buf.length)
        throw new SshProtocolException(
          s"truncated packet: need $n bytes at $pos of ${buf.length}")
    def byte(): Int = { need(1); val b = buf(pos) & 0xff; pos += 1; b }
    def boolean(): Boolean = byte() != 0
    def uint32(): Long = {
      need(4)
      val v = ((buf(pos) & 0xffL) << 24) | ((buf(pos + 1) & 0xffL) << 16) |
        ((buf(pos + 2) & 0xffL) << 8) | (buf(pos + 3) & 0xffL)
      pos += 4; v
    }
    def string(): Array[Byte] = {
      val n = uint32()
      if (n > Int.MaxValue) throw new SshProtocolException(s"string too long: $n")
      need(n.toInt)
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + n.toInt)
      pos += n.toInt; b
    }
    def stringUtf8(): String = new String(string(), UTF_8)
    def mpint(): BigInteger = {
      val b = string()
      if (b.isEmpty) BigInteger.ZERO else new BigInteger(b)
    }
    def nameList(): Seq[String] = {
      val s = stringUtf8()
      if (s.isEmpty) Seq.empty else s.split(',').toSeq
    }
    def remaining: Int = buf.length - pos
  }

  /** SSH message numbers used by this stack. */
  object Msg {
    val Disconnect = 1
    val Ignore = 2
    val Unimplemented = 3
    val Debug = 4
    val ServiceRequest = 5
    val ServiceAccept = 6
    val KexInit = 20
    val NewKeys = 21
    val KexDhInit = 30
    val KexDhReply = 31
    val UserauthRequest = 50
    val UserauthFailure = 51
    val UserauthSuccess = 52
    val GlobalRequest = 80
    val RequestFailure = 82
    val ChannelOpen = 90
    val ChannelOpenConfirmation = 91
    val ChannelOpenFailure = 92
    val ChannelWindowAdjust = 93
    val ChannelData = 94
    val ChannelExtendedData = 95
    val ChannelEof = 96
    val ChannelClose = 97
    val ChannelRequest = 98
    val ChannelFailure = 100
  }
}

/** A violation of the SSH protocol contract by the peer (or a truncated
  * stream) — always fatal to the connection, never to the JVM. */
final class SshProtocolException(msg: String) extends java.io.IOException(msg)
