package graft.sources.ssh

import java.io.{DataInputStream, IOException}
import java.math.BigInteger
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import javax.crypto.{Cipher, Mac}
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import SshWire.{Msg, R, W}

/** SSH-2 transport layer (RFC 4253) over a connected [[Socket]], pure JDK
  * crypto — the REAL implementation of the hop the S4 tunnel previously
  * modelled as plain TCP (round-13 verdict task 4; the reference runs
  * `SSHTunnelForwarder`, index_align_to_firebase.py:43-101). One fixed
  * algorithm suite, offered and required on both sides:
  *
  *  - kex `diffie-hellman-group14-sha256` (RFC 4253 §8 group, SHA-256 per
  *    RFC 8268; 2048-bit MODP via JDK `KeyAgreement`-free BigInteger
  *    modPow — the group is public and fixed, no parameter negotiation)
  *  - host key `rsa-sha2-256` (RFC 8332; `SHA256withRSA` signatures over
  *    the exchange hash, public blob in the `ssh-rsa` format)
  *  - cipher `aes128-ctr` both directions (RFC 4344; ONE JDK
  *    `AES/CTR/NoPadding` instance per direction, keystream continuous
  *    across packets)
  *  - MAC `hmac-sha2-256` (RFC 6668; over seq ‖ plaintext packet)
  *  - compression `none`
  *
  * RE-KEYING (RFC 4253 §9) is implemented for both roles and both
  * initiators: after [[rekeyAfterBytes]] of encrypted traffic (the RFC's
  * per-GB guidance is the default) the connection's reader initiates a
  * fresh KEXINIT → DH → NEWKEYS exchange, and a peer-initiated KEXINIT
  * arriving mid-session is answered the same way ([[rekeyRespond]]).
  * The exchange runs ON the reader thread while HOLDING the packet-write
  * monitor, so concurrent channel writers block for its duration —
  * which is exactly §9's requirement that no non-kex packet follows our
  * KEXINIT until NEWKEYS; peer packets already in flight when we
  * initiate are buffered ([[nextPacket]] drains them to the normal
  * dispatch afterward, order preserved). The session id stays the FIRST
  * exchange hash (§7.2) while every cipher/MAC key re-derives from the
  * new K ‖ H. The single-suite offer means a peer that cannot speak the
  * suite fails the kex loudly instead of negotiating down. Both roles
  * (client and the
  * in-spec server fixture) run this same class, so the framing and kex
  * arithmetic are exercised against themselves, against the RFC test
  * vectors in `SshWireSpec`, AND — in the server role — against an
  * INDEPENDENT implementation: `SshInteropSpec` drives the container's
  * real OpenSSH client through kex (OpenSSH verifies this class's
  * rsa-sha2-256 exchange-hash signature), password auth, and a
  * multi-window direct-tcpip echo, asserting the negotiated suite from
  * the client's own log. */
final class SshTransport(socket: Socket, val clientRole: Boolean,
                         localVersion: String = "SSH-2.0-graft_14") {
  import SshTransport._

  private val in = new DataInputStream(socket.getInputStream)
  private val out = socket.getOutputStream

  private var sendSeq = 0L
  private var recvSeq = 0L
  private var sendCipher: Cipher = _
  private var recvCipher: Cipher = _
  private var sendMac: Mac = _
  private var recvMac: Mac = _

  /** Exchange-hash H of the first kex — the SSH session id, the salt of
    * every derived key and the value userauth signatures bind to. */
  var sessionId: Array[Byte] = _

  var peerVersion: String = _

  // ------------------------------------------------------------ re-keying

  /** Encrypted-traffic budget (both directions) before the reader
    * initiates a re-key — RFC 4253 §9's one-gigabyte guidance; specs
    * shrink it to force re-keys through small transfers. */
  @volatile var rekeyAfterBytes: Long = 1L << 30

  private val sinceKex = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile private var kexes = 0
  private var clientVerify: Array[Byte] => Boolean = _
  private var serverHostKey: java.security.KeyPair = _

  /** Completed key exchanges (initial + re-keys) — spec observability. */
  def kexCount: Int = kexes

  /** The server's effective threshold runs an eighth EARLY: both ends
    * count the same bidirectional traffic, so under symmetric budgets
    * the two counters cross in the same instant — and two CONCURRENT
    * initiators can four-way deadlock on a saturated tunnel (each
    * reader parked on the write monitor held by a channel writer that
    * is blocked on a socket the other side has stopped draining). The
    * skew makes the server the initiator under symmetric budgets (the
    * client's counter resets on the responded kex ~12% before its own
    * threshold — socket-buffer drift is megabytes against a 128 MiB gap
    * at the default budget), while one-sided budgets keep either role a
    * capable initiator. The tie is broken by moving the server EARLIER,
    * never the client later: the budget encodes the cipher's data limit
    * (RFC 4253 §9), so NEITHER role may run past the configured bound —
    * a client facing a server with a larger or disabled budget must
    * still re-key at its own limit, not 12% beyond it. */
  def needsRekey: Boolean = {
    val eff =
      if (clientRole) rekeyAfterBytes
      else rekeyAfterBytes - (rekeyAfterBytes >> 3)
    sendCipher != null && sinceKex.get >= eff
  }

  /** Non-kex packets the peer had in flight when WE initiated a re-key,
    * preserved in arrival order for the normal dispatch loop. Reader-
    * thread-only, like [[readPacket]]. */
  private val pending = new java.util.ArrayDeque[Array[Byte]]()

  /** The reader's packet source: drains re-key-buffered packets first. */
  def nextPacket(): Array[Byte] =
    if (!pending.isEmpty) pending.poll() else readPacket()

  // ------------------------------------------------------ version exchange

  /** RFC 4253 §4.2: send our identification, read the peer's (ignoring
    * any pre-banner lines a server may emit). */
  def exchangeVersions(): Unit = {
    out.write((localVersion + "\r\n").getBytes(UTF_8))
    out.flush()
    var line = readLine()
    var guard = 0
    while (!line.startsWith("SSH-")) {
      guard += 1
      if (guard > 64) throw new SshProtocolException("no SSH identification")
      line = readLine()
    }
    if (!line.startsWith("SSH-2.0-") && !line.startsWith("SSH-1.99-"))
      throw new SshProtocolException(s"unsupported peer version: $line")
    peerVersion = line
  }

  private def readLine(): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\n') {
      if (c < 0) throw new SshProtocolException("EOF in version exchange")
      if (c != '\r') sb.append(c.toChar)
      if (sb.length > 255) throw new SshProtocolException("identification too long")
      c = in.read()
    }
    sb.toString
  }

  // ------------------------------------------------------- packet framing

  /** Write one packet (RFC 4253 §6): uint32 length, padding length,
    * payload, random padding — encrypted and MAC'd once keys are live.
    * Synchronized: channels and the keepalive path write concurrently. */
  def writePacket(payload: Array[Byte]): Unit = synchronized {
    val block = if (sendCipher == null) 8 else 16
    var pad = block - ((5 + payload.length) % block)
    if (pad < 4) pad += block
    val plain = new W()
      .putUInt32((1 + payload.length + pad).toLong)
      .putByte(pad)
      .putRaw(payload)
      .putRaw(randomBytes(pad))
      .bytes
    if (sendCipher == null) out.write(plain)
    else {
      val mac = {
        sendMac.reset()
        sendMac.update(new W().putUInt32(sendSeq).bytes)
        sendMac.update(plain)
        sendMac.doFinal()
      }
      out.write(sendCipher.update(plain))
      out.write(mac)
      sinceKex.addAndGet(plain.length + 32L): Unit
    }
    out.flush()
    sendSeq = (sendSeq + 1) & 0xffffffffL
  }

  /** Read one packet's payload, decrypting and MAC-verifying once keys
    * are live. Single-reader discipline: only the connection's reader
    * thread (or the pre-auth setup sequence) calls this. */
  def readPacket(): Array[Byte] = {
    if (recvCipher == null) {
      val lenBuf = new Array[Byte](4)
      in.readFully(lenBuf)
      val len = new R(lenBuf ++ Array[Byte](0)).uint32()
      checkLen(len, blockAligned = false)
      val rest = new Array[Byte](len.toInt)
      in.readFully(rest)
      recvSeq = (recvSeq + 1) & 0xffffffffL
      val padLen = rest(0) & 0xff
      java.util.Arrays.copyOfRange(rest, 1, len.toInt - padLen)
    } else {
      val first = new Array[Byte](16)
      in.readFully(first)
      val firstPlain = recvCipher.update(first)
      val len = new R(firstPlain).uint32()
      checkLen(len, blockAligned = true)
      val restLen = 4 + len.toInt - 16
      val rest = new Array[Byte](restLen)
      in.readFully(rest)
      val restPlain = if (restLen == 0) Array.emptyByteArray
        else recvCipher.update(rest)
      val macGot = new Array[Byte](32)
      in.readFully(macGot)
      recvMac.reset()
      recvMac.update(new W().putUInt32(recvSeq).bytes)
      recvMac.update(firstPlain)
      recvMac.update(restPlain)
      if (!MessageDigest.isEqual(recvMac.doFinal(), macGot))
        throw new SshProtocolException("MAC verification failed")
      recvSeq = (recvSeq + 1) & 0xffffffffL
      sinceKex.addAndGet(4L + len + 32L): Unit
      val plain = firstPlain ++ restPlain
      val padLen = plain(4) & 0xff
      java.util.Arrays.copyOfRange(plain, 5, 4 + len.toInt - padLen)
    }
  }

  /** RFC 4253 §6 bounds: the whole packet (4+len) is at least 16 bytes
    * (len ≥ 12), so the encrypted path's `restLen = 4+len-16` can never
    * go negative on attacker-supplied lengths; once keys are live, 4+len
    * must also be a whole number of 16-byte cipher blocks. */
  private def checkLen(len: Long, blockAligned: Boolean): Unit =
    if (len < 12 || len > 256 * 1024 ||
        (blockAligned && (4 + len) % 16 != 0))
      throw new SshProtocolException(s"implausible packet length $len")

  // ---------------------------------------------------------------- kex

  private def kexInitPayload(): Array[Byte] =
    new W()
      .putByte(Msg.KexInit)
      .putRaw(randomBytes(16))
      .putNameList(Seq(KexAlg))
      .putNameList(Seq(HostKeyAlg))
      .putNameList(Seq(CipherAlg)).putNameList(Seq(CipherAlg))
      .putNameList(Seq(MacAlg)).putNameList(Seq(MacAlg))
      .putNameList(Seq("none")).putNameList(Seq("none"))
      .putNameList(Nil).putNameList(Nil)
      .putBoolean(false)
      .putUInt32(0L)
      .bytes

  private def requireOffer(r: R, what: String, alg: String): Unit = {
    val offered = r.nameList()
    if (!offered.contains(alg))
      throw new SshProtocolException(
        s"peer offers no common $what: ${offered.mkString(",")} (need $alg)")
  }

  private def checkPeerKexInit(payload: Array[Byte]): Unit = {
    val r = new R(payload)
    if (r.byte() != Msg.KexInit)
      throw new SshProtocolException("expected KEXINIT")
    (0 until 16).foreach(_ => r.byte()) // cookie
    requireOffer(r, "kex", KexAlg)
    requireOffer(r, "host key", HostKeyAlg)
    requireOffer(r, "cipher c2s", CipherAlg)
    requireOffer(r, "cipher s2c", CipherAlg)
    requireOffer(r, "mac c2s", MacAlg)
    requireOffer(r, "mac s2c", MacAlg)
    requireOffer(r, "compression c2s", "none")
    requireOffer(r, "compression s2c", "none")
    r.nameList(); r.nameList()
    if (r.boolean())
      throw new SshProtocolException("guessed kex packets unsupported")
  }

  /** CLIENT key exchange: KEXINIT both ways, DH, verify the server's
    * signature over H with the host key `verify` accepts, NEWKEYS, derive
    * and activate keys. `verify` receives the raw `ssh-rsa` public blob —
    * the known-hosts seam (the spec fixture pins the expected blob;
    * accept-all is never the default) — and is RETAINED: every later
    * re-key verifies the fresh exchange hash against it too. */
  def clientKex(verifyHostKey: Array[Byte] => Boolean): Unit = {
    require(clientRole)
    clientVerify = verifyHostKey
    rekeyInitiate()
  }

  /** SERVER key exchange against [[clientKex]]: same suite, host keypair
    * supplied by the fixture and retained for re-keys. */
  def serverKex(hostKey: java.security.KeyPair): Unit = {
    require(!clientRole)
    serverHostKey = hostKey
    rekeyInitiate()
  }

  /** Initiate a (re-)key exchange — also the INITIAL kex, which is the
    * same protocol with no keys live. Runs on the reader thread; holds
    * the write monitor throughout, so no non-kex packet can follow our
    * KEXINIT (RFC 4253 §9). Peer non-kex packets already in flight are
    * buffered for [[nextPacket]]. */
  def rekeyInitiate(): Unit = synchronized {
    val mine = kexInitPayload()
    writePacket(mine)
    var peerInit: Array[Byte] = null
    var guard = 0
    while (peerInit == null) {
      guard += 1
      if (guard > 100000)
        throw new SshProtocolException("no KEXINIT from peer")
      val p = readPacket()
      (p(0) & 0xff) match {
        case Msg.KexInit => peerInit = p
        case Msg.Ignore | Msg.Debug => ()
        case other if sendCipher == null =>
          // initial kex: nothing else is legal before KEXINIT
          throw new SshProtocolException(
            s"expected KEXINIT, got message $other")
        case _ => pending.add(p): Unit
      }
    }
    runKex(mine, peerInit)
  }

  /** Answer a peer-initiated mid-session KEXINIT (the reader saw it in
    * the dispatch loop). Same monitor discipline as [[rekeyInitiate]]. */
  def rekeyRespond(peerInit: Array[Byte]): Unit = synchronized {
    runKex(kexInitPayload() match {
      case mine => writePacket(mine); mine
    }, peerInit)
  }

  private def runKex(mine: Array[Byte], peerInit: Array[Byte]): Unit = {
    checkPeerKexInit(peerInit)
    if (clientRole) doKexClient(mine, peerInit)
    else doKexServer(peerInit, mine)
  }

  /** The next kex-phase message, skipping IGNORE/DEBUG (legal anywhere,
    * and OpenSSH emits them). After both KEXINITs the peer sends nothing
    * else until NEWKEYS, so anything unexpected is a protocol error. */
  private def readKexMessage(): Array[Byte] = {
    var p = readPacket()
    while ((p(0) & 0xff) == Msg.Ignore || (p(0) & 0xff) == Msg.Debug)
      p = readPacket()
    p
  }

  private def doKexClient(iC: Array[Byte], iS: Array[Byte]): Unit = {
    val x = new BigInteger(2048 - 2, rnd).add(BigInteger.TWO)
    val e = G.modPow(x, P)
    writePacket(new W().putByte(Msg.KexDhInit).putMpint(e).bytes)
    val reply = new R(readKexMessage())
    if (reply.byte() != Msg.KexDhReply)
      throw new SshProtocolException("expected KEXDH_REPLY")
    val hostKeyBlob = reply.string()
    val f = reply.mpint()
    val sigBlob = reply.string()
    if (f.signum <= 0 || f.compareTo(P) >= 0)
      throw new SshProtocolException("server DH value out of range")
    if (!clientVerify(hostKeyBlob))
      throw new SshProtocolException("host key rejected")
    val k = f.modPow(x, P)
    val h = exchangeHash(localVersion, peerVersion, iC, iS, hostKeyBlob, e, f, k)
    verifySignature(hostKeyBlob, sigBlob, h)
    finishKex(k, h)
  }

  private def doKexServer(iC: Array[Byte], iS: Array[Byte]): Unit = {
    val hostKey = serverHostKey
    val init = new R(readKexMessage())
    if (init.byte() != Msg.KexDhInit)
      throw new SshProtocolException("expected KEXDH_INIT")
    val e = init.mpint()
    if (e.signum <= 0 || e.compareTo(P) >= 0)
      throw new SshProtocolException("client DH value out of range")
    val y = new BigInteger(2048 - 2, rnd).add(BigInteger.TWO)
    val f = G.modPow(y, P)
    val k = e.modPow(y, P)
    val pub = hostKey.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey]
    val hostKeyBlob = new W().putString("ssh-rsa")
      .putMpint(pub.getPublicExponent).putMpint(pub.getModulus).bytes
    // NOTE: versions swap — V_C is the PEER's here
    val h = exchangeHash(peerVersion, localVersion, iC, iS, hostKeyBlob, e, f, k)
    val sig = java.security.Signature.getInstance("SHA256withRSA")
    sig.initSign(hostKey.getPrivate)
    sig.update(h)
    val sigBlob = new W().putString(HostKeyAlg).putString(sig.sign()).bytes
    writePacket(new W().putByte(Msg.KexDhReply)
      .putString(hostKeyBlob).putMpint(f).putString(sigBlob).bytes)
    finishKex(k, h)
  }

  /** H = hash over the RFC 4253 §8 concatenation. */
  private def exchangeHash(vC: String, vS: String, iC: Array[Byte],
                           iS: Array[Byte], hostKeyBlob: Array[Byte],
                           e: BigInteger, f: BigInteger,
                           k: BigInteger): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(new W()
      .putString(vC).putString(vS)
      .putString(iC).putString(iS)
      .putString(hostKeyBlob)
      .putMpint(e).putMpint(f).putMpint(k)
      .bytes)

  private def verifySignature(hostKeyBlob: Array[Byte], sigBlob: Array[Byte],
                              h: Array[Byte]): Unit = {
    val kb = new R(hostKeyBlob)
    if (kb.stringUtf8() != "ssh-rsa")
      throw new SshProtocolException("host key blob is not ssh-rsa")
    val pubExp = kb.mpint(); val modulus = kb.mpint()
    val sb = new R(sigBlob)
    val sigAlg = sb.stringUtf8()
    if (sigAlg != HostKeyAlg)
      throw new SshProtocolException(s"unexpected signature algorithm $sigAlg")
    val raw = sb.string()
    val pub = java.security.KeyFactory.getInstance("RSA").generatePublic(
      new java.security.spec.RSAPublicKeySpec(modulus, pubExp))
    val ver = java.security.Signature.getInstance("SHA256withRSA")
    ver.initVerify(pub)
    ver.update(h)
    if (!ver.verify(raw))
      throw new SshProtocolException("host key signature verification failed")
  }

  /** NEWKEYS both ways, then derive (RFC 4253 §7.2) and activate the four
    * direction keys. Client writes with the c2s keys ('A','C','E'),
    * reads with s2c ('B','D','F'); server the mirror image. */
  private def finishKex(k: BigInteger, h: Array[Byte]): Unit = {
    if (sessionId == null) sessionId = h
    writePacket(Array(Msg.NewKeys.toByte))
    val nk = readKexMessage()
    if (nk.length != 1 || (nk(0) & 0xff) != Msg.NewKeys)
      throw new SshProtocolException("expected NEWKEYS")
    def key(x: Char, n: Int) = deriveKey(k, h, x, sessionId, n)
    val (ivOut, keyOut, macOut, ivIn, keyIn, macIn) =
      if (clientRole)
        (key('A', 16), key('C', 16), key('E', 32),
          key('B', 16), key('D', 16), key('F', 32))
      else
        (key('B', 16), key('D', 16), key('F', 32),
          key('A', 16), key('C', 16), key('E', 32))
    sendCipher = ctr(Cipher.ENCRYPT_MODE, keyOut, ivOut)
    recvCipher = ctr(Cipher.DECRYPT_MODE, keyIn, ivIn)
    sendMac = hmac(macOut)
    recvMac = hmac(macIn)
    sinceKex.set(0L)
    kexes += 1
  }

  private def ctr(mode: Int, key: Array[Byte], iv: Array[Byte]): Cipher = {
    val c = Cipher.getInstance("AES/CTR/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c
  }

  private def hmac(key: Array[Byte]): Mac = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m
  }

  def close(): Unit =
    try socket.close() catch { case _: IOException => () }
}

object SshTransport {
  val KexAlg = "diffie-hellman-group14-sha256"
  val HostKeyAlg = "rsa-sha2-256"
  val CipherAlg = "aes128-ctr"
  val MacAlg = "hmac-sha2-256"

  /** RFC 3526 group 14: 2048-bit MODP prime, generator 2. */
  val P: BigInteger = new BigInteger(
    ("FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74" +
      "020BBEA63B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F1437" +
      "4FE1356D6D51C245E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7ED" +
      "EE386BFB5A899FA5AE9F24117C4B1FE649286651ECE45B3DC2007CB8A163BF05" +
      "98DA48361C55D39A69163FA8FD24CF5F83655D23DCA3AD961C62F356208552BB" +
      "9ED529077096966D670C354E4ABC9804F1746C08CA18217C32905E462E36CE3B" +
      "E39E772C180E86039B2783A2EC07A28FB5C55DF06F4C52C9DE2BCBF695581718" +
      "3995497CEA956AE515D2261898FA051015728E5A8AACAA68FFFFFFFFFFFFFFFF"), 16)
  val G: BigInteger = BigInteger.TWO

  private val rnd = new java.security.SecureRandom()

  def randomBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); rnd.nextBytes(b); b
  }

  /** RFC 4253 §7.2 key derivation: K1 = HASH(K ‖ H ‖ X ‖ session_id),
    * Kn+1 = HASH(K ‖ H ‖ K1 ‖ … ‖ Kn), truncated to `need`. */
  def deriveKey(k: BigInteger, h: Array[Byte], x: Char,
                sessionId: Array[Byte], need: Int): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    val kPrefix = new W().putMpint(k).bytes
    var acc = md.digest(kPrefix ++ h ++ Array(x.toByte) ++ sessionId)
    while (acc.length < need)
      acc = acc ++ md.digest(kPrefix ++ h ++ acc)
    acc.take(need)
  }
}
