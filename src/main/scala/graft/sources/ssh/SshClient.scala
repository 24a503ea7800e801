package graft.sources.ssh

import java.io.{IOException, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import SshWire.{Msg, R, W}

/** SSH-2 client connection (transport + password userauth + `direct-tcpip`
  * channels, RFC 4252/4254) — the session side of the S4 tunnel's real hop.
  * One connection multiplexes any number of concurrently open forward
  * channels (one per accepted tunnel client); a single reader thread
  * dispatches incoming packets to per-channel queues, and writes go
  * through the transport's packet lock. Flow control is the real RFC 4254
  * window protocol on BOTH directions: outbound data blocks when the
  * peer's window is exhausted, inbound consumption replenishes our window
  * with WINDOW_ADJUST once half is used. */
final class SshClient(host: String, port: Int, user: String, password: String,
                      verifyHostKey: Array[Byte] => Boolean,
                      connectTimeoutMs: Int = 5000) extends AutoCloseable {
  import SshClient._

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  socket.setTcpNoDelay(true)
  private val transport = new SshTransport(socket, clientRole = true)
  private val channels = new ConcurrentHashMap[Long, SshChannel]()
  private val nextId = new AtomicLong(0L)
  @volatile private var dead: IOException = _

  // --- connection setup runs synchronously on the constructing thread ---
  transport.exchangeVersions()
  transport.clientKex(verifyHostKey)
  authenticate()
  private val reader = {
    val t = new Thread(() => readLoop(), s"graft-ssh-reader:$host:$port")
    t.setDaemon(true)
    t.start()
    t
  }

  private def authenticate(): Unit = {
    transport.writePacket(new W().putByte(Msg.ServiceRequest)
      .putString("ssh-userauth").bytes)
    val accept = new R(transport.readPacket())
    if (accept.byte() != Msg.ServiceAccept)
      throw new SshProtocolException("expected SERVICE_ACCEPT")
    transport.writePacket(new W().putByte(Msg.UserauthRequest)
      .putString(user).putString("ssh-connection").putString("password")
      .putBoolean(false).putString(password).bytes)
    var done = false
    while (!done) {
      val p = transport.readPacket()
      (p(0) & 0xff) match {
        case Msg.UserauthSuccess => done = true
        case Msg.UserauthFailure =>
          throw new IOException(s"SSH authentication failed for user $user")
        case 53 /* USERAUTH_BANNER */ | Msg.Ignore | Msg.Debug => ()
        case other =>
          throw new SshProtocolException(s"unexpected message $other in auth")
      }
    }
  }

  /** Open a forward channel to (destHost, destPort) through the session
    * and wrap it as a [[Socket]] — the [[graft.sources.Tunnel.ChannelFactory]]
    * return shape, so the forwarder pumps it exactly like a TCP socket. */
  def openDirectTcpip(destHost: String, destPort: Int,
                      timeoutMs: Long = 10000): Socket = {
    failIfDead()
    val id = nextId.getAndIncrement()
    val ch = new SshChannel(this, id)
    channels.put(id, ch)
    transport.writePacket(new W().putByte(Msg.ChannelOpen)
      .putString("direct-tcpip").putUInt32(id)
      .putUInt32(LocalWindow).putUInt32(MaxPacket)
      .putString(destHost).putUInt32(destPort.toLong)
      .putString("127.0.0.1").putUInt32(0L)
      .bytes)
    if (!ch.opened.await(timeoutMs, TimeUnit.MILLISECONDS)) {
      channels.remove(id)
      throw new IOException(s"direct-tcpip open to $destHost:$destPort timed out")
    }
    if (ch.openFailure != null) {
      channels.remove(id)
      throw new IOException(
        s"direct-tcpip open to $destHost:$destPort refused: ${ch.openFailure}")
    }
    ch.asSocket
  }

  def isAlive: Boolean = dead == null && !socket.isClosed

  private def failIfDead(): Unit = {
    val d = dead
    if (d != null) throw new IOException("SSH connection is down", d)
  }

  /** Shrink the transport's re-key budget (spec knob — see
    * [[SshTransport.rekeyAfterBytes]]). */
  def setRekeyAfterBytes(n: Long): Unit = transport.rekeyAfterBytes = n

  /** Completed key exchanges on this connection (initial kex = 1). */
  def kexCount: Int = transport.kexCount

  private def readLoop(): Unit =
    try {
      while (true) {
        if (transport.needsRekey) transport.rekeyInitiate()
        val p = transport.nextPacket()
        val r = new R(p)
        // channel-scoped messages racing a locally-removed channel (open
        // timeout, close) are dropped, not fatal: the peer may have data/
        // adjusts in flight for a channel we already abandoned
        (r.byte(): @annotation.switch) match {
          case Msg.ChannelOpenConfirmation =>
            val ch = channels.get(r.uint32())
            if (ch != null) {
              ch.remoteId = r.uint32()
              ch.addWindow(r.uint32())
              val mp = r.uint32()
              // a peer max-packet at or below the 64-byte framing headroom
              // would make every write grant 0 bytes and spin forever —
              // fail the open instead (round-14 advice)
              if (mp < 256L) ch.failOpen(s"implausible peer max packet $mp")
              else {
                ch.remoteMaxPacket = mp.toInt
                ch.opened.countDown()
              }
            }
          case Msg.ChannelOpenFailure =>
            val ch = channels.get(r.uint32())
            if (ch != null) {
              r.uint32() // reason code
              ch.openFailure = r.stringUtf8()
              ch.opened.countDown()
            }
          case Msg.ChannelWindowAdjust =>
            val ch = channels.get(r.uint32())
            if (ch != null) ch.addWindow(r.uint32())
          case Msg.ChannelData =>
            val ch = channels.get(r.uint32())
            if (ch != null) ch.deliver(r.string())
          case Msg.ChannelExtendedData =>
            val ch = channels.get(r.uint32()); r.uint32()
            if (ch != null) ch.deliverExtended(r.string().length) // no stderr here
          case Msg.ChannelEof =>
            val ch = channels.get(r.uint32())
            if (ch != null) ch.deliverEof()
          case Msg.ChannelClose =>
            val id = r.uint32()
            val ch = channels.remove(id)
            if (ch != null) ch.peerClosed()
          case Msg.ChannelRequest =>
            val ch = channels.get(r.uint32()); r.stringUtf8()
            if (ch != null && r.boolean())
              transport.writePacket(new W().putByte(Msg.ChannelFailure)
                .putUInt32(ch.remoteId).bytes)
          case Msg.GlobalRequest =>
            r.stringUtf8()
            if (r.boolean())
              transport.writePacket(Array(Msg.RequestFailure.toByte))
          case Msg.KexInit =>
            // peer-initiated re-key (RFC 4253 §9) — answered inline on
            // this reader thread; channel writers block on the packet
            // monitor for the exchange's duration
            transport.rekeyRespond(p)
          case Msg.Ignore | Msg.Debug | Msg.Unimplemented => ()
          case Msg.Disconnect =>
            r.uint32()
            throw new IOException(s"peer disconnected: ${r.stringUtf8()}")
          case other =>
            throw new SshProtocolException(s"unexpected message $other")
        }
      }
    } catch {
      // NonFatal, not just IOException: a malformed peer packet that trips
      // an array/parse exception must still kill the connection LOUDLY —
      // a silently-dead reader thread leaves every open channel blocked
      // on its queue forever (round-14 advice).
      case scala.util.control.NonFatal(e) =>
        val io = e match {
          case io: IOException => io
          case other => new IOException(s"SSH reader failed: $other", other)
        }
        dead = io
        channels.values.forEach(_.connectionDown(io))
        channels.clear()
        transport.close()
    }

  private[ssh] def send(payload: Array[Byte]): Unit = {
    failIfDead()
    transport.writePacket(payload)
  }

  private[ssh] def channelGone(id: Long): Unit = channels.remove(id)

  override def close(): Unit = {
    channels.values.forEach(ch =>
      ch.connectionDown(new IOException("SSH connection closed")))
    channels.clear()
    transport.close()
    reader.join(2000)
  }
}

object SshClient {
  /** Our receive window and the max packet we advertise. The window is
    * replenished once half is consumed, so steady-state throughput never
    * stalls on adjusts. */
  val LocalWindow = 2L * 1024 * 1024
  val MaxPacket = 32768L
}

/** One `direct-tcpip` channel: per-channel inbound queue + both-direction
  * RFC 4254 window accounting, exposed as Input/OutputStream and wrapped
  * by [[asSocket]] for the tunnel forwarder. */
private[ssh] final class SshChannel(client: SshClient, localId: Long) {
  import SshWire.{Msg, W}

  val opened = new CountDownLatch(1)
  @volatile var openFailure: String = _
  @volatile var remoteId: Long = -1L
  @volatile var remoteMaxPacket: Int = 32768

  // peer's window for OUR writes
  private val windowLock = new Object
  private var remoteWindow = 0L

  // our window for the PEER's writes
  private val consumedLock = new Object
  private var consumedSinceAdjust = 0L
  // delivered-but-unconsumed inbound bytes: read-side replenishment bounds
  // a COMPLIANT peer at the advertised window; a peer that keeps sending
  // past it must kill the connection loudly, not grow inQueue without
  // limit (round-15 advice). One MaxPacket of slack over the strict bound
  // keeps a borderline last packet from flapping the session.
  private var outstandingInbound = 0L

  private def noteInbound(n: Int): Unit = consumedLock.synchronized {
    outstandingInbound += n
    if (outstandingInbound > SshClient.LocalWindow + SshClient.MaxPacket)
      throw new SshProtocolException(
        s"peer overran the receive window: $outstandingInbound bytes " +
          s"outstanding, advertised window ${SshClient.LocalWindow}")
  }

  private sealed trait InEvent
  private case class Data(bytes: Array[Byte]) extends InEvent
  private case object Eof extends InEvent
  private case class Down(cause: IOException) extends InEvent

  private val inQueue = new LinkedBlockingQueue[InEvent]()
  @volatile private var closeSent = false
  @volatile private var downCause: IOException = _

  def addWindow(n: Long): Unit = windowLock.synchronized {
    remoteWindow += n
    windowLock.notifyAll()
  }

  // Enqueue only — window accounting happens when the CONSUMER reads the
  // bytes (the InputStream below), not when the reader thread queues them.
  // Replenishing at enqueue time never exerts backpressure: a peer sending
  // faster than the tunnel client reads would grow inQueue without bound,
  // because each adjust re-arms the peer before the data is drained
  // (round-14 advice). With read-side accounting the advertised 2 MiB
  // window is a real bound on buffered-but-unread data — and noteInbound
  // ENFORCES it against non-compliant peers.
  def deliver(bytes: Array[Byte]): Unit = {
    noteInbound(bytes.length)
    inQueue.put(Data(bytes))
  }

  /** Extended data is dropped on arrival: it counts against the window at
    * receipt (a violator dies like any other) and is consumed
    * immediately. */
  def deliverExtended(n: Int): Unit = {
    noteInbound(n)
    consumeOnly(n)
  }

  /** Window accounting for inbound bytes (data the consumer has READ, and
    * extended data we drop on arrival): replenish with one adjust per
    * half-window consumed. */
  def consumeOnly(n: Int): Unit = {
    val adjust = consumedLock.synchronized {
      consumedSinceAdjust += n
      outstandingInbound -= n
      if (consumedSinceAdjust >= SshClient.LocalWindow / 2) {
        val a = consumedSinceAdjust
        consumedSinceAdjust = 0L
        a
      } else 0L
    }
    if (adjust > 0L && remoteId >= 0 && !closeSent)
      client.send(new W().putByte(Msg.ChannelWindowAdjust)
        .putUInt32(remoteId).putUInt32(adjust).bytes)
  }

  /** Open-failure path for a confirmed-but-unusable channel: record the
    * reason, close on the wire (the peer believes the channel opened)
    * THROUGH the close-once machinery — so the peer's reciprocal
    * CHANNEL_CLOSE finds closeSent already set and cannot trigger a
    * second CLOSE for an id the peer has discarded (strict peers
    * disconnect the whole multiplexed session on that). */
  def failOpen(reason: String): Unit = {
    openFailure = reason
    sendCloseOnce()
    opened.countDown()
  }

  def deliverEof(): Unit = inQueue.put(Eof)

  def peerClosed(): Unit = {
    sendCloseOnce()
    inQueue.put(Eof)
  }

  def connectionDown(e: IOException): Unit = {
    downCause = e
    windowLock.synchronized { windowLock.notifyAll() }
    inQueue.put(Down(e))
  }

  private def sendCloseOnce(): Unit = synchronized {
    if (!closeSent) {
      closeSent = true
      try client.send(new W().putByte(Msg.ChannelClose)
        .putUInt32(remoteId).bytes)
      catch { case _: IOException => () }
    }
  }

  private val in: InputStream = new InputStream {
    private var current: Array[Byte] = _
    private var pos = 0
    private var eof = false
    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (eof) return -1
      while (current == null || pos >= current.length) {
        inQueue.take() match {
          case Data(bytes) => current = bytes; pos = 0
          case Eof => eof = true; return -1
          case Down(cause) => eof = true; throw new IOException(cause)
        }
      }
      val n = math.min(len, current.length - pos)
      System.arraycopy(current, pos, b, off, n)
      pos += n
      consumeOnly(n) // replenish only what was handed to the consumer
      n
    }
  }

  private val out: OutputStream = new OutputStream {
    override def write(b: Int): Unit = write(Array(b.toByte), 0, 1)
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      var sent = 0
      while (sent < len) {
        if (closeSent) throw new IOException("channel closed")
        // acquire window, bounded by the peer's max packet
        val grant = windowLock.synchronized {
          while (remoteWindow <= 0 && downCause == null && !closeSent)
            windowLock.wait(1000)
          if (downCause != null) throw new IOException(downCause)
          if (closeSent) throw new IOException("channel closed")
          val g = math.min(remoteWindow,
            math.min((len - sent).toLong, remoteMaxPacket.toLong - 64L))
          remoteWindow -= g
          g.toInt
        }
        client.send(new W().putByte(Msg.ChannelData).putUInt32(remoteId)
          .putUInt32(grant.toLong)
          .putRaw(java.util.Arrays.copyOfRange(b, off + sent, off + sent + grant))
          .bytes)
        sent += grant
      }
    }
  }

  /** The channel as a [[Socket]] — only the methods the tunnel forwarder
    * touches are meaningful; the underlying TCP state accessors of the
    * unconnected base Socket are not routed. */
  def asSocket: Socket = new Socket() {
    override def getInputStream: InputStream = in
    override def getOutputStream: OutputStream = out
    override def shutdownOutput(): Unit =
      if (!closeSent)
        try client.send(new W().putByte(Msg.ChannelEof)
          .putUInt32(remoteId).bytes)
        catch { case _: IOException => () }
    override def close(): Unit = {
      sendCloseOnce()
      client.channelGone(localId)
      inQueue.put(Eof)
    }
    override def isClosed: Boolean = closeSent
  }
}

/** [[graft.sources.Tunnel.ChannelFactory]] over a REAL SSH hop — the
  * deployment implementation of the S4 seam
  * (index_align_to_firebase.py:43-101's `SSHTunnelForwarder`, re-expressed
  * over this stack): one lazily-connected SSH session per factory, each
  * `open()` a `direct-tcpip` channel on it (channels multiplex; a dead
  * session reconnects on the next open). `verifyHostKey` is the
  * known-hosts seam — pass a pinned public-key blob check; there is no
  * accept-all default. */
final class SshChannelFactory(sshHost: String, sshPort: Int, user: String,
                              password: String,
                              verifyHostKey: Array[Byte] => Boolean,
                              targetHost: String, targetPort: Int)
    extends graft.sources.Tunnel.ChannelFactory with AutoCloseable {
  private var client: SshClient = _

  override def open(): Socket = {
    val c = synchronized {
      if (client == null || !client.isAlive) {
        if (client != null) client.close()
        client = new SshClient(sshHost, sshPort, user, password, verifyHostKey)
      }
      client
    }
    c.openDirectTcpip(targetHost, targetPort)
  }

  override def describe: String =
    s"ssh://$user@$sshHost:$sshPort -> $targetHost:$targetPort"

  override def close(): Unit = synchronized {
    if (client != null) { client.close(); client = null }
  }
}
