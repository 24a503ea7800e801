package graft.sources

import java.io.IOException
import java.net.{InetAddress, InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** Tunnel management for the S4 source path (SURVEY.md §2.1): the
  * reference reaches its MySQL host through a forwarded local port
  * (index_align_to_firebase.py:43-101 — `SSHTunnelForwarder` bound to
  * `('127.0.0.1', 0)`, then pymysql connects to
  * `127.0.0.1:tunnel.local_bind_port`). [[TunnelForwarder]] reproduces
  * that contract as engine code: bind an ephemeral loopback port, relay
  * every accepted connection to the remote bind address, expose
  * `localBindPort`, tear everything down on `close()`.
  *
  * The hop rides the [[Tunnel.ChannelFactory]] seam:
  * [[Tunnel.DirectChannel]] (plain TCP) for an unciphered bind, and the
  * REAL SSH-2 hop [[graft.sources.ssh.SshChannelFactory]] — a pure-JDK
  * client (group14-sha256 kex, rsa-sha2-256 host keys verified against a
  * pinned blob, aes128-ctr + hmac-sha2-256, password auth, multiplexed
  * `direct-tcpip` channels; `graft.sources.ssh`) exercised in-spec
  * against an in-process SSH server running the same transport, with
  * on-the-wire ciphertext and MAC-tamper checks. Deployments may still
  * swap any other factory (e.g. a JSch-backed one) without touching the
  * forwarder — the same config-over-code seam as
  * [[graft.sinks.BatchTransports]].
  *
  * Scale/placement note: a tunnel is DRIVER-side infrastructure. The
  * forwarded port only exists on the host that opened it, so a
  * partition-parallel JDBC scan through a tunnel
  * ([[Tables.jdbcPartitioned]]) must either run executors co-located
  * with the driver (local mode — the reference's actual deployment) or
  * open one tunnel per executor via a connection-provider hook. The
  * forwarder itself is cheap enough for either: two daemon threads per
  * live connection, no buffering beyond a fixed 16 KiB copy buffer per
  * direction, so N JDBC partition cursors cost 2N threads and O(N)
  * memory.
  */
object Tunnel {

  /** Opens one forward channel to the tunnel's remote bind address.
    * Implementations must be safe to call concurrently (one open per
    * accepted local connection). */
  trait ChannelFactory {
    def open(): Socket
    /** Human-readable remote endpoint, for diagnostics. */
    def describe: String
  }

  /** Plain-TCP hop: connect straight to the remote bind address. The
    * in-sandbox stand-in for the SSH `direct-tcpip` channel. */
  final class DirectChannel(host: String, port: Int,
                            connectTimeoutMs: Int = 5000) extends ChannelFactory {
    override def open(): Socket = {
      val s = new Socket()
      try { s.connect(new InetSocketAddress(host, port), connectTimeoutMs); s }
      catch { case e: IOException => runCatching(s.close()); throw e }
    }
    override def describe: String = s"tcp://$host:$port"
  }

  private[sources] def runCatching(f: => Unit): Unit =
    try f catch { case _: IOException => () }

  /** Bracketed lifecycle — the reference's shape: tunnel up, work
    * through it, `tunnel.stop()` in the finally block no matter how the
    * pipeline exits (index_align_to_firebase.py:329-333). */
  def withTunnel[A](factory: ChannelFactory)(body: TunnelForwarder => A): A = {
    val t = new TunnelForwarder(factory).start()
    try body(t) finally t.close()
  }
}

/** A live local-port forwarder. `start()` binds and begins accepting;
  * `close()` stops the listener, severs every in-flight relay, and
  * joins the acceptor. Mirrors `SSHTunnelForwarder.start()/stop()`
  * lifecycle (index_align_to_firebase.py:81,101 start;
  * :329-333 `tunnel.stop()` in the pipeline's finally block).
  *
  * Channel-open failures are retried with doubling backoff up to
  * `maxOpenRetries` (transient bastion/DB hiccups — same instinct as
  * [[graft.sinks.HttpBatchWriter]]'s transient tier); if retries
  * exhaust, that ONE client connection is closed (the dialing client
  * sees connection-reset, exactly what sshtunnel produces) and the
  * forwarder stays up for subsequent connections.
  */
final class TunnelForwarder(factory: Tunnel.ChannelFactory,
                            maxOpenRetries: Int = 2,
                            initialBackoffMs: Long = 10L) extends AutoCloseable {
  import Tunnel.runCatching

  private val server = new ServerSocket()
  private val closed = new AtomicBoolean(false)
  private val live = ConcurrentHashMap.newKeySet[Socket]()
  private val relaySeq = new AtomicInteger(0)
  @volatile private var acceptor: Thread = _

  /** Bind 127.0.0.1:0 (ephemeral port, loopback only — never a
    * wildcard bind: the tunnel must not expose the remote service to
    * the network, matching the reference's `local_bind_address=
    * ('127.0.0.1', 0)`) and start the accept loop. Idempotence is not
    * needed — one forwarder, one lifecycle. */
  def start(): TunnelForwarder = {
    server.bind(new InetSocketAddress(InetAddress.getLoopbackAddress, 0))
    acceptor = daemon(s"graft-tunnel-acceptor:${server.getLocalPort}") { () =>
      while (!closed.get() && !server.isClosed) {
        val client =
          try server.accept()
          catch {
            case _: IOException =>
              // closed underneath us → the loop guard exits next pass; a
              // PERSISTENT non-fatal accept failure (EMFILE under many
              // concurrent JDBC cursors — the advertised use) must not
              // busy-spin the acceptor: brief pause, then retry
              if (!closed.get() && !server.isClosed) Thread.sleep(10)
              null
          }
        // hop open (with its retry/backoff and connect timeouts) runs on
        // its OWN thread: inline it and one slow/dead hop head-of-line-
        // blocks every other client's connection setup — N concurrent
        // JDBC cursors (the advertised use) must set up independently
        if (client != null)
          daemon(s"graft-tunnel-setup-${relaySeq.incrementAndGet()}")(
            () => relay(client))
      }
    }
    this
  }

  /** The auto-allocated local port (`tunnel.local_bind_port` in the
    * reference) — dial 127.0.0.1:this to reach the remote service. */
  def localBindPort: Int = server.getLocalPort

  /** True only between a successful `start()` (bound listener) and
    * `close()` — an UNSTARTED forwarder is not active (its port would
    * read -1), so URL-building guards fail fast on the misuse. */
  def isActive: Boolean = !closed.get() && server.isBound && !server.isClosed

  /** Open the hop channel (with bounded retry) and pump bytes both ways
    * until either side hangs up.
    *
    * Close-race discipline: each socket is registered in `live` BEFORE
    * the next blocking step, and `closed` is re-checked AFTER each
    * registration. `close()` sets `closed` first, then severs `live` —
    * so for any interleaving either close() sees the socket in `live`
    * and severs it, or this thread's post-registration check sees
    * `closed` and severs it itself. No relay can survive close(). */
  private def relay(client: Socket): Unit = {
    live.add(client)
    if (closed.get()) { runCatching(client.close()); live.remove(client); return }
    val channel =
      try openWithRetry()
      catch {
        case _: IOException =>
          runCatching(client.close()) // surface as reset to the dialer
          live.remove(client)
          return
      }
    live.add(channel)
    if (closed.get()) {
      runCatching(client.close()); runCatching(channel.close())
      live.remove(client); live.remove(channel)
      return
    }
    val id = relaySeq.incrementAndGet()
    val half = new AtomicInteger(2)
    def pump(name: String, from: Socket, to: Socket): Unit =
      daemon(s"graft-tunnel-$id-$name") { () =>
        val buf = new Array[Byte](16 * 1024)
        try {
          val in = from.getInputStream; val out = to.getOutputStream
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); out.flush(); n = in.read(buf) }
          runCatching(to.shutdownOutput()) // propagate half-close (FIN)
        } catch { case _: IOException => () }
        finally if (half.decrementAndGet() == 0) { // both directions done
          runCatching(client.close()); runCatching(channel.close())
          live.remove(client); live.remove(channel)
        }
      }
    pump("up", client, channel)
    pump("down", channel, client)
  }

  /** Close-aware retry: `closed` is re-checked before every dial and the
    * backoff sleeps in 10 ms slices that re-check it too, so a setup
    * thread lingers at most one in-flight `factory.open()` connect
    * timeout past close() — never connect-timeout PLUS the whole
    * backoff ladder. */
  private def openWithRetry(): Socket = {
    var attempt = 0
    var backoffMs = initialBackoffMs
    while (true) {
      if (closed.get()) throw new IOException("forwarder closed")
      try return factory.open()
      catch {
        case e: IOException =>
          if (attempt >= maxOpenRetries || closed.get()) throw e
          var waited = 0L
          while (waited < backoffMs && !closed.get()) {
            val step = math.min(10L, backoffMs - waited)
            Thread.sleep(step); waited += step
          }
          backoffMs *= 2; attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Stop accepting, sever every live relay, join the acceptor. Safe to
    * call twice (the pipeline's finally-block `tunnel.stop()` shape). */
  override def close(): Unit = if (closed.compareAndSet(false, true)) {
    runCatching(server.close())
    live.forEach(s => runCatching(s.close()))
    live.clear()
    val a = acceptor
    if (a != null) a.join(2000)
  }

  private def daemon(name: String)(body: () => Unit): Thread = {
    val t = new Thread(() => body(), name)
    t.setDaemon(true)
    t.start()
    t
  }
}
