package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sinks.{DocumentSink, HttpBatchWriter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.io.IOException
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** [[TunnelForwarder]] against real local sockets: the
  * `SSHTunnelForwarder` lifecycle from index_align_to_firebase.py:43-101
  * reproduced as engine code — ephemeral loopback bind, relay to the
  * remote bind address, clean teardown — with the hop behind the
  * [[Tunnel.ChannelFactory]] seam (DirectChannel in-sandbox). */
class TunnelSpec extends AnyFunSuite {

  /** A one-connection-at-a-time uppercasing echo server: proves bytes
    * crossed the relay (not a loopback short-circuit) because the
    * response is a transformation only the remote side applies. */
  private def withUpperEcho(body: Int => Unit): Unit = {
    val srv = new ServerSocket(0, 50, java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try while (true) {
        val s = srv.accept()
        new Thread(() => {
          try {
            val in = s.getInputStream; val out = s.getOutputStream
            val buf = new Array[Byte](4096)
            var n = in.read(buf)
            while (n >= 0) {
              out.write(new String(buf, 0, n, StandardCharsets.UTF_8)
                .toUpperCase.getBytes(StandardCharsets.UTF_8))
              out.flush()
              n = in.read(buf)
            }
          } catch { case _: IOException => () } finally s.close()
        }).start()
      } catch { case _: IOException => () } // server closed
    })
    t.setDaemon(true); t.start()
    try body(srv.getLocalPort) finally srv.close()
  }

  private def roundTrip(port: Int, msg: String): String = {
    val s = new Socket("127.0.0.1", port)
    try {
      s.setSoTimeout(5000)
      s.getOutputStream.write(msg.getBytes(StandardCharsets.UTF_8))
      s.getOutputStream.flush()
      s.shutdownOutput()
      new String(s.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    } finally s.close()
  }

  test("relays bytes to the remote bind address on an auto-allocated loopback port") {
    withUpperEcho { remotePort =>
      val tunnel = new TunnelForwarder(new Tunnel.DirectChannel("127.0.0.1", remotePort)).start()
      try {
        assert(tunnel.localBindPort > 0, "port 0 bind must resolve to a real ephemeral port")
        assert(tunnel.localBindPort !== remotePort)
        assert(tunnel.isActive)
        assert(roundTrip(tunnel.localBindPort, "hello tunnel") === "HELLO TUNNEL")
      } finally tunnel.close()
    }
  }

  test("concurrent connections each get their own relay, payloads never cross") {
    withUpperEcho { remotePort =>
      val tunnel = new TunnelForwarder(new Tunnel.DirectChannel("127.0.0.1", remotePort)).start()
      try {
        val results = new ConcurrentHashMap[Int, String]()
        val threads = (0 until 8).map { i =>
          val t = new Thread(() => results.put(i, roundTrip(tunnel.localBindPort, s"msg-$i-" * 200)))
          t.start(); t
        }
        threads.foreach(_.join(10000))
        (0 until 8).foreach { i =>
          assert(results.get(i) === s"MSG-$i-" * 200, s"connection $i payload intact")
        }
      } finally tunnel.close()
    }
  }

  test("close() severs the listener and in-flight relays; safe to call twice") {
    withUpperEcho { remotePort =>
      val tunnel = new TunnelForwarder(new Tunnel.DirectChannel("127.0.0.1", remotePort)).start()
      val port = tunnel.localBindPort
      // hold a connection open across the close to prove it is severed
      val held = new Socket("127.0.0.1", port)
      held.setSoTimeout(5000)
      tunnel.close()
      tunnel.close() // the finally-block double-stop shape: must not throw
      assert(!tunnel.isActive)
      // the held relay is severed: read hits EOF or reset, never data
      val severed =
        try held.getInputStream.read() == -1 catch { case _: IOException => true }
      assert(severed, "in-flight relay must be severed on close")
      held.close()
      // new dials are refused — the local port no longer listens
      intercept[IOException](new Socket("127.0.0.1", port).close())
    }
  }

  test("hop-open failure: that client sees a dead connection, forwarder survives") {
    // a remote that refuses: bind-then-close leaves a port with no listener
    val probe = new ServerSocket(0); val deadPort = probe.getLocalPort; probe.close()
    val attempts = new AtomicInteger(0)
    val factory = new Tunnel.ChannelFactory {
      override def open(): Socket = { attempts.incrementAndGet(); new Tunnel.DirectChannel("127.0.0.1", deadPort, 500).open() }
      override def describe: String = "tcp://dead"
    }
    val tunnel = new TunnelForwarder(factory, maxOpenRetries = 2, initialBackoffMs = 1L).start()
    try {
      val s = new Socket("127.0.0.1", tunnel.localBindPort)
      s.setSoTimeout(5000)
      val dead = try s.getInputStream.read() == -1 catch { case _: IOException => true }
      assert(dead, "dialer must see reset/EOF when the hop cannot open")
      s.close()
      assert(attempts.get === 3, "initial attempt + maxOpenRetries")
      assert(tunnel.isActive, "one failed hop must not kill the forwarder")
    } finally tunnel.close()
  }

  test("withTunnel brackets the lifecycle: closed on success AND on throw") {
    withUpperEcho { remotePort =>
      val factory = new Tunnel.DirectChannel("127.0.0.1", remotePort)
      var port = 0
      val out = Tunnel.withTunnel(factory) { t =>
        port = t.localBindPort
        roundTrip(port, "bracketed")
      }
      assert(out === "BRACKETED")
      intercept[IOException](new Socket("127.0.0.1", port).close())
      val thrown = intercept[RuntimeException] {
        Tunnel.withTunnel(factory) { t => port = t.localBindPort; sys.error("boom") }
      }
      assert(thrown.getMessage === "boom")
      intercept[IOException](new Socket("127.0.0.1", port).close())
    }
  }

  test("jdbcUrlViaTunnel rewrites the endpoint to the tunnel's local end") {
    withUpperEcho { remotePort =>
      val tunnel = new TunnelForwarder(new Tunnel.DirectChannel("127.0.0.1", remotePort)).start()
      try {
        val url = Tables.jdbcUrlViaTunnel(tunnel, "mysql", "index_align")
        assert(url === s"jdbc:mysql://127.0.0.1:${tunnel.localBindPort}/index_align")
      } finally tunnel.close()
      intercept[IllegalArgumentException](Tables.jdbcUrlViaTunnel(tunnel, "mysql", "db"))
    }
    // an UNSTARTED forwarder must fail the guard too — its port would
    // read -1 and the URL would be silently broken (review finding)
    val unstarted = new TunnelForwarder(new Tunnel.DirectChannel("127.0.0.1", 1))
    assert(!unstarted.isActive)
    intercept[IllegalArgumentException](
      Tables.jdbcUrlViaTunnel(unstarted, "mysql", "db"))
  }
}

/** End-to-end: a REAL protocol (HTTP) through the tunnel, driven by the
  * engine's own sink — [[HttpBatchWriter]] dials the tunnel's local
  * port, the tunnel relays to an HTTP server it never heard of, and
  * [[DocumentSink.writeBatched]]'s accounting passes. This is the
  * reference's exact composition (tunnel up → client library speaks its
  * native wire protocol through 127.0.0.1:local_bind_port) with HTTP
  * standing where the sandbox cannot run a networked MySQL. */
class TunnelEndToEndSpec extends graft.SparkSpec {

  test("HttpBatchWriter delivers through the tunnel; accounting green") {
    import spark.implicits._
    val delivered = new ConcurrentHashMap[String, Boolean]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ingest", (ex: HttpExchange) => {
      new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).foreach(delivered.put(_, true))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.setExecutor(null); server.start()
    val tunnel = new TunnelForwarder(
      new Tunnel.DirectChannel("127.0.0.1", server.getAddress.getPort)).start()
    try {
      val docs = DocumentSink.prepare(
        (0 until 30).map(i => (i.toLong, s"doc $i")).toDF("id", "payload"),
        collection = lit("issues"), documentId = col("id"))
      val report = DocumentSink.writeBatched(
        docs.coalesce(1),
        new HttpBatchWriter(s"http://127.0.0.1:${tunnel.localBindPort}/ingest",
                            maxRetries = 2, initialBackoffMs = 5L),
        batchSize = 10)
      assert(report.total === 30 && report.succeeded === 30 && report.ok)
      assert(delivered.size === 30, "every record crossed the relay exactly once")
    } finally { tunnel.close(); server.stop(0) }
  }
}
