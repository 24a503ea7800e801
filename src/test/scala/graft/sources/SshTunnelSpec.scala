package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sinks.{DocumentSink, HttpBatchWriter}
import graft.sources.ssh.{SshChannelFactory, SshClient, SshTransport}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.io.IOException
import java.math.BigInteger
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

/** The S4 tunnel over a REAL SSH-2 hop (round-13 verdict task 4): the
  * TunnelSpec relay suite re-run with [[SshChannelFactory]] dialing an
  * in-process [[SshTestServer]] — version exchange, group14-sha256 DH,
  * rsa-sha2-256 host-key verification against a PINNED blob, aes128-ctr +
  * hmac-sha2-256 framing, password auth, and `direct-tcpip` channels with
  * both-direction window flow control. The previously seam-only hop is
  * now the real binary protocol end to end. */
class SshTunnelSpec extends AnyFunSuite {

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
            s.shutdownOutput()
          } catch { case _: IOException => () } finally s.close()
        }).start()
      } catch { case _: IOException => () }
    })
    t.setDaemon(true); t.start()
    try body(srv.getLocalPort) finally srv.close()
  }

  private def roundTrip(port: Int, msg: String): String = {
    val s = new Socket("127.0.0.1", port)
    try {
      s.setSoTimeout(20000)
      s.getOutputStream.write(msg.getBytes(StandardCharsets.UTF_8))
      s.getOutputStream.flush()
      s.shutdownOutput()
      new String(s.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    } finally s.close()
  }

  private def withSsh(body: (SshTestServer, Int => SshChannelFactory) => Unit): Unit = {
    val sshd = new SshTestServer("pac", "s3cret")
    try {
      def factory(targetPort: Int) = new SshChannelFactory(
        "127.0.0.1", sshd.port, "pac", "s3cret",
        blob => java.util.Arrays.equals(blob, sshd.hostKeyBlob),
        "127.0.0.1", targetPort)
      body(sshd, factory)
    } finally sshd.close()
  }

  test("wire primitives: mpint/uint32/name-list round-trip; RFC key " +
       "derivation expands past one hash block") {
    import graft.sources.ssh.SshWire.{R, W}
    val vals = Seq(BigInteger.ZERO, BigInteger.ONE,
      new BigInteger("80", 16), // high bit set → sign byte
      SshTransport.P.subtract(BigInteger.ONE))
    val w = new W()
    vals.foreach(w.putMpint)
    w.putUInt32(0xfffffffeL).putNameList(Seq("a", "b-c")).putString("x")
    val r = new R(w.bytes)
    vals.foreach(v => assert(r.mpint() === v))
    assert(r.uint32() === 0xfffffffeL)
    assert(r.nameList() === Seq("a", "b-c"))
    assert(r.stringUtf8() === "x")
    assert(r.remaining === 0)
    val k = new BigInteger(200, new java.util.Random(7))
    val h = Array.fill[Byte](32)(3)
    val d48 = SshTransport.deriveKey(k, h, 'A', h, 48)
    assert(d48.length === 48)
    // prefix property: the 16-byte truncation is the 48-byte head
    assert(d48.take(16).toSeq === SshTransport.deriveKey(k, h, 'A', h, 16).toSeq)
    // distinct letters give distinct keys
    assert(d48.toSeq !== SshTransport.deriveKey(k, h, 'B', h, 48).toSeq)
  }

  test("relays bytes through the real SSH channel (kex, auth, framing, " +
       "window protocol all live)") {
    withUpperEcho { echoPort =>
      withSsh { (_, mkFactory) =>
        val factory = mkFactory(echoPort)
        val tunnel = new TunnelForwarder(factory).start()
        try {
          assert(roundTrip(tunnel.localBindPort, "hello over ssh") ===
            "HELLO OVER SSH")
        } finally { tunnel.close(); factory.close() }
      }
    }
  }

  test("re-keying (RFC 4253 §9) from BOTH initiators: data crosses the " +
       "exchanges intact and every side re-derives keys") {
    withUpperEcho { echoPort =>
      def echoThrough(cli: SshClient): Unit = {
        val sock = cli.openDirectTcpip("127.0.0.1", echoPort)
        try {
          sock.setSoTimeout(30000)
          val big = "abcdefgh" * (512 * 1024 / 8) // 1 MiB round trip
          sock.getOutputStream.write(
            big.getBytes(StandardCharsets.UTF_8))
          sock.getOutputStream.flush()
          sock.shutdownOutput()
          val got = new String(sock.getInputStream.readAllBytes(),
            StandardCharsets.UTF_8)
          assert(got === big.toUpperCase)
        } finally sock.close()
      }
      // SERVER-initiated: tiny server budget, default client budget —
      // the client answers mid-stream KEXINITs
      val sshd1 = new SshTestServer("pac", "s3cret", rekeyBytes = 64L * 1024)
      try {
        val cli = new SshClient("127.0.0.1", sshd1.port, "pac", "s3cret",
          blob => java.util.Arrays.equals(blob, sshd1.hostKeyBlob))
        try {
          echoThrough(cli)
          assert(cli.kexCount >= 2,
            s"client completed ${cli.kexCount} kex(es); expected re-keys")
          assert(sshd1.maxKexCount >= 2)
          // the connection is still healthy after the re-keys
          echoThrough(cli)
        } finally cli.close()
      } finally sshd1.close()
      // CLIENT-initiated: tiny client budget against a default server
      val sshd2 = new SshTestServer("pac", "s3cret")
      try {
        val cli = new SshClient("127.0.0.1", sshd2.port, "pac", "s3cret",
          blob => java.util.Arrays.equals(blob, sshd2.hostKeyBlob))
        try {
          cli.setRekeyAfterBytes(64L * 1024)
          echoThrough(cli)
          assert(cli.kexCount >= 2,
            s"client initiated ${cli.kexCount} kex(es); expected re-keys")
          assert(sshd2.maxKexCount >= 2)
          echoThrough(cli)
        } finally cli.close()
      } finally sshd2.close()
    }
  }

  test("payload larger than the channel window round-trips intact " +
       "(WINDOW_ADJUST exercised in both directions)") {
    withUpperEcho { echoPort =>
      withSsh { (_, mkFactory) =>
        val factory = mkFactory(echoPort)
        val tunnel = new TunnelForwarder(factory).start()
        try {
          val big = "abcdefgh" * (SshClient.LocalWindow.toInt / 4) // 2× window
          assert(roundTrip(tunnel.localBindPort, big) === big.toUpperCase)
        } finally { tunnel.close(); factory.close() }
      }
    }
  }

  test("concurrent relays multiplex as channels on ONE ssh session, " +
       "payloads never cross") {
    withUpperEcho { echoPort =>
      withSsh { (_, mkFactory) =>
        val factory = mkFactory(echoPort)
        val tunnel = new TunnelForwarder(factory).start()
        try {
          val results = new ConcurrentHashMap[Int, String]()
          val threads = (0 until 8).map { i =>
            val t = new Thread(() =>
              results.put(i, roundTrip(tunnel.localBindPort, s"msg-$i-" * 500)))
            t.start(); t
          }
          threads.foreach(_.join(30000))
          (0 until 8).foreach { i =>
            assert(results.get(i) === s"MSG-$i-" * 500, s"channel $i intact")
          }
        } finally { tunnel.close(); factory.close() }
      }
    }
  }

  test("a pinned host key MISMATCH aborts the hop before auth; bad " +
       "password fails auth; the dialer sees a dead connection") {
    withUpperEcho { echoPort =>
      withSsh { (sshd, _) =>
        val wrongPin = new SshChannelFactory(
          "127.0.0.1", sshd.port, "pac", "s3cret",
          _ => false, "127.0.0.1", echoPort)
        val e1 = intercept[IOException](wrongPin.open())
        assert(e1.getMessage.contains("host key"))
        wrongPin.close()
        val badPw = new SshChannelFactory(
          "127.0.0.1", sshd.port, "pac", "wrong",
          blob => java.util.Arrays.equals(blob, sshd.hostKeyBlob),
          "127.0.0.1", echoPort)
        val e2 = intercept[IOException](badPw.open())
        assert(e2.getMessage.contains("authentication failed"))
        badPw.close()
      }
    }
  }

  test("a peer-supplied packet length below the RFC 4253 minimum aborts " +
       "the connection with a protocol error, not an array exception") {
    // round-14 advice: len 1..11 passed the old bounds check and made the
    // encrypted path's restLen negative; the pre-key plaintext path's
    // copyOfRange similarly underflowed. A fake server that speaks the
    // version exchange and then frames garbage with len=5 must produce a
    // LOUD IOException mentioning the implausible length.
    val srv = new java.net.ServerSocket(
      0, 5, java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try {
        val s = srv.accept()
        val out = s.getOutputStream
        out.write("SSH-2.0-fakesrv\r\n".getBytes("UTF-8"))
        out.flush()
        // drain the client's version line, then send a 4-byte length
        // field of 5 followed by 5 garbage bytes
        val in = s.getInputStream
        var c = in.read()
        while (c != -1 && c != '\n') c = in.read()
        out.write(Array[Byte](0, 0, 0, 5, 9, 9, 9, 9, 9))
        out.flush()
        Thread.sleep(2000)
        s.close()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    try {
      val e = intercept[Exception](new graft.sources.ssh.SshClient(
        "127.0.0.1", srv.getLocalPort, "pac", "s3cret", _ => true))
      assert(e.getMessage.contains("implausible packet length"),
        s"expected the checkLen protocol error, got: $e")
    } finally srv.close()
  }

  test("hop to a dead target: open() fails cleanly (CHANNEL_OPEN_FAILURE), " +
       "session survives for the next relay") {
    val probe = new ServerSocket(0); val deadPort = probe.getLocalPort
    probe.close()
    withUpperEcho { echoPort =>
      withSsh { (sshd, _) =>
        val factory = new SshChannelFactory(
          "127.0.0.1", sshd.port, "pac", "s3cret",
          blob => java.util.Arrays.equals(blob, sshd.hostKeyBlob),
          "127.0.0.1", deadPort)
        val e = intercept[IOException](factory.open())
        assert(e.getMessage.contains("refused"))
        // same factory, live target: the session is still good
        val live = new SshChannelFactory(
          "127.0.0.1", sshd.port, "pac", "s3cret",
          blob => java.util.Arrays.equals(blob, sshd.hostKeyBlob),
          "127.0.0.1", echoPort)
        val tunnel = new TunnelForwarder(live).start()
        try assert(roundTrip(tunnel.localBindPort, "still up") === "STILL UP")
        finally { tunnel.close(); live.close(); factory.close() }
      }
    }
  }

  test("the hop is genuinely encrypted and authenticated: plaintext never " +
       "appears on the wire, and a tampered byte kills the connection") {
    // An intercepting proxy between client and sshd records every byte
    // and, in the second phase, corrupts one byte of a post-kex packet.
    val captured = new java.io.ByteArrayOutputStream()
    @volatile var corruptNext = false
    val accepts = new java.util.concurrent.atomic.AtomicInteger(0)
    withUpperEcho { echoPort =>
      withSsh { (sshd, _) =>
        val proxy = new ServerSocket(0, 5, java.net.InetAddress.getLoopbackAddress)
        val pt = new Thread(() => {
          try while (true) {
            val a = proxy.accept()
            accepts.incrementAndGet()
            val b = new Socket("127.0.0.1", sshd.port)
            def pump(from: Socket, to: Socket, record: Boolean): Unit = {
              val t = new Thread(() => {
                try {
                  val buf = new Array[Byte](8192)
                  var n = from.getInputStream.read(buf)
                  while (n >= 0) {
                    if (record) captured.synchronized { captured.write(buf, 0, n) }
                    if (record && corruptNext && n > 40) {
                      buf(n - 1) = (buf(n - 1) ^ 0x5a).toByte
                      corruptNext = false
                    }
                    to.getOutputStream.write(buf, 0, n)
                    to.getOutputStream.flush()
                    n = from.getInputStream.read(buf)
                  }
                } catch { case _: IOException => () }
                finally { try { a.close(); b.close() } catch { case _: IOException => () } }
              })
              t.setDaemon(true); t.start()
            }
            pump(a, b, record = true); pump(b, a, record = false)
          } catch { case _: IOException => () }
        })
        pt.setDaemon(true); pt.start()
        try {
          val secret = "the-tunnel-payload-marker-0xS3CRET"
          val factory = new SshChannelFactory(
            "127.0.0.1", proxy.getLocalPort, "pac", "s3cret",
            blob => java.util.Arrays.equals(blob, sshd.hostKeyBlob),
            "127.0.0.1", echoPort)
          val tunnel = new TunnelForwarder(factory).start()
          try {
            assert(roundTrip(tunnel.localBindPort, secret) === secret.toUpperCase)
            val wire = captured.synchronized {
              new String(captured.toByteArray, StandardCharsets.ISO_8859_1)
            }
            assert(!wire.contains(secret), "payload must be ciphertext on the wire")
            assert(!wire.contains("s3cret"), "password must be ciphertext on the wire")
            // phase 2: corrupt one client→server byte mid-stream. The
            // server's MAC check must KILL that session (no tolerance, no
            // skip); the factory then transparently reconnects — so the
            // observable contract is "relay still works, but only via a
            // SECOND ssh session". One accept so far; the tampered open
            // forces exactly one reconnect.
            assert(accepts.get === 1)
            corruptNext = true
            val outcome =
              try roundTrip(tunnel.localBindPort, "x" * 100)
              catch { case _: IOException => "<dead>" }
            assert(accepts.get >= 2,
              "the tampered session must die and force a reconnect — " +
                s"accepts=${accepts.get}, outcome=${outcome.take(20)}")
            assert(!corruptNext, "the corruption must actually have fired")
          } finally { tunnel.close(); factory.close() }
        } finally proxy.close()
      }
    }
  }
}

/** End-to-end over the ENCRYPTED hop — TunnelEndToEndSpec's HTTP
  * composition with the SSH factory in place of the plain-TCP channel. */
class SshTunnelEndToEndSpec extends graft.SparkSpec {

  test("HTTP through the SSH tunnel: HttpBatchWriter delivery + accounting " +
       "green over the encrypted hop") {
    import spark.implicits._
    val delivered = new ConcurrentHashMap[String, Boolean]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ingest", (ex: HttpExchange) => {
      new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).foreach(delivered.put(_, true))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.setExecutor(null); server.start()
    val sshd = new SshTestServer("pac", "s3cret")
    val factory = new SshChannelFactory(
      "127.0.0.1", sshd.port, "pac", "s3cret",
      blob => java.util.Arrays.equals(blob, sshd.hostKeyBlob),
      "127.0.0.1", server.getAddress.getPort)
    val tunnel = new TunnelForwarder(factory).start()
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
      assert(delivered.size === 30, "every record crossed the SSH relay")
    } finally { tunnel.close(); factory.close(); server.stop(0); sshd.close() }
  }
}
