package graft.sources

import java.net.{InetAddress, InetSocketAddress, ServerSocket, Socket}

import org.scalatest.funsuite.AnyFunSuite

/** OpenSSH INTEROP (round-15 verdict task 7): every prior SSH spec ran
  * both roles of ONE implementation, leaving wire compatibility with an
  * independent peer unproven (the stated honesty caveat in
  * SshTransport's scaladoc). Here the container's real OpenSSH client
  * (`/usr/bin/ssh -N -L`) negotiates against the from-scratch
  * [[SshTestServer]]: version exchange, group14-sha256 kex, OpenSSH
  * VERIFYING our rsa-sha2-256 host-key signature, aes128-ctr +
  * hmac-sha2-256 in both directions, password userauth through the
  * askpass seam, a `direct-tcpip` forward, and a multi-window echo
  * round-trip with live window adjusts. The negotiated algorithms are
  * additionally asserted from the client's own -v log, so a silent
  * downgrade cannot pass. Skips (assume) when the container lacks an
  * ssh binary. */
class SshInteropSpec extends AnyFunSuite {

  private def freePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  test("OpenSSH client tunnels through the from-scratch server: kex, " +
       "host-key verification, password auth and a 4 MiB echo round-trip") {
    val log = opensshEcho(new SshTestServer("tunnel", "hunter2"))._1
    assert(log.contains("diffie-hellman-group14-sha256"), log)
    assert(log.contains("rsa-sha2-256"), log)
    assert(log.contains("aes128-ctr"), log)
    assert(log.contains("hmac-sha2-256"), log)
    assert(log.contains("Authenticated to"), log)
  }

  test("OpenSSH client survives server-initiated RE-KEYS mid-echo " +
       "(RFC 4253 \u00a79): the 8 MiB round-trip crosses a 256 KiB " +
       "re-key budget dozens of times and the stream stays intact") {
    // the tiny budget makes OUR server initiate KEXINIT repeatedly while
    // channel data is flowing; OpenSSH must answer each one and keep the
    // forward alive — an independent implementation validating the whole
    // \u00a79 state machine, not just the happy path
    val (log, serverKexes) =
      opensshEcho(new SshTestServer("tunnel", "hunter2",
        rekeyBytes = 256L * 1024))
    assert(serverKexes >= 2,
      s"server completed only $serverKexes kex(es) — no re-key happened")
    // the client's own view: one KEXINIT per exchange beyond the initial
    val kexinits = "SSH2_MSG_KEXINIT received".r
      .findAllMatchIn(log).length
    assert(kexinits >= 2, s"client log shows $kexinits KEXINITs:\n$log")
  }

  /** Drive the container's OpenSSH client through the given server with
    * a 4 MiB echo round-trip; returns (client -v log, the server's max
    * per-connection kex count). Closes the server. */
  private def opensshEcho(server: SshTestServer): (String, Int) = {
    val sshBin = new java.io.File("/usr/bin/ssh")
    assume(sshBin.canExecute, "no OpenSSH client in this container")
    // plain TCP echo target behind the bastion
    val echo = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    val echoThread = new Thread(() => {
      try while (true) {
        val s = echo.accept()
        val t = new Thread(() => {
          try {
            val in = s.getInputStream
            val out = s.getOutputStream
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); out.flush(); n = in.read(buf) }
          } catch { case _: java.io.IOException => () }
          finally s.close()
        })
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => () }
    })
    echoThread.setDaemon(true)
    echoThread.start()

    val lport = freePort()
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssh-interop")
    val askpass = tmp.resolve("askpass.sh")
    java.nio.file.Files.write(askpass, "#!/bin/sh\necho hunter2\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    askpass.toFile.setExecutable(true): Unit
    val logFile = tmp.resolve("ssh.log").toFile
    val cmd = Seq("/usr/bin/ssh",
      "-v", // debug1 lines carry the negotiated algorithms (asserted below)
      "-p", server.port.toString,
      "-N", // no session channel — the server is a tunnel-only bastion
      "-L", s"127.0.0.1:$lport:127.0.0.1:${echo.getLocalPort}",
      "-F", "/dev/null", // user/system ssh_config must not leak in
      "-o", "ExitOnForwardFailure=yes",
      "-o", "StrictHostKeyChecking=no",
      "-o", s"UserKnownHostsFile=${tmp.resolve("known_hosts")}",
      "-o", "KexAlgorithms=diffie-hellman-group14-sha256",
      "-o", "HostKeyAlgorithms=rsa-sha2-256",
      "-o", "Ciphers=aes128-ctr",
      "-o", "MACs=hmac-sha2-256",
      "-o", "PreferredAuthentications=password",
      "-o", "NumberOfPasswordPrompts=1",
      "-o", "ConnectTimeout=10",
      "tunnel@127.0.0.1")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SSH_ASKPASS", askpass.toString)
    pb.environment().put("SSH_ASKPASS_REQUIRE", "force") // no TTY needed
    pb.environment().put("DISPLAY", ":0")
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile): Unit
    val proc = pb.start()
    def sshLog: String =
      try new String(java.nio.file.Files.readAllBytes(logFile.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: java.io.IOException => "(no log)" }
    try {
      // the forward comes up only after kex + auth succeed
      def dial(): Socket = {
        val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
        var last: Exception = null
        while (System.nanoTime() < deadline) {
          assert(proc.isAlive, s"ssh exited early:\n$sshLog")
          try {
            val s = new Socket()
            s.connect(new InetSocketAddress("127.0.0.1", lport), 500)
            return s
          } catch {
            case e: java.io.IOException => last = e; Thread.sleep(100)
          }
        }
        fail(s"local forward never came up: $last\n$sshLog")
      }
      val s = dial()
      try {
        s.setTcpNoDelay(true)
        // 4 MiB — past the 2 MiB channel window in BOTH directions, so
        // the round-trip cannot complete without live window adjusts
        val payload = new Array[Byte](4 * 1024 * 1024)
        new scala.util.Random(4253).nextBytes(payload)
        val writer = new Thread(() => {
          try {
            s.getOutputStream.write(payload)
            s.getOutputStream.flush()
          } catch { case _: java.io.IOException => () }
        })
        writer.setDaemon(true)
        writer.start()
        val got = new Array[Byte](payload.length)
        var off = 0
        while (off < got.length) {
          val n = s.getInputStream.read(got, off, got.length - off)
          assert(n >= 0, s"echo stream ended at $off of ${got.length}:\n$sshLog")
          off += n
        }
        writer.join(10000)
        assert(java.util.Arrays.equals(got, payload),
          "echoed bytes diverged from the payload")
      } finally s.close()
      (sshLog, server.maxKexCount)
    } finally {
      proc.destroyForcibly()
      proc.waitFor()
      server.close()
      try echo.close() catch { case _: java.io.IOException => () }
    }
  }
}
