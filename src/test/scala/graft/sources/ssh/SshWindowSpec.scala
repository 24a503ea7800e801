package graft.sources.ssh

import org.scalatest.funsuite.AnyFunSuite

/** RFC 4254 §5.2 receive-window ENFORCEMENT (round-15 advice): read-side
  * replenishment bounds a compliant peer's in-flight data at the
  * advertised window, but only enforcement makes it a bound on memory —
  * a violator must kill the connection loudly, not grow the inbound
  * queue without limit. Driven directly on the channel (no wire I/O:
  * deliver/consume touch no socket until an adjust is due, and an
  * unopened channel sends none). */
class SshWindowSpec extends AnyFunSuite {

  private val chunk = new Array[Byte](SshClient.MaxPacket.toInt)

  /** Packets that fit the strict bound (window + one-MaxPacket slack). */
  private val fits =
    ((SshClient.LocalWindow + SshClient.MaxPacket) / chunk.length).toInt

  test("a peer sending past the advertised receive window kills the " +
       "connection loudly instead of growing the inbound queue") {
    val ch = new SshChannel(null, 0L)
    (1 to fits).foreach(_ => ch.deliver(chunk))
    intercept[SshProtocolException] { ch.deliver(chunk) }
  }

  test("consumed bytes replenish the enforcement bound in step with the " +
       "window accounting, and extended data counts on arrival") {
    val ch = new SshChannel(null, 0L)
    (1 to fits).foreach(_ => ch.deliver(chunk))
    ch.consumeOnly(chunk.length) // unopened channel: no wire adjust sent
    ch.deliver(chunk) // freed capacity admits exactly one more packet
    intercept[SshProtocolException] { ch.deliver(chunk) }
    // extended data is consumed on arrival: it must transit the check but
    // never occupy the bound
    val ch2 = new SshChannel(null, 1L)
    (1 to fits).foreach(_ => ch2.deliverExtended(chunk.length))
    ch2.deliver(chunk) // full window still free for real data
  }
}
