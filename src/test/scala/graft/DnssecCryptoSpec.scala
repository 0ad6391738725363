package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.probes.{CrawlConfig, ForwardingProbeService, Probes}
import graft.universe.{SigningDnssecService, Universe, VerifyingDnssecService}

/** F7 crypto closure: real RSA signatures over the synthetic zone's
  * rrsets, verified with `java.security` behind the ProbeService seam —
  * the `dns.dnssec.validate` analog (`dns_utils.py:42-70`). The
  * `Probes.checkDnssec` classifier runs UNCHANGED on top; only the source
  * of the validity verdict changes from a synthetic attribute to actual
  * cryptography.
  */
class DnssecCryptoSpec extends AnyFunSuite {

  private val u = new Universe(42L)
  private val domains = (0 to 2000).map(i => s"d$i.cz")
  private def withState(s: String): String =
    domains.find(d => u.dnssecState(d) == s && u.aFor(d).nonEmpty).get

  private val crypto = new VerifyingDnssecService(new SigningDnssecService(u))
  private val p = new Probes(crypto, CrawlConfig())

  test("signed zone: real signature verifies; classifier emits valid=true with the real rrsig strings") {
    val d = withState("signed")
    val r = p.checkDnssec(d)
    assert(r.valid.contains(true))
    // the rrsig carried into the document is the actual base64 signature
    assert(r.rrsig.get.head.startsWith("A 8 2 3600 "))
    assert(r.rrsig.get.head.split("\\s+").last.length > 200) // RSA-2048 sig
  }

  test("bogus zone: present-but-invalid signature fails verification; classifier emits valid=false (SERVFAIL branch)") {
    val d = withState("bogus")
    val r = p.checkDnssec(d)
    assert(r.valid.contains(false))
    assert(r.error.exists(_.contains("SERVFAIL")))
  }

  test("unsigned zone: no records; classifier emits valid=null with the missing-DS/DNSKEY message") {
    val d = domains.find(d => u.dnssecState(d) == "unsigned").get
    val r = p.checkDnssec(d)
    assert(r.valid.isEmpty)
    assert(r.message.exists(_.contains("Missing")))
  }

  test("a corrupted RRSIG flips a signed zone to valid=false through the unchanged classifier") {
    val d = withState("signed")
    assert(p.checkDnssec(d).valid.contains(true))
    // corrupt one signature byte between signer and verifier
    val corrupting = new ForwardingProbeService(new SigningDnssecService(u)) {
      override def rrsigFor(domain: String): Seq[String] =
        inner.rrsigFor(domain).map { s =>
          val last = s.last
          s.dropRight(1) + (if (last == 'A') 'B' else 'A')
        }
    }
    val pc = new Probes(new VerifyingDnssecService(corrupting), CrawlConfig())
    val r = pc.checkDnssec(d)
    assert(r.valid.contains(false), "corrupted signature must fail real verification")
  }

  test("signatures are deterministic (RSA PKCS#1 v1.5): repeated leaf calls return identical rrsig strings") {
    val d = withState("signed")
    val signer = new SigningDnssecService(u)
    assert(signer.rrsigFor(d) == signer.rrsigFor(d))
    assert(new SigningDnssecService(u).rrsigFor(d) == signer.rrsigFor(d))
  }
}
