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

  // ---- RFC 4034 wire-format fidelity -----------------------------------

  import java.security.interfaces.RSAPublicKey
  import graft.universe.DnssecCrypto

  test("key material is seed-derived and JDK-independent: pinned modulus digest") {
    // built from RSAPrivateCrtKeySpec over a deterministic SHA-256 prime
    // search, NOT provider keygen — so this digest must hold on ANY JDK
    // build (heterogeneous executor fleets derive identical leaves)
    val pub = DnssecCrypto.keyPair(42L).getPublic.asInstanceOf[RSAPublicKey]
    assert(pub.getModulus.bitLength == 2048)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(pub.getModulus.toByteArray).map(b => f"$b%02x").mkString
    assert(digest ==
      "377fe06926dbc14861cb7e55022ea8d8ae129171587918a33468df36a903a935")
    // distinct seeds give distinct keys
    assert(DnssecCrypto.keyPair(43L).getPublic.asInstanceOf[RSAPublicKey]
      .getModulus != pub.getModulus)
  }

  test("DNSKEY rides RFC 3110 wire material and its key tag matches the RRSIG field") {
    val d = withState("signed")
    val signer = new SigningDnssecService(u)
    val key = signer.dnskeyFor(d).head
    val Array(flags, proto, alg, keyB64) = key.split("\\s+")
    assert((flags, proto, alg) == (("257", "3", "8")))
    // base64 decodes as RFC 3110: exponent length 3, exponent 65537, 2048-bit modulus
    val raw = java.util.Base64.getDecoder.decode(keyB64)
    assert(raw(0) == 3 && raw(1) == 1 && raw(2) == 0 && raw(3) == 1)
    assert(raw.length == 4 + 256) // 1 len byte + 3 exp bytes + 256 modulus bytes
    // Appendix B key tag over the DNSKEY RDATA == the RRSIG's keytag field
    val tag = DnssecCrypto.keyTag(DnssecCrypto.dnskeyRdata(257, 3, 8,
      java.util.Arrays.copyOfRange(raw, 0, raw.length)))
    val rrsigTag = signer.rrsigFor(d).head.split("\\s+")(6).toInt
    assert(tag == rrsigTag && tag >= 0 && tag <= 0xffff)
    // and decodePublic round-trips the RFC 3110 material
    val pub = DnssecCrypto.decodePublic(keyB64).get.asInstanceOf[RSAPublicKey]
    assert(pub.getModulus ==
      DnssecCrypto.keyPair(42L).getPublic.asInstanceOf[RSAPublicKey].getModulus)
  }

  test("canonical wire encoding: owner names and A-rrset bytes per RFC 4034 §6") {
    assert(DnssecCrypto.wireName("NIC.cz").toSeq ==
      Seq[Byte](3, 'n', 'i', 'c', 2, 'c', 'z', 0))
    // two A records, canonical order = RDATA byte order (10.* before 192.*)
    val wire = DnssecCrypto.canonicalARrsetWire("x.cz", 3600L,
      Seq("192.0.2.1", "10.0.0.1"))
    val oneRr = 6 /*owner*/ + 2 + 2 + 4 + 2 + 4
    assert(wire.length == 2 * oneRr)
    val first = wire.slice(oneRr - 4, oneRr).map(_ & 0xff).toSeq
    val second = wire.slice(2 * oneRr - 4, 2 * oneRr).map(_ & 0xff).toSeq
    assert(first == Seq(10, 0, 0, 1) && second == Seq(192, 0, 2, 1))
    // type=1, class=1, TTL=3600 in the fixed fields
    assert(wire.slice(6, 14).map(_ & 0xff).toSeq ==
      Seq(0, 1, 0, 1, 0, 0, 14, 16)) // 3600 = 0x00000E10
    // RRSIG timestamps: presentation YYYYMMDDHHmmSS → epoch seconds
    assert(DnssecCrypto.sigTimeToEpoch("20260101000000") == 1767225600L)
    assert(DnssecCrypto.sigTimeToEpoch("20270101000000") == 1798761600L)
  }

  test("verification honors the RECORD's fields: a tampered key tag breaks the signature") {
    val d = withState("signed")
    // the signed data embeds the RRSIG RDATA (incl. key tag), so flipping
    // the presentation's keytag field must flip the verdict — a verifier
    // that ignored record fields would still pass this record
    val tampering = new ForwardingProbeService(new SigningDnssecService(u)) {
      override def rrsigFor(domain: String): Seq[String] =
        inner.rrsigFor(domain).map { s =>
          val parts = s.split("\\s+")
          parts(6) = ((parts(6).toInt + 1) & 0xffff).toString
          parts.mkString(" ")
        }
    }
    val pt = new Probes(new VerifyingDnssecService(tampering), CrawlConfig())
    assert(pt.checkDnssec(d).valid.contains(false),
      "tampered key tag must invalidate the RRSIG")
  }
}
