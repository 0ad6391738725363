package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parsers.Parsers
import graft.probes.{CrawlConfig, Probes}
import graft.universe.Universe

/** Golden assertions re-encoding the reference's live e2e test
  * (`/root/reference/test/nic.cz.test.py:21-45`) against the deterministic
  * universe, plus the null/edge semantics the reference pins.
  */
class ProbesSpec extends AnyFunSuite {

  val u = new Universe(seed = 42L)
  val p = new Probes(u, CrawlConfig())

  test("nic.cz golden: NS_AUTH set equality after sort_by_value (test line 28-34)") {
    val r = p.processDomain("nic.cz", "2026-01-01 00:00:00")
    val ns = r.DNS_LOCAL.NS_AUTH.get.map(_.value).sorted
    assert(ns == Seq("a.ns.nic.cz", "b.ns.nic.cz", "d.ns.nic.cz"))
  }

  test("nic.cz golden: web 80 first step 301, final step server nginx (test line 35-36)") {
    val r = p.processDomain("nic.cz", "2026-01-01 00:00:00")
    val web80 = r.WEB.WEB4_80.get.head
    val steps = web80.steps.get
    assert(steps.head.status.contains(301))
    assert(steps.head.is_redirect.contains(true))
    assert(steps.last.header("server").contains("nginx"))
    assert(steps.last.status.contains(200))
  }

  test("nic.cz golden: www 443 status 200 (test line 41)") {
    val r = p.processDomain("nic.cz", "2026-01-01 00:00:00")
    val www443 = r.WEB.WEB4_443_www.get.head
    assert(www443.steps.get.last.status.contains(200))
  }

  test("nic.cz golden: DNSSEC valid, DS algorithm ECDSAP256SHA256 (test line 43-44)") {
    val r = p.processDomain("nic.cz", "2026-01-01 00:00:00")
    assert(r.DNS_LOCAL.DNSSEC.valid.contains(true))
    assert(r.DNS_LOCAL.DNSSEC.rrsig.isDefined)
    assert(r.DNS_LOCAL.DS.get.head.algorithm.contains("ECDSAP256SHA256"))
  }

  test("nic.cz golden: exact geoip struct (test line 45)") {
    val r = p.processDomain("nic.cz", "2026-01-01 00:00:00")
    val g = r.DNS_LOCAL.WEB4.get.head.geoip.get
    assert(g.country.contains("CZ"))
    assert(g.org.contains("CZ.NIC, z.s.p.o."))
    assert(g.asn.contains(25192))
  }

  test("no NS → DNS_AUTH null (crawl.py:77-78)") {
    val noNs = (0 to 5000).map(i => s"d$i.cz").find(d => u.nsFor(d).isEmpty).get
    assert(p.getDnsAuth(noNs).isEmpty)
  }

  test("no MX falls back to apex when A exists; None when nothing (crawl.py:145-154)") {
    val domains = (0 to 5000).map(i => s"d$i.cz")
    val noMxWithA = domains.find(d => u.mxFor(d).isEmpty && u.aFor(d).nonEmpty).get
    val dl1 = p.getDnsLocal(noMxWithA)
    assert(p.getMail(noMxWithA, dl1).get.map(_.host) == Seq(noMxWithA))
    val nothing = domains.find(d =>
      u.mxFor(d).isEmpty && u.aFor(d).isEmpty && u.aaaaFor(d).isEmpty).get
    val dl2 = p.getDnsLocal(nothing)
    assert(p.getMail(nothing, dl2).isEmpty)
  }

  test("CNAME chains carry cname and from_cname (dns_utils.py:293-302)") {
    val www = (0 to 20000).map(i => s"www.d$i.cz")
      .find(w => u.cnameFor(w).isDefined && p.resolve(w, "A").isDefined).get
    val recs = p.resolve(www, "A").get
    assert(recs.forall(_.cname.isDefined))
    assert(recs.forall(_.from_cname.isDefined))
    assert(recs.head.cname.get.startsWith("edge"))
  }

  test("redirect chains are bounded by max_redirects=6 (web_utils.py:221-223)") {
    val domains = (0 to 8000).map(i => s"d$i.cz")
    val results = domains.take(600).flatMap { d =>
      u.aFor(d).headOption.map(ip => p.fetchWeb(d, ip, 80))
    }
    assert(results.nonEmpty)
    assert(results.forall(_.redirect_count <= 6))
    assert(results.forall(_.steps.get.length <= 7))
    // at least one chain actually hits the cap (universe generates up to 8)
    assert(results.exists(r => r.redirect_count == 6 &&
      r.steps.get.last.is_redirect.contains(true)))
  }

  test("http→https redirect reconnects on 443: later hops carry TLS metadata") {
    val chains = (0 to 2000).iterator.map(i => s"d$i.cz").flatMap { d =>
      u.aFor(d).headOption.map(ip => p.fetchWeb(d, ip, 80))
    }.filter(r => r.steps.get.length > 1 &&
      r.steps.get.head.status.contains(301)).take(20).toSeq
    assert(chains.nonEmpty)
    chains.foreach { r =>
      val after = r.steps.get.tail
      // every post-301 hop is an https fetch: tls fields + cert present
      after.filter(_.status.exists(_ > 0)).foreach { s =>
        assert(s.url.startsWith("https://"), s.url)
        assert(s.tls_version.isDefined && s.cert.isDefined, s.url)
      }
      // and the first hop (plain http) has neither
      assert(r.steps.get.head.tls_version.isEmpty && r.steps.get.head.cert.isEmpty)
    }
  }

  test("final_step-only mode mirrors save_intermediate_steps=false (web_utils.py:327-333)") {
    val p2 = new Probes(u, CrawlConfig(saveIntermediateSteps = false))
    val d = (0 to 2000).map(i => s"d$i.cz").find(x => u.aFor(x).nonEmpty).get
    val ip = u.aFor(d).head
    val r = p2.fetchWeb(d, ip, 80)
    assert(r.steps.isEmpty && r.final_step.isDefined)
    val full = p.fetchWeb(d, ip, 80)
    assert(full.final_step.isEmpty && full.steps.get.last == r.final_step.get)
  }

  test("empty TLSA/SPF parses collapse to null not empty (dns_utils.py:156-157,181-182,201-202)") {
    val d = (0 to 5000).map(i => s"d$i.cz")
      .find(x => u.tlsaFor(s"_443._tcp.$x").isEmpty).get
    val dl = p.getDnsLocal(d)
    assert(dl.WEB_TLSA.isEmpty) // None, never Some(Seq())
    dl.TXT_SPF.foreach { parses =>
      assert(parses.nonEmpty) // Some(Seq()) never emitted
      parses.foreach(s => assert(s.pass.forall(_.nonEmpty)))
    }
  }

  test("probe determinism: same domain, same result, any call order") {
    val a = p.processDomain("d777.cz", "2026-01-01 00:00:00")
    val b = p.processDomain("d777.cz", "2026-01-01 00:00:00")
    assert(a == b)
  }

  test("nic.cz golden: cert CN / version 3 / sha256 algorithm (test line 38-40)") {
    val r = p.processDomain("nic.cz", "2026-01-01 00:00:00")
    val cert = r.WEB.WEB4_443.get.head.steps.get.last.cert.get.head
    assert(cert.subject("commonName") == "nic.cz")
    assert(cert.version == 3)
    assert(cert.algorithm == "sha256")
    assert(!cert.expired && cert.expired_for.isEmpty)
    assert(cert.serial.matches("[0-9a-f]{16}"))
    assert(cert.fingerprint_cert.sha256.matches("[0-9a-f]{64}"))
    assert(cert.fingerprint_pubkey.sha512.matches("[0-9a-f]{128}"))
    assert(cert.alt_names.contains("www.nic.cz"))
  }

  test("expired certs carry expired_for days (certificate.py:78-81)") {
    val hostWithExpired = (0 to 8000).iterator.map(i => s"d$i.cz")
      .find(d => u.certFor(d).expired).get
    val c = u.certFor(hostWithExpired)
    assert(c.expired && c.expired_for.exists(_ > 0))
    // validity_period = not_after - not_before in days
    val nb = java.time.LocalDate.parse(c.not_before.take(10))
    val na = java.time.LocalDate.parse(c.not_after.take(10))
    assert(java.time.temporal.ChronoUnit.DAYS.between(nb, na) == c.validity_period)
  }

  test("set-cookie parses to cookie structs with nonstandard attrs (web_utils.py:243-252)") {
    val c = Parsers.parseSetCookie(
      "sid=abc123; Path=/; HttpOnly; Secure; tracker=42; Expires=Wed, 01 Jan 2025 00:00:00 GMT").get
    assert(c.name == "sid" && c.value == "abc123")
    assert(c.path.contains("/") && c.httponly.contains(true) && c.secure.contains(true))
    assert(c.expires.isDefined)
    assert(c.nonstandard_attrs == Map("tracker" -> "42"))
    assert(Parsers.parseSetCookie("garbage-no-equals").isEmpty)
  }

  test("alt-svc parses to protocol map; encoding detection (web_utils.py:67-72,130-152)") {
    assert(Parsers.parseAltSvc("h3=\":443\"; ma=86400, h2=\":443\"") ==
      Map("h3" -> ":443", "h2" -> ":443"))
    // detector guess wins on success; charset header only consulted on
    // decode FAILURE (autodetect_encoding, web_utils.py:130-152)
    assert(Parsers.detectEncoding(Some("text/html; charset=utf-8"), "x") == "ascii")
    assert(Parsers.detectEncoding(Some("text/html"), "plain ascii") == "ascii")
    assert(Parsers.detectEncoding(None, "háčky") == "utf-8")
    // Czech-range byte without a header: the histogram detector proposes
    // windows-1250 directly (the ICU primary-path analog) and it decodes
    val bad = Array[Byte](0x68, 0xE8.toByte, 0x20, 0x68) // č in cp1250
    val (decoded, enc) = Parsers.autodetectEncoding(bad, None)
    assert(decoded.contains("hč h") && enc.contains("windows-1250"))
    assert(Parsers.autodetectEncoding(bad,
      Some("text/html; charset=windows-1250"))._2.contains("windows-1250"))
    // fallback chain when the detector's guess cannot decode: 0x81 is
    // undefined in cp1250/cp1252 → header charset → iso-8859-2 succeeds
    val undec = Array[Byte](0x68, 0x81.toByte, 0x68)
    assert(Parsers.autodetectEncoding(undec, None)._2.contains("iso-8859-2"))
    assert(Parsers.autodetectEncoding(undec, None)._1.exists(_.length == 3))
    // F13: real Czech text in the three legacy encodings, NO charset
    // header — the detector must pick the right codepage so the round-trip
    // reproduces the original string (the reference's ICU primary path)
    val czech = "příliš žluťoučký kůň úpěl ďábelské ódy"
    for (cs <- Seq("windows-1250", "iso-8859-2")) {
      val bytes = czech.getBytes(java.nio.charset.Charset.forName(cs))
      val (dec, e) = Parsers.autodetectEncoding(bytes, None)
      assert(dec.contains(czech), s"$cs: got $dec")
      assert(e.contains(cs), s"$cs: detected $e")
    }
    val french = "déjà vu à côté, garçon français"
    val fBytes = french.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val (fDec, fEnc) = Parsers.autodetectEncoding(fBytes, None)
    assert(fDec.contains(french) && fEnc.contains("windows-1252"))
    // utf-8 Czech bytes stay utf-8 (strict validation, not a guess)
    val (uDec, uEnc) = Parsers.autodetectEncoding(czech.getBytes("UTF-8"), None)
    assert(uDec.contains(czech) && uEnc.contains("utf-8"))
    // web steps carry the parsed headers end-to-end; detected_encoding
    // exists only under save_content (web_utils.py:283-320)
    val pc = new Probes(u, CrawlConfig(saveContent = true))
    val results = (0 to 800).flatMap { i =>
      val d = s"d$i.cz"
      u.aFor(d).headOption.map(ip => pc.fetchWeb(d, ip, 443))
    }
    val steps = results.flatMap(_.steps.get)
    assert(steps.exists(_.cookies.exists(_.nonEmpty)))
    assert(steps.exists(_.alt_svc.isDefined))
    assert(steps.exists(_.detected_encoding.contains("utf-8")))
    // save_content off → no content/encoding keys anywhere
    val noSave = (0 to 200).flatMap { i =>
      val d = s"d$i.cz"
      u.aFor(d).headOption.map(ip => p.fetchWeb(d, ip, 443))
    }.flatMap(_.steps.get)
    assert(noSave.forall(s => s.content.isEmpty && s.detected_encoding.isEmpty
      && s.content_is_binary.isEmpty))
    assert(steps.filter(_.status.contains(200))
      .filter(s => s.url.startsWith("https")).forall(_.cert.isDefined))
  }

  test("WEB_paths fetches configured extra paths (crawl.py:158-163)") {
    val p2 = new Probes(u, CrawlConfig(webPaths = Seq("/robots.txt", "/.well-known/security.txt")))
    val d = (0 to 2000).map(i => s"d$i.cz").find(x => u.aFor(x).nonEmpty).get
    val dl = p2.getDnsLocal(d)
    val wp = p2.getWebPaths(d, dl).get
    // full get_web_status per path, in configured order (crawl.py:158-163)
    assert(wp.map(_.path) == Seq("/robots.txt", "/.well-known/security.txt"))
    val robots = wp.find(_.path == "/robots.txt").get.web
    assert(robots.WEB4_443.nonEmpty)
    assert(robots.WEB4_443.get.head.steps.get.head.url.endsWith("/robots.txt"))
    // the per-path probe carries ALL gated combos, not just apex-v4-443
    assert(robots.WEB4_80.nonEmpty)
    // default config: no paths → None (null, not empty map)
    assert(p.getWebPaths(d, dl).isEmpty)
  }

  test("additional-RR registry fetches configured extra rrtypes (crawl.py:61-68, U1)") {
    val p2 = new Probes(u, CrawlConfig(additionalRrtypes = Seq("CAA", "SPF")))
    val withCaa = (0 to 3000).map(i => s"d$i.cz")
      .find(d => u.additionalFor(d, "CAA").nonEmpty).get
    val dl = p2.getDnsLocal(withCaa)
    assert(dl.additional.get("CAA").head.contains("issue"))
    // default config: no additional key at all
    assert(p.getDnsLocal(withCaa).additional.isEmpty)
    // unknown rrtype passes through raw (registry has only SPF)
    assert(graft.probes.AdditionalParsers("CAA", "0 issue \"x\"") == "0 issue \"x\"")
    assert(graft.probes.AdditionalParsers("SPF", "\"v=spf1 -all\"") == "v=spf1 -all")
  }

  test("dnssec classifier covers signed/bogus/unsigned branches (dns_utils.py:73-127)") {
    val domains = (0 to 3000).map(i => s"d$i.cz")
    val signed = domains.find(d => u.dnssecState(d) == "signed").get
    val bogus = domains.find(d => u.dnssecState(d) == "bogus").get
    val unsigned = domains.find(d => u.dnssecState(d) == "unsigned").get
    assert(p.checkDnssec(signed).valid.contains(true))
    assert(p.checkDnssec(bogus).valid.contains(false))
    val un = p.checkDnssec(unsigned)
    assert(un.valid.isEmpty && un.message.isDefined)
  }
}
