package graft

import org.scalatest.funsuite.AnyFunSuite

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
    assert(steps.last.headers.get("server").contains("nginx"))
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
    dl.TXT_SPF.foreach(s => assert(s.pass.forall(_.nonEmpty)))
  }

  test("probe determinism: same domain, same result, any call order") {
    val a = p.processDomain("d777.cz", "2026-01-01 00:00:00")
    val b = p.processDomain("d777.cz", "2026-01-01 00:00:00")
    assert(a == b)
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
