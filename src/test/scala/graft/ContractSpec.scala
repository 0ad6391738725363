package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.probes.{CrawlConfig, Probes}
import graft.universe.Universe

/** P8/U3 config-gating matrix + S8 source-address gates + the result-
  * document contract fields added in round 2 (TXT_openid, config-driven
  * CHAOS incl. fortune, DMARC-per-record, worker_hostname, save_binary,
  * save_cert_chain, max_ips_per_domain null semantics). Each test pins the
  * reference behavior it mirrors.
  */
class ContractSpec extends AnyFunSuite {

  val u = new Universe(seed = 42L)
  val p = new Probes(u, CrawlConfig())

  private def webDomain: String =
    (0 to 4000).map(i => s"d$i.cz")
      .find(d => u.aFor(d).nonEmpty && u.aaaaFor(d).nonEmpty && u.nsFor(d).nonEmpty).get

  // ------------------------------------------------ P8 web plan gates

  test("check_http off ⇒ all *_80 combos absent (crawl.py:110-133)") {
    val d = webDomain
    val w = new Probes(u, CrawlConfig(checkHttp = false)).getWeb(d, p.getDnsLocal(d))
    assert(w.WEB4_80.isEmpty && w.WEB6_80.isEmpty
      && w.WEB4_80_www.isEmpty && w.WEB6_80_www.isEmpty)
    assert(w.WEB4_443.nonEmpty)
  }

  test("check_https off ⇒ all *_443 combos absent (crawl.py:110-133)") {
    val d = webDomain
    val w = new Probes(u, CrawlConfig(checkHttps = false)).getWeb(d, p.getDnsLocal(d))
    assert(w.WEB4_443.isEmpty && w.WEB6_443.isEmpty
      && w.WEB4_443_www.isEmpty && w.WEB6_443_www.isEmpty)
    assert(w.WEB4_80.nonEmpty)
  }

  test("check_ipv4 / check_ipv6 off ⇒ that family's combos absent (crawl.py:110-124)") {
    val d = webDomain
    val dl = p.getDnsLocal(d)
    val no4 = new Probes(u, CrawlConfig(checkIpv4 = false)).getWeb(d, dl)
    assert(no4.WEB4_80.isEmpty && no4.WEB4_443.isEmpty && no4.WEB4_80_www.isEmpty)
    assert(no4.WEB6_443.nonEmpty)
    val no6 = new Probes(u, CrawlConfig(checkIpv6 = false)).getWeb(d, dl)
    assert(no6.WEB6_80.isEmpty && no6.WEB6_443.isEmpty && no6.WEB6_443_www.isEmpty)
    assert(no6.WEB4_443.nonEmpty)
  }

  test("max_ips_per_domain: null = unlimited, n = bound (config.yml:39, web_utils.py:168)") {
    val d = (0 to 8000).map(i => s"d$i.cz")
      .find(x => u.aFor(x).length >= 3).get
    val dl = p.getDnsLocal(d)
    val unlimited = p.getWeb(d, dl).WEB4_443.get
    assert(unlimited.length == u.aFor(d).length) // default None = every IP
    val bounded = new Probes(u, CrawlConfig(maxIpsPerDomain = Some(1))).getWeb(d, dl)
    assert(bounded.WEB4_443.get.length == 1)
  }

  // ----------------------------------------------------- S8 source gates

  test("S8: v6-less worker ⇒ WEB6*, DNS_AUTH.ipv6, AAAA banners all absent (ip_utils.py:44-75)") {
    val d = webDomain
    val p6less = new Probes(u, CrawlConfig(connectivityIpv6 = Some("unreachable")))
    assert(p6less.sourceIpv6.isEmpty && p6less.sourceIpv4.isDefined)
    val r = p6less.processDomain(d, "2026-01-01 00:00:00")
    assert(r.WEB.WEB6_80.isEmpty && r.WEB.WEB6_443.isEmpty
      && r.WEB.WEB6_80_www.isEmpty && r.WEB.WEB6_443_www.isEmpty)
    assert(r.WEB.WEB4_443.nonEmpty)
    r.DNS_AUTH.foreach(_.foreach(na => assert(na.ipv6.isEmpty)))
    // mail banner IPs exclude AAAA (mail_utils.py:67-68)
    r.MAIL.foreach(_.foreach(_.banners.foreach(_.foreach(ib =>
      assert(!ib.ip.contains(":"))))))
    // DNS_LOCAL itself still resolves AAAA (get_dns_local has no gate)
    assert(r.DNS_LOCAL.WEB6.nonEmpty)
  }

  test("S8: family disabled via null config target (config.yml:46-49)") {
    val pNo4 = new Probes(u, CrawlConfig(connectivityIpv4 = None))
    assert(pNo4.sourceIpv4.isEmpty && pNo4.sourceIpv6.isDefined)
    val d = webDomain
    val w = pNo4.getWeb(d, p.getDnsLocal(d))
    assert(w.WEB4_80.isEmpty && w.WEB4_443.isEmpty)
    assert(w.WEB6_443.nonEmpty)
  }

  // ------------------------------------------------------- mail gates

  test("get_banners off ⇒ banners field absent; on ⇒ per-port banner map (mail_utils.py:61-87)") {
    val d = (0 to 4000).map(i => s"d$i.cz")
      .find(x => u.mxFor(x).nonEmpty && {
        val host = u.mxFor(x).head.split(" ").last.stripSuffix(".")
        u.aFor(host).nonEmpty
      }).get
    val dl = p.getDnsLocal(d)
    val on = p.getMail(d, dl).get
    assert(on.exists(_.banners.exists(_.nonEmpty)))
    val off = new Probes(u, CrawlConfig(getBanners = false)).getMail(d, dl).get
    assert(off.forall(_.banners.isEmpty))
  }

  test("mail hosts: one entry per MX record, no dedup (mail_utils.py:95-107)") {
    val d = (0 to 4000).map(i => s"d$i.cz").find(x => u.mxFor(x).length >= 2).get
    val hosts = p.getMail(d, p.getDnsLocal(d)).get.map(_.host)
    assert(hosts.length == u.mxFor(d).length)
  }

  // ------------------------------------------------- content/cert gates

  test("save_binary: binary content → base64 data-uri, off → dropped but flagged (web_utils.py:286-316)") {
    val pc = new Probes(u, CrawlConfig(saveContent = true))
    val binStep = (0 to 4000).iterator.map(i => s"d$i.cz").flatMap { d =>
      u.aFor(d).headOption.map(ip => pc.fetchWeb(d, ip, 443))
    }.flatMap(_.steps.get).find(_.content_is_binary.contains(true)).get
    assert(binStep.content.exists(_.startsWith("data:application/octet-stream;base64,")))
    val pNoBin = new Probes(u, CrawlConfig(saveContent = true, saveBinary = false))
    val noBin = (0 to 4000).iterator.map(i => s"d$i.cz").flatMap { d =>
      u.aFor(d).headOption.map(ip => pNoBin.fetchWeb(d, ip, 443))
    }.flatMap(_.steps.get).find(_.content_is_binary.contains(true)).get
    assert(noBin.content.isEmpty) // flag kept, payload dropped
  }

  test("save_cert_chain: leaf-only vs full chain (web_utils.py:274-282)") {
    val d = webDomain
    val ip = u.aFor(d).head
    val leafOnly = p.fetchWeb(d, ip, 443).steps.get.last.cert.get
    assert(leafOnly.length == 1)
    val chain = new Probes(u, CrawlConfig(saveCertChain = true))
      .fetchWeb(d, ip, 443).steps.get.last.cert.get
    assert(chain.length == 2)
    assert(chain.head.subject("commonName") == d)
    assert(chain(1).subject("commonName") == chain.head.issuer("commonName"))
  }

  // ------------------------------------------- new result-contract fields

  test("TXT_openid resolved from _openid.<domain> (crawl.py:57)") {
    val domains = (0 to 6000).map(i => s"d$i.cz")
    val withOpenid = domains.find(d => u.txtFor(s"_openid.$d").nonEmpty).get
    val dl = p.getDnsLocal(withOpenid)
    assert(dl.TXT_openid.get.head.value.startsWith("https://id."))
    val without = domains.find(d => u.txtFor(s"_openid.$d").isEmpty).get
    assert(p.getDnsLocal(without).TXT_openid.isEmpty)
  }

  test("TXT_DMARC parses EVERY record incl. per-record errors (dns_utils.py:144-158)") {
    val domains = (0 to 20000).map(i => s"d$i.cz")
    val multi = domains.find(d => u.txtFor(s"_dmarc.$d").length >= 2).get
    val parses = p.getDnsLocal(multi).TXT_DMARC.get
    assert(parses.length == u.txtFor(s"_dmarc.$multi").length)
    assert(parses.exists(_.error.isEmpty) && parses.exists(_.error.isDefined))
    // no record at all → None
    val none = domains.find(d => u.txtFor(s"_dmarc.$d").isEmpty).get
    assert(p.getDnsLocal(none).TXT_DMARC.isEmpty)
  }

  test("TXT_SPF is one parse per spf record (dns_utils.py:166-183)") {
    val multi = (0 to 20000).map(i => s"d$i.cz")
      .find(d => u.txtFor(d).count(_.startsWith("v=spf1")) >= 2).get
    val parses = p.getDnsLocal(multi).TXT_SPF.get
    assert(parses.length == u.txtFor(multi).count(_.startsWith("v=spf1")))
    assert(parses.length >= 2)
    assert(parses.forall(_.error.isEmpty))
  }

  test("SPF redirect= resolves recursively over DNS into {domain, record, parsed} (dns_utils.py:166-183; result-schema.json:91 — null|object)") {
    val dom = (0 to 20000).map(i => s"d$i.cz")
      .find(d => u.txtFor(d).exists(_.startsWith("v=spf1 redirect="))).get
    val spf = p.getDnsLocal(dom).TXT_SPF.get
    val red = spf.find(_.redirect.isDefined).get
    val ref = red.redirect_resolved.get
    assert(ref.domain.startsWith("_spf2.hoster"))
    // 2-hop chain: _spf2 redirects onward; its nested parse resolved the
    // terminal _spf zone, whose own parse carries the pass mechanisms
    assert(ref.record.get.startsWith("v=spf1 redirect=_spf.hoster"))
    val nested = ref.parsed.get
    assert(nested.contains("\"redirect\":{\"domain\":\"_spf.hoster"))
    assert(nested.contains("\"parsed\":{\"pass\":[{\"value\":"))
    // emit contract: redirect is an object; include entries are bare
    // domain strings (result-schema.json:82-86, additionalProperties off)
    val json = graft.spans.JsonSink.toJson(p.processDomain(dom, "t"))
    assert(json.contains("\"redirect\":{\"domain\":\"_spf2.hoster"))
    assert(!json.contains("\"mechanism\":\"include\""))
  }

  test("SPF redirect loop is cut by the seen-set guard (checkdmarc SPFRedirectLoop analog)") {
    val s = p.parseSpfResolved("v=spf1 redirect=_spfloop-a.cz", Set("origin.cz"))
    val ref = s.redirect_resolved.get
    assert(ref.domain == "_spfloop-a.cz" && ref.record.isDefined)
    // a → b resolves; b's redirect back to a is cut with {domain} alone
    val inner = ref.parsed.get
    assert(inner.contains("\"redirect\":{\"domain\":\"_spfloop-b.cz\",\"record\":"))
    assert(inner.contains("\"redirect\":{\"domain\":\"_spfloop-a.cz\"}"))
  }

  test("SPF redirect target without an SPF record resolves to {domain} alone (documented deviation from checkdmarc's raise)") {
    val s = p.parseSpfResolved("v=spf1 redirect=_openid.no-spf.cz -all",
      Set("origin.cz"))
    assert(s.redirect_resolved.contains(
      graft.model.Model.SpfRef("_openid.no-spf.cz", None, None)))
    // the rest of the parse survives
    assert(s.all.contains("fail"))
  }

  test("HSTS preload from a real list file flips HSTS end-to-end; includeSubdomains and IDNA honored (hsts_utils.py:23-24)") {
    val f = java.nio.file.Files.createTempFile("hsts-preload", ".txt")
    java.nio.file.Files.writeString(f,
      "# chromium-style preload fixture\nseznam.cz\nexample.cz includeSubdomains\nháčky.cz\n")
    val svc = new graft.universe.HstsPreloadService(u, f.toString)
    val pp = new Probes(svc, CrawlConfig())
    // exact entry flips a domain the synthetic set does not preload
    assert(!u.hstsPreload("seznam.cz"))
    val json = graft.spans.JsonSink.toJson(pp.processDomain("seznam.cz", "t"))
    assert(json.contains("\"HSTS\":true"))
    // exact ≠ subtree: www of an exact entry is NOT preloaded
    assert(!svc.hstsPreload("www.seznam.cz"))
    // includeSubdomains matches the domain and any depth below it
    assert(svc.hstsPreload("example.cz"))
    assert(svc.hstsPreload("a.b.example.cz"))
    // IDNA: the entry and the query both canonicalize to punycode
    assert(svc.hstsPreload("HÁČKY.CZ."))
    // the already-punycoded form matches too (entries are stored encoded)
    assert(svc.hstsPreload(graft.canon.Canon.canonicalize("háčky.cz")))
    assert(graft.canon.Canon.canonicalize("háčky.cz").startsWith("xn--"))
    // file replaces the synthetic set entirely (nic.cz not in the file)
    assert(!svc.hstsPreload("nic.cz"))
    // missing file degrades to the inner service with a warning
    val missing = new graft.universe.HstsPreloadService(u, "/nonexistent/preload.txt")
    assert(missing.hstsPreload("nic.cz"))
  }

  test("CHAOS records are config-driven incl. fortune; keys dot-stripped (dns_utils.py:249-250)") {
    val ip = "192.0.2.53"
    val default = p.probeNsIp(ip)
    assert(default.chaos.map(_.key) == Seq("hostnamebind", "versionbind"))
    val pf = new Probes(u, CrawlConfig(
      authChaosTxt = Seq("hostname.bind", "version.bind", "authors.bind", "fortune")))
    val ni = pf.probeNsIp(ip)
    assert(ni.chaos.map(_.key) ==
      Seq("hostnamebind", "versionbind", "authorsbind", "fortune"))
    val fortune = (0 to 50).map(i => pf.probeNsIp(s"192.0.2.$i"))
      .flatMap(_.chaos.find(_.key == "fortune")).find(_.txt.value.isDefined).get
    assert(fortune.txt.value.get.head.nonEmpty)
  }

  test("worker_hostname present only under save_worker_hostname (crawl.py:180-181)") {
    assert(p.processDomain("d1.cz", "t").worker_hostname.isEmpty)
    val pw = new Probes(u, CrawlConfig(saveWorkerHostname = true, workerHostname = "w-07"))
    assert(pw.processDomain("d1.cz", "t").worker_hostname.contains("w-07"))
  }

  test("cross-host redirects followed: alt host serves its own cert (web_utils.py:202-223)") {
    val crossed = (0 to 6000).iterator.map(i => s"d$i.cz").flatMap { d =>
      u.aFor(d).headOption.map(ip => (d, p.fetchWeb(d, ip, 443)))
    }.find { case (_, r) =>
      r.steps.get.exists(s => s.url.startsWith("https://alt-") && s.cert.isDefined)
    }.get
    val (d, r) = crossed
    // the hop served by the alt host carries the ALT host's certificate
    val served = r.steps.get
      .find(s => s.url.startsWith("https://alt-") && s.cert.isDefined).get
    assert(served.cert.get.head.subject("commonName") == s"alt-$d")
    // and detected encodings include the non-ascii utf-8 page flavor
    val pc = new Probes(u, CrawlConfig(saveContent = true))
    val encs = (0 to 600).flatMap { i =>
      val x = s"d$i.cz"
      u.aFor(x).headOption.map(ip => pc.fetchWeb(x, ip, 443))
    }.flatMap(_.steps.get).flatMap(_.detected_encoding).toSet
    assert(encs.contains("ascii") && encs.contains("utf-8"))
  }

  test("DNS_AUTH ipv4/ipv6 keys omitted when empty (crawl.py:100-104)") {
    val noV6ns = (0 to 6000).map(i => s"d$i.cz").find { d =>
      val ns = u.nsFor(d)
      ns.nonEmpty && ns.exists(n => u.nsIps6(n).isEmpty)
    }.get
    val auth = p.getDnsAuth(noV6ns).get
    val bare = auth.find(_.ipv6.isEmpty).get
    assert(bare.ipv6.isEmpty) // None, not Some(Seq())
    assert(auth.forall(na => na.ipv4.forall(_.nonEmpty) && na.ipv6.forall(_.nonEmpty)))
  }
}
