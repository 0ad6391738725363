package graft.probes

import graft.model.Model._
import graft.parsers.Parsers
import graft.universe.Universe

/** Probe leaves: the "fetch" functions of the crawl, each the semantic twin
  * of a reference network leaf, backed by the deterministic [[Universe]].
  * Branch logic (CNAME flattening, DNSSEC classification, redirect loops,
  * null short-circuits) is reproduced from the cited reference lines; only
  * the socket I/O is synthetic.
  */
class Probes(val u: Universe, val cfg: CrawlConfig) extends Serializable {

  // per-Probes (≈ per-partition) cert cache: one TLS handshake's worth of
  // work per distinct host, like a real connection pool would amortize
  @transient private lazy val certCache =
    scala.collection.mutable.HashMap.empty[String, Option[Seq[Certificate]]]

  private def certOf(host: String): Option[Seq[Certificate]] =
    certCache.getOrElseUpdate(host, Some(Seq(u.certFor(host))))

  /** Resolve name/rrtype with CNAME-chain flattening (reference
    * `dns_utils.py:260-306`): follow CNAMEs (bounded), attach `cname` on
    * the first record and `from_cname` on records resolved through the
    * chain; None when nothing resolves (NXDOMAIN/timeout analog).
    */
  def resolve(name: String, rrtype: String): Option[Seq[DnsRecord]] = {
    val ttl = Some(u.ttlFor(name))
    def leaf(n: String): Seq[String] = rrtype match {
      case "A" => u.aFor(n)
      case "AAAA" => u.aaaaFor(n)
      case "NS" => u.nsFor(n)
      case "MX" => u.mxFor(n)
      case "TXT" => u.txtFor(n)
      case "DS" => u.dsFor(n)
      case "DNSKEY" => u.dnskeyFor(n)
      case "TLSA" => u.tlsaFor(n)
      case _ => Seq.empty
    }
    u.cnameFor(name) match {
      case Some(target) if rrtype == "A" || rrtype == "AAAA" =>
        // bounded chain walk (reference caps at answer flattening)
        var cur = target
        var hops = 0
        while (hops < 8 && u.cnameFor(cur).isDefined) { cur = u.cnameFor(cur).get; hops += 1 }
        val vals = leaf(cur)
        if (vals.isEmpty) None
        else Some(vals.map(v => DnsRecord(v, cname = Some(target),
          from_cname = Some(cur), ttl = ttl)))
      case _ =>
        val vals = leaf(name)
        if (vals.isEmpty) None else Some(vals.map(v => DnsRecord(v, ttl = ttl)))
    }
  }

  /** DNSSEC classifier (reference `dns_utils.py:73-127`): signed → valid
    * with rrsig; bogus → valid=false (SERVFAIL rcode 2 branch); unsigned →
    * valid=null with "Missing DS/DNSKEY" message (1-answer branch).
    */
  def checkDnssec(domain: String): Dnssec = u.dnssecState(domain) match {
    case "signed" => Dnssec(Some(true), Some(u.rrsigFor(domain)), None, None)
    case "bogus" => Dnssec(Some(false), None, None,
      Some("SERVFAIL — validation failed"))
    case _ => Dnssec(None, None, Some("Missing DS or DNSKEY records"), None)
  }

  private def annotate(recs: Option[Seq[DnsRecord]], tokenIndex: Int) =
    recs.map(_.map(r => r.copy(algorithm = Parsers.annotateAlgorithm(r.value, tokenIndex))))

  /** GeoIP only for global IPs (reference CHANGELOG.md:160-164 +
    * `ip_utils.py:24-41`): private/reserved/doc-range addresses pass
    * through unannotated.
    */
  private def geoAnnotate(recs: Option[Seq[DnsRecord]]) =
    recs.map(_.map(r =>
      if (graft.canon.IpPredicates.isGlobalIp(r.value))
        r.copy(geoip = Some(u.geo(r.value)))
      else r))

  /** DNS_LOCAL assembly (reference `crawl.py:39-69`): the 10 required keys
    * + optional www/TLSA/SPF extras, geoip on address records, algorithm
    * on DS/DNSKEY, SPF/DMARC parsed with empty→null collapse.
    */
  def getDnsLocal(domain: String): DnsLocal = {
    val txt = resolve(domain, "TXT")
    val spf = txt.flatMap(_.collectFirst {
      case r if r.value.matches("^\"?v=spf.*") => Parsers.parseSpf(r.value)
    })
    val dmarc = resolve(s"_dmarc.$domain", "TXT") // reference queries _dmarc.<domain>
      .flatMap(_.headOption)
      .orElse(u.dmarcFor(domain).map(DnsRecord(_)))
      .filter(_.value.toLowerCase.contains("dmarc"))
      .map(r => Parsers.parseDmarc(r.value))
    val tlsa = resolve(s"_443._tcp.$domain", "TLSA")
      .map(_.flatMap(r => Parsers.parseTlsa(r.value))).filter(_.nonEmpty)
    val tlsaWww = if (cfg.checkWww)
      resolve(s"_443._tcp.www.$domain", "TLSA")
        .map(_.flatMap(r => Parsers.parseTlsa(r.value))).filter(_.nonEmpty)
    else None
    val additional =
      if (cfg.additionalRrtypes.isEmpty) None
      else {
        val m = cfg.additionalRrtypes.flatMap { rt =>
          val vals = u.additionalFor(domain, rt).map(AdditionalParsers(rt, _))
          if (vals.isEmpty) None else Some(rt -> vals)
        }.toMap
        if (m.isEmpty) None else Some(m)
      }
    DnsLocal(
      additional = additional,
      NS_AUTH = resolve(domain, "NS"),
      MAIL = resolve(domain, "MX"),
      WEB4 = geoAnnotate(resolve(domain, "A")),
      WEB6 = geoAnnotate(resolve(domain, "AAAA")),
      WEB4_www = if (cfg.checkWww) geoAnnotate(resolve(s"www.$domain", "A")) else None,
      WEB6_www = if (cfg.checkWww) geoAnnotate(resolve(s"www.$domain", "AAAA")) else None,
      WEB_TLSA = tlsa,
      WEB_TLSA_www = tlsaWww,
      TXT = txt,
      TXT_SPF = spf,
      TXT_DMARC = dmarc,
      DS = annotate(resolve(domain, "DS"), 1),
      DNSKEY = annotate(resolve(domain, "DNSKEY"), 2),
      DNSSEC = checkDnssec(domain))
  }

  /** Per-nameserver-IP probe (reference `dns_utils.py:235-253` — the
    * Redis-cached leaf; the engine dedups these across domains).
    */
  private def geoIfGlobal(ip: String): Option[GeoIp] =
    if (graft.canon.IpPredicates.isGlobalIp(ip)) Some(u.geo(ip)) else None

  def probeNsIp(ip: String): NsIp =
    NsIp(ip, geoIfGlobal(ip),
      hostnamebind = u.chaosTxt(ip, "hostname.bind"),
      versionbind = u.chaosTxt(ip, "version.bind"),
      authorsbind = u.chaosTxt(ip, "authors.bind"))

  /** DNS_AUTH (reference `crawl.py:72-106`): NS fan-out → per-NS A/AAAA →
    * per-IP probes; no NS → None; empty-value NS skipped.
    */
  def getDnsAuth(domain: String): Option[Seq[NsAuth]] = {
    val ns = u.nsFor(domain)
    if (ns.isEmpty) None
    else Some(ns.filter(_.nonEmpty).map { n =>
      NsAuth(n, u.nsIps4(n).map(probeNsIp), u.nsIps6(n).map(probeNsIp))
    })
  }

  /** Mail probes (reference `mail_utils.py:48-107`): MX hosts (fallback to
    * apex when no MX but A/AAAA exists, `crawl.py:145-154`), per-host TLSA
    * on ports 25/465/587, per-IP banners; max_ips_per_host bound.
    */
  def getMail(domain: String, dnsLocal: DnsLocal): Option[Seq[MailHost]] = {
    val mxHosts = dnsLocal.MAIL.map(_.flatMap(r => Parsers.mxHost(r.value)))
      .getOrElse(Seq.empty)
    val hosts =
      if (mxHosts.nonEmpty) mxHosts
      else if (dnsLocal.WEB4.isDefined || dnsLocal.WEB6.isDefined) Seq(domain)
      else return None
    Some(hosts.distinct.map { host =>
      val tlsa = cfg.mailPorts.map { port =>
        val recs = u.tlsaFor(s"_$port._tcp.$host").flatMap(Parsers.parseTlsa)
        port -> (if (recs.isEmpty) None else Some(recs))
      }.toMap
      val ips = (u.aFor(host) ++ u.aaaaFor(host)).take(cfg.maxIpsPerMailHost)
      val banners = ips.map { ip =>
        MailIpBanners(ip,
          cfg.mailPorts.map(p => p -> u.mailBanner(ip, p)).toMap,
          geoIfGlobal(ip))
      }
      MailHost(host, tlsa, banners)
    })
  }

  /** HTTP(S) redirect-chain fetch for one (host, ip, port, path) (reference
    * `web_utils.py:202-223,225-320`): bounded by max_redirects, steps in
    * fetch order, final_step-only when save_intermediate_steps is off,
    * content truncation, binary sniff, parsed hsts/alt-svc/content-length/
    * set-cookie headers, cert on TLS steps, encoding detection.
    */
  def fetchWeb(host: String, ip: String, port: Int, startPath: String = "/"): WebResult = {
    var steps = Vector.empty[WebStep]
    var hop = 0
    var done = false
    var url = s"${if (port == 443) "https" else "http"}://$host${if (port == 80 || port == 443) "" else s":$port"}$startPath"
    var path = startPath
    // the scheme decides the connection: an http→https redirect reconnects
    // on 443 (the reference's requests session does the same), so later
    // hops' TLS metadata matches the transport actually used
    var curPort = port
    // one handshake per connection: cert computed once, reused per step
    lazy val hostCert = certOf(host)
    while (!done && hop <= cfg.maxRedirects) {
      val (status, loc, headers, body, isBin) = u.webStep(host, ip, curPort, hop, path)
      if (status == 0) {
        steps :+= WebStep(url, None, None, Map.empty, None, None, None, None,
          Some(ip), None, None, None, None, None, None, Some("timeout"))
        done = true
      } else {
        val isRedirect = loc.isDefined && status >= 300 && status < 400
        val https = url.startsWith("https")
        val (tlsV, tlsC) = if (https) {
          val t = u.tlsInfo(host, ip); (Some(t._1), Some(t._2))
        } else (None, None)
        val content = body.map(b =>
          if (b.length > cfg.contentSizeLimit) b.substring(0, cfg.contentSizeLimit) else b)
        steps :+= WebStep(
          url = url, status = Some(status), is_redirect = Some(isRedirect),
          headers = headers,
          hsts_header = headers.get("strict-transport-security").map(Parsers.parseHstsHeader),
          alt_svc = headers.get("alt-svc").map(Parsers.parseAltSvc),
          cookies = headers.get("set-cookie")
            .map(raw => Parsers.parseSetCookie(raw).toSeq).filter(_.nonEmpty),
          content_length = headers.get("content-length").flatMap(Parsers.parseContentLength),
          ip = Some(ip), tls_version = tlsV, tls_cipher = tlsC,
          cert = if (https) hostCert else None,
          content = if (cfg.saveContent) content else None,
          content_is_binary = if (body.isDefined) Some(isBin) else None,
          detected_encoding = body.filter(_ => !isBin)
            .map(b => Parsers.detectEncoding(headers.get("content-type"), b)),
          error = None)
        if (isRedirect && hop < cfg.maxRedirects) {
          val l = loc.get
          // urljoin (web_utils.py:205); absolute locations skip URI parsing
          url = if (l.startsWith("http://") || l.startsWith("https://")) l
                else java.net.URI.create(url).resolve(l).toString
          val schemeEnd = url.indexOf("//") + 2
          val slash = url.indexOf('/', schemeEnd)
          path = if (slash < 0) "/" else url.substring(slash)
          curPort = if (url.startsWith("https://")) 443 else 80
          hop += 1
        } else done = true
      }
    }
    // hops actually followed (reference web_utils.py:202-223: the counter
    // increments per follow, so a capped chain reports max_redirects)
    val redirectCount = steps.length - 1
    if (cfg.saveIntermediateSteps)
      WebResult(ip, redirectCount, Some(steps), None)
    else
      WebResult(ip, redirectCount, None, steps.lastOption)
  }

  /** WEB section: the 8 combos `WEB{4,6}_{80,443}[_www]` (reference
    * `crawl.py:109-133`), ips bounded by max_ips_per_domain; no ips → None.
    */
  def getWeb(domain: String, dl: DnsLocal): WebObj = {
    def ips(recs: Option[Seq[DnsRecord]]): Seq[String] =
      recs.map(_.map(_.value).take(cfg.maxIpsPerDomain)).getOrElse(Seq.empty)
    def combo(host: String, recs: Option[Seq[DnsRecord]], port: Int): Option[Seq[WebResult]] = {
      val ipList = ips(recs)
      if (ipList.isEmpty) None else Some(ipList.map(ip => fetchWeb(host, ip, port)))
    }
    val www = s"www.$domain"
    WebObj(
      WEB4_80 = combo(domain, dl.WEB4, 80),
      WEB4_443 = combo(domain, dl.WEB4, 443),
      WEB6_80 = combo(domain, dl.WEB6, 80),
      WEB6_443 = combo(domain, dl.WEB6, 443),
      WEB4_80_www = if (cfg.checkWww) combo(www, dl.WEB4_www, 80) else None,
      WEB4_443_www = if (cfg.checkWww) combo(www, dl.WEB4_www, 443) else None,
      WEB6_80_www = if (cfg.checkWww) combo(www, dl.WEB6_www, 80) else None,
      WEB6_443_www = if (cfg.checkWww) combo(www, dl.WEB6_www, 443) else None)
  }

  /** WEB_paths: per configured path, the apex-v4-443 fetch results
    * (reference `crawl.py:158-163`, `config.yml:46`).
    */
  def getWebPaths(domain: String, dl: DnsLocal): Option[Map[String, Seq[WebResult]]] = {
    if (cfg.webPaths.isEmpty) return None
    val ips = dl.WEB4.map(_.map(_.value).take(cfg.maxIpsPerDomain)).getOrElse(Seq.empty)
    if (ips.isEmpty) return None
    Some(cfg.webPaths.map { p =>
      p -> ips.map(ip => fetchWeb(domain, ip, 443, p))
    }.toMap)
  }

  /** Full per-domain pipeline (reference `process_domain`,
    * `crawl.py:136-183`) with an injected clock for determinism.
    */
  def processDomain(domain: String, timestamp: String): DomainResult = {
    val dl = getDnsLocal(domain)
    DomainResult(
      domain = domain,
      timestamp = timestamp,
      DNS_LOCAL = dl,
      DNS_AUTH = getDnsAuth(domain),
      MAIL = getMail(domain, dl),
      WEB = getWeb(domain, dl),
      WEB_paths = getWebPaths(domain, dl),
      HSTS = u.hstsPreload(domain))
  }
}

/** U1 — the additional-RR plugin registry (reference `crawl.py:61-68`,
  * `dns_utils.py:309-319`): config lists extra rrtypes to fetch; a parser
  * registry normalizes known types, unknown types pass through raw.
  * Only SPF is registered, exactly like the reference.
  */
object AdditionalParsers {
  val registry: Map[String, String => String] = Map(
    "SPF" -> (raw => raw.trim.stripPrefix("\"").stripSuffix("\"")))

  def apply(rrtype: String, raw: String): String =
    registry.get(rrtype).map(_(raw)).getOrElse(raw)
}

/** Crawl configuration (reference `config.yml` defaults via
  * `config_loader.py:31-81`): plain case class — Spark broadcasts it with
  * the closure; no Redis-shared config needed.
  */
case class CrawlConfig(
    checkWww: Boolean = true,
    saveContent: Boolean = false,     // config_loader.py:62 (library default)
    saveIntermediateSteps: Boolean = true, // config_loader.py:74
    maxRedirects: Int = 6,            // config.yml:34
    contentSizeLimit: Int = 5120000,  // config.yml:37
    maxIpsPerDomain: Int = 16,
    maxIpsPerMailHost: Int = 4,       // config.yml:30
    mailPorts: Seq[Int] = Seq(25, 465, 587),
    cacheTtlSeconds: Int = 3600,      // config.yml:23
    jobTimeoutSeconds: Int = 80,      // config.yml:19
    webPaths: Seq[String] = Seq.empty,          // config.yml:46
    additionalRrtypes: Seq[String] = Seq.empty) // config.yml dns.additional
