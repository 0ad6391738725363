package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.probes.{ConfigLoader, CrawlConfig, Probes}
import graft.universe.Universe

/** F19/S2 — reference-compatible `config.yml` loading
  * (`config_loader.py:84-138`): YAML-subset parse, defaults-merge,
  * string coercion, legacy-format detection, and end-to-end gate toggling
  * through [[Probes]].
  */
class ConfigLoaderSpec extends AnyFunSuite {

  // the reference repo's own config.yml, verbatim content (config.yml:1-52)
  private val referenceYml =
    """geoip:
      |  country: /usr/share/GeoIP/GeoLite2-Country.mmdb
      |  asn: /usr/share/GeoIP/GeoLite2-ASN.mmdb
      |dns:
      |  resolvers:
      |    - 193.17.47.1  # https://www.nic.cz/odvr/
      |    - 2001:148f:ffff::1
      |  check_www: True  # get A/AAAA/TLSA records for the `www.` subdomain
      |  auth_chaos_txt:
      |    - hostname.bind
      |    - version.bind
      |  additional:
      |   - SPF
      |timeouts:
      |  job: 80
      |  dns: 2
      |  http: 2
      |  http_read: 5
      |  cache: 3600
      |mail:
      |  get_banners: True
      |  ports:
      |    - 25
      |    - 465
      |    - 587
      |  max_ips_per_host: 4
      |web:
      |  save_content: True
      |  save_binary: True
      |  max_redirects: 6
      |  user_agent: Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko) Chrome/74.0.3729.131 Safari/537.36
      |  accept_language: en-US;q=0.9,en;q=0.8
      |  content_size_limit: 5120000
      |  max_ips_per_domain: null
      |  check_http: True
      |  check_https: True
      |  check_ipv4: True
      |  check_ipv6: True
      |  save_intermediate_steps: True
      |  save_cert_chain: False
      |  flatten_output: False
      |  paths: []
      |connectivity_check_ips:
      |  ipv4: 193.17.47.1
      |  ipv6: 2001:148f:ffff::1
      |save_worker_hostname: False
      |""".stripMargin

  test("reference config.yml parses to the expected CrawlConfig") {
    val c = ConfigLoader.fromYamlText(referenceYml)
    assert(c.checkWww)
    assert(c.authChaosTxt == Seq("hostname.bind", "version.bind"))
    assert(c.additionalRrtypes == Seq("SPF"))
    assert(c.jobTimeoutSeconds == 80)
    assert(c.cacheTtlSeconds == 3600)
    assert(c.dnsTimeoutSeconds == 2.0 && c.httpTimeoutSeconds == 2.0 &&
      c.httpReadTimeoutSeconds == 5.0)
    assert(c.userAgent.startsWith("Mozilla/5.0 AppleWebKit/537.36"))
    assert(!c.respectRobots) // extension key, absent in the reference file
    assert(c.getBanners)
    assert(c.mailPorts == Seq(25, 465, 587))
    assert(c.maxIpsPerMailHost == 4)
    assert(c.saveContent) // config.yml True overrides the library default false
    assert(c.saveBinary)
    assert(c.maxRedirects == 6)
    assert(c.contentSizeLimit == 5120000)
    assert(c.maxIpsPerDomain.isEmpty) // null = unlimited
    assert(c.checkHttp && c.checkHttps && c.checkIpv4 && c.checkIpv6)
    assert(c.saveIntermediateSteps)
    assert(!c.saveCertChain)
    assert(!c.flattenOutput)
    assert(c.webPaths.isEmpty)
    assert(c.connectivityIpv4.contains("193.17.47.1"))
    assert(c.connectivityIpv6.contains("2001:148f:ffff::1"))
    assert(!c.saveWorkerHostname)
  }

  test("defaults-merge: keys absent from the file keep CrawlConfig defaults") {
    val c = ConfigLoader.fromYamlText("mail:\n  get_banners: False\n")
    assert(!c.getBanners)                      // overridden
    assert(c.maxRedirects == 6)                // default survives
    assert(c.mailPorts == Seq(25, 465, 587))   // default survives
    assert(c.jobTimeoutSeconds == 80)
  }

  test("merge coercion: quoted digit-strings to numbers, True/False strings " +
      "to bools, global IPs exempt from the float rule") {
    val c = ConfigLoader.fromYamlText(
      """timeouts:
        |  job: "120"
        |web:
        |  save_content: "True"
        |  max_redirects: "3"
        |connectivity_check_ips:
        |  ipv6: 2001:148f:ffff::1
        |""".stripMargin)
    assert(c.jobTimeoutSeconds == 120)   // "120" → float → int
    assert(c.saveContent)                // "True" → bool
    assert(c.maxRedirects == 3)
    // starts with a digit but is a valid global IPv6 → stays a string
    assert(c.connectivityIpv6.contains("2001:148f:ffff::1"))
  }

  test("empty / comment-only file → defaults (reference warn branch)") {
    assert(ConfigLoader.fromYamlText("") == CrawlConfig())
    assert(ConfigLoader.fromYamlText("# just a comment\n") == CrawlConfig())
  }

  test("pre-v1.2 format (http_timeout at top level) → defaults") {
    val c = ConfigLoader.fromYamlText(
      "http_timeout: 2\nsave_web_content: True\nmail:\n  get_banners: False\n")
    assert(c == CrawlConfig()) // the whole file is discarded, not merged
  }

  test("pre-v1.4 format (top-level resolvers) converts and still merges") {
    val c = ConfigLoader.fromYamlText(
      """resolvers:
        |  - 193.17.47.1
        |mail:
        |  get_banners: False
        |""".stripMargin)
    assert(!c.getBanners) // the rest of the file still merges
  }

  test("null connectivity IP disables the family end-to-end (S8 gate)") {
    val c = ConfigLoader.fromYamlText(
      "connectivity_check_ips:\n  ipv4: 193.17.47.1\n  ipv6: null\n")
    assert(c.connectivityIpv6.isEmpty)
    val p = new Probes(new Universe(7L), c)
    assert(p.sourceIpv6.isEmpty)
    val dl = p.getDnsLocal("nic.cz")
    val w = p.getWeb("nic.cz", dl)
    assert(w.WEB6_80.isEmpty && w.WEB6_443.isEmpty) // v6 side gated off
  }

  test("config toggles flow end-to-end: save_content on, banners off") {
    val yml =
      """web:
        |  save_content: True
        |mail:
        |  get_banners: False
        |""".stripMargin
    val c = ConfigLoader.fromYamlText(yml)
    val p = new Probes(new Universe(7L), c)
    val d = "nic.cz"
    val dl = p.getDnsLocal(d)
    val web = p.getWeb(d, dl)
    val firstStep = web.WEB4_443.get.head.steps.get.head
    assert(firstStep.content.isDefined || firstStep.content_is_binary.isDefined,
      "save_content: True must flow into the web fetch")
    val mail = p.getMail(d, dl)
    assert(mail.get.forall(_.banners.isEmpty), "get_banners: False must gate banners")
  }

  test("missing file path → defaults") {
    assert(ConfigLoader.load("/nonexistent/config.yml") == CrawlConfig())
  }

  test("inline lists and paths parse") {
    val c = ConfigLoader.fromYamlText(
      "web:\n  paths: [/robots.txt, /.well-known/security.txt]\n")
    assert(c.webPaths == Seq("/robots.txt", "/.well-known/security.txt"))
  }
}
