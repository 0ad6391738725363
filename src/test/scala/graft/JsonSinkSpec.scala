package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.probes.{CrawlConfig, Probes}
import graft.spans.JsonSink
import graft.universe.Universe

/** K1 — reference-format JSON-lines output contract (`crawl.py:186-187`,
  * `result-example.json`, `result-schema.json`): compact separators,
  * reference key order, gate-absent vs probe-null distinction, and a full
  * round-trip parse (Spark's JSON reader as the well-formedness oracle).
  */
class JsonSinkSpec extends AnyFunSuite {

  val u = new Universe(seed = 42L)
  val cfg = CrawlConfig()
  val p = new Probes(u, cfg)

  private def goldenJson: String =
    JsonSink.toJson(p.processDomain("nic.cz", "2026-01-01 00:00:00"), cfg)

  test("compact separators + reference top-level key order (crawl.py:186-187)") {
    val j = goldenJson
    assert(j.startsWith("""{"domain":"nic.cz","timestamp":"2026-01-01 00:00:00","results":{"DNS_LOCAL":{"NS_AUTH":["""))
    // reference dict build order inside DNS_LOCAL (crawl.py:39-60)
    val keys = Seq("\"NS_AUTH\"", "\"MAIL\"", "\"WEB4\"", "\"WEB4_www\"",
      "\"WEB6\"", "\"WEB6_www\"", "\"WEB_TLSA\"", "\"WEB_TLSA_www\"",
      "\"TXT\"", "\"TXT_SPF\"", "\"TXT_DMARC\"", "\"TXT_openid\"",
      "\"DS\"", "\"DNSKEY\"", "\"DNSSEC\"")
    val idx = keys.map(j.indexOf(_))
    assert(idx.forall(_ >= 0), s"missing keys: ${keys.zip(idx).filter(_._2 < 0)}")
    assert(idx == idx.sorted, "DNS_LOCAL key order diverges from crawl.py")
    // results section order (crawl.py:165-182); each searched after the
    // previous (MAIL/WEB also exist as DNS_LOCAL keys)
    val sections = Seq("\"DNS_LOCAL\"", "\"DNS_AUTH\"", "\"MAIL\"", "\"WEB\"", "\"HSTS\"")
    val positions = sections.scanLeft(0) { (from, k) =>
      val i = j.indexOf(k, from)
      assert(i >= 0, s"section $k missing after $from")
      i
    }.tail
    assert(positions == positions.sorted)
  }

  test("probe-answered-nothing is null; gated-off keys are ABSENT") {
    val d = (0 to 4000).map(i => s"d$i.cz")
      .find(x => u.aFor(x).nonEmpty && u.tlsaFor(s"_443._tcp.$x").isEmpty
        && u.txtFor(s"_openid.$x").isEmpty).get
    val j = JsonSink.toJson(p.processDomain(d, "t"), cfg)
    assert(j.contains("\"WEB_TLSA\":null"))
    assert(j.contains("\"TXT_openid\":null"))
    // check_www off drops the _www keys entirely (crawl.py:45-52)
    val cNoWww = CrawlConfig(checkWww = false)
    val jNoWww = JsonSink.toJson(new Probes(u, cNoWww).processDomain(d, "t"), cNoWww)
    assert(!jNoWww.contains("WEB4_www") && !jNoWww.contains("WEB_TLSA_www")
      && !jNoWww.contains("WEB4_443_www"))
    // check_https off drops 443 combos (crawl.py:113-133)
    val cNoTls = CrawlConfig(checkHttps = false)
    val jNoTls = JsonSink.toJson(new Probes(u, cNoTls).processDomain(d, "t"), cNoTls)
    assert(!jNoTls.contains("\"WEB4_443\"") && jNoTls.contains("\"WEB4_80\""))
  }

  test("worker_hostname emitted after results only when configured (crawl.py:180-181)") {
    assert(!goldenJson.contains("worker_hostname"))
    val c = CrawlConfig(saveWorkerHostname = true, workerHostname = "w-03")
    val j = JsonSink.toJson(new Probes(u, c).processDomain("nic.cz", "t"), c)
    assert(j.endsWith(""","worker_hostname":"w-03"}"""))
  }

  test("DNS_AUTH nsip carries config-driven chaos keys; banners key gated (get_ns_info/mail_utils)") {
    val d = (0 to 4000).map(i => s"d$i.cz")
      .find(x => u.nsFor(x).nonEmpty && u.mxFor(x).nonEmpty).get
    val j = JsonSink.toJson(p.processDomain(d, "t"), cfg)
    assert(j.contains("\"hostnamebind\":{\"value\":"))
    assert(j.contains("\"versionbind\":{\"value\":"))
    assert(!j.contains("authorsbind")) // not in default auth_chaos_txt
    assert(j.contains("\"banners\":")) // getBanners default on
    val cNoB = CrawlConfig(getBanners = false)
    val jNoB = JsonSink.toJson(new Probes(u, cNoB).processDomain(d, "t"), cNoB)
    assert(!jNoB.contains("\"banners\":"))
  }

  test("flatten_output: lone combo into WEB, lone ip-result unwrapped (config.yml:45)") {
    val c = CrawlConfig(flattenOutput = true, checkHttps = false, checkIpv6 = false,
      checkWww = false, maxIpsPerDomain = Some(1))
    val pf = new Probes(u, c)
    val d = (0 to 4000).map(i => s"d$i.cz").find(x => u.aFor(x).nonEmpty).get
    val j = JsonSink.toJson(pf.processDomain(d, "t"), c)
    // only WEB4_80 survives the gates → saved directly into WEB (no combo key)
    assert(!j.contains("\"WEB4_80\""))
    // single ip → object, not 1-element array
    assert(j.contains("\"WEB\":{\"ip\":"))
  }

  test("round-trip: Spark's JSON reader parses every emitted line (well-formedness oracle)") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val cAll = CrawlConfig(saveContent = true, saveWorkerHostname = true,
      webPaths = Seq("/robots.txt"),
      additionalRrtypes = Seq("CAA", "SPF"),
      authChaosTxt = Seq("hostname.bind", "version.bind", "fortune"))
    val pAll = new Probes(u, cAll)
    val lines = ("nic.cz" +: (0 to 120).map(i => s"d$i.cz"))
      .map(d => JsonSink.toJson(pAll.processDomain(d, "2026-01-01 00:00:00"), cAll))
    val df = spark.read
      .option("mode", "FAILFAST") // any malformed line throws
      .json(spark.createDataset(lines))
    assert(df.count() == lines.length.toLong)
    assert(df.columns.contains("domain") && df.columns.contains("results"))
    val domains = df.select("domain").as[String].collect().toSet
    assert(domains.contains("nic.cz") && domains.contains("d0.cz"))
  }

  test("headers emit in network ARRIVAL order, not name-sorted (reference " +
      "byte-order fidelity)") {
    // golden nic.cz first hop arrives as server, location — alphabetical
    // would put location first; the JSON must preserve arrival order
    val j = goldenJson
    val h80 = j.indexOf("\"WEB4_80\":[{\"ip\"")
    assert(h80 >= 0)
    val headersAt = j.indexOf("\"headers\":{", h80)
    assert(j.startsWith("\"headers\":{\"server\":\"nginx\",\"location\":", headersAt), // server first
      j.substring(headersAt, math.min(j.length, headersAt + 80)))
    // a synthetic 200 arrives server, content-type, content-length —
    // name-sorted would reverse it; scan the full crawl population for a
    // step carrying all three and check relative positions
    val results = (0 to 300).map(i => u.webStep(s"host$i.cz", "1.2.3.4", 443, 9, "/"))
    val full = results.find(r => r._1 == 200 && r._3.map(_._1)
      .containsSlice(Seq("server", "content-type", "content-length")))
    assert(full.isDefined)
    // and through the full pipeline: arrival-ordered pairs ride the WebStep
    val step = p.fetchWeb("host7.cz", "1.2.3.4", 443).steps.get.last
    assert(step.headers.nonEmpty)
    assert(step.headers.map(_._1) == step.headers.map(_._1).distinct)
    if (step.headers.length > 1) {
      val json = JsonSink.toJson(p.processDomain("host7.cz", "t"), cfg)
      // arrival order (server before content-*) somewhere in the document
      val si = json.indexOf("\"server\":")
      val ci = json.indexOf("\"content-type\":")
      if (si >= 0 && ci >= 0) assert(si < ci, "server header must precede content-type")
    }
  }

  test("jsonLines sink is distributed and deterministic") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val eng = new graft.engine.Engine(spark, u,
      workDir = graft.TmpDirs.create("graft-json").toString)
    val results = eng.crawlDomains(spark.createDataset((0L until 40L).map(u.seedDomain)))
    val a = JsonSink.jsonLines(results, cfg).collect().sorted
    val b = JsonSink.jsonLines(results, cfg).collect().sorted
    assert(a.length >= 30 && a.sameElements(b))
    assert(a.forall(_.startsWith("{\"domain\":\"")))
  }
}
