package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.probes.{CrawlConfig, Probes}
import graft.spans.SpanCodec
import graft.universe.Universe

class SpanCodecSpec extends AnyFunSuite {

  val u = new Universe(42L)
  // content saving on: the codec's media_ref path needs bodies present
  val p = new Probes(u, CrawlConfig(saveContent = true))

  test("span enumeration: contiguous offsets, doc_id = domain, canonical order") {
    val r = p.processDomain("nic.cz", "2026-01-01 00:00:00")
    val doc = SpanCodec.encode(r)
    assert(doc.doc_id == "nic.cz")
    assert(doc.spans.map(_.offset) == doc.spans.indices)
    // section order is the reference's insertion order (crawl.py:165-182)
    val kinds = doc.spans.map(_.kind)
    val firstDnsLocal = kinds.indexWhere(_.startsWith("DNS_LOCAL"))
    val firstDnsAuth = kinds.indexWhere(_.startsWith("DNS_AUTH"))
    val firstMail = kinds.indexWhere(_.startsWith("MAIL"))
    val firstWeb = kinds.indexWhere(_.startsWith("WEB."))
    val hsts = kinds.indexWhere(_ == "HSTS")
    assert(firstDnsLocal < firstDnsAuth && firstDnsAuth < firstMail)
    assert(firstMail < firstWeb && firstWeb < hsts && hsts == kinds.length - 1)
  }

  test("golden leaf spans for nic.cz") {
    val r = p.processDomain("nic.cz", "2026-01-01 00:00:00")
    val spans = SpanCodec.encode(r).spans
    def texts(kind: String) = spans.filter(_.kind == kind).map(_.text)
    assert(texts("domain") == Seq("nic.cz"))
    assert(texts("DNS_LOCAL.NS_AUTH.value").sorted ==
      Seq("a.ns.nic.cz", "b.ns.nic.cz", "d.ns.nic.cz"))
    assert(texts("DNS_LOCAL.DNSSEC.valid") == Seq("true"))
    assert(texts("DNS_LOCAL.DS.algorithm") == Seq("ECDSAP256SHA256"))
    assert(texts("DNS_LOCAL.WEB4.geoip.asn") == Seq("25192"))
    assert(texts("HSTS") == Seq("true"))
  }

  test("null sections encode as single null spans (null vs empty distinction)") {
    val noNs = (0 to 5000).map(i => s"d$i.cz").find(d => u.nsFor(d).isEmpty).get
    val r = p.processDomain(noNs, "2026-01-01 00:00:00")
    val spans = SpanCodec.encode(r).spans
    assert(spans.exists(s => s.kind == "DNS_AUTH" && s.text == "null"))
  }

  test("binary content goes to media_ref, not text") {
    // find a domain whose fetch produces binary content
    val found = (0 to 4000).iterator.map(i => s"d$i.cz").flatMap { d =>
      u.aFor(d).headOption.map(ip => p.fetchWeb(d, ip, 443))
    }.find(_.steps.exists(_.exists(_.content_is_binary.contains(true))))
    assert(found.isDefined, "universe should generate binary bodies")
    val r = p.processDomain("nic.cz", "2026-01-01 00:00:00")
    // encode a synthetic result embedding the binary step's WebResult
    val withBin = r.copy(WEB = r.WEB.copy(WEB4_443 = Some(Seq(found.get))))
    val spans = SpanCodec.encode(withBin).spans
    val binSpans = spans.filter(s => s.kind.endsWith(".content") && s.media_ref != null)
    assert(binSpans.nonEmpty)
    assert(binSpans.forall(_.text == null))
    assert(binSpans.forall(_.media_ref.startsWith("data:application/octet-stream,")))
  }

  test("encoding is deterministic") {
    val r = p.processDomain("d42.cz", "2026-01-01 00:00:00")
    assert(SpanCodec.encode(r) == SpanCodec.encode(r))
  }
}
