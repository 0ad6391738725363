package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.parsers.Parsers

class ParsersSpec extends AnyFunSuite {

  test("parseTlsa splits usage/selector/matchingtype/data (dns_utils.py:186-203)") {
    val t = Parsers.parseTlsa("3 1 1 aabbccdd").get
    assert(t.usage == 3 && t.selector == 1 && t.matchingtype == 1 && t.data == "aabbccdd")
    assert(Parsers.parseTlsa("garbage").isEmpty)
    assert(Parsers.parseTlsa("3 1 1").isEmpty)
    assert(Parsers.parseTlsa("x y z w").isEmpty)
  }

  test("parseSpf buckets mechanisms by qualifier and derives pass ips") {
    val s = Parsers.parseSpf("v=spf1 ip4:1.2.3.0/24 ip6:2001:db8::/32 include:_spf.example.com -exists:%{i} ~mx ?a all")
    assert(s.pass.get == Seq("ip4:1.2.3.0/24", "ip6:2001:db8::/32"))
    assert(s.include.get == Seq("_spf.example.com"))
    assert(s.fail.get == Seq("exists:%{i}"))
    assert(s.softfail.get == Seq("mx"))
    assert(s.neutral.get == Seq("a"))
    assert(s.ip4.get == Seq("1.2.3.0/24"))
    assert(s.ip6.get == Seq("2001:db8::/32"))
    assert(s.all.contains("pass"))
    assert(s.error.isEmpty)
  }

  test("parseSpf modifiers and error case") {
    val s = Parsers.parseSpf("v=spf1 redirect=_spf.other.cz exp=explain.other.cz -all")
    assert(s.redirect.contains("_spf.other.cz"))
    assert(s.exp.contains("explain.other.cz"))
    assert(s.all.contains("fail"))
    // empty buckets collapse to None (dns_utils.py:181-182 null semantics)
    assert(s.pass.isEmpty && s.include.isEmpty && s.ip4.isEmpty)
    assert(Parsers.parseSpf("not spf at all").error.isDefined)
  }

  test("parseDmarc extracts the tag map (dns_utils.py:144-158)") {
    val d = Parsers.parseDmarc("v=DMARC1; p=reject; sp=none; pct=100; rua=mailto:agg@nic.cz")
    assert(d.v.contains("DMARC1") && d.p.contains("reject") && d.sp.contains("none"))
    assert(d.pct.contains("100") && d.rua.contains("mailto:agg@nic.cz"))
    assert(d.error.isEmpty)
    assert(Parsers.parseDmarc("v=spf1 -all").error.isDefined)
  }

  test("dmarcTags: checkdmarc per-tag objects with defaults and explicit " +
      "flags (result-example.json golden)") {
    import graft.model.Model.{DmarcTag, DmarcUri}
    // the reference example's own nic.cz record shape
    val d = Parsers.parseDmarc("v=DMARC1; p=none; sp=none; adkim=s; pct=5; " +
      "fo=1; ri=86400; rua=mailto:dmarc.reports@nic.cz; ruf=mailto:dmarc.ruf@nic.cz")
    val tags = Parsers.dmarcTags(d).toMap
    assert(Parsers.dmarcTags(d).map(_._1) == // reference tag order
      Seq("v", "p", "sp", "adkim", "pct", "fo", "ri", "rua", "ruf", "aspf", "rf"))
    assert(tags("v") == DmarcTag(strValue = Some("DMARC1"), explicit = true))
    assert(tags("p") == DmarcTag(strValue = Some("none"), explicit = true))
    assert(tags("sp") == DmarcTag(strValue = Some("none"), explicit = true))
    assert(tags("adkim") == DmarcTag(strValue = Some("s"), explicit = true))
    assert(tags("pct") == DmarcTag(intValue = Some(5L), explicit = true))
    assert(tags("fo") == DmarcTag(listValue = Some(Seq("1")), explicit = true))
    assert(tags("ri") == DmarcTag(intValue = Some(86400L), explicit = true))
    assert(tags("rua") == DmarcTag(uriValue =
      Some(Seq(DmarcUri("mailto", "dmarc.reports@nic.cz", None))), explicit = true))
    // defaulted tags carry explicit=false, like the example's aspf/rf
    assert(tags("aspf") == DmarcTag(strValue = Some("r"), explicit = false))
    assert(tags("rf") == DmarcTag(listValue = Some(Seq("afrf")), explicit = false))
    // sp defaults to p's value when absent (RFC 7489 §6.3)
    val noSp = Parsers.parseDmarc("v=DMARC1; p=reject")
    val t2 = Parsers.dmarcTags(noSp).toMap
    assert(t2("sp") == DmarcTag(strValue = Some("reject"), explicit = false))
    assert(t2("pct") == DmarcTag(intValue = Some(100L), explicit = false))
    assert(t2("fo") == DmarcTag(listValue = Some(Seq("0")), explicit = false))
    assert(!t2.contains("rua") && !t2.contains("ruf")) // no default for these
    // size-limited URI
    val lim = Parsers.dmarcTags(
      Parsers.parseDmarc("v=DMARC1; p=none; rua=mailto:a@b.cz!10m")).toMap
    assert(lim("rua").uriValue.get ==
      Seq(DmarcUri("mailto", "a@b.cz", Some("10m"))))
    // junk record has no tag view (error entry instead)
    assert(Parsers.dmarcTags(Parsers.parseDmarc("v=spf1 -all")).isEmpty)
  }

  test("annotateAlgorithm maps IANA numbers to mnemonics at the right token") {
    // DS rdata: keytag algorithm digesttype digest → token index 1
    assert(Parsers.annotateAlgorithm("61281 13 2 deadbeef", 1).contains("ECDSAP256SHA256"))
    // DNSKEY rdata: flags protocol algorithm key → token index 2
    assert(Parsers.annotateAlgorithm("257 3 8 AwEAAc==", 2).contains("RSASHA256"))
    assert(Parsers.annotateAlgorithm("257 3 99 x", 2).contains("99")) // unknown stays numeric
    assert(Parsers.annotateAlgorithm("short", 2).isEmpty)
  }

  test("hsts header parse (web_utils.py:75-86)") {
    val h = Parsers.parseHstsHeader("max-age=31536000; includeSubDomains; preload")
    assert(h.max_age.contains(31536000L))
    assert(h.includeSubdomains.contains(true) && h.preload.contains(true))
    val h2 = Parsers.parseHstsHeader("max-age=0")
    assert(h2.max_age.contains(0L) && h2.includeSubdomains.isEmpty)
  }

  test("content-length leading digits (web_utils.py:89-97)") {
    assert(Parsers.parseContentLength("1234").contains(1234L))
    assert(Parsers.parseContentLength(" 1234 bytes").contains(1234L))
    assert(Parsers.parseContentLength("none").isEmpty)
  }

  test("binary content-type sniff (web_utils.py:107-119)") {
    assert(Parsers.isBinaryContentType("application/octet-stream"))
    assert(!Parsers.isBinaryContentType("application/json"))
    assert(!Parsers.isBinaryContentType("application/xhtml+xml"))
    assert(Parsers.isBinaryContentType("image/png"))
    assert(!Parsers.isBinaryContentType("image/svg+xml"))
    assert(Parsers.isBinaryContentType("video/mp4; codecs=avc1"))
    assert(!Parsers.isBinaryContentType("text/html; charset=utf-8"))
  }

  test("mxHost skips root and empty (mail_utils.py:95-103)") {
    assert(Parsers.mxHost("10 mail.nic.cz.").contains("mail.nic.cz"))
    assert(Parsers.mxHost("0 .").isEmpty)
  }

  test("emsg normalizes timeouts (web_utils.py:122-127)") {
    assert(Parsers.emsg(new RuntimeException("connect timed out")) == "timeout")
    assert(Parsers.emsg(new RuntimeException("boom")) == "boom")
  }
}
