package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.parsers.Parsers

/** Property tests over the reference's record/header grammars (SURVEY §5):
  * generators produce well-formed AND malformed inputs for each parser
  * family; invariants are never-throw, the A5 empty→null collapse rules,
  * and parse round-trips on well-formed inputs. Complements the
  * example-based golden cases in ParsersSpec/ContractSpec.
  */
class ParserPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  // ----------------------------------------------------------- generators

  private val genToken: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(20))

  private val genDomain: Gen[String] = for {
    a <- genToken; b <- Gen.oneOf("cz", "com", "net", "example")
  } yield s"$a.$b".toLowerCase

  private val genIp4Cidr: Gen[String] = for {
    a <- Gen.choose(1, 223); b <- Gen.choose(0, 255); c <- Gen.choose(0, 255)
    d <- Gen.choose(0, 255); m <- Gen.option(Gen.choose(8, 32))
  } yield s"$a.$b.$c.$d" + m.fold("")(x => s"/$x")

  private val genQualifier: Gen[String] = Gen.oneOf("", "+", "-", "~", "?")

  private val genSpfTerm: Gen[String] = Gen.oneOf(
    for { q <- genQualifier; ip <- genIp4Cidr } yield s"${q}ip4:$ip",
    for { q <- genQualifier; d <- genDomain } yield s"${q}include:$d",
    for { q <- genQualifier } yield s"${q}mx",
    for { q <- genQualifier } yield s"${q}a",
    for { q <- genQualifier } yield s"${q}all",
    genDomain.map(d => s"redirect=$d"),
    genDomain.map(d => s"exp=$d"))

  private val genSpfRecord: Gen[String] =
    Gen.listOf(genSpfTerm).map(ts => ("v=spf1" +: ts).mkString(" "))

  // arbitrary garbage, incl. control chars and unicode
  private val genJunk: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', ';', '=', ':', '"',
      '\t', '\u0001', 'ž', '€'), Gen.choose('\u007f', '￿')))
      .map(_.mkString.take(200))

  // ----------------------------------------------------------------- SPF

  test("property: parseSpf never throws, on well-formed or junk input") {
    check(Prop.forAll(Gen.oneOf(genSpfRecord, genJunk)) { s =>
      Parsers.parseSpf(s) != null
    })
  }

  test("property: parseSpf round-trip — every generated term lands in exactly one bucket or modifier") {
    check(Prop.forAll(Gen.listOf(genSpfTerm)) { terms =>
      val s = Parsers.parseSpf(("v=spf1" +: terms).mkString(" "))
      def isModifier(t: String): Boolean = {
        val b = t.dropWhile("+-~?".contains(_)).toLowerCase
        b == "all" || b.startsWith("redirect=") || b.startsWith("exp=")
      }
      val bucketed = Seq(s.pass, s.fail, s.softfail, s.neutral, s.include)
        .map(_.map(_.size).getOrElse(0)).sum
      val modifiers = Seq(s.all, s.redirect, s.exp).count(_.isDefined)
      // mechanisms land in buckets 1:1; duplicate modifiers overwrite
      s.error.isEmpty &&
        bucketed == terms.count(!isModifier(_)) &&
        modifiers <= math.min(3, terms.count(isModifier))
    })
  }

  test("property: parseSpf A5 collapse — empty buckets are None, never Some(empty)") {
    check(Prop.forAll(genSpfRecord) { rec =>
      val s = Parsers.parseSpf(rec)
      Seq(s.pass, s.fail, s.softfail, s.neutral, s.include, s.ip4, s.ip6)
        .forall(o => o.forall(_.nonEmpty))
    })
  }

  test("property: parseSpf ip4/ip6 are exactly the pass-qualified ip mechanisms (dns_utils.py:161-163)") {
    check(Prop.forAll(Gen.listOf(genSpfTerm)) { terms =>
      val s = Parsers.parseSpf(("v=spf1" +: terms).mkString(" "))
      val expected = terms.filter(t => t.startsWith("ip4:") || t.startsWith("+ip4:"))
        .map(_.stripPrefix("+").stripPrefix("ip4:"))
      s.ip4.getOrElse(Seq.empty) == expected
    })
  }

  // ---------------------------------------------------------------- DMARC

  private val genDmarcTag: Gen[(String, String)] = Gen.oneOf(
    Gen.oneOf("none", "quarantine", "reject").map("p" -> _),
    Gen.oneOf("r", "s").map("adkim" -> _),
    Gen.choose(0, 100).map(n => "pct" -> n.toString),
    genDomain.map(d => "rua" -> s"mailto:agg@$d"),
    Gen.oneOf("0", "1", "d", "s", "0:1").map("fo" -> _),
    Gen.choose(60, 86400).map(n => "ri" -> n.toString))

  test("property: parseDmarc never throws and keeps raw tag values verbatim") {
    val genRec = Gen.listOf(genDmarcTag).map(ts =>
      ("v=DMARC1" +: ts.toMap.toList.map { case (k, v) => s"$k=$v" }).mkString("; "))
    check(Prop.forAll(genRec) { rec =>
      val d = Parsers.parseDmarc(rec)
      d.error.isEmpty && d.v.contains("DMARC1") &&
        "p=([^;]+)".r.findFirstMatchIn(rec).forall(m =>
          d.p.contains(m.group(1).trim))
    })
    check(Prop.forAll(genJunk) { s => Parsers.parseDmarc(s) != null })
  }

  test("property: dmarcTags fills RFC 7489 defaults exactly for absent tags, explicit=false") {
    val genRec = Gen.listOf(genDmarcTag).map(ts =>
      ("v=DMARC1" +: ts.toMap.toList.map { case (k, v) => s"$k=$v" }).mkString("; "))
    check(Prop.forAll(genRec) { rec =>
      val tags = Parsers.dmarcTags(Parsers.parseDmarc(rec)).toMap
      val adkimOk = tags("adkim").explicit == rec.contains("adkim=")
      val pctOk = rec.contains("pct=") ||
        (tags("pct").intValue.contains(100L) && !tags("pct").explicit)
      val riOk = rec.contains("ri=") ||
        (tags("ri").intValue.contains(86400L) && !tags("ri").explicit)
      val ruaOk = rec.contains("rua=") || !tags.contains("rua")
      adkimOk && pctOk && riOk && ruaOk
    })
  }

  // ----------------------------------------------------------------- TLSA

  test("property: parseTlsa round-trips well-formed rdata and never throws on junk") {
    val genTlsa = for {
      u <- Gen.choose(0, 3); s <- Gen.choose(0, 1); m <- Gen.choose(0, 2)
      data <- Gen.listOfN(32, Gen.hexChar).map(_.mkString.toLowerCase)
    } yield (u, s, m, data)
    check(Prop.forAll(genTlsa) { case (u, s, m, data) =>
      val parsed = Parsers.parseTlsa(s"$u $s $m $data")
      parsed.contains(graft.model.Model.Tlsa(u, s, m, data))
    })
    check(Prop.forAll(genJunk) { s => Parsers.parseTlsa(s); true })
    // fewer than 4 fields or non-int prefix → None, not a throw
    check(Prop.forAll(genToken) { t => Parsers.parseTlsa(t).isEmpty || t.split("\\s+").length >= 4 })
  }

  // ----------------------------------------------------- HSTS / alt-svc

  test("property: parseHstsHeader — first max-age wins, flags detected case-insensitively, never throws") {
    val genDirective = Gen.oneOf(
      Gen.choose(0L, 63072000L).map(n => s"max-age=$n"),
      Gen.const("includeSubDomains"), Gen.const("INCLUDESUBDOMAINS"),
      Gen.const("preload"), Gen.const("Preload"),
      genToken)
    val genHeader = Gen.nonEmptyListOf(genDirective).map(_.mkString("; "))
    check(Prop.forAll(genHeader) { h =>
      val p = Parsers.parseHstsHeader(h)
      val firstMaxAge = h.split(";").map(_.trim)
        .collectFirst { case s if s.toLowerCase.startsWith("max-age=") =>
          s.substring(8).takeWhile(_.isDigit) }
        .filter(_.nonEmpty).map(_.toLong)
      p.raw == h && p.max_age == firstMaxAge &&
        p.includeSubdomains.contains(true) == h.toLowerCase.contains("includesubdomains") &&
        p.preload.contains(true) == h.split(";").map(_.trim.toLowerCase).contains("preload")
    })
    check(Prop.forAll(genJunk) { s => Parsers.parseHstsHeader(s) != null })
  }

  test("property: parseAltSvc keeps every protocol=authority pair; junk never throws") {
    val genEntry = for {
      proto <- Gen.oneOf("h2", "h3", "h3-29", "quic")
      port <- Gen.choose(1, 65535)
      ma <- Gen.option(Gen.choose(1, 86400))
    } yield (proto, s"""$proto=":$port"""" + ma.fold("")(m => s"; ma=$m"))
    val genHeader = Gen.nonEmptyListOf(genEntry)
    check(Prop.forAll(genHeader) { entries =>
      // last duplicate proto wins in a Map — compare against the same fold
      val h = entries.map(_._2).mkString(", ")
      val m = Parsers.parseAltSvc(h)
      entries.map(_._1).toSet == m.keySet && m.values.forall(_.startsWith(":"))
    })
    check(Prop.forAll(genJunk) { s => Parsers.parseAltSvc(s) != null })
  }

  // --------------------------------------------------------------- cookie

  test("property: parseSetCookie round-trips name/value and standard attrs; junk never throws") {
    val genCookie = for {
      name <- genToken; value <- genToken
      domain <- Gen.option(genDomain)
      path <- Gen.option(Gen.const("/"))
      secure <- Gen.oneOf(true, false)
      httponly <- Gen.oneOf(true, false)
      nonstd <- Gen.option(genToken.map(t => s"x-$t"))
    } yield {
      val parts = Seq(s"$name=$value") ++
        domain.map(d => s"Domain=$d") ++ path.map(p => s"Path=$p") ++
        (if (secure) Seq("Secure") else Nil) ++
        (if (httponly) Seq("HttpOnly") else Nil) ++
        nonstd.map(k => s"$k=1")
      (name, value, domain, secure, httponly, nonstd, parts.mkString("; "))
    }
    check(Prop.forAll(genCookie) { case (name, value, domain, secure, httponly, nonstd, raw) =>
      val c = Parsers.parseSetCookie(raw).get
      c.name == name && c.value == value && c.domain == domain &&
        c.secure.contains(true) == secure && c.httponly.contains(true) == httponly &&
        nonstd.forall(k => c.nonstandard_attrs.contains(k.toLowerCase))
    })
    check(Prop.forAll(genJunk) { s => Parsers.parseSetCookie(s); true })
    // no name=value first segment → None
    assert(Parsers.parseSetCookie("; Secure").isEmpty)
  }

  // ------------------------------------------------------- content-length

  test("property: parseContentLength takes leading digits only, never throws") {
    check(Prop.forAll(Gen.oneOf(Gen.choose(0L, Long.MaxValue / 2).map(_.toString), genJunk)) { s =>
      val p = Parsers.parseContentLength(s)
      val lead = s.trim.takeWhile(_.isDigit)
      if (lead.isEmpty) p.isEmpty
      else if (lead.length <= 18) p.contains(lead.toLong)
      else p == lead.toLongOption // overflow → None, like the parser
    })
  }
}
