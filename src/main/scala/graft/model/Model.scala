package graft.model

/** Typed result-document tree — the engine's `Dataset[DomainResult]` row.
  *
  * Mirrors the reference crawler's per-domain JSON result contract
  * (reference `result-schema.json:499-819`, assembled in
  * `crawl.py:165-182`): top level `{domain, timestamp, results:{DNS_LOCAL,
  * DNS_AUTH, MAIL, WEB, HSTS}}`. Encoded with `Encoders.product`, so the
  * whole tree is a Catalyst struct and Tungsten-serialized between stages
  * (the reference pickles dicts through Redis; we get this for free).
  *
  * Null semantics are load-bearing (reference distinguishes null vs empty
  * in `dns_utils.py:156-157,181-182,201-202`, `crawl.py:77-78,101-104`):
  * `None` = probe answered "nothing" (NXDOMAIN / no records); empty Seq is
  * never emitted for record arrays — empty parses collapse to None.
  */
object Model {

  /** GeoIP annotation (reference `geoip_utils.py:57-79`,
    * `result-schema.json:207-221`).
    */
  case class GeoIp(country: Option[String], org: Option[String], asn: Option[Int])

  /** Generic DNS record (reference `result-schema.json:8-19`; cname fields
    * `dns_utils.py:293-302`; algorithm `dns_utils.py:130-141`).
    */
  case class DnsRecord(
      value: String,
      cname: Option[String] = None,
      from_cname: Option[String] = None,
      algorithm: Option[String] = None,
      geoip: Option[GeoIp] = None,
      ttl: Option[Int] = None)

  /** Parsed TLSA rdata (reference `dns_utils.py:186-203`). */
  case class Tlsa(usage: Int, selector: Int, matchingtype: Int, data: String)

  /** A resolved SPF reference (checkdmarc's redirect object, emitted as
    * `redirect: object` per `result-schema.json:91-93`): the target
    * domain, the SPF record found at it (None when the target has none),
    * and the recursively-resolved parse pre-rendered as compact JSON by
    * [[graft.parsers.Parsers.renderSpfNested]] — the model tree can't be
    * recursive under Spark encoders, so nesting rides a rendered string
    * the JSON emitter splices raw.
    */
  case class SpfRef(
      domain: String,
      record: Option[String],
      parsed: Option[String])

  /** Parsed SPF (reference `dns_utils.py:161-183`): mechanism buckets +
    * derived pass-ip lists + modifiers; `error` when the parse fails.
    * `redirect` keeps the raw modifier target; `redirect_resolved` is the
    * checkdmarc-style DNS-resolved view ([[graft.probes.Probes]] fills it
    * through the probe-service seam; pure `Parsers.parseSpf` leaves None).
    */
  case class SpfParsed(
      record: String,
      pass: Option[Seq[String]],
      fail: Option[Seq[String]],
      softfail: Option[Seq[String]],
      neutral: Option[Seq[String]],
      include: Option[Seq[String]],
      ip4: Option[Seq[String]],
      ip6: Option[Seq[String]],
      all: Option[String],
      redirect: Option[String],
      exp: Option[String],
      error: Option[String],
      redirect_resolved: Option[SpfRef] = None)

  /** Parsed DMARC tag map (reference `dns_utils.py:144-158`,
    * `result-schema.json:101-143`). Fields hold the RAW tag values as they
    * appeared (None = absent); the checkdmarc per-tag object view — typed
    * values, filled defaults, explicit flags — is computed by
    * [[graft.parsers.Parsers.dmarcTags]] so the stored row schema stays
    * flat while consumers and the JSON emitter get full tag metadata.
    */
  case class DmarcParsed(
      record: String,
      v: Option[String], p: Option[String], sp: Option[String],
      adkim: Option[String], aspf: Option[String], pct: Option[String],
      fo: Option[String], ri: Option[String], rua: Option[String],
      ruf: Option[String], rf: Option[String], error: Option[String])

  /** One checkdmarc report URI (`rua`/`ruf` values,
    * `result-example.json`: `{scheme, address, size_limit}`).
    */
  case class DmarcUri(scheme: String, address: String, size_limit: Option[String])

  /** One checkdmarc tag object: `{value, explicit}` where value is
    * string | int | string list | URI list depending on the tag (typed
    * sibling fields per SURVEY §1.4) and `explicit` records whether the
    * tag appeared in the record or was filled from the RFC 7489 default.
    */
  case class DmarcTag(
      strValue: Option[String] = None,
      intValue: Option[Long] = None,
      listValue: Option[Seq[String]] = None,
      uriValue: Option[Seq[DmarcUri]] = None,
      explicit: Boolean)

  /** DNSSEC verdict (reference `dns_utils.py:73-127`,
    * `result-schema.json:671-695`): valid true/false/null + one of
    * rrsig/message/error.
    */
  case class Dnssec(
      valid: Option[Boolean],
      rrsig: Option[Seq[String]],
      message: Option[String],
      error: Option[String])

  /** CHAOS-class TXT probe result (reference `dns_utils.py:218-232`). */
  case class ChaosTxt(value: Option[Seq[String]], error: Option[String])

  /** One config-driven CHAOS record result: `key` is the queried record
    * name with dots stripped (reference `dns_utils.py:249-250`:
    * `result[record.replace(".", "")] = get_chaostxt(...)`), kept as an
    * ordered Seq so output follows the configured `auth_chaos_txt` order.
    */
  case class ChaosEntry(key: String, txt: ChaosTxt)

  /** Per-nameserver-IP info (reference `dns_utils.py:235-253`,
    * `result-schema.json:171-201`). Cached per IP across domains. The
    * chaos entries are config-driven (`auth_chaos_txt`, `config.yml:12-14`)
    * — hostname.bind/version.bind by default, `fortune` or any other
    * record representable.
    */
  case class NsIp(
      ip: String,
      geoip: Option[GeoIp],
      chaos: Seq[ChaosEntry])

  /** One authoritative NS entry (reference `crawl.py:80-105`): the ipv4/
    * ipv6 keys are OMITTED when no probe results exist for that family
    * (`crawl.py:100-104` — `if len(...) > 0`), hence Option.
    */
  case class NsAuth(ns: String, ipv4: Option[Seq[NsIp]], ipv6: Option[Seq[NsIp]])

  /** SMTP banner per port (reference `mail_utils.py:28-45`). */
  case class MailBanner(banner: Option[String], error: Option[String])

  /** Per-mailhost-IP banners (reference `mail_utils.py:60-92`): ports are
    * genuine map keys in the reference JSON.
    */
  case class MailIpBanners(ip: String, banners: Map[Int, MailBanner], geoip: Option[GeoIp])

  /** One MX host result (reference `mail_utils.py:48-107`). `tlsa` maps
    * port → parsed TLSA records (None = no TLSA at that port). `banners`
    * is None when `mail.get_banners` is off (key absent in reference
    * output, `mail_utils.py:61`) or when no IPs answered
    * (`mail_utils.py:86-87` collapses the empty list to null).
    */
  case class MailHost(host: String, tlsa: Map[Int, Option[Seq[Tlsa]]],
      banners: Option[Seq[MailIpBanners]])

  /** Parsed strict-transport-security header (reference `web_utils.py:75-86`). */
  case class HstsHeader(
      max_age: Option[Long], includeSubdomains: Option[Boolean],
      preload: Option[Boolean], raw: String)

  /** Cookie struct from set-cookie headers (reference `web_utils.py:243-252`):
    * standard attrs + pass-through of nonstandard ones.
    */
  case class Cookie(
      name: String, value: String, domain: Option[String],
      path: Option[String], secure: Option[Boolean],
      httponly: Option[Boolean], expires: Option[String],
      nonstandard_attrs: Map[String, String])

  /** X.509 certificate projection (reference `certificate.py:73-102`):
    * dates, expiry, RDN maps, serial as %016x hex, cert+SPKI fingerprints,
    * signature algorithm, SANs. Null fields dropped at the JSON sink
    * (reference `utils.py:20-21`).
    */
  case class CertFingerprint(sha256: String, sha512: String)
  case class Certificate(
      not_before: String,
      not_after: String,
      expired: Boolean,
      expired_for: Option[Int],
      validity_period: Int,
      subject: Map[String, String],
      issuer: Map[String, String],
      version: Int,
      serial: String,
      fingerprint_cert: CertFingerprint,
      fingerprint_pubkey: CertFingerprint,
      algorithm: String,
      alt_names: Seq[String])

  /** One hop of an HTTP(S) fetch (reference `web_utils.py:225-320`).
    * The heterogeneous headers are split per SURVEY §1.4: raw pairs +
    * typed sibling columns for the parsed headers. `headers` is an
    * arrival-ordered (name, value) seq, not a map — names are unique
    * (requests merges duplicates), the reference's JSON preserves network
    * arrival order, a map would round-trip through Spark rows in hash
    * order, and at ~45 steps/domain the per-step HashMap build was a
    * measurable slice of the crawl's allocation ceiling. Use
    * [[WebStep.header]] for lookups.
    */
  case class WebStep(
      url: String,
      status: Option[Int],
      is_redirect: Option[Boolean],
      headers: Seq[(String, String)],
      hsts_header: Option[HstsHeader],
      alt_svc: Option[Map[String, String]],
      cookies: Option[Seq[Cookie]],
      content_length: Option[Long],
      ip: Option[String],
      tls_version: Option[String],
      tls_cipher: Option[String],
      cert: Option[Seq[Certificate]],
      content: Option[String],
      content_is_binary: Option[Boolean],
      detected_encoding: Option[String],
      error: Option[String]) {
    /** Case-exact header lookup — a linear scan over ≤ a handful of pairs,
      * allocation-free where a map view would cost a build per step.
      */
    def header(name: String): Option[String] = {
      var i = 0
      while (i < headers.length) {
        if (headers(i)._1 == name) return Some(headers(i)._2)
        i += 1
      }
      None
    }
  }

  /** Fetch result for one (domain-variant, ip) pair
    * (reference `web_utils.py:322-334`): full chain when
    * save_intermediate_steps, else only the final step.
    */
  case class WebResult(
      ip: String,
      redirect_count: Int,
      steps: Option[Seq[WebStep]],
      final_step: Option[WebStep])

  /** The 8 fixed web probe combos (reference `crawl.py:109-133`). */
  case class WebObj(
      WEB4_80: Option[Seq[WebResult]], WEB4_443: Option[Seq[WebResult]],
      WEB6_80: Option[Seq[WebResult]], WEB6_443: Option[Seq[WebResult]],
      WEB4_80_www: Option[Seq[WebResult]], WEB4_443_www: Option[Seq[WebResult]],
      WEB6_80_www: Option[Seq[WebResult]], WEB6_443_www: Option[Seq[WebResult]])

  /** DNS_LOCAL section (reference `crawl.py:39-69`,
    * `result-schema.json:513-710`).
    */
  case class DnsLocal(
      NS_AUTH: Option[Seq[DnsRecord]],
      MAIL: Option[Seq[DnsRecord]],
      WEB4: Option[Seq[DnsRecord]],
      WEB6: Option[Seq[DnsRecord]],
      WEB4_www: Option[Seq[DnsRecord]],
      WEB6_www: Option[Seq[DnsRecord]],
      WEB_TLSA: Option[Seq[Tlsa]],
      WEB_TLSA_www: Option[Seq[Tlsa]],
      TXT: Option[Seq[DnsRecord]],
      /** One parse per spf-matching TXT record (reference `parse_spf`
        * returns a LIST, `dns_utils.py:166-183`); None = no spf records.
        */
      TXT_SPF: Option[Seq[SpfParsed]],
      /** One parse per TXT record at `_dmarc.<domain>`, including
        * per-record error entries (`dns_utils.py:144-158`).
        */
      TXT_DMARC: Option[Seq[DmarcParsed]],
      /** TXT records at `_openid.<domain>` (reference `crawl.py:57`). */
      TXT_openid: Option[Seq[DnsRecord]],
      DS: Option[Seq[DnsRecord]],
      DNSKEY: Option[Seq[DnsRecord]],
      DNSSEC: Dnssec,
      /** Config-driven additional RR types (reference `crawl.py:61-68`,
        * U1 plugin registry): rrtype → raw record values.
        */
      additional: Option[Map[String, Seq[String]]] = None)

  /** Per-path full web probe (reference `crawl.py:158-163`: WEB_paths runs
    * the COMPLETE get_web_status — all 8 combos — for each configured
    * path). Seq keeps the configured path order.
    */
  case class PathWeb(path: String, web: WebObj)

  /** Top-level per-domain result (reference `crawl.py:165-182`); WEB_paths
    * present when `web.paths` configured (reference `crawl.py:158-163`);
    * worker_hostname when `save_worker_hostname` (`crawl.py:180-181`).
    */
  case class DomainResult(
      domain: String,
      timestamp: String,
      DNS_LOCAL: DnsLocal,
      DNS_AUTH: Option[Seq[NsAuth]],
      MAIL: Option[Seq[MailHost]],
      WEB: WebObj,
      WEB_paths: Option[Seq[PathWeb]],
      HSTS: Boolean,
      worker_hostname: Option[String] = None)

  // ------------------------------------------------------------ frontier

  /** Frontier admission row: canonical domain + seen-set key + scheduling
    * attributes (north rule: nameserver bucket, TTL-derived priority,
    * stable seq for deterministic ordering).
    */
  case class FrontierEntry(
      domain: String,
      canonical: String,
      key: Long,
      nsBucket: Int,
      priority: Int,
      seq: Long,
      /** Discovery depth: 0 = seed-list entry; d+1 = host discovered while
        * crawling a depth-d entry (redirect target / MX / NS / in-content
        * link). Bounds frontier growth under [[graft.engine.Engine]]'s
        * discovery mode — the synthetic universe (like the real web)
        * contains infinite host chains (mail0.mail0.…), so an un-depth-
        * capped discovering crawler never terminates.
        */
      depth: Int = 0)

  /** Interleaved-docs input row (`BASELINE.json.input_hint`). */
  case class Span(kind: String, text: String, media_ref: String, offset: Int)
  case class Doc(doc_id: String, spans: Seq[Span])

  /** Checkpoint lineage row (north rule): one per frontier partition. */
  case class PartitionLineage(
      partition_id: Int,
      offset_watermark: Long,
      seen_filter_snapshot_ref: String,
      fetch_counters: Map[String, Long])
}
