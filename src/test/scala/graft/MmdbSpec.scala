package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.probes.{CrawlConfig, Probes}
import graft.universe.{GeoMmdbService, MmdbReader, Universe}

/** S3 — real `.mmdb` GeoIP loading. The fixture databases are hand-built
  * from the public MaxMind DB spec by the writer below (24-bit records,
  * IPv4 tree), so the reader is exercised against independently-encoded
  * bytes, and [[GeoMmdbService]] is tested end-to-end through the probe
  * pipeline with the reference's country/isp>asn precedence
  * (`geoip_utils.py:27-54`).
  */
class MmdbSpec extends AnyFunSuite {

  // ---------------------------------------------------- fixture writer

  /** Minimal mmdb writer (spec-conformant; test-only): IPv4 tree with
    * 24-bit records. Networks must be disjoint.
    */
  private object Writer {
    sealed trait Child
    case object Empty extends Child
    final class Node extends Child { var l: Child = Empty; var r: Child = Empty }
    case class Leaf(dataOff: Int) extends Child

    // ----- data-section encoders (type codes from the spec)
    def str(s: String): Array[Byte] = {
      val b = s.getBytes("UTF-8")
      require(b.length < 285)
      if (b.length < 29) Array((2 << 5 | b.length).toByte) ++ b
      else Array((2 << 5 | 29).toByte, (b.length - 29).toByte) ++ b
    }
    def uint32(v: Long): Array[Byte] = {
      val payload = BigInt(v).toByteArray.dropWhile(_ == 0)
      Array((6 << 5 | payload.length).toByte) ++ payload
    }
    def uint16(v: Int): Array[Byte] = {
      val payload = BigInt(v).toByteArray.dropWhile(_ == 0)
      Array((5 << 5 | payload.length).toByte) ++ payload
    }
    def uint64(v: Long): Array[Byte] = {
      val payload = BigInt(v).toByteArray.dropWhile(_ == 0)
      Array((0 << 5 | payload.length).toByte, (9 - 7).toByte) ++ payload
    }
    def map(entries: (String, Array[Byte])*): Array[Byte] = {
      require(entries.length < 29)
      entries.foldLeft(Array((7 << 5 | entries.length).toByte)) {
        case (acc, (k, v)) => acc ++ str(k) ++ v
      }
    }
    def array(items: Array[Byte]*): Array[Byte] = {
      // extended type 11: ctrl(type 0, size) + type byte (11-7)
      items.foldLeft(Array((0 << 5 | items.length).toByte, (11 - 7).toByte)) {
        _ ++ _
      }
    }

    /** Build a complete mmdb file: networks = (dottedIp, prefixLen) →
      * encoded record bytes.
      */
    def build(networks: Seq[((String, Int), Array[Byte])], dbType: String): Array[Byte] = {
      // data section: concatenate records, remember offsets (+16 separator
      // handled by record addressing, not here)
      val data = new ByteArrayOutputStream()
      val withOffsets = networks.map { case (net, rec) =>
        val off = data.size(); data.write(rec); (net, off)
      }
      // binary trie
      val root = new Node
      for (((ip, plen), off) <- withOffsets) {
        val addr = MmdbReader.ipToBytes(ip).get
        var cur = root
        var i = 0
        while (i < plen - 1) {
          val bit = (addr(i >> 3) >> (7 - (i & 7))) & 1
          val next = (if (bit == 0) cur.l else cur.r) match {
            case n: Node => n
            case Empty => val n = new Node; if (bit == 0) cur.l = n else cur.r = n; n
            case _: Leaf => fail(s"overlapping networks at $ip/$plen")
          }
          cur = next
          i += 1
        }
        val lastBit = (addr((plen - 1) >> 3) >> (7 - ((plen - 1) & 7))) & 1
        if (lastBit == 0) cur.l = Leaf(off) else cur.r = Leaf(off)
      }
      // number nodes (preorder)
      val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
      def collect(n: Node): Unit = {
        nodes += n
        n.l match { case c: Node => collect(c); case _ => }
        n.r match { case c: Node => collect(c); case _ => }
      }
      collect(root)
      val idx = nodes.zipWithIndex.toMap
      val nodeCount = nodes.length
      def recOf(c: Child): Int = c match {
        case Empty => nodeCount
        case n: Node => idx(n)
        case Leaf(off) => nodeCount + 16 + off
      }
      val tree = new ByteArrayOutputStream()
      for (n <- nodes; r <- Seq(recOf(n.l), recOf(n.r))) {
        tree.write((r >> 16) & 0xff); tree.write((r >> 8) & 0xff); tree.write(r & 0xff)
      }
      val out = new ByteArrayOutputStream()
      out.write(tree.toByteArray)
      out.write(new Array[Byte](16)) // separator
      out.write(data.toByteArray)
      out.write(Array(0xab.toByte, 0xcd.toByte, 0xef.toByte))
      out.write("MaxMind.com".getBytes("US-ASCII"))
      out.write(map(
        "binary_format_major_version" -> uint16(2),
        "binary_format_minor_version" -> uint16(0),
        "build_epoch" -> uint64(1700000000L),
        "database_type" -> str(dbType),
        "description" -> map("en" -> str("graft test fixture")),
        "ip_version" -> uint16(4),
        "languages" -> array(str("en")),
        "node_count" -> uint32(nodeCount.toLong),
        "record_size" -> uint16(24)))
      out.toByteArray
    }
  }

  private def countryRec(iso: String) =
    Writer.map("country" -> Writer.map("iso_code" -> Writer.str(iso)))
  private def asnRec(asn: Long, org: String) = Writer.map(
    "autonomous_system_number" -> Writer.uint32(asn),
    "autonomous_system_organization" -> Writer.str(org))

  private def writeTemp(bytes: Array[Byte]): String = {
    val f = java.nio.file.Files.createTempFile("graft", ".mmdb")
    java.nio.file.Files.write(f, bytes)
    f.toString
  }

  // --------------------------------------------------------- reader

  test("reader: metadata, exact /32 and covering /24 lookups, miss → None") {
    val db = Writer.build(Seq(
      ("217.31.205.50", 32) -> countryRec("CZ"),
      ("77.75.0.0", 16) -> countryRec("SK"),
      ("8.8.8.0", 24) -> countryRec("US")), "GeoLite2-Country")
    val r = new MmdbReader(db)
    assert(r.nodeCount > 0 && r.recordSizeBits == 24 && r.ipVersion == 4)
    assert(r.metadata("database_type") == "GeoLite2-Country")
    def iso(ip: String) = r.lookup(ip).map(_("country")
      .asInstanceOf[Map[String, Any]]("iso_code"))
    assert(iso("217.31.205.50").contains("CZ"))
    assert(iso("217.31.205.51").isEmpty)    // /32 next door: no data
    assert(iso("77.75.123.45").contains("SK")) // inside the /16
    assert(iso("8.8.8.8").contains("US"))
    assert(iso("9.9.9.9").isEmpty)
    assert(r.lookup("not-an-ip").isEmpty)
  }

  test("reader: ASN database record types (uint32 + string)") {
    val db = Writer.build(Seq(
      ("217.31.205.0", 24) -> asnRec(25192L, "CZ.NIC, z.s.p.o.")),
      "GeoLite2-ASN")
    val r = new MmdbReader(db)
    val m = r.lookup("217.31.205.50").get
    assert(m("autonomous_system_number") == 25192L)
    assert(m("autonomous_system_organization") == "CZ.NIC, z.s.p.o.")
  }

  test("ipToBytes parses v4/v6 and rejects junk without touching a resolver") {
    assert(MmdbReader.ipToBytes("1.2.3.4").get.toSeq == Seq[Byte](1, 2, 3, 4))
    assert(MmdbReader.ipToBytes("2001:148f:ffff::1").get.length == 16)
    assert(MmdbReader.ipToBytes("::1").get.toSeq.count(_ != 0) == 1)
    assert(MmdbReader.ipToBytes("::ffff:1.2.3.4").get.takeRight(4).toSeq ==
      Seq[Byte](1, 2, 3, 4))
    for (bad <- Seq("", "1.2.3", "1.2.3.256", "abcd", "1:2:3:4:5:6:7:8:9", "x::y"))
      assert(MmdbReader.ipToBytes(bad).isEmpty, bad)
  }

  // ----------------------------------------------- service + precedence

  private val u = new Universe(7L)

  test("GeoMmdbService annotates A records end-to-end through the probes") {
    // plant /32 networks for the universe's actual nic.cz A records
    val ips = u.aFor("nic.cz")
    assert(ips.nonEmpty)
    val cdb = writeTemp(Writer.build(
      ips.map(ip => (ip, 32) -> countryRec("CZ")), "GeoLite2-Country"))
    val adb = writeTemp(Writer.build(
      ips.map(ip => (ip, 32) -> asnRec(64500L, "Fixture ISP")), "GeoLite2-ASN"))
    val svc = new GeoMmdbService(u, Some(cdb), None, Some(adb))
    val p = new Probes(svc, CrawlConfig())
    val web4 = p.getDnsLocal("nic.cz").WEB4.get
    assert(web4.nonEmpty)
    for (rec <- web4; g <- rec.geoip) {
      assert(g.country.contains("CZ"))
      assert(g.org.contains("Fixture ISP"))
      assert(g.asn.contains(64500))
    }
    assert(web4.forall(_.geoip.isDefined))
  }

  test("precedence: isp db beats asn db (geoip_utils.py:47)") {
    val ip = "198.41.0.4"
    val ispDb = writeTemp(Writer.build(Seq((ip, 32) -> asnRec(1L, "ISP Org")), "GeoIP2-ISP"))
    val asnDb = writeTemp(Writer.build(Seq((ip, 32) -> asnRec(2L, "ASN Org")), "GeoLite2-ASN"))
    val svc = new GeoMmdbService(u, None, Some(ispDb), Some(asnDb))
    val g = svc.geo(ip)
    assert(g.org.contains("ISP Org") && g.asn.contains(1))
  }

  test("missing db path disables that db; all missing → synthetic dim") {
    val ip = "198.41.0.4"
    val asnDb = writeTemp(Writer.build(Seq((ip, 32) -> asnRec(3L, "Only ASN")), "GeoLite2-ASN"))
    val partial = new GeoMmdbService(u, Some("/nonexistent/country.mmdb"), None, Some(asnDb))
    val g = partial.geo(ip)
    assert(g.country.isEmpty && g.org.contains("Only ASN") && g.asn.contains(3))
    val none = new GeoMmdbService(u, Some("/nope1"), None, Some("/nope2"))
    assert(none.geo(ip) == u.geo(ip)) // falls back to the synthetic dimension
  }
}
