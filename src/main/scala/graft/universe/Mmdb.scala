package graft.universe

import graft.model.Model.GeoIp

/** Reader for the MaxMind DB ("mmdb") binary format, from the public spec
  * (https://maxmind.github.io/MaxMind-DB/, format version 2.0) — the file
  * format behind the reference's GeoLite2/GeoIP2 databases
  * (`geoip_utils.py:27-54` opens country/isp/asn readers).
  *
  * Layout: a binary search tree over address bits (node_count nodes of two
  * record_size-bit records), a 16-byte zero separator, the data section
  * (typed, pointer-compressed values), and a metadata map after the last
  * `\xab\xcd\xefMaxMind.com` marker. A record value R means: R < node_count
  * → next tree node; R == node_count → no data; R > node_count → value at
  * data-section offset R − node_count − 16.
  *
  * The whole file is held as one byte array — mmdb files are designed for
  * memory-mapped random access and GeoLite2 country/ASN are tens of MB, so
  * on Spark the reader rides inside a broadcast to every executor, exactly
  * like the synthetic geo dimension it can replace.
  */
final class MmdbReader(bytes: Array[Byte]) extends Serializable {

  import MmdbReader._

  // ------------------------------------------------------------ metadata

  private val metaStart: Int = {
    val idx = lastIndexOfMarker(bytes)
    require(idx >= 0, "mmdb: metadata marker not found")
    idx + MetadataMarker.length
  }

  val metadata: Map[String, Any] = decodeAt(metaStart, metaStart)._1 match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case other => throw new IllegalArgumentException(s"mmdb: metadata is $other")
  }

  val nodeCount: Int = metadata("node_count") match { case n: Long => n.toInt }
  val recordSizeBits: Int = metadata("record_size") match { case n: Long => n.toInt }
  val ipVersion: Int = metadata("ip_version") match { case n: Long => n.toInt }
  require(recordSizeBits == 24 || recordSizeBits == 28 || recordSizeBits == 32,
    s"mmdb: unsupported record size $recordSizeBits")

  private val nodeBytes = recordSizeBits * 2 / 8
  private val treeSize = nodeCount * nodeBytes
  private val dataStart = treeSize + 16 // past the 16-byte zero separator

  // ------------------------------------------------------------- lookup

  /** Decoded record for `ip` (dotted v4 or v6 text), or None when the tree
    * has no data for it / the address does not parse.
    */
  def lookup(ip: String): Option[Map[String, Any]] = ipToBytes(ip).flatMap { addr =>
    var node = 0
    // a v4 address in a v6 tree lives under 96 leading zero bits
    val bits =
      if (ipVersion == 6 && addr.length == 4) new Array[Byte](12) ++ addr
      else if (ipVersion == 4 && addr.length == 16) return None
      else addr
    var i = 0
    val nBits = bits.length * 8
    while (i < nBits) {
      if (node >= nodeCount) {
        return if (node == nodeCount) None
        else Some(decodeAt(treeSize + (node - nodeCount), dataStart)._1
          .asInstanceOf[Map[String, Any]])
      }
      val bit = (bits(i >> 3) >> (7 - (i & 7))) & 1
      node = readRecord(node, bit)
      i += 1
    }
    if (node == nodeCount) None
    else if (node > nodeCount)
      Some(decodeAt(treeSize + (node - nodeCount), dataStart)._1
        .asInstanceOf[Map[String, Any]])
    else None // ran out of bits inside the tree — malformed
  }

  private def readRecord(node: Int, side: Int): Int = {
    val base = node * nodeBytes
    recordSizeBits match {
      case 24 =>
        val o = base + side * 3
        ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) & 0xff)
      case 28 =>
        if (side == 0)
          ((bytes(base + 3) & 0xf0) << 20) | ((bytes(base) & 0xff) << 16) |
            ((bytes(base + 1) & 0xff) << 8) | (bytes(base + 2) & 0xff)
        else
          ((bytes(base + 3) & 0x0f) << 24) | ((bytes(base + 4) & 0xff) << 16) |
            ((bytes(base + 5) & 0xff) << 8) | (bytes(base + 6) & 0xff)
      case _ =>
        val o = base + side * 4
        ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
          ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    }
  }

  // ------------------------------------------------- data-section decode

  /** Decode the value at absolute offset `off`. `sectionBase` anchors
    * pointer resolution (the data section for tree values, the metadata
    * start for metadata — pointers inside metadata are also
    * metadata-relative per spec).
    */
  private def decodeAt(off: Int, sectionBase: Int): (Any, Int) = {
    val ctrl = bytes(off) & 0xff
    var typ = ctrl >>> 5
    var p = off + 1
    if (typ == 0) { typ = (bytes(p) & 0xff) + 7; p += 1 } // extended type

    if (typ == TypePointer) {
      val psize = (ctrl >>> 3) & 0x3
      val vbits = ctrl & 0x7
      val (ptr, np) = psize match {
        case 0 => ((vbits << 8) | (bytes(p) & 0xff), p + 1)
        case 1 => (((vbits << 16) | ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)) + 2048, p + 2)
        case 2 => (((vbits << 24) | ((bytes(p) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) |
          (bytes(p + 2) & 0xff)) + 526336, p + 3)
        case _ => (((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
          ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff), p + 4)
      }
      val (v, _) = decodeAt(sectionBase + ptr, sectionBase)
      return (v, np)
    }

    var size = ctrl & 0x1f
    if (size == 29) { size = 29 + (bytes(p) & 0xff); p += 1 }
    else if (size == 30) {
      size = 285 + (((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)); p += 2
    } else if (size == 31) {
      size = 65821 + (((bytes(p) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) |
        (bytes(p + 2) & 0xff)); p += 3
    }

    typ match {
      case TypeUtf8 =>
        (new String(bytes, p, size, java.nio.charset.StandardCharsets.UTF_8), p + size)
      case TypeDouble =>
        (java.lang.Double.longBitsToDouble(readULong(p, 8)), p + 8)
      case TypeBytes =>
        (java.util.Arrays.copyOfRange(bytes, p, p + size), p + size)
      case TypeUint16 | TypeUint32 | TypeUint64 =>
        (readULong(p, size), p + size)
      case TypeInt32 =>
        (readULong(p, size), p + size) // int32 of size<4 zero-pads per spec
      case TypeUint128 =>
        (BigInt(1, java.util.Arrays.copyOfRange(bytes, p, p + size)), p + size)
      case TypeMap =>
        var m = Map.empty[String, Any]
        var q = p
        var i = 0
        while (i < size) {
          val (k, q1) = decodeAt(q, sectionBase)
          val (v, q2) = decodeAt(q1, sectionBase)
          m += (k.asInstanceOf[String] -> v)
          q = q2; i += 1
        }
        (m, q)
      case TypeArray =>
        var v = Vector.empty[Any]
        var q = p
        var i = 0
        while (i < size) {
          val (x, q1) = decodeAt(q, sectionBase)
          v :+= x; q = q1; i += 1
        }
        (v, q)
      case TypeBoolean => (size != 0, p) // value lives in the size bits
      case TypeFloat =>
        (java.lang.Float.intBitsToFloat(readULong(p, 4).toInt), p + 4)
      case TypeEndMarker | TypeContainer => (null, p)
      case other => throw new IllegalArgumentException(s"mmdb: type $other at $off")
    }
  }

  private def readULong(off: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (bytes(off + i) & 0xff); i += 1 }
    v
  }
}

object MmdbReader {
  private val MetadataMarker: Array[Byte] =
    Array(0xab.toByte, 0xcd.toByte, 0xef.toByte) ++ "MaxMind.com".getBytes("US-ASCII")

  // data-section type codes (spec §"Output Data Section")
  final val TypePointer = 1
  final val TypeUtf8 = 2
  final val TypeDouble = 3
  final val TypeBytes = 4
  final val TypeUint16 = 5
  final val TypeUint32 = 6
  final val TypeMap = 7
  final val TypeInt32 = 8
  final val TypeUint64 = 9
  final val TypeUint128 = 10
  final val TypeArray = 11
  final val TypeContainer = 12
  final val TypeEndMarker = 13
  final val TypeBoolean = 14
  final val TypeFloat = 15

  def open(path: String): MmdbReader =
    new MmdbReader(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  private def lastIndexOfMarker(bytes: Array[Byte]): Int = {
    // the spec says the marker may also occur in data; take the LAST
    // occurrence, scanning backward from EOF (metadata is < 128 KiB)
    val m = MetadataMarker
    var i = bytes.length - m.length
    while (i >= 0) {
      var j = 0
      while (j < m.length && bytes(i + j) == m(j)) j += 1
      if (j == m.length) return i
      i -= 1
    }
    -1
  }

  /** Textual IP → network-order bytes (4 for v4, 16 for v6); None when it
    * does not parse. No java.net.InetAddress: a literal parse must never
    * be able to touch a resolver.
    */
  def ipToBytes(s: String): Option[Array[Byte]] = {
    if (s == null || s.isEmpty) None
    else if (s.indexOf(':') < 0) {
      val parts = s.split("\\.", -1)
      if (parts.length != 4) None
      else try {
        val out = new Array[Byte](4)
        var i = 0
        while (i < 4) {
          val v = parts(i).toInt
          if (v < 0 || v > 255 || parts(i).isEmpty) return None
          out(i) = v.toByte; i += 1
        }
        Some(out)
      } catch { case _: NumberFormatException => None }
    } else {
      // v6: expand '::', allow a trailing v4-dotted tail
      try {
        val (head, tail) = s.indexOf("::") match {
          case -1 => (s, null)
          case i => (s.substring(0, i), s.substring(i + 2))
        }
        def groups(part: String): Vector[Int] =
          if (part == null || part.isEmpty) Vector.empty
          else part.split(":", -1).toVector.flatMap { g =>
            if (g.contains('.')) { // embedded v4 tail
              val b = ipToBytes(g).getOrElse(return null)
              Vector(((b(0) & 0xff) << 8) | (b(1) & 0xff),
                ((b(2) & 0xff) << 8) | (b(3) & 0xff))
            } else Vector(Integer.parseInt(g, 16))
          }
        val h = groups(head); val t = groups(tail)
        if (h == null || t == null) return None
        val total = h.length + t.length
        val gs =
          if (tail == null) { if (total != 8) return None; h }
          else { if (total > 8) return None; h ++ Vector.fill(8 - total)(0) ++ t }
        if (gs.length != 8 || gs.exists(g => g < 0 || g > 0xffff)) None
        else {
          val out = new Array[Byte](16)
          var i = 0
          while (i < 8) {
            out(i * 2) = (gs(i) >> 8).toByte
            out(i * 2 + 1) = (gs(i) & 0xff).toByte
            i += 1
          }
          Some(out)
        }
      } catch { case _: NumberFormatException => None }
    }
  }
}

/** GeoIP annotation from real mmdb files, with the reference's database
  * precedence (`geoip_utils.py:27-54`): `country` for the country code;
  * `isp` for org/asn when configured, else `asn`; a configured-but-missing
  * file disables that database with a warning rather than failing. Wraps
  * any [[graft.probes.ProbeService]] (normally the synthetic [[Universe]]),
  * overriding only the `geo` leaf — every other probe is untouched, so the
  * broadcast-join shape proven by q03 carries over unchanged.
  */
class GeoMmdbService(
    inner: graft.probes.ProbeService,
    countryPath: Option[String],
    ispPath: Option[String],
    asnPath: Option[String]) extends graft.probes.ForwardingProbeService(inner) {

  private def openOrWarn(p: Option[String], label: String): Option[MmdbReader] =
    p.flatMap { path =>
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
        Some(MmdbReader.open(path))
      else {
        System.err.println(s"GeoIP $label DB cannot be found in '$path'. Disabling.")
        None
      }
    }

  private val country = openOrWarn(countryPath, "Country")
  private val isp = openOrWarn(ispPath, "ISP")
  // asn only opens when no isp db is configured (geoip_utils.py:47)
  private val asn = if (ispPath.isDefined) None else openOrWarn(asnPath, "ASN")

  override def geo(ip: String): GeoIp = {
    if (country.isEmpty && isp.isEmpty && asn.isEmpty) inner.geo(ip)
    else {
      val c = country.flatMap(_.lookup(ip)).flatMap { m =>
        m.get("country") match {
          case Some(cm: Map[_, _]) =>
            cm.asInstanceOf[Map[String, Any]].get("iso_code").map(_.toString)
          case _ => None
        }
      }
      val orgAsn = isp.orElse(asn).flatMap(_.lookup(ip)).map { m =>
        (m.get("autonomous_system_organization").map(_.toString),
          m.get("autonomous_system_number").collect { case n: Long => n.toInt })
      }
      GeoIp(c, orgAsn.flatMap(_._1), orgAsn.flatMap(_._2))
    }
  }
}
