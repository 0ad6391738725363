package graft.canon

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** IP validity / is-global predicate (reference `ip_utils.py:24-41`:
  * Python `ipaddress ... .is_global`) — gates GeoIP lookups and web
  * fetches (reference CHANGELOG.md:160-164). Unparseable → false.
  *
  * Matches Python's `is_global` on the ranges the crawler meets:
  * excluded v4: 0/8, 10/8, 100.64/10, 127/8, 169.254/16, 172.16/12,
  * 192.0.0/24, 192.0.2/24, 192.168/16, 198.18/15, 198.51.100/24,
  * 203.0.113/24, 240/4, 255.255.255.255 (multicast 224/4 IS global in
  * Python except 233.252.0.0/24-adjacent doc ranges; the crawler never
  * probes multicast, we treat 224/4 as non-global like `is_global` does
  * for link-local scopes). Excluded v6: ::/128, ::1, fc00::/7, fe80::/10,
  * 2001:db8::/32, ::ffff/96 mapped.
  */
object IpPredicates {

  def isGlobalIp(s: String): Boolean = {
    if (s == null || s.isEmpty) return false
    if (s.indexOf(':') >= 0) isGlobal6(s) else isGlobal4(s)
  }

  private def isGlobal4(s: String): Boolean = {
    // allocation-free octet parse (this predicate runs per address record
    // per domain on the crawl's hot path; String.split cost ~200 B/call)
    var a = -1; var b = -1; var c = -1; var d = -1
    var cur = 0; var digits = 0; var dots = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '.') {
        if (digits == 0 || cur > 255) return false
        dots match {
          case 0 => a = cur
          case 1 => b = cur
          case 2 => c = cur
          case _ => return false
        }
        dots += 1; cur = 0; digits = 0
      } else if (ch >= '0' && ch <= '9') {
        digits += 1
        if (digits > 3) return false
        cur = cur * 10 + (ch - '0')
      } else return false
      i += 1
    }
    if (dots != 3 || digits == 0 || cur > 255) return false
    d = cur
    !(a == 0 || a == 10 || a == 127 ||
      (a == 100 && b >= 64 && b <= 127) ||
      (a == 169 && b == 254) ||
      (a == 172 && b >= 16 && b <= 31) ||
      (a == 192 && b == 0 && (c == 0 || c == 2)) ||
      (a == 192 && b == 168) ||
      (a == 198 && (b == 18 || b == 19)) ||
      (a == 198 && b == 51 && c == 100) ||
      (a == 203 && b == 0 && c == 113) ||
      a >= 224)
  }

  private def isGlobal6(s: String): Boolean = {
    // allocation-free: char-scan with inline lowercasing (no toLowerCase /
    // split churn on the per-record hot path)
    @inline def lc(i: Int): Char = {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
    }
    val len = s.length
    if (len == 0) return false
    if (len == 2 && s.charAt(0) == ':' && s.charAt(1) == ':') return false // ::
    if (len == 3 && s.charAt(0) == ':' && s.charAt(1) == ':' && s.charAt(2) == '1')
      return false // ::1
    // ::ffff: mapped prefix
    if (len >= 7 && s.charAt(0) == ':' && s.charAt(1) == ':' &&
      lc(2) == 'f' && lc(3) == 'f' && lc(4) == 'f' && lc(5) == 'f' && s.charAt(6) == ':')
      return false
    // head group = chars before the first ':'
    var headEnd = 0
    while (headEnd < len && s.charAt(headEnd) != ':') headEnd += 1
    if (headEnd == 0) return false // leading ':' but not '::…' forms above
    @inline def headIs(p: String): Boolean = {
      if (headEnd < p.length) false
      else { var i = 0; while (i < p.length) { if (lc(i) != p.charAt(i)) return false; i += 1 }; true }
    }
    if (headIs("fc") || headIs("fd")) return false // fc00::/7
    if (headIs("fe8") || headIs("fe9") || headIs("fea") || headIs("feb")) return false // fe80::/10
    if (headIs("ff")) return false // multicast
    if (headEnd == 4 && headIs("2001")) {
      // second group db8 → documentation range
      val s2 = headEnd + 1
      if (s2 + 3 <= len && lc(s2) == 'd' && lc(s2 + 1) == 'b' && lc(s2 + 2) == '8' &&
        (s2 + 3 == len || s.charAt(s2 + 3) == ':')) return false
    }
    // structural sanity: hex groups ≤ 4 chars, at most one '::'
    var i = 0; var groupLen = 0; var doubles = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c == ':') {
        if (i + 1 < len && s.charAt(i + 1) == ':') { doubles += 1; i += 1 }
        if (doubles > 1) return false
        groupLen = 0
      } else {
        val l = lc(i)
        if (!(l >= '0' && l <= '9') && !(l >= 'a' && l <= 'f')) return false
        groupLen += 1
        if (groupLen > 4) return false
      }
      i += 1
    }
    true
  }

  def isGlobalIpUtf8(s: UTF8String): Boolean = isGlobalIp(s.toString)

  def isGlobalIpCol(c: Column): Column =
    GraftSqlBridge.toCol(IsGlobalIp(GraftSqlBridge.toExpr(c)))
}

/** Codegen'd `is_global_ip(string) → boolean` predicate. */
case class IsGlobalIp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "is_global_ip"

  override protected def nullSafeEval(input: Any): Any =
    IpPredicates.isGlobalIpUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.canon.IpPredicates.isGlobalIpUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
