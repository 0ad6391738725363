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
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return false
    val oct = new Array[Int](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return false
      oct(i) = p.toInt
      if (oct(i) > 255) return false
      i += 1
    }
    val a = oct(0); val b = oct(1); val c = oct(2)
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
    val lower = s.toLowerCase
    if (lower == "::" || lower == "::1") return false
    if (lower.startsWith("::ffff:")) return false
    val head = lower.split(":")(0)
    if (head.isEmpty) return false
    if (head.startsWith("fc") || head.startsWith("fd")) return false // fc00::/7
    if (head.startsWith("fe8") || head.startsWith("fe9") ||
      head.startsWith("fea") || head.startsWith("feb")) return false // fe80::/10
    if (head == "2001") {
      val second = lower.split(":").lift(1).getOrElse("")
      if (second == "db8") return false // documentation range
    }
    if (head.startsWith("ff")) return false // multicast
    // minimal structural sanity: hex groups only
    lower.split("::", -1).forall(_.split(":").forall(g =>
      g.isEmpty || (g.length <= 4 && g.forall(ch => ch.isDigit || (ch >= 'a' && ch <= 'f')))))
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
