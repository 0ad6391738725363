package graft.canon

import java.net.IDN

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Domain canonicalization: trim → lowercase → strip one trailing dot →
  * IDNA/punycode (`java.net.IDN.toASCII`).
  *
  * Semantics match the reference crawler's handling of user-supplied domain
  * names: whitespace-trimmed lines (reference `single.py:48`), names passed
  * to the resolver without the trailing root dot (reference
  * `dns_utils.py:262-264` appends its own absolute dot), and hosts
  * IDNA-encoded before use (reference `web_utils.py:45-56`).
  *
  * Exposed three ways, most-preferred first:
  *   - [[CanonicalizeDomain]]: a codegen'd Catalyst `UnaryExpression`
  *     (whole-stage-codegen friendly; no UDF serialization overhead);
  *   - `Canon.canonicalizeDomainCol`: the `Column` wrapper;
  *   - `Canon.canonicalize`: the plain Scala function for probe leaves.
  *
  * The frontier seen-set key is `xxhash64(canonicalize_domain(col))` —
  * `xxhash64` is a Spark built-in codegen'd expression, so the whole
  * canonicalize→punycode→hash pipeline stays inside WholeStageCodegen.
  */
object Canon {

  /** Pure canonicalizer. Null-safe at the expression layer, not here.
    * Invalid IDNA input falls back to the lowercased form rather than
    * failing the row (a crawler must never die on one bad seed).
    */
  def canonicalize(raw: String): String = {
    var s = raw.trim.toLowerCase(java.util.Locale.ROOT)
    if (s.endsWith(".") && s.length > 1) s = s.substring(0, s.length - 1)
    if (s.isEmpty) s
    else
      try IDN.toASCII(s, IDN.ALLOW_UNASSIGNED)
      catch { case _: IllegalArgumentException => s }
  }

  /** UTF8String bridge used from generated code (static call target). */
  def canonicalizeUtf8(raw: UTF8String): UTF8String =
    UTF8String.fromString(canonicalize(raw.toString))

  def canonicalizeDomainCol(c: Column): Column =
    GraftSqlBridge.toCol(CanonicalizeDomain(GraftSqlBridge.toExpr(c)))

  /** Frontier key: canonicalize → punycode → xxHash64 (built-in). */
  def domainKey(c: Column): Column = xxhash64(canonicalizeDomainCol(c))
}

/** Codegen'd canonicalize(trim, lowercase, strip-root-dot, IDNA) expression. */
case class CanonicalizeDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "canonicalize_domain"

  override protected def nullSafeEval(input: Any): Any =
    Canon.canonicalizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.canon.Canon.canonicalizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
