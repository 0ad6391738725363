package graft.canon

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.regexp_replace
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus curation — the step every
  * web-scale text pipeline runs before fingerprinting and dedup: the same
  * visible string arrives from the web in composed (NFC) and decomposed
  * (NFD) byte forms (e.g. `é` vs `e`+U+0301), and without canonicalizing
  * them exact dedup silently treats equal documents as distinct.
  *
  * [[NfcNormalize]] is a codegen'd Catalyst `UnaryExpression` (same
  * preference order as [[CanonicalizeDomain]]: native expression > UDF),
  * with a fast path that returns the input buffer untouched when it is
  * already NFC — true for almost all real web text, so the hot loop is a
  * scan, not an allocation. DuckDB's `nfc_normalize` replays it exactly
  * (oracle q54).
  *
  * [[TextNorm.stripControls]] composes built-ins only: C0/C1 control
  * characters except \t \n \r → removed (the cleanup C4/CCNet pipelines
  * apply before quality scoring); the character-class regex means the
  * same thing in Java regex and RE2.
  */
object TextNorm {

  /** Static call target for generated code. Fast path: already-NFC input
    * (the overwhelmingly common case) returns the original buffer.
    */
  def nfcUtf8(raw: UTF8String): UTF8String = {
    val s = raw.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) raw
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    GraftSqlBridge.toCol(NfcNormalize(GraftSqlBridge.toExpr(c)))

  /** Remove C0/C1 controls except tab/newline/carriage-return. */
  def stripControls(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
}

/** Codegen'd Unicode-NFC normalization expression. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.nfcUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.canon.TextNorm.nfcUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
