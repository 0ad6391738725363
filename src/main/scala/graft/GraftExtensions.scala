package graft

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.xxhash64

import graft.canon.{Canon, CanonicalizeDomain, IsGlobalIp}
import graft.ops.TextOps

/** SQL surface for the library: registers the custom Catalyst expressions
  * and the codegen-composed text-pipeline columns as SQL functions, so a
  * `spark.sql(...)` user gets the same operators as the Dataset API.
  *
  * Activate per-session at build time:
  * {{{
  * SparkSession.builder.config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * or retro-fit an existing session (tests, notebooks) with
  * [[GraftExtensions.register]].
  *
  * Every function here resolves to a pure Catalyst expression tree (either
  * a native codegen'd expression — [[graft.canon.CanonicalizeDomain]],
  * [[graft.canon.IsGlobalIp]] — or a composition of Spark built-ins), so
  * Catalyst still folds constants, pushes filters through them where legal,
  * and keeps them inside WholeStageCodegen; nothing registered here is a
  * black-box UDF.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-operator surface: plans graft.plans.CuckooAdmit (first-seen
    // admission over a partitioned cuckoo filter) into CuckooAdmitExec
    ext.injectPlannerStrategy(_ => graft.plans.CuckooAdmitStrategy)
  }
}

object GraftExtensions {

  private def col(e: Expression): Column = GraftSqlBridge.toCol(e)
  private def expr(c: Column): Expression = GraftSqlBridge.toExpr(c)

  /** One unary SQL function from a Column→Column pipeline. */
  private def unary(name: String, usage: String)(
      f: Column => Column): (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = {
    val builder: FunctionBuilder = { children =>
      require(children.length == 1, s"$name expects exactly 1 argument")
      // eager conversion: a lazy ColumnNodeExpression would reach codegen
      // unresolved when returned from a FunctionRegistry builder
      GraftSqlBridge.toExprEager(f(col(children.head)))
    }
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
      builder)
  }

  /** All registered functions; names mirror the Dataset-API operators. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    unary("canonicalize_domain",
      "canonicalize_domain(str) - trim, lowercase, strip root dot, IDNA/punycode.")(
      Canon.canonicalizeDomainCol),
    unary("is_global_ip",
      "is_global_ip(str) - true iff the string is a globally-routable IPv4/IPv6 address.")(
      c => col(IsGlobalIp(expr(c)))),
    unary("domain_key",
      "domain_key(str) - frontier seen-set key: xxhash64(canonicalize_domain(str)).")(
      Canon.domainKey),
    unary("graft_token_count",
      "graft_token_count(text) - whitespace-token count (bigint).")(
      c => TextOps.tokenCount(c).cast("long")),
    unary("graft_subword_count",
      "graft_subword_count(text) - BPE-ish subword count (bigint).")(
      c => TextOps.subwordCount(c).cast("long")),
    unary("graft_stopword_ratio_mill",
      "graft_stopword_ratio_mill(text) - stopword ratio in integer mills.")(
      TextOps.stopwordRatioMill),
    unary("graft_norm_fingerprint",
      "graft_norm_fingerprint(text) - md5 fingerprint of the normalized text.")(
      TextOps.normFingerprint),
    unary("graft_lang_id",
      "graft_lang_id(text) - heuristic language id (en/de/fr/es/cs/zh/unknown).")(
      TextOps.langIdCol),
    unary("graft_redact_pii",
      "graft_redact_pii(text) - emails -> <EMAIL>, IPv4 -> <IP>, E.164 phones -> <PHONE>.")(
      graft.ops.PiiOps.redactPii),
    unary("graft_char_trigrams",
      "graft_char_trigrams(text) - overlapping lowercase character trigrams (array<string>).")(
      TextOps.charTrigrams),
    unary("graft_nfc",
      "graft_nfc(text) - Unicode NFC normalization (codegen'd expression).")(
      graft.canon.TextNorm.nfc)
  )

  /** Retro-fit registration into an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
