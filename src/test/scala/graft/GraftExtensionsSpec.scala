package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.canon.Canon
import graft.ops.TextOps

/** SQL-surface registration ([[GraftExtensions]]): every library operator
  * registered as a SQL function must agree with its Dataset-API /
  * plain-Scala twin.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkSessionFixture.spark; GraftExtensions.register(s); s }

  private def one[T](sql: String): T =
    spark.sql(sql).collect().head.getAs[T](0)

  test("extensions class injects all functions without error") {
    // The config path (`spark.sql.extensions=graft.GraftExtensions`) runs
    // exactly this apply() against a fresh SparkSessionExtensions.
    new GraftExtensions().apply(new SparkSessionExtensions)
    assert(GraftExtensions.functions.map(_._1.funcName).distinct.size ==
      GraftExtensions.functions.size)
  }

  test("canonicalize_domain matches Canon.canonicalize incl. IDNA") {
    for (raw <- Seq("  ExAmple.CZ. ", "háčky.cz", "A.b.C", "x.")) {
      assert(one[String](s"SELECT canonicalize_domain('$raw')") ==
        Canon.canonicalize(raw), raw)
    }
  }

  test("is_global_ip agrees with the predicate twin") {
    for ((ip, want) <- Seq("8.8.8.8" -> true, "10.1.2.3" -> false,
        "192.168.0.1" -> false, "2001:db8::1" -> false, "2a00:1::1" -> true,
        "not-an-ip" -> false)) {
      assert(one[Boolean](s"SELECT is_global_ip('$ip')") == want, ip)
    }
  }

  test("domain_key = xxhash64 of the canonical form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("WWW.Seznam.CZ.").toDF("d")
    val viaCol = df.select(xxhash64(lit(Canon.canonicalize("WWW.Seznam.CZ."))))
      .collect().head.getLong(0)
    assert(one[Long]("SELECT domain_key('WWW.Seznam.CZ.')") == viaCol)
  }

  test("text functions agree with TextOps twins") {
    val txt = "The cat and the dog, of course; with 42 things."
    assert(one[Long](s"SELECT graft_token_count('$txt')") == 10L)
    assert(one[Int](s"SELECT graft_stopword_ratio_mill('$txt')") ==
      spark.sql(s"SELECT 1").select(TextOps.stopwordRatioMill(
        org.apache.spark.sql.functions.lit(txt))).collect().head.getInt(0))
    for (t <- Seq("the quick brown fox of course", "der und die das ist nicht",
        "le la les et dans pour", "")) {
      assert(one[String](s"SELECT graft_lang_id('$t')") == TextOps.langId(t), t)
    }
  }

  test("graft_redact_pii and graft_char_trigrams agree with their twins") {
    val t = "mail bob@corp.example from 10.0.0.7 tel +420123456789 end"
    val viaSql = one[String](s"SELECT graft_redact_pii('$t')")
    val viaCol = spark.sql("SELECT 1").select(graft.ops.PiiOps.redactPii(
      org.apache.spark.sql.functions.lit(t))).collect().head.getString(0)
    assert(viaSql == viaCol)
    assert(viaSql == "mail <EMAIL> from <IP> tel <PHONE> end")
    assert(one[collection.Seq[String]](
      "SELECT graft_char_trigrams('AbCd')").toSeq == Seq("abc", "bcd"))
    assert(one[collection.Seq[String]](
      "SELECT graft_char_trigrams('ab')").toSeq == Seq())
  }

  test("registered functions stay expression trees (codegen, not UDF)") {
    val plan = spark.sql(
      "SELECT domain_key(concat('a', id, '.cz')) FROM range(1000)")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the simple plan form
    assert(plan.contains("*("), plan)
    assert(!plan.toLowerCase.contains("udf"), plan)
  }
}
