package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PiiOps

/** PII scrub: counts, redaction order (email beats phone on `+digits`
  * local parts), idempotence, and the codegen/no-shuffle plan shape.
  * Exact cross-engine values are pinned by the q47 DuckDB oracle.
  */
class PiiOpsSpec extends AnyFunSuite {

  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def scrub(s: String): (String, Long, Long, Long) = {
    val row = Seq(s).toDF("t")
      .select(PiiOps.redactPii(col("t")).as("r"), PiiOps.piiCounts(col("t")).as("c"))
      .select(col("r"), col("c.n_emails"), col("c.n_ips"), col("c.n_phones"))
      .as[(String, Long, Long, Long)].head()
    row
  }

  test("redacts emails, IPv4s, and E.164 phones; counts match") {
    val (r, e, i, p) = scrub(
      "mail jan.novak+spam@nic.cz or admin@mx1.example.cz, " +
        "host 192.0.2.17 port 53, call +420234567890 now")
    assert(r == "mail <EMAIL> or <EMAIL>, host <IP> port 53, call <PHONE> now")
    assert((e, i, p) == (2L, 1L, 1L))
  }

  test("a +digits email local part is an email, not a phone") {
    val (r, e, i, p) = scrub("user+420123456789@example.cz")
    assert(r == "<EMAIL>")
    assert((e, i, p) == (1L, 0L, 0L))
  }

  test("dotted version strings inside words don't match IPv4 (word boundary)") {
    val (r, _, i, _) = scrub("ip 10.0.0.1, but spark-4.1.2.3-rc1 stays")
    // 4.1.2.3 sits between '-' boundaries — '-' is a non-word char, so the
    // quad DOES match; the guarded case is digits glued to letters
    assert(i == 2L)
    val (r2, _, i2, _) = scrub("build id x1.2.3.4y keeps its digits")
    assert(i2 == 0L && r2.contains("x1.2.3.4y"))
    assert(r.contains("<IP>"))
  }

  test("redaction is idempotent and clean text is untouched") {
    val clean = "plain czech text bez osobnich udaju, port 8080"
    assert(scrub(clean)._1 == clean)
    val once = scrub("a@b.cz 10.1.1.1 +12345678")._1
    assert(scrub(once)._1 == once)
    assert(scrub(once)._2 == 0L)
  }

  test("empty and junk inputs never throw") {
    for (s <- Seq("", "@", "+", "1.2.3", "+123", "a@b", ".", "+" + "9" * 40))
      scrub(s)
  }

  test("scrub plan is scan-local: no exchange, stays in codegen") {
    // spark.range (not a local Seq) so Catalyst can't constant-fold the
    // whole projection into a LocalTableScan
    val df = spark.range(64)
      .select(col("id"), concat(lit("d"), col("id"), lit(" a@b.cz")).as("t"))
      .select(col("id"), PiiOps.redactPii(col("t")).as("r"), PiiOps.piiCounts(col("t")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PII scrub shuffles:\n$plan")
    // the compact plan marks WholeStageCodegen stages with a "*(n)" prefix
    assert(plan.linesIterator.next().startsWith("*("),
      s"PII scrub fell out of codegen:\n$plan")
  }
}
