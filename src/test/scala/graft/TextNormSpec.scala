package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.canon.TextNorm

/** Unicode NFC normalization expression + control-strip helper. */
class TextNormSpec extends AnyFunSuite {
  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  // explicit code points so no editor/tooling can re-normalize them
  private val decomposed = "Ka\u0301va" // a + combining acute
  private val composed = "K\u00e1va"

  test("nfc composes decomposed sequences; composed input unchanged") {
    assert(decomposed != composed) // sanity: really two byte forms
    val out = Seq(decomposed, composed, "plain").toDF("t")
      .select(TextNorm.nfc(col("t"))).as[String].collect().toSeq
    assert(out == Seq(composed, composed, "plain"))
    // fast path: already-NFC input returns the SAME buffer (no realloc)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(composed)
    assert(TextNorm.nfcUtf8(u) eq u)
  }

  test("stripControls removes C0 controls but keeps tab/newline/CR") {
    val t = "ab\tc\nd\r\u0007e\u0000 f"
    val out = Seq(t).toDF("t").select(TextNorm.stripControls(col("t")))
      .as[String].collect().head
    assert(out == "ab\tc\nd\re f")
  }

  test("nfc expression stays inside WholeStageCodegen; null-safe") {
    val plan = spark.range(100)
      .select(TextNorm.nfc(concat(lit("x"), col("id"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
    val nulls = Seq(Option.empty[String], Some("e\u0301")).toDF("t")
      .select(TextNorm.nfc(col("t"))).as[Option[String]].collect().toSet
    assert(nulls == Set(None, Some("\u00e9")))
  }
}
