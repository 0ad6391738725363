package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.canon.Canon

class CanonSpec extends AnyFunSuite {

  test("trim, lowercase, strip one trailing dot") {
    assert(Canon.canonicalize("  Example.CZ  ") == "example.cz")
    assert(Canon.canonicalize("example.cz.") == "example.cz")
    assert(Canon.canonicalize("EXAMPLE.CZ.") == "example.cz")
    // only one trailing dot stripped; root stays root
    assert(Canon.canonicalize(".") == ".")
  }

  test("IDN names are punycode-encoded (reference web_utils.py:45-56)") {
    assert(Canon.canonicalize("háčkyčárky.cz") == "xn--hkyrky-ptac70bc.cz")
    assert(Canon.canonicalize("HÁČKYČÁRKY.CZ.") == "xn--hkyrky-ptac70bc.cz")
    // already-punycode passes through unchanged
    assert(Canon.canonicalize("xn--hkyrky-ptac70bc.cz") == "xn--hkyrky-ptac70bc.cz")
  }

  test("ascii domains are idempotent; garbage does not throw") {
    assert(Canon.canonicalize("nic.cz") == "nic.cz")
    assert(Canon.canonicalize("a b c") == Canon.canonicalize("a b c")) // stable
  }

  test("expression works in a plan and keys duplicate variants together") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val df = Seq("NIC.cz", "nic.cz.", "  nic.cz ", "háčkyčárky.cz", "HÁČKYČÁRKY.CZ")
      .toDF("d")
      .select(Canon.canonicalizeDomainCol(org.apache.spark.sql.functions.col("d")).as("c"),
        Canon.domainKey(org.apache.spark.sql.functions.col("d")).as("k"))
    val rows = df.collect()
    assert(rows.take(3).map(_.getString(0)).toSet == Set("nic.cz"))
    assert(rows.takeRight(2).map(_.getString(0)).toSet == Set("xn--hkyrky-ptac70bc.cz"))
    // same canonical → same xxhash64 key
    assert(rows.take(3).map(_.getLong(1)).toSet.size == 1)
    assert(df.select("c").distinct().count() == 2)
  }
}
