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

  test("is_global_ip predicate matches Python ipaddress.is_global (ip_utils.py:24-41)") {
    import graft.canon.IpPredicates.isGlobalIp
    // global
    assert(isGlobalIp("217.31.205.50"))
    assert(isGlobalIp("8.8.8.8"))
    assert(isGlobalIp("2001:1488:0:3::2"))
    // private / reserved / invalid
    assert(!isGlobalIp("10.1.2.3"))
    assert(!isGlobalIp("192.168.1.1"))
    assert(!isGlobalIp("172.20.0.1"))
    assert(!isGlobalIp("127.0.0.1"))
    assert(!isGlobalIp("169.254.10.10"))
    assert(!isGlobalIp("100.64.0.1"))
    assert(!isGlobalIp("198.51.100.7"))
    assert(!isGlobalIp("224.0.0.1"))
    assert(!isGlobalIp("256.1.1.1"))
    assert(!isGlobalIp("not-an-ip"))
    assert(!isGlobalIp("::1"))
    assert(!isGlobalIp("fe80::1"))
    assert(!isGlobalIp("fd12::3"))
    assert(!isGlobalIp("2001:db8:1:2::3")) // documentation range
    assert(!isGlobalIp(""))
  }

  test("is_global_ip works as a codegen'd column predicate") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val df = Seq("8.8.8.8", "10.0.0.1", "2001:db8::1", "217.31.205.50")
      .toDF("ip")
      .where(graft.canon.IpPredicates.isGlobalIpCol(
        org.apache.spark.sql.functions.col("ip")))
    assert(df.as[String].collect().sorted.toSeq == Seq("217.31.205.50", "8.8.8.8"))
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
