package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftOps

/** The custom whole-operator admission ([[graft.plans.CuckooAdmit]]):
  * logical node → injected strategy → physical exec, equivalent to
  * `dropDuplicates` on the key, visible in `explain()`.
  */
class CuckooAdmitPlanSpec extends AnyFunSuite {
  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def dupDf = spark.range(2000)
    .select((col("id") % 437).as("k"), col("id"))
    .withColumn("key", xxhash64(col("k")))

  test("admits exactly one row per key, equal to dropDuplicates on the key") {
    val admitted = GraftOps.admitFirstSeen(dupDf, col("key"), partitions = 4)
    assert(admitted.count() == 437)
    assert(admitted.select("k").as[Long].collect().sorted.toSeq ==
      (0L until 437L))
    // set equality with the built-in dedup (kept-row choice may differ:
    // dropDuplicates keeps an arbitrary row, CuckooAdmit the partition-first)
    assert(admitted.select("key").as[Long].collect().toSet ==
      dupDf.dropDuplicates("key").select("key").as[Long].collect().toSet)
  }

  test("plans as CuckooAdmitExec behind a Catalyst-planned shuffle") {
    val admitted = GraftOps.admitFirstSeen(dupDf, col("key"), partitions = 4)
    val plan = admitted.queryExecution.executedPlan.toString
    assert(plan.contains("CuckooAdmit"), plan)
    assert(plan.contains("Exchange"), plan) // the required distribution
    assert(admitted.rdd.getNumPartitions == 4)
  }

  test("co-partitioned input needs no second shuffle (exchange reuse)") {
    val admitted = GraftOps.admitFirstSeen(dupDf, col("key"), partitions = 4)
    // admitting twice on the same key keeps one Exchange for the chain:
    // the exec's outputPartitioning satisfies the second node's requirement
    val twice = GraftOps.admitFirstSeen(admitted, col("key"), partitions = 4)
    val nExchanges = "(?<!Reused)Exchange".r
      .findAllIn(twice.queryExecution.executedPlan.toString).size
    assert(twice.count() == 437)
    assert(nExchanges == 1,
      s"expected a single shuffle:\n${twice.queryExecution.executedPlan}")
  }

  test("exact at high cardinality: no fingerprint false-positive drops") {
    // 300k distinct keys through 2 partitions — the old cuckoo-fingerprint
    // membership lost ~n²/2^16 rows per partition at this scale; the exact
    // LongOpenHashSet must keep every distinct key.
    val n = 300000L
    val big = spark.range(n).withColumn("key", xxhash64(col("id")))
    val admitted = GraftOps.admitFirstSeen(big, col("key"), partitions = 2)
    assert(admitted.count() == n)
  }

  test("null key groups like dropDuplicates: first null-keyed row kept") {
    val df = Seq[(java.lang.Long, Int)]((1L, 10), (null, 20), (1L, 30),
      (null, 40), (2L, 50)).toDF("key", "v")
    val admitted = GraftOps.admitFirstSeen(df, col("key"), partitions = 2)
    assert(admitted.count() == 3) // {1, null, 2}
    assert(admitted.where(col("key").isNull).count() == 1)
  }

  test("non-Long key is rejected at call time, not runtime") {
    val df = Seq("a", "b").toDF("s")
    val e = intercept[IllegalArgumentException] {
      GraftOps.admitFirstSeen(df, col("s"), partitions = 2)
    }
    assert(e.getMessage.contains("LongType"))
  }

  test("crawl-shaped use: first-enqueue per canonical domain key") {
    val raws = Seq("Nic.CZ", "nic.cz.", "nic.cz", "seznam.cz", "SEZNAM.cz")
      .toDF("domain")
    val keyed = raws.withColumn("key",
      graft.canon.Canon.domainKey(col("domain")))
    val admitted = GraftOps.admitFirstSeen(keyed, col("key"), partitions = 2)
    assert(admitted.count() == 2) // {nic.cz, seznam.cz}
  }

  test("URL-seen admission: canonicalize → urlKey → cuckoo, non-URLs filtered") {
    // the north-rule URL-frontier chain end to end: crawl-equivalent URL
    // variants (case, default port, fragment, param order) share one
    // xxhash64 seen-key and admit exactly once; distinct query
    // MULTIPLICITY stays distinct; non-URLs canonicalize to NULL and are
    // dropped by the frontier's null-skip before keying
    val raws = Seq(
      "HTTP://Example.CZ:80/a?b=2&a=1#frag",
      "http://example.cz/a?a=1&b=2",
      "http://example.cz./a?a=1&b=2",
      "http://example.cz/a?a=1&a=1&b=2",  // dup param → a DIFFERENT page
      "https://example.cz/a?a=1&b=2",     // scheme matters
      "not a url"
    ).toDF("url")
    val keyed = raws
      .withColumn("canon", graft.canon.Canon.canonicalizeUrlCol(col("url")))
      .where(col("canon").isNotNull)
      .withColumn("key", graft.canon.Canon.urlKey(col("url")))
    val admitted = GraftOps.admitFirstSeen(keyed, col("key"), partitions = 2)
    assert(admitted.select("canon").as[String].collect().toSet == Set(
      "http://example.cz/a?a=1&b=2",
      "http://example.cz/a?a=1&a=1&b=2",
      "https://example.cz/a?a=1&b=2"))
  }
}
