package graft

import org.apache.spark.sql.SparkSession

import graft.engine.Engine
import graft.model.Model.{Doc, Span}
import graft.universe.Universe

/** N vs 4N ordering / seen-set equality evidence (BASELINE sandbox rule:
  * "matching the reference's crawl ordering and URL-seen set under an
  * identical seed list and politeness budget" across two cluster sizes).
  *
  * Runs the full frontier loop (`Engine.run`: admission → seen-filter →
  * politeness budgets → crawl → checkpoints) on the same interleaved-docs
  * seed corpus at `local[N]` and `local[4N]`, then compares
  *   - the seen-set (the exact set of crawled canonical domains), and
  *   - the pop order (`pop_round`, `pop_rank` per domain)
  * via order-sensitive digests. Prints one JSON line.
  *
  * Usage: `sbt "runMain graft.OrderingCheck [N] [domains]"` (default 8, 20000).
  */
object OrderingCheck {

  private def digestAt(cores: Int, nDomains: Int): (String, String, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-ordering-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val u = new Universe(42L)
    val eng = new Engine(spark, u,
      workDir = graft.TmpDirs.create(s"ordering-$cores").toString,
      frontierPartitions = 16, seedChunkSize = 5000)
    // identical seed corpus: interleaved docs, 10 text spans per doc
    val docs = spark.range(nDomains.toLong / 10).map { d =>
      Doc(f"doc-$d%08d", (0 until 10).map(j =>
        Span("text", u.seedDomain(d * 10 + j), null, j)))
    }
    eng.run(docs)
    val rows = eng.resultsTable.read().get
      .select("domain", "pop_round", "pop_rank")
      .as[(String, Int, Long)].collect()
      .sortBy(r => (r._2, r._3))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.foreach { case (d, r, k) => md.update(s"$d|$r|$k;".getBytes("UTF-8")) }
    val orderDigest = md.digest().map(b => f"$b%02x").mkString
    val mdSeen = java.security.MessageDigest.getInstance("SHA-256")
    rows.map(_._1).sorted.foreach(d => mdSeen.update(s"$d;".getBytes("UTF-8")))
    val seenDigest = mdSeen.digest().map(b => f"$b%02x").mkString
    spark.stop()
    (orderDigest, seenDigest, rows.length.toLong)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    val domains = args.lift(1).map(_.toInt).getOrElse(20000)
    val (ordN, seenN, cntN) = digestAt(n, domains)
    val (ord4N, seen4N, cnt4N) = digestAt(4 * n, domains)
    val orderEq = ordN == ord4N
    val seenEq = seenN == seen4N
    println(
      s"""{"metric":"ordering_equality","order_equal":$orderEq,"seen_set_equal":$seenEq,"n_cores":$n,"4n_cores":${4 * n},"crawled_n":$cntN,"crawled_4n":$cnt4N,"order_digest":"${ordN.take(16)}","seed_domains":$domains}""")
    if (!orderEq || !seenEq) sys.exit(1)
  }
}
