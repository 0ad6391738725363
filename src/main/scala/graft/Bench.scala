package graft

import org.apache.spark.sql.SparkSession

import graft.engine.Engine
import graft.universe.Universe

/** Per-round benchmark: headline operator queries on the driver's sf dir +
  * the crawl engine's frontier throughput (domains resolved/sec — the
  * BASELINE.md metric). Prints exactly one JSON line.
  */
object Bench {

  /** Queries timed as the headline set (one per operator family that
    * dominates cost at scale; rows-only extras excluded to keep the bench
    * signal clean).
    */
  val headline: Seq[String] = Seq(
    "q02_agg_pricing", "q03_join_regions", "q05_dedup_exact",
    "q07_topk_orders", "q12_hourly_rollup", "q17_minhash_bands",
    "q19_ngram_jaccard", "q20_cosine_topk", "q21_ann_lsh", "q25_multimodal",
    "q38_star_join",
    // round-5 additions: the heavy curation operators, so regressions are
    // visible where the new work lives (verdict r4 next-round #8)
    "q45_curation_funnel", "q46_line_dedup", "q48_lm_coverage",
    "q50_stream_curation",
    // round-5 extension: the join/sketch operator families, so the
    // union-window as-of, bucketized range join, and fixed-size sketch
    // aggregations stay regression-visible
    "q94_asof_attrib", "q95_range_join", "q96_hll_sessions",
    "q97_cms_tokens",
    // extension session 4: retrieval scoring and the recall-1 prefix-
    // filtered similarity join — the two corpus-heavy additions — plus
    // the degree-ordered triangle count (the wedge join is the
    // scale-interesting graph step)
    "q100_bm25_rank", "q102_setsim_join", "q110_triangles")

  def crawlBench(spark: SparkSession, nDomains: Int): (Double, Long) = {
    import spark.implicits._
    val u = new Universe(42L)
    val dir = graft.TmpDirs.create("graft-bench").toString
    val eng = new Engine(spark, u, workDir = dir, frontierPartitions = 32,
      seedChunkSize = nDomains)
    // distributed seed generation — no driver-side 10^5-element Seq
    val domains = spark.range(nDomains.toLong).map(i => u.seedDomain(i))
    val t0 = System.nanoTime()
    val n = eng.crawlDomains(domains).count()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache() // drop the run's frontier cache blocks
    (dt, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-query result: best-of-2 time over the SUCCESSFUL reps only, or
    // NaN + an error entry when every rep throws — a failing query must
    // never report its fast time-to-failure as a benchmark number
    var errors = Vector.empty[(String, String)]
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      // best-of-2: the first rep also pays JVM/C2/codegen warm-up, and this
      // box has measured multi-minute CPU-steal windows that swing identical
      // runs several-fold — a single cold sample is mostly noise
      val reps = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            errors :+= name -> e.toString.takeWhile(_ != '\n').take(200)
            false
        }
        val d = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // queries that cache internal stages pay here
        Option.when(ok)(d)
      }
      name -> (if (reps.nonEmpty) reps.min else Double.NaN)
    }

    val nCrawl = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "4000").toInt
    // best-of-2 for the same reason as above (the probe path needs C2 warm)
    val (crawlSec, crawled) = Seq(crawlBench(spark, nCrawl),
      crawlBench(spark, nCrawl)).minBy(_._1)
    val domPerSec = if (crawlSec > 0) crawled / crawlSec else 0.0

    // failed queries serialize as null (NaN is not valid JSON) and are
    // excluded from the total; the errors field keeps the signal loud
    val qs = (results :+ ("crawl" -> crawlSec))
      .map { case (k, v) =>
        "\"" + k + "\":" + (if (v.isNaN) "null" else f"$v%.3f")
      }.mkString("{", ",", "}")
    val total = results.map(_._2).filterNot(_.isNaN).sum + crawlSec
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (q, m) =>
        "\"" + q + "\":\"" + m.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }.mkString(""","errors":{""", ",", "}")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","crawl_domains":$crawled,"crawl_domains_per_sec":$domPerSec%.1f,"cpus":$cpus$errJson}""")
    if (errors.nonEmpty) {
      errors.foreach { case (q, m) => System.err.println(s"BENCH FAILURE $q: $m") }
      sys.exit(3) // a bench with failing queries must not look green
    }
    spark.stop()
  }
}
