package graft

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.engine.Engine
import graft.model.Model.{Doc, DomainResult}
import graft.probes.CrawlConfig
import graft.spans.JsonSink
import graft.universe.Universe

/** The user-facing crawl entry point — the spark-submit twin of the
  * reference CLI (`single.py:36-61` for plaintext lists; the
  * controller/worker loop for big corpora):
  *
  * {{{
  * spark-submit --class graft.CrawlMain graft.jar <input> [options]
  *   <input>           .txt  → plaintext domain list, one per line, empty
  *                             lines ignored (single.py:50) → one-shot crawl
  *                             (no frontier state — low latency, right for
  *                             ad-hoc lists)
  *                     .parquet → interleaved-docs table (doc_id, spans) →
  *                             full frontier loop with politeness budgets,
  *                             cuckoo seen-set, MERGE checkpoints, resume.
  *                             Each round carries a fixed stage/commit cost
  *                             that amortizes at corpus scale (≥10⁵ domains
  *                             per round) — use .txt for tiny inputs
  *   --config FILE     reference-format config.yml (config_loader.py
  *                             semantics: defaults-merge, string coercion,
  *                             legacy-format detection); missing file →
  *                             defaults
  *   --out DIR         write results there (default: JSON lines on stdout,
  *                             like the reference, single.py:55)
  *   --format jsonl|parquet    output format for --out (default jsonl)
  *   --work DIR        checkpoint/table dir (default: temp) — re-running
  *                             with the same dir RESUMES from the last
  *                             committed round
  *   --max-rounds N    stop after N frontier rounds
  *   --partitions P    frontier partitions (default 32)
  *   --seed N          universe seed (default 42; the synthetic universe
  *                             stands in for the network in this sandbox —
  *                             probe leaves are the single place a real
  *                             resolver/HTTP client would plug in)
  *   --discover        frontier discovery (parquet inputs): hosts found
  *                             while crawling (redirect targets, MX hosts,
  *                             in-content links) re-enter the frontier
  *                             through the seen-set as depth+1 entries
  *   --discover-depth N  discovery depth cap (default 2; implies --discover)
  *   --real-timestamps  stamp result documents with the actual UTC wall
  *                             clock, reference format `%Y-%m-%d %H:%M:%S`
  *                             (`timestamp.py:22-23`, `crawl.py:167`).
  *                             Default is the fixed deterministic stamp so
  *                             resume/ordering digests stay bit-identical
  * }}}
  *
  * Progress goes to stderr with timestamps, mirroring the reference's
  * `single.py:52-59` progress contract.
  */
object CrawlMain {

  private def err(msg: String): Unit = {
    val ts = java.time.LocalDateTime.now()
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    System.err.println(s"$ts $msg")
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty || args.contains("-h") || args.contains("--help")) {
      System.err.println("Usage: spark-submit --class graft.CrawlMain graft.jar " +
        "<input.txt|input.parquet> [--config config.yml] [--out DIR] " +
        "[--format jsonl|parquet] [--work DIR] [--max-rounds N] " +
        "[--partitions P] [--seed N] [--discover] [--discover-depth N] " +
        "[--real-timestamps]")
      sys.exit(1)
    }
    val input = args(0)
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val outDir = opt("--out")
    val format = opt("--format").getOrElse("jsonl")
    val workDir = opt("--work").getOrElse(
      graft.TmpDirs.create("graft-crawl").toString)
    val maxRounds = opt("--max-rounds").map(_.toInt).getOrElse(Int.MaxValue)
    val partitions = opt("--partitions").map(_.toInt).getOrElse(32)
    val seed = opt("--seed").map(_.toLong).getOrElse(42L)
    // frontier discovery (parquet/frontier runs only): hosts found while
    // crawling re-enter the frontier through the seen-set (Engine scaladoc)
    val discovery =
      if (args.contains("--discover") || opt("--discover-depth").isDefined)
        Engine.DiscoveryConfig.on.copy(
          maxDepth = opt("--discover-depth").map(_.toInt).getOrElse(2))
      else Engine.DiscoveryConfig.off

    // spark-submit provides the master; standalone runs fall back to local
    val hadSession = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = SparkSession.builder()
      .appName("graft-crawl")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", partitions.toString))
      .master(sys.props.getOrElse("spark.master",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")}]"))
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // reference-compatible YAML config (config_loader.py): defaults-merge
    // with string coercion; missing/empty file falls back to defaults
    val cfg = opt("--config") match {
      case Some(path) =>
        err(s"Loading config from $path.")
        graft.probes.ConfigLoader.load(path)
      case None => CrawlConfig()
    }
    val u = new Universe(seed)
    // real mmdb GeoIP when the config points at databases (missing files
    // disable that db with a warning, like the reference); synthetic
    // geo otherwise
    val geoSvc: graft.probes.ProbeService =
      if (cfg.geoipCountry.isDefined || cfg.geoipIsp.isDefined || cfg.geoipAsn.isDefined)
        new graft.universe.GeoMmdbService(u, cfg.geoipCountry, cfg.geoipIsp, cfg.geoipAsn)
      else u
    // real HSTS preload list when configured (hsts_preload key), layered
    // over the geo decorator — each decorator swaps exactly one leaf
    val svc: graft.probes.ProbeService = cfg.hstsPreloadFile match {
      case Some(path) => new graft.universe.HstsPreloadService(geoSvc, path)
      case None => geoSvc
    }
    val clock =
      if (args.contains("--real-timestamps")) Engine.Clock.utcWall
      else Engine.Clock.fixed
    val eng = new Engine(spark, u, cfg, workDir = workDir,
      frontierPartitions = partitions, probeService = svc,
      discovery = discovery, clock = clock)

    // for .txt inputs: the reference's single.py contract — one JSON per
    // input line, duplicates included, in input order
    var orderedJson: Option[Dataset[String]] = None
    val results: Dataset[DomainResult] =
      if (input.endsWith(".parquet")) {
        err(s"Reading interleaved docs from $input.")
        val raw = spark.read.parquet(input)
        if (!raw.columns.contains("spans")) {
          System.err.println("Expected the interleaved-docs schema " +
            "(doc_id: string, spans: array<struct<kind, text, media_ref, offset>>); " +
            s"got [${raw.columns.mkString(", ")}]. For a plain domain list use a .txt input.")
          sys.exit(2)
        }
        val docs = raw.select(raw("doc_id").cast("string").as("doc_id"),
          raw("spans")).as[Doc]
        val stats = eng.run(docs, maxRounds)
        stats.foreach(s => err(f"round ${s.round}: admitted=${s.admitted} " +
          f"crawled=${s.crawled} deferred=${s.deferred} " +
          f"discovered=${s.discovered} ${s.seconds}%.1f s"))
        eng.resultsTable.read() match {
          case Some(df) => df.select("result.*").as[DomainResult]
          case None => spark.emptyDataset[DomainResult]
        }
      } else {
        err(s"Reading domains from $input.")
        import org.apache.spark.sql.functions.{col, length, trim}
        // line numbers = file order (zipWithIndex is deterministic for a
        // given file); the reference emits one JSON result per input LINE,
        // duplicates included, in input order (single.py:50-59) — the
        // engine still crawls each canonical domain once, then results fan
        // back out per line below
        val lines = spark.createDataset(
            spark.sparkContext.textFile(input).zipWithIndex())
          .toDF("raw", "line_no")
          .select(trim(col("raw")).as("domain"), col("line_no"))
          .where(length(col("domain")) > 0) // empty lines ignored (single.py:50)
          .cache()
        err(s"Read ${lines.count()} domains.")
        val res = eng.crawlDomains(lines.select("domain").as[String])
        val keyed = res.map(r => (r.domain, JsonSink.toJson(r, cfg)))
          .toDF("canonical", "json")
        orderedJson = Some(lines
          .withColumn("canonical", graft.canon.Canon.canonicalizeDomainCol(col("domain")))
          .join(keyed, "canonical")
          .orderBy("line_no")
          .select("json").as[String])
        res
      }

    outDir match {
      case Some(dir) if format == "parquet" =>
        // parquet is our extension (no reference analog): the deduped
        // result set, unordered — order carries no meaning in parquet
        results.write.mode("overwrite").parquet(dir)
        err(s"Finished. Results: $dir (parquet), state: $workDir.")
      case Some(dir) =>
        orderedJson.getOrElse(JsonSink.jsonLines(results, cfg))
          .write.mode("overwrite").text(dir)
        err(s"Finished. Results: $dir (JSON lines), state: $workDir.")
      case None =>
        // reference contract: one JSON document per line on stdout
        // (single.py:55); toLocalIterator keeps the driver at O(1 row)
        val it = orderedJson.getOrElse(JsonSink.jsonLines(results, cfg))
          .toLocalIterator()
        while (it.hasNext) println(it.next())
        err(s"Finished. State: $workDir.")
    }
    // don't tear down a session we joined (library/test embedding)
    if (!hadSession) spark.stop()
  }
}
