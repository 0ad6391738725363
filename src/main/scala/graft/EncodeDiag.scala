package graft

import org.apache.spark.sql.SparkSession

import graft.spans.SpanCodec
import graft.universe.Universe

/** Micro-diagnostics separating the crawl stage's cost layers (dev tool):
  * probe-only (pruned serializer), full object materialization, Tungsten
  * encode + parquet write, and columnar cache build, each on the same
  * domain set.
  */
object EncodeDiag {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("8")
    val n = args.lift(1).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val u = new Universe(42L)
    val eng = new graft.engine.Engine(spark, u,
      workDir = graft.TmpDirs.create("encdiag").toString)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val doms = spark.range(n).map(i => u.seedDomain(i))
    // warm-up
    eng.crawlDomains(spark.range(2000).map(i => u.seedDomain(i))).count()

    val results = eng.crawlDomains(doms)
    time("A probe-only count (pruned serializer)")(results.count())
    time("B probe + object map (no Tungsten)")(
      results.map(r => r.domain.length.toLong).reduce(_ + _))
    time("B2 probe + SpanCodec (no Tungsten)")(
      results.map(r => SpanCodec.encode(r).spans.length.toLong).reduce(_ + _))
    val enriched = results.map(r => (r.domain, r, SpanCodec.encode(r)))
      .toDF("domain", "result", "span_doc")
    val outDir = graft.TmpDirs.create("encdiag-out").toString
    time("C probe + encode + parquet write (full columns)")(
      enriched.write.mode("overwrite").parquet(outDir + "/c"))
    val cached = enriched.cache()
    time("D probe + encode + columnar cache build")(cached.count())
    time("E commit from cache: parquet write")(
      cached.write.mode("overwrite").parquet(outDir + "/e"))
    time("E2 commit from cache: spans only")(
      cached.select("span_doc.doc_id", "span_doc.spans")
        .write.mode("overwrite").parquet(outDir + "/e2"))
    time("E3 commit from cache: coalesce(8) -> 8 files")(
      cached.coalesce(8).write.mode("overwrite").parquet(outDir + "/e3"))
    time("E4 commit from cache: coalesce(2) -> 2 files")(
      cached.coalesce(2).write.mode("overwrite").parquet(outDir + "/e4"))
    time("E5 cache -> uncompressed write")(
      cached.write.mode("overwrite").option("compression", "none")
        .parquet(outDir + "/e5"))
    cached.unpersist()
    val staged = spark.read.parquet(outDir + "/c")
    time("F staged re-read: count")(staged.count())
    time("F2 staged re-read: full re-write")(
      staged.write.mode("overwrite").parquet(outDir + "/f2"))
    time("F3 staged re-read: spans-only re-write")(
      staged.select("span_doc.doc_id", "span_doc.spans")
        .write.mode("overwrite").parquet(outDir + "/f3"))
    spark.stop()
  }
}
