package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** CLI contract (reference `single.py:36-61`): plaintext list in → one
  * JSON document per domain out; parquet interleaved docs → frontier loop
  * with resume. Runs `CrawlMain.main` in-process against the shared
  * session (main must not stop a session it joined).
  */
class CrawlMainSpec extends AnyFunSuite {
  private val spark = SparkSessionFixture.spark

  test("plaintext list: one JSON line per input line, duplicates included, " +
      "input order (single.py contract)") {
    val in = Files.createTempFile("domains", ".txt")
    // Seznam.CZ and seznam.cz. are the same canonical domain — the
    // reference still emits one result per input line (single.py:52-59)
    Files.writeString(in, "nic.cz\n\n  \nSeznam.CZ\nexample.cz.\nseznam.cz.\n")
    val out = graft.TmpDirs.create("crawl-out").toString + "/res"
    val work = graft.TmpDirs.create("crawl-work").toString
    CrawlMain.main(Array(in.toString, "--out", out, "--work", work))
    // read part files in name order — the ordered write preserves the
    // line order across the sorted range partitions
    import scala.jdk.CollectionConverters._
    val listing = Files.list(java.nio.file.Paths.get(out))
    val parts = try listing.iterator().asScala.toVector.sortBy(_.toString)
      finally listing.close()
    val lines = parts
      .filter(p => p.getFileName.toString.startsWith("part-") &&
        !p.getFileName.toString.endsWith(".crc"))
      .flatMap(p => Files.readAllLines(p).asScala)
    assert(lines.length == 4) // empty/blank lines ignored; duplicate kept
    assert(lines.forall(l => l.startsWith("{\"domain\":\"") && l.endsWith("}")))
    // input order preserved; canonical domain in the output document
    assert(lines(0).contains("\"domain\":\"nic.cz\""))
    assert(lines(1).contains("\"domain\":\"seznam.cz\""))
    assert(lines(2).contains("\"domain\":\"example.cz\""))
    assert(lines(3).contains("\"domain\":\"seznam.cz\""))
    assert(lines(1) == lines(3)) // same canonical → identical document
    // the golden nic.cz NS set from the reference e2e fixture
    assert(lines(0).contains("a.ns.nic.cz"))
    assert(spark.sparkContext.isStopped == false) // joined session survives
  }

  test("interleaved parquet: frontier loop crawls and resume re-emits identically") {
    import spark.implicits._
    import graft.model.Model.{Doc, Span}
    val docs = (0 until 40).map(i =>
      Doc(f"doc-$i%04d", Seq(Span("text", s"site${i % 25}.cz", null, 0),
        Span("image", null, s"blob://img-$i", 1))))
    val in = graft.TmpDirs.create("crawl-in").toString + "/docs.parquet"
    spark.createDataset(docs).write.parquet(in)
    val work = graft.TmpDirs.create("crawl-work").toString
    val out1 = graft.TmpDirs.create("crawl-out").toString + "/r1"
    CrawlMain.main(Array(in, "--out", out1, "--work", work, "--partitions", "4"))
    val r1 = spark.read.textFile(out1).collect().sorted
    assert(r1.length == 25) // dedup across docs
    // resume: same work dir, nothing new to crawl, identical output
    val out2 = graft.TmpDirs.create("crawl-out").toString + "/r2"
    CrawlMain.main(Array(in, "--out", out2, "--work", work, "--partitions", "4"))
    val r2 = spark.read.textFile(out2).collect().sorted
    assert(r1.sameElements(r2))
  }

  test("--real-timestamps stamps actual UTC wall time; the default stays the fixed deterministic stamp") {
    val in = Files.createTempFile("domains-ts", ".txt")
    Files.writeString(in, "nic.cz\nexample.cz\n")
    def stamps(extra: String*): Seq[String] = {
      val out = graft.TmpDirs.create("ts-out").toString + "/res"
      val work = graft.TmpDirs.create("ts-work").toString
      CrawlMain.main(Array(in.toString, "--out", out, "--work", work) ++ extra)
      spark.read.textFile(out).collect().toSeq
        .map(l => "\"timestamp\":\"([^\"]+)\"".r.findFirstMatchIn(l).get.group(1))
    }
    // default: every document carries the fixed stamp (bit-identical runs)
    assert(stamps().forall(_ == graft.engine.Engine.Clock.fixedStamp))
    // flag: a parseable, current UTC stamp in the reference format
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val now = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
    stamps("--real-timestamps").foreach { s =>
      val t = java.time.LocalDateTime.parse(s, fmt)
      assert(math.abs(java.time.Duration.between(t, now).toMinutes) <= 10,
        s"wall-clock stamp $s not near current UTC $now")
    }
  }

  test("--discover flag: discovered hosts appear in the output beyond the seed set") {
    import spark.implicits._
    import graft.model.Model.{Doc, Span}
    val docs = (0 until 30).map(i =>
      Doc(f"d-$i%04d", Seq(Span("text", s"shop${i % 20}.cz", null, 0))))
    val in = graft.TmpDirs.create("disc-in").toString + "/docs.parquet"
    spark.createDataset(docs).write.parquet(in)
    val work = graft.TmpDirs.create("disc-work").toString
    val out = graft.TmpDirs.create("disc-out").toString + "/r"
    CrawlMain.main(Array(in, "--out", out, "--work", work,
      "--partitions", "4", "--discover-depth", "1"))
    val lines = spark.read.textFile(out).collect()
    assert(lines.length > 20, s"expected discoveries beyond the 20 seeds, got ${lines.length}")
    // every output is still a unique domain (seen-set exactly-once)
    val domains = lines.map(l => l.split("\"domain\":\"")(1).split("\"")(0))
    assert(domains.distinct.length == domains.length)
  }
}
