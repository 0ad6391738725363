package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CurationOps, DedupOps, TextOps}

/** End-to-end crawl → training-data pipeline: the library's two halves in
  * one flow. Crawl a synthetic universe, span-encode the results, turn
  * each domain's span sequence into a text document, then run the
  * curation stages a corpus builder would: cross-document boilerplate-line
  * removal (the crawl analog of C4's rule — shared header/config lines
  * like `server: nginx` appear in most domains and carry no per-domain
  * signal), fingerprint dedup, and sequence-packing assignment. Asserts
  * semantic invariants and bit-determinism of the whole chain.
  */
class PipelineIntegrationSpec extends AnyFunSuite {
  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def crawlDocs() = {
    val u = new graft.universe.Universe(42L)
    val eng = new graft.engine.Engine(spark, u,
      workDir = graft.TmpDirs.create("pipe-int").toString)
    val seeds = spark.createDataset((0L until 100L).map(u.seedDomain))
    eng.crawlDomains(seeds)
      .map(graft.spans.SpanCodec.encode)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .where(col("s.text").isNotNull)
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("s.offset"), col("s.kind"), col("s.text")))),
          x => concat(x.getField("kind"), lit(": "), x.getField("text"))),
        "\n").as("body"))
  }

  test("crawl -> boilerplate-line removal -> dedup -> packing, deterministic") {
    val docs = crawlDocs().cache()
    val n = docs.count()
    // a few seeds canonicalize to the same domain; first-enqueue dedup
    // collapses them (expected) — 95 distinct domains from 100 seeds
    assert(n >= 90L, s"crawled $n")

    // 1. boilerplate: lines shared by >= 30% of domains vanish (server
    // headers, shared nameserver records); per-domain lines survive
    val cleaned = CurationOps.dropCommonLines(docs, "doc_id", "body",
      minDocFreq = 30).cache()
    val rows = cleaned.as[(String, String, Long)].collect()
    assert(rows.length == n, "no domain is pure boilerplate")
    val droppedSomething = docs.as[(String, String)].collect().toMap
    for ((id, kept, nKept) <- rows) {
      val orig = droppedSomething(id).split("\n").length
      assert(nKept < orig, s"$id: nothing dropped ($nKept of $orig)")
      assert(nKept >= 1 && kept.nonEmpty)
    }

    // 2. fingerprint dedup over the CLEANED text: every domain's residue
    // is unique in this universe (per-domain hex page ids, ips, certs)
    val deduped = DedupOps.dedupedCorpus(
      cleaned.select(col("doc_id"), col("clean_text").as("text")),
      "doc_id", "text")
    assert(deduped.count() == n, "cleaned profiles must stay distinct")

    // 3. packing assignment over cleaned token counts: bijection + packs
    val packed = CurationOps.packSequences(
      cleaned.select(xxhash64(col("doc_id")).as("doc_id"),
        col("clean_text").as("text")),
      "doc_id", "text", tokenBudget = 512, strata = 4)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(packed.length == n)
    assert(packed.forall(r => r._3 > 0 && r._5 == r._4 / 512))

    // 4. the WHOLE chain is deterministic: a second crawl + pipeline run
    // produces byte-identical cleaned output
    val digest = md5Of(rows.sortBy(_._1).mkString("\u0000"))
    val again = CurationOps.dropCommonLines(crawlDocs(), "doc_id", "body",
      minDocFreq = 30).as[(String, String, Long)].collect()
    assert(md5Of(again.sortBy(_._1).mkString("\u0000")) == digest)
    docs.unpersist(); cleaned.unpersist()
  }

  test("crawl -> htmlToText -> vocabulary; hostRank over the discovered link graph") {
    import graft.ops.LinkOps
    // the crawl stores fetched HTML verbatim (reference behavior); the
    // corpus pipeline re-extracts prose and link structure at read time
    def crawlSpans() = {
      val u = new graft.universe.Universe(42L)
      // save_content is off by default (reference library default) — a
      // corpus-building crawl turns it on, or there is no HTML to extract
      val eng = new graft.engine.Engine(spark, u,
        cfg = graft.probes.CrawlConfig(saveContent = true),
        workDir = graft.TmpDirs.create("pipe-web").toString)
      val seeds = spark.createDataset((0L until 100L).map(u.seedDomain))
      eng.crawlDomains(seeds)
        .map(graft.spans.SpanCodec.encode)
        .select(col("doc_id"), explode(col("spans")).as("s"))
        .where(col("s.text").isNotNull)
        .select(col("doc_id"), col("s.kind").as("kind"), col("s.text").as("text"))
    }
    val spans = crawlSpans().cache()

    // 1. HTML re-extraction: every stored text/html body loses its markup
    val contents = spans
      .where(col("kind").endsWith(".content") && col("text").contains("<html"))
      .select(col("doc_id"), TextOps.htmlToText(col("text")).as("plain"))
      .cache()
    val plains = contents.as[(String, String)].collect()
    assert(plains.nonEmpty, "crawl produced no HTML bodies")
    assert(plains.forall { case (_, p) =>
      p.nonEmpty && !p.contains("<html") && !p.contains("</") }, "markup survived")

    // 2. vocabulary over the extracted prose: the universe's page bodies
    // all start "page <hex>", so "page" is the corpus's top token
    val vocab = TextOps.vocabulary(
      contents.toDF("doc_id", "text"), "text", minCount = 1L, topN = 3)
      .as[(String, Long)].collect()
    assert(vocab.nonEmpty && vocab.head._1 == "page", s"vocab: ${vocab.toSeq}")

    // 3. hostRank over the link graph the crawl itself surfaced (the same
    // span text the frontier-discovery hook reads): deterministic ranks,
    // teleport floor respected, linked hosts above pure-dangling mass
    def edges(sp: org.apache.spark.sql.DataFrame) = sp
      .select(col("doc_id").as("src"),
        explode(LinkOps.extractedHosts(col("text"))).as("dst"))
    val ranks = LinkOps.hostRank(edges(spans), "src", "dst", iters = 2)
      .as[(String, Long)].collect().sortBy(_._1)
    assert(ranks.nonEmpty)
    assert(ranks.forall(_._2 >= 150000L), "teleport floor violated")
    assert(ranks.map(_._2).max > 150000L, "no host accumulated any rank")
    // whole-chain determinism: a second crawl yields identical rank bytes
    val again = LinkOps.hostRank(edges(crawlSpans()), "src", "dst", iters = 2)
      .as[(String, Long)].collect().sortBy(_._1)
    assert(md5Of(again.mkString("\u0000")) == md5Of(ranks.mkString("\u0000")))
    spans.unpersist(); contents.unpersist()
  }

  test("crawl -> htmlToText -> BPE training loop: learned merges encode the crawl corpus") {
    import graft.ops.TrainPrepOps
    // tokenizer training over the crawl's own extracted prose: the loop
    // finds the corpus's repeated adjacent pairs (the diacritics tail a
    // slice of universe pages shares), the encoded stream shrinks, no
    // learned rule survives its own fixed point, and the whole chain is
    // deterministic across two independent crawls
    def prose() = {
      val u = new graft.universe.Universe(42L)
      val eng = new graft.engine.Engine(spark, u,
        cfg = graft.probes.CrawlConfig(saveContent = true),
        workDir = graft.TmpDirs.create("pipe-bpe").toString)
      val seeds = spark.createDataset((0L until 100L).map(u.seedDomain))
      eng.crawlDomains(seeds)
        .map(graft.spans.SpanCodec.encode)
        .select(col("doc_id"), explode(col("spans")).as("s"))
        .where(col("s.text").isNotNull && col("s.kind").endsWith(".content")
          && col("s.text").contains("<html"))
        .select(col("doc_id"), TextOps.htmlToText(col("s.text")).as("text"))
    }
    val docs = prose().cache()
    val learned = TrainPrepOps.learnMerges(docs, "text",
      nMerges = 4, minCount = 2L)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(learned.nonEmpty, "no merges learnable over crawl prose")
    val enc = TrainPrepOps.applyMerges(docs, "doc_id", "text",
      learned.map(r => (r._2, r._3))).cache()
    val before = docs.select(sum(size(TextOps.tokens(col("text")))))
      .as[Long].head()
    val after = enc.select(sum(col("n_tokens"))).as[Long].head()
    assert(after < before, s"encoding did not shrink: $before -> $after")
    // every learned rule is at its fixed point in the final stream
    val remaining = TrainPrepOps.mergePairCandidates(
      enc.select(col("doc_id"), array_join(col("toks"), " ").as("text")),
      "text", minCount = 1L, topN = 100000)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(learned.forall(r => !remaining.contains((r._2, r._3))),
      s"a learned rule still matches after encoding: $learned")
    // determinism: a fresh crawl trains the identical merge list
    val again = TrainPrepOps.learnMerges(prose(), "text",
      nMerges = 4, minCount = 2L)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(again == learned)
    docs.unpersist(); enc.unpersist()
  }

  test("crawl -> htmlToText -> hashEmbed -> cosine top-1: edited queries find their source page") {
    import graft.ops.SimilarityOps
    // the model-free text→vector bridge over the crawl's own prose: embed
    // every extracted page, then query with lightly-edited copies — the
    // nearest corpus neighbor of each edit must be its source page
    val u = new graft.universe.Universe(42L)
    val eng = new graft.engine.Engine(spark, u,
      cfg = graft.probes.CrawlConfig(saveContent = true),
      workDir = graft.TmpDirs.create("pipe-embed").toString)
    val seeds = spark.createDataset((0L until 100L).map(u.seedDomain))
    // several content spans per domain (one per web step) → one prose doc
    // per domain, span order canonicalized
    val docs = eng.crawlDomains(seeds)
      .map(graft.spans.SpanCodec.encode)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .where(col("s.text").isNotNull && col("s.kind").endsWith(".content")
        && col("s.text").contains("<html"))
      .select(col("doc_id"), TextOps.htmlToText(col("s.text")).as("plain"))
      .groupBy(col("doc_id"))
      .agg(array_join(array_sort(collect_list(col("plain"))), " ").as("text"))
      .cache()
    val nDocs = docs.count()
    assert(nDocs >= 90, s"only $nDocs domains produced HTML prose")
    val corpus = SimilarityOps.hashEmbed(docs, "doc_id", "text", dims = 64)
      .withColumnRenamed("embedding_h", "vec").cache()
    assert(corpus.count() == nDocs, "a domain's prose embedded empty")
    val sample = docs.orderBy(col("doc_id")).limit(5)
      .as[(String, String)].collect()
    val queries = sample.map { case (id, text) =>
      ("edit-" + id, text + " novel marker tokens appended")
    }.toSeq.toDF("doc_id", "text")
    val qvecs = SimilarityOps.hashEmbed(queries, "doc_id", "text", dims = 64)
      .withColumnRenamed("embedding_h", "vec")
    val top1 = SimilarityOps.bruteForceTopK(corpus, qvecs, "doc_id", "vec",
      k = 1).as[(String, String, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    sample.foreach { case (id, _) =>
      assert(top1("edit-" + id) == id,
        s"edited $id retrieved ${top1("edit-" + id)}")
    }
    docs.unpersist(); corpus.unpersist()
  }

  test("crawl -> vocabulary-trained lexicon -> lexiconGate: model-as-table over crawl prose") {
    // the q84 classifier shape trained from the corpus itself: vocabulary
    // counts become the weight table (a corpus-frequency prior — docs of
    // common tokens score high, hex-id-heavy docs score low), then the
    // gate filters the same prose the weights were fit on
    val u = new graft.universe.Universe(42L)
    val eng = new graft.engine.Engine(spark, u,
      cfg = graft.probes.CrawlConfig(saveContent = true),
      workDir = graft.TmpDirs.create("pipe-lex").toString)
    val seeds = spark.createDataset((0L until 100L).map(u.seedDomain))
    val docs = eng.crawlDomains(seeds)
      .map(graft.spans.SpanCodec.encode)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .where(col("s.text").isNotNull && col("s.kind").endsWith(".content")
        && col("s.text").contains("<html"))
      .select(col("doc_id"), TextOps.htmlToText(col("s.text")).as("plain"))
      .groupBy(col("doc_id"))
      .agg(array_join(array_sort(collect_list(col("plain"))), " ").as("text"))
      .cache()
    val weights = TextOps.vocabulary(docs, "text", minCount = 1L,
        topN = 100000)
      .select(col("token"), col("cnt").as("weight_mill")).cache()
    val scored = TextOps.scoreWithLexicon(docs, "doc_id", "text", weights)
      .as[(String, Long, Long, Long)].collect()
    // the lexicon was fit on this corpus, so it knows EVERY token
    assert(scored.nonEmpty && scored.forall(r => r._3 == r._2),
      "a corpus-fit lexicon missed a corpus token")
    // gate ≡ the manual filter at the corpus's own median mean-weight
    val means = scored.map(r => r._4.toDouble / r._2).sorted
    val cut = math.ceil(means(means.length / 2)).toLong
    val kept = TextOps.lexiconGate(docs, "doc_id", "text", weights, cut)
      .select("doc_id").as[String].collect().toSet
    val expect = scored.filter(r => r._4 >= cut * r._2).map(_._1).toSet
    assert(kept == expect)
    assert(kept.nonEmpty && kept.size < scored.length,
      s"degenerate split: ${kept.size} of ${scored.length}")
    docs.unpersist(); weights.unpersist()
  }

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
}
