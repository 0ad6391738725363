package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

class TextOpsSpec extends AnyFunSuite {

  test("lmCoverage: corpus-typical text outscores gibberish; short docs drop out") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    // 8 fluent docs share a trigram distribution; 1 is symbol gibberish
    val fluent = (0 until 8).map(i => (i.toLong, s"the cat sat on the mat $i"))
    val docs = (fluent :+ (8L, "zqx!#@%&*()[]{}~^|\\") :+ (9L, "ab"))
      .toDF("doc_id", "text")
    val out = TextOps.lmCoverage(docs, "doc_id", "text", k = 16)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(!out.contains(9L), "sub-trigram doc must drop out")
    assert(fluent.forall { case (id, _) => out(id) > out(8L) },
      s"fluent docs must outscore gibberish: $out")
    // permille bounds and integer-division exactness on a known case:
    // every doc has a score in [0, 1000]
    assert(out.values.forall(v => v >= 0 && v <= 1000))
  }

  test("lmCoverage model tie-break is deterministic (count desc, trigram asc)") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    // two distinct 3-char docs → every trigram has count 1; k=1 must pick
    // the lexicographically smallest, so only that doc scores 1000
    val docs = Seq((1L, "aaa"), (2L, "bbb")).toDF("doc_id", "text")
    val out = TextOps.lmCoverage(docs, "doc_id", "text", k = 1)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1000L, 1L, 1L), (2L, 0L, 0L, 1L)))
  }

  test("simhash: similar docs have small hamming distance, unrelated large") {
    val base = "the quick brown fox jumps over the lazy dog again and again today".split(" ").toSeq
    val near = base.updated(3, "foxx") // one token changed
    val far = "completely different content about spark shuffle partitions and catalyst".split(" ").toSeq
    val hBase = TextOps.simhash64(base)
    val hNear = TextOps.simhash64(near)
    val hFar = TextOps.simhash64(far)
    assert(TextOps.hamming64(hBase, hNear) < TextOps.hamming64(hBase, hFar))
    assert(TextOps.hamming64(hBase, hNear) <= 16)
    assert(TextOps.simhash64(base) == hBase) // deterministic
  }

  test("rolling fingerprint is stable and shifts only with content") {
    val a = TextOps.rollingFingerprint("The quick brown fox jumps over the lazy dog")
    val b = TextOps.rollingFingerprint("The  quick   brown fox jumps over the lazy dog") // ws-normalized
    assert(a == b)
    val c = TextOps.rollingFingerprint("An entirely different document body here")
    assert(a != c)
  }

  test("langId heuristic on real sentences") {
    assert(TextOps.langId("the cat sat on the mat and it is happy with the result") == "en")
    assert(TextOps.langId("der Hund ist nicht mit der Katze und das ist gut") == "de")
    assert(TextOps.langId("le chat est dans la maison et les enfants sont dans le jardin") == "fr")
    assert(TextOps.langId("el perro es una mascota que vive en la casa como los gatos") == "es")
    assert(TextOps.langId("今天天气很好我们一起去公园散步吧") == "zh")
    assert(TextOps.langId("zzz qqq xxx") == "und")
    assert(TextOps.langId("") == "und")
  }

  test("langStopGate ≡ langIdCol/stopwordRatioMill filter conjunction, row for row") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // adversarial corpus for every when-chain branch: en/de/fr/es winners,
    // score ties (fr-before-en order), zh by CJK ratio, empty text,
    // token-less whitespace, stopword-free text (null ratio), and texts
    // straddling the stop-mill threshold
    val docs = Seq(
      (1L, "the cat is on the mat and it is a cat"),
      (2L, "der hund ist nicht mit der katze und das"),
      (3L, "le chat est dans la maison et les le la"),
      (4L, "el perro es una mascota que vive en la casa"),
      (5L, "the der le el and und et es"), // cross-language tie soup
      (6L, "今天天气很好我们一起去公园散步吧"),
      (7L, ""), (8L, "   \t  "), (9L, "zzz qqq xxx"),
      (10L, "the the the the"), (11L, "the word word word word word word"),
      (12L, "is it to in of a an")).toDF("doc_id", "text")
    for (lang <- Seq("en", "de", "fr", "zh", "und"); mill <- Seq(0L, 60L, 500L)) {
      val fused = docs.where(TextOps.langStopGate(col("text"), lang, mill))
        .select("doc_id").as[Long].collect().sorted
      val twoStep = docs
        .where(TextOps.langIdCol(col("text")) === lang)
        .where(TextOps.stopwordRatioMill(col("text")).cast("long") >= mill)
        .select("doc_id").as[Long].collect().sorted
      assert(fused.sameElements(twoStep), s"lang=$lang mill=$mill: " +
        s"fused=${fused.mkString(",")} twoStep=${twoStep.mkString(",")}")
    }
  }

  test("mix64/hashToken deterministic avalanche") {
    assert(TextOps.mix64(1L) != TextOps.mix64(2L))
    assert(TextOps.hashToken("abc") == TextOps.hashToken("abc"))
    assert(TextOps.hashToken("abc") != TextOps.hashToken("abd"))
  }

  test("column tokenizer/shingles agree with the oracle definition") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("a b c d", "x y", "one").toDF("text")
    val toks = df.select(TextOps.tokenCount(col("text")).as("n")).as[Int].collect()
    assert(toks.toSeq == Seq(4, 2, 1))
    val sh = df.select(TextOps.shingles(col("text"), 3).as("s")).as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Seq.empty) // shorter than k → empty array
    assert(sh(2) == Seq.empty)
  }

  test("repetitionStats: Gopher duplicate-token and top-bigram fractions") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a"),      // 5 toks, 2 distinct → dup 600; bigrams
                              // [a b, b a, a b, b a] → top 2/4 → 500
      (2L, "w x y z"),        // all distinct → dup 0; all bigrams unique → 333
      (3L, "solo"),           // 1 token: no bigrams → nulls
      (4L, "")                // 0 tokens → all null
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(df, "doc_id", "text")
      .as[(Long, Long, Option[Long], Long, Option[Long])].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 5L, Some(600L), 4L, Some(500L))))
    assert(r(2L) == ((2L, 4L, Some(0L), 3L, Some(333L))))
    assert(r(3L) == ((3L, 1L, Some(0L), 0L, None)))
    assert(r(4L) == ((4L, 0L, None, 0L, None)))
  }

  test("scoreWithLexicon / lexiconGate: hand scores, negative weights, broadcast model table") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val weights = Seq(("good", 1000L), ("fine", 500L), ("junk", -2000L))
      .toDF("token", "weight_mill")
    val docs = Seq(
      (1L, "good fine good"),       // sum 2500, n 3 → mean 833
      (2L, "good junk junk"),       // sum -3000, n 3 → mean -1000
      (3L, "unknown words only"),   // sum 0, n 3, n_scored 0
      (4L, "fine"),                 // sum 500, n 1
      (5L, "   ")                   // zero tokens → dropped
    ).toDF("doc_id", "text")
    val scored = TextOps.scoreWithLexicon(docs, "doc_id", "text", weights)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(scored.size == 4 && !scored.contains(5L))
    assert(scored(1L) == ((1L, 3L, 3L, 2500L)))
    assert(scored(2L) == ((2L, 3L, 3L, -3000L)))
    assert(scored(3L) == ((3L, 3L, 0L, 0L)))
    assert(scored(4L) == ((4L, 1L, 1L, 500L)))
    // gate at mean ≥ 400 mills: cross-multiplication handles the negative
    // sum exactly (no floor-division semantics anywhere)
    val kept = TextOps.lexiconGate(docs, "doc_id", "text", weights,
      minMeanMill = 400L).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
    // the model table rides a broadcast join; partitioning-invariant
    val plan = TextOps.scoreWithLexicon(docs, "doc_id", "text", weights)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"lexicon not broadcast:\n$plan")
    val again = TextOps.scoreWithLexicon(docs.repartition(5), "doc_id",
      "text", weights.repartition(2))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(again == scored)
  }

  test("surprisalStats: hand-computed integer-log2 bits; minCount boundary") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    // corpus tokens: a×3, b×1, c×1 → N = 5, bitlen(5) = 3
    // model (minCount 2): a only, bitlen(3) = 2 → a costs 1 bit,
    // unknown b/c cost the full 3 bits
    val docs = Seq(
      (1L, "a a b"),   // bits 1+1+3 = 5, mean 5000 div 3 = 1666
      (2L, "a c"),     // bits 1+3 = 4, mean 2000
      (3L, "  ")       // zero tokens → dropped
    ).toDF("doc_id", "text")
    val got = TextOps.surprisalStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 2 && !got.contains(3L))
    assert(got(1L) == ((1L, 3L, 5L, 1666L)))
    assert(got(2L) == ((2L, 2L, 4L, 2000L)))

    // minCount = 1 admits every token: b/c now cost bitlen(5)−bitlen(1)=2
    val all = TextOps.surprisalStats(docs, "doc_id", "text", minCount = 1L)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(all(1L) == ((1L, 3L, 4L, 1333L)))  // 1+1+2
    assert(all(2L) == ((2L, 2L, 3L, 1500L)))  // 1+2

    // model and corpus-total ride broadcasts; partitioning-invariant
    val plan = TextOps.surprisalStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"model not broadcast:\n$plan")
    val again = TextOps.surprisalStats(docs.repartition(5), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("bm25Rank: hand-computed fixed-point scores, saturation, length norm") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    // N=3, Σdl=9, avgdl_mill=3000; df: apple/banana 2 (idf 600),
    // cherry/date 1 (idf 1666); norm_mill: dl3→1000, dl4→1249, dl2→749
    val docs = Seq((1L, "apple banana banana"),
      (2L, "apple apple apple cherry"), (3L, "banana date"),
      (4L, "   ")).toDF("doc_id", "text")
    val qs = Seq(("qa", "apple cherry"), ("qb", "banana")).toDF("query_id", "qtext")
    val got = TextOps.bm25Rank(docs, "doc_id", "text", qs)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // qa: d2 = 600*1467/1000 + 1666*880/1000 = 880+1466 = 2346 (2 terms);
    //     d1 = 600*1000/1000 = 600; d3 absent (no query term)
    // qb: d1 = 600*1375/1000 = 825 (tf 2 saturated); d3 = 600*1159/1000 = 695
    assert(got == Set(
      ("qa", 1L, 2L, 2346L, 2L), ("qa", 2L, 1L, 600L, 1L),
      ("qb", 1L, 1L, 825L, 1L), ("qb", 2L, 3L, 695L, 1L)))
    assert(!got.exists(_._3 == 4L), "zero-token doc must never match")

    // k caps per query, keeping the top rank only
    val top1 = TextOps.bm25Rank(docs, "doc_id", "text", qs, k = 1)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(top1 == got.filter(_._2 == 1L))

    // partitioning-invariant; query terms + df model + corpus stats all
    // ride broadcasts
    val again = TextOps.bm25Rank(docs.repartition(5), "doc_id", "text",
      qs.repartition(3)).as[(String, Long, Long, Long, Long)].collect().toSet
    assert(again == got)
    val plan = TextOps.bm25Rank(docs, "doc_id", "text", qs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast joins:\n$plan")
  }

  test("bm25Rank: rare-term docs outrank common-term docs at equal tf") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    // 'rare' appears in 1 of 6 docs, 'common' in all 6; equal dl and tf ⇒
    // the idf (RSJ odds, monotone in df) alone decides the order
    val docs = ((1L, "rare common pad") +:
      (2L to 6L).map(i => (i, "xx common pad"))).toDF("doc_id", "text")
    val qs = Seq(("q", "rare common")).toDF("query_id", "qtext")
    val out = TextOps.bm25Rank(docs, "doc_id", "text", qs, k = 6)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(out.head._3 == 1L, s"rare-term doc must rank first: ${out.toSeq}")
    assert(out.head._4 > out(1)._4)
  }
}
