package graft

import org.apache.spark.sql.functions.{array_join, col}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{TextOps, TrainPrepOps}

/** Tokenizer-training prep: incremental vocabulary ledgers
  * ([[TrainPrepOps.vocabularyCounts]]/[[TrainPrepOps.mergeVocabCounts]]),
  * BPE merge-pair candidates, and fixed-point label centroids. Expected
  * values are hand-computed.
  */
class TrainPrepSpec extends AnyFunSuite {

  private def spark = SparkSessionFixture.spark

  test("vocab ledger: merge of batch counts ≡ one-pass counts; cut only at read") {
    val s = spark; import s.implicits._
    val h1 = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val h2 = Seq((3L, "a d")).toDF("doc_id", "text")
    val full = h1.union(h2)
    val merged = TrainPrepOps.mergeVocabCounts(
      TrainPrepOps.vocabularyCounts(h1, "text"),
      TrainPrepOps.vocabularyCounts(h2, "text"))
      .as[(String, Long)].collect().toMap
    val onePass = TrainPrepOps.vocabularyCounts(full, "text")
      .as[(String, Long)].collect().toMap
    assert(merged == onePass && merged == Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
    // the cut ledger matches the one-shot vocabulary operator
    val cut = TrainPrepOps.cutVocab(
      TrainPrepOps.mergeVocabCounts(
        TrainPrepOps.vocabularyCounts(h1, "text"),
        TrainPrepOps.vocabularyCounts(h2, "text")), minCount = 2L, topN = 10)
      .as[(String, Long)].collect().toSet
    val oneShot = TextOps.vocabulary(full, "text", minCount = 2L, topN = 10)
      .as[(String, Long)].collect().toSet
    assert(cut == oneShot && cut == Set(("a", 3L), ("b", 2L)))
    // PIN: cutting BEFORE merging loses counts forever — a-count drops to
    // 2 and the h2-only tokens vanish if the ledger is stored cut
    val wrong = TrainPrepOps.mergeVocabCounts(
      TrainPrepOps.cutVocab(TrainPrepOps.vocabularyCounts(h1, "text"), 2L, 10),
      TrainPrepOps.cutVocab(TrainPrepOps.vocabularyCounts(h2, "text"), 2L, 10))
      .as[(String, Long)].collect().toMap
    assert(wrong == Map("a" -> 2L, "b" -> 2L), s"cut-then-merge must differ: $wrong")
  }

  test("mergePairCandidates: adjacent pairs, threshold, deterministic cut") {
    val s = spark; import s.implicits._
    // "a b a b" → (a,b)×2, (b,a)×1; "b a" → (b,a)×1; "c" → none
    val docs = Seq((1L, "a b a b"), (2L, "c"), (3L, "b a")).toDF("doc_id", "text")
    val out = TrainPrepOps.mergePairCandidates(docs, "text", minCount = 2L, topN = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(out.toSet == Set(("a", "b", 2L), ("b", "a", 2L)))
    // tie on cnt breaks lhs asc: topN=1 keeps (a,b)
    val top1 = TrainPrepOps.mergePairCandidates(docs, "text", 2L, 1)
      .as[(String, String, Long)].collect().toSeq
    assert(top1 == Seq(("a", "b", 2L)))
    // partitioning-invariant
    val again = TrainPrepOps.mergePairCandidates(docs.repartition(5), "text", 2L, 10)
      .as[(String, String, Long)].collect().toSet
    assert(again == out.toSet)
  }

  test("labelCentroids: fixed-point means, negative floor, unlabeled drop") {
    val s = spark; import s.implicits._
    val embs = Seq(
      (1L, Seq(1.0f, -0.5f)), (2L, Seq(0.5f, 0.5f)),   // label x
      (3L, Seq(2.0f, 0.0f)),                            // label y
      (5L, Seq(9.0f, 9.0f))                             // no label → dropped
    ).toDF("vec_id", "embedding")
    val labels = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "source")
    val out = TrainPrepOps.labelCentroids(embs, "vec_id", "embedding",
      labels, "doc_id", "source")
      .as[(String, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    // x: pos0 (1048576 + 524288)/2 = 786432; pos1 (-524288 + 524288)/2 = 0
    assert(out == Seq(("x", 2L, Seq(786432L, 0L)), ("y", 1L, Seq(2097152L, 0L))))
    // negative component floors toward -inf at quantization time:
    // -0.3f promotes to -0.30000001192092896 → floor(·2^20) = -314573
    val neg = Seq((7L, Seq(-0.3f))).toDF("vec_id", "embedding")
    val nl = Seq((7L, "z")).toDF("doc_id", "source")
    val nOut = TrainPrepOps.labelCentroids(neg, "vec_id", "embedding",
      nl, "doc_id", "source").as[(String, Long, Seq[Long])].collect().head
    assert(nOut == (("z", 1L, Seq(-314573L))))
    // partitioning-invariant (associative fixed-point sums)
    val again = TrainPrepOps.labelCentroids(embs.repartition(7), "vec_id",
      "embedding", labels, "doc_id", "source")
      .as[(String, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(again == out)
  }

  test("centroidOutliers: BIGINT distances, desc rank with id-asc ties, singleton zero") {
    val s = spark; import s.implicits._
    // label a: (0,0), (1,0), (0.5,0) → centroid_q = (524288, 0); the two
    // extremes are EQUIDISTANT ((524288)^2) and tie-break id-asc; the
    // midpoint is at distance 0. label b: singleton sits ON its centroid.
    val embs = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.5f, 0.0f)),
      (4L, Seq(7.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val labels = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("doc_id", "source")
    val d = 524288L * 524288L
    val got = TrainPrepOps.centroidOutliers(embs, "vec_id", "embedding",
        labels, "doc_id", "source", topK = 2)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(got == Seq(
      ("a", 1L, d, 1L), ("a", 2L, d, 2L), ("b", 4L, 0L, 1L)))
    // topK = 1 keeps only the id-asc tie winner per label
    val top1 = TrainPrepOps.centroidOutliers(embs, "vec_id", "embedding",
        labels, "doc_id", "source", topK = 1)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(top1 == Seq(("a", 1L, d, 1L), ("b", 4L, 0L, 1L)))
    // centroids ride a broadcast; partitioning-invariant
    val plan = TrainPrepOps.centroidOutliers(embs, "vec_id", "embedding",
      labels, "doc_id", "source").queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"centroids not broadcast:\n$plan")
    val again = TrainPrepOps.centroidOutliers(embs.repartition(5), "vec_id",
        "embedding", labels.repartition(3), "doc_id", "source", topK = 2)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(again == got)
  }

  test("applyMerges: greedy l-t-r, rule order, merged symbols feed later rules") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the cat the cat cat"), // a≠b: every match merges
      (2L, "a b c"), // rule chain: (a,b) → ab, then (ab,c) → abc
      (3L, "a a b b"), // merged 'ab' must NOT retro-match (a,b) in-pass
      (4L, "   ") // zero tokens → dropped
    ).toDF("doc_id", "text")
    val out = TrainPrepOps.applyMerges(docs, "doc_id", "text",
      Seq("the" -> "cat", "a" -> "b", "ab" -> "c"))
      .as[(Long, Seq[String], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      1L -> ((Seq("thecat", "thecat", "cat"), 3L)),
      2L -> ((Seq("abc"), 1L)),
      3L -> ((Seq("a", "ab", "b"), 3L))))
  }

  test("applyMerges: a==b rule merges run pairs at even offsets") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "x a a a x"), // odd run: ⌊3/2⌋=1 pair, trailing a survives
      (2L, "a a a a"), // even run: two pairs
      (3L, "a"), // no pair
      (4L, "b a a") // run at end of stream
    ).toDF("doc_id", "text")
    val out = TrainPrepOps.applyMerges(docs, "doc_id", "text",
      Seq("a" -> "a"))
      .as[(Long, Seq[String], Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(out == Map(
      1L -> Seq("x", "aa", "a", "x"),
      2L -> Seq("aa", "aa"),
      3L -> Seq("a"),
      4L -> Seq("b", "aa")))
  }

  test("applyMerges ≡ reference greedy fold on exhaustive {a,b}^≤6 streams") {
    val s = spark; import s.implicits._
    // the one executable definition of greedy left-to-right non-overlap
    def mergeRef(toks: List[String], a: String, b: String): List[String] = {
      @annotation.tailrec
      def go(rest: List[String], acc: List[String]): List[String] =
        rest match {
          case x :: y :: t if x == a && y == b => go(t, (a + b) :: acc)
          case x :: t => go(t, x :: acc)
          case Nil => acc.reverse
        }
      go(toks, Nil)
    }
    val rules = Seq("a" -> "a", "a" -> "b", "ab" -> "aa")
    def all(n: Int): Seq[List[String]] =
      if (n == 0) Seq(Nil)
      else all(n - 1).flatMap(t => Seq("a" :: t, "b" :: t))
    val streams = (1 to 6).flatMap(all) // 126 streams, both rule shapes
    val expected = streams.zipWithIndex.map { case (t, i) =>
      i.toLong -> rules.foldLeft(t) { case (cur, (a, b)) => mergeRef(cur, a, b) }
    }.toMap
    val docs = streams.zipWithIndex
      .map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = TrainPrepOps.applyMerges(docs, "doc_id", "text", rules)
      .as[(Long, Seq[String], Long)].collect()
      .map(r => r._1 -> r._2.toList).toMap
    assert(got == expected)
  }

  test("learnMerges: hand-computed rounds, early stop below minCount") {
    val s = spark; import s.implicits._
    // round 1: (a,b)×3 beats (a,a)×2; after merging, every remaining pair
    // is unique, so minCount=2 stops the loop after one rule.
    val docs = Seq((1L, "a a a b"), (2L, "a b c a b")).toDF("doc_id", "text")
    val learned = TrainPrepOps.learnMerges(docs, "text", nMerges = 3,
      minCount = 2L).as[(Int, String, String, Long)].collect().toSeq
    assert(learned == Seq((1, "a", "b", 3L)))
  }

  test("learnMerges: ties break (lhs, rhs) asc; a==b rules learnable in-loop") {
    val s = spark; import s.implicits._
    // minCount=1 continues past the hand-verified round 1: round-2
    // candidates all count 1 — (a,a) wins the tie on lhs asc (the a==b
    // shape, selected by the LOOP not pinned by the caller); round 3 then
    // sees the merged 'aa' symbol.
    val docs = Seq((1L, "a a a b"), (2L, "a b c a b")).toDF("doc_id", "text")
    val learned = TrainPrepOps.learnMerges(docs, "text", nMerges = 3,
      minCount = 1L).as[(Int, String, String, Long)].collect().toSeq
    assert(learned == Seq((1, "a", "b", 3L), (2, "a", "a", 1L),
      (3, "aa", "ab", 1L)))
    // prefix consistency: a shorter run is a prefix of a longer one
    for (k <- 1 to 2) {
      val pre = TrainPrepOps.learnMerges(docs, "text", nMerges = k,
        minCount = 1L).as[(Int, String, String, Long)].collect().toSeq
      assert(pre == learned.take(k), s"nMerges=$k not a prefix: $pre")
    }
    // partitioning invariance: exact counts + total-order argmax
    val again = TrainPrepOps.learnMerges(docs.repartition(7), "text",
      nMerges = 3, minCount = 1L)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(again == learned)
  }

  test("learnMerges ∘ applyMerges agree: encoding k rules, the next " +
      "candidate argmax IS the (k+1)-th learned rule") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "a b c a b")).toDF("doc_id", "text")
    val learned = TrainPrepOps.learnMerges(docs, "text", nMerges = 3,
      minCount = 1L).as[(Int, String, String, Long)].collect().toSeq
    for (k <- 0 to 2) {
      val enc =
        if (k == 0) docs.select(col("doc_id"), col("text"))
        else TrainPrepOps.applyMerges(docs, "doc_id", "text",
          learned.take(k).map(r => r._2 -> r._3))
          .select(col("doc_id"), array_join(col("toks"), " ").as("text"))
      val next = TrainPrepOps.mergePairCandidates(enc, "text",
        minCount = 1L, topN = 1)
        .as[(String, String, Long)].collect().head
      assert((learned(k)._2, learned(k)._3, learned(k)._4) == next,
        s"after $k rules, argmax $next != learned round ${k + 1}")
    }
  }

  test("learnMerges: reliable checkpointDir ≡ localCheckpoint default, " +
      "round files land in the dir") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "a b c a b")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("learn-ckpt").toString
    val viaDir = TrainPrepOps.learnMerges(docs, "text", nMerges = 3,
      minCount = 1L, checkpointDir = Some(dir))
      .as[(Int, String, String, Long)].collect().toSeq
    val viaLocal = TrainPrepOps.learnMerges(docs, "text", nMerges = 3,
      minCount = 1L).as[(Int, String, String, Long)].collect().toSeq
    assert(viaDir == viaLocal)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, "no checkpoint files written")
  }

  test("applyMerges is scan-local: no Exchange at any rule count") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b a a")).toDF("doc_id", "text")
    val plan = TrainPrepOps.applyMerges(docs, "doc_id", "text",
      Seq("a" -> "a", "a" -> "b", "aa" -> "ab"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"applyMerges plan shuffles:\n$plan")
  }

  test("pmiBigrams: hand-computed bitlen-sum PMI, deterministic cut order, minCount") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    // unigrams a:3 b:3 c,d,x,y:1, N1=10 (bitlen 4); bigrams ab:3 ba,bc,
    // cd,bx,xy:1, N2=8 (bitlen 4)
    val docs = Seq((1L, "a b a b c d"), (2L, "a b x y")).toDF("doc_id", "text")
    val got = graft.ops.TrainPrepOps.pmiBigrams(docs, "text", minCount = 1L,
        topN = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    // pmi_bits = bl(cnt) + 2·4 − 4 − bl(c_lhs) − bl(c_rhs)
    assert(got == Seq(
      ("c", "d", 1L, 3L), ("x", "y", 1L, 3L),   // 1+8−4−1−1
      ("a", "b", 3L, 2L),                        // 2+8−4−2−2, cnt 3 first
      ("b", "c", 1L, 2L), ("b", "x", 1L, 2L),   // 1+8−4−2−1
      ("b", "a", 1L, 1L)), s"got $got")          // 1+8−4−2−2
    // minCount drops the hapax tail; N2 still totals ALL bigrams
    val cut = graft.ops.TrainPrepOps.pmiBigrams(docs, "text", minCount = 2L,
        topN = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(cut == Seq(("a", "b", 3L, 2L)))
    // partitioning-invariant; totals ride broadcasts
    val again = graft.ops.TrainPrepOps.pmiBigrams(docs.repartition(5), "text",
        minCount = 1L, topN = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(again == got)
  }
}
