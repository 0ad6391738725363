package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CurationOps, SimilarityOps, TextOps}

/** Pipeline statistics operators: the per-source data card
  * ([[CurationOps.sourceStats]]), rational-tf-idf keyword extraction
  * ([[TextOps.tfidfTopTerms]]), and int8 embedding quantization
  * ([[SimilarityOps.quantizeInt8]]). Expected values are hand-computed.
  */
class PipelineStatsSpec extends AnyFunSuite {

  private def spark = SparkSessionFixture.spark

  test("sourceStats: hand-computed card (volume, dup copies, mean mill)") {
    val s = spark; import s.implicits._
    // source a: docs 1,2 are exact dups ("the cat", mill 500 each),
    //           doc 3 "dog" mill 0 → n_docs 3, n_tokens 5, n_dup 1,
    //           mean = (500+500+0) div 3 = 333
    // source b: "the the" mill 1000, "x" mill 0 → mean 500, no dups
    val docs = Seq(
      (1L, "the cat", "a"), (2L, "the cat", "a"), (3L, "dog", "a"),
      (4L, "the the", "b"), (5L, "x", "b")).toDF("doc_id", "text", "source")
    val out = CurationOps.sourceStats(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a", 3L, 5L, 1L, 333L), ("b", 2L, 3L, 0L, 500L)))
    // dup detection is whitespace/case-normalized (normFingerprint)
    val norm = Seq((1L, "The  Cat", "a"), (2L, "the cat", "a"))
      .toDF("doc_id", "text", "source")
    val n = CurationOps.sourceStats(norm, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(n._4 == 1L, s"normalized dup not counted: $n")
  }

  test("tfidfTopTerms: rational idf ranks distinctive terms above stopwords") {
    val s = spark; import s.implicits._
    // N=3; df(the)=3, df(apple)=df(banana)=df(cherry)=1
    // d1: apple tf2 score 2*(3 div 1)=6 > the score 1*(3 div 3)=1
    val docs = Seq(
      (1L, "apple apple the"), (2L, "banana the"), (3L, "the cherry"))
      .toDF("doc_id", "text")
    val top1 = TextOps.tfidfTopTerms(docs, "doc_id", "text", topK = 1)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(top1 == Seq((1L, "apple", 2L, 6L, 1L), (2L, "banana", 1L, 3L, 1L),
      (3L, "cherry", 1L, 3L, 1L)))
    // topK=2 exposes the stopword at rank 2
    val top2 = TextOps.tfidfTopTerms(docs, "doc_id", "text", topK = 2)
      .as[(Long, String, Long, Long, Long)].collect()
      .filter(_._1 == 1L).sortBy(_._5).toSeq
    assert(top2 == Seq((1L, "apple", 2L, 6L, 1L), (1L, "the", 1L, 1L, 2L)))
    // total tie (same score, same tf) breaks on token asc
    val tie = Seq((1L, "kiwi lime")).toDF("doc_id", "text")
    val t = TextOps.tfidfTopTerms(tie, "doc_id", "text", topK = 2)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._5).toSeq
    assert(t.map(r => (r._2, r._5)) == Seq(("kiwi", 1L), ("lime", 2L)))
  }

  test("quantizeInt8: hand-computed bytes, zero-vector guard, error bound") {
    val s = spark; import s.implicits._
    val embs = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f)),
      (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(-2.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.quantizeInt8(embs, "vec_id", "embedding")
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 1000000L, Seq(127L, -64L, 31L)),   // floor(-63.5) = -64
      (2L, 0L, Seq(0L, 0L)),
      (3L, 2000000L, Seq(-127L, 63L))))       // floor(63.5) = 63
    // dequantization error ≤ s/127 per component
    for ((id, sm, q) <- out if sm > 0) {
      val sc = sm / 1e6
      val orig = embs.where(org.apache.spark.sql.functions.col("vec_id") === id)
        .as[(Long, Seq[Float])].collect().head._2
      orig.zip(q).foreach { case (v, qi) =>
        assert(math.abs(v - qi * sc / 127.0) <= sc / 127.0 + 1e-9,
          s"vec $id component $v → $qi exceeds error bound")
      }
    }
  }

  // independent implementation of hashEmbed's bucket/sign rule
  // (java.security directly, not Spark expressions) — validates the
  // expression tree in the tests below
  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def bucketSign(t: String, dims: Int): (Int, Long) = {
    val h = md5hex(t)
    (Integer.parseInt(h.substring(0, 4), 16) % dims,
      if (Integer.parseInt(h.substring(4, 5), 16) % 2 == 0) 1L else -1L)
  }
  private def refEmbed(text: String, dims: Int): Option[Seq[Long]] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) None
    else {
      val v = Array.fill(dims)(0L)
      toks.foreach { t => val (b, sg) = bucketSign(t, dims); v(b) += sg }
      Some(v.toSeq)
    }
  }

  test("hashEmbed: bucket/sign plumbing vs an independent md5, additivity, invariance") {
    val s = spark; import s.implicits._
    val dims = 16
    val docs = Seq(
      (1L, "alpha"),                  // single token → one ±1 component
      (2L, "alpha alpha"),            // doubled → ±2 at the same bucket
      (3L, "alpha beta gamma delta"),
      (4L, "beta gamma"),
      (5L, "   ")                     // zero tokens → dropped
    ).toDF("doc_id", "text")
    val out = SimilarityOps.hashEmbed(docs, "doc_id", "text", dims = dims)
      .as[(Long, Seq[Long])].collect().toMap
    assert(!out.contains(5L) && out.size == 4)
    assert(out.values.forall(_.length == dims))
    def expected(toks: Seq[String]): Seq[Long] = {
      val v = Array.fill(dims)(0L)
      toks.foreach { t => val (b, sg) = bucketSign(t, dims); v(b) += sg }
      v.toSeq
    }
    assert(out(1L) == expected(Seq("alpha")))
    assert(out(1L).map(math.abs).sum == 1L)
    assert(out(2L) == expected(Seq("alpha", "alpha")))
    assert(out(3L) == expected(Seq("alpha", "beta", "gamma", "delta")))
    // additivity: signed counts of a concatenation are the component sums
    val concat = Seq((6L, "alpha beta gamma delta beta gamma")).toDF("doc_id", "text")
    val c = SimilarityOps.hashEmbed(concat, "doc_id", "text", dims = dims)
      .as[(Long, Seq[Long])].collect().head._2
    assert(c == out(3L).zip(out(4L)).map { case (a, b) => a + b })
    // partitioning-invariant
    val again = SimilarityOps.hashEmbed(docs.repartition(7), "doc_id", "text",
      dims = dims).as[(Long, Seq[Long])].collect().toMap
    assert(again == out)
  }

  test("hashEmbed property: 300 random docs (incl. non-ASCII tokens) match the reference") {
    val s = spark; import s.implicits._
    // seeded random corpus, one Spark pass, every row checked against the
    // java.security reference (the CurationPropertySpec discipline);
    // non-ASCII words pin the UTF-8-bytes hashing contract
    val rnd = new scala.util.Random(20260819)
    val dims = 32
    val words = (0 until 50).map(i => s"w$i") ++
      Seq("é", "žluťoučký", "naïve", "文字", "кирилица")
    val docs = (1L to 300L).map { id =>
      val n = rnd.nextInt(40) // 0 → zero-token doc → dropped
      (id, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val expected = docs.flatMap { case (id, text) =>
      refEmbed(text, dims).map(id -> _)
    }.toMap
    assert(expected.nonEmpty && expected.size < docs.size,
      "fixture must exercise both kept and dropped docs")
    val out = SimilarityOps.hashEmbed(docs.toDF("doc_id", "text"),
      "doc_id", "text", dims = dims).as[(Long, Seq[Long])].collect().toMap
    assert(out == expected)
  }

  test("l2Normalize: exact 3-4-5 case, zero-vector guard, unit norms, zero shuffle") {
    val s = spark; import s.implicits._
    val embs = Seq(
      (1L, Seq(3.0f, 4.0f)),   // norm2_fp = 25·2^20 exactly → norm 5.0
      (2L, Seq(0.0f, 0.0f)),   // zero vector → all-zero, not NaN
      (3L, Seq(-1.0f, 0.0f))   // sign preserved
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.l2Normalize(embs, "vec_id", "embedding")
      .as[(Long, Long, Seq[Double])].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 25L * 1048576L, Seq(3.0 / 5.0, 4.0 / 5.0))))
    assert(got(2L) == ((2L, 0L, Seq(0.0, 0.0))))
    assert(got(3L) == ((3L, 1048576L, Seq(-1.0, 0.0))))
    // unit norm within the 2^-20 fixed-point quantization on a non-exact case
    val irr = Seq((9L, Seq(0.37f, -1.42f, 0.055f))).toDF("vec_id", "embedding")
    val u = SimilarityOps.l2Normalize(irr, "vec_id", "embedding")
      .as[(Long, Long, Seq[Double])].collect().head._3
    assert(math.abs(u.map(x => x * x).sum - 1.0) < 1e-5)
    // scan-local: no Exchange anywhere in the plan
    val plan = SimilarityOps.l2Normalize(embs, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a shuffle-free plan:\n$plan")
    // partitioning-invariant (fixed-point norm, correctly-rounded IEEE ops)
    val again = SimilarityOps.l2Normalize(embs.repartition(5), "vec_id",
      "embedding").as[(Long, Long, Seq[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(again == got)
  }
}
