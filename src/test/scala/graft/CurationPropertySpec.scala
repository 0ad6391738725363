package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CurationOps, PiiOps, TextOps}

/** Property-style invariants for the curation operators over seeded random
  * corpora — one Spark pass per property (a per-case job would be too slow),
  * every generated row checked.
  */
class CurationPropertySpec extends AnyFunSuite {
  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260818)

  test("dropCommonLines invariants on a random corpus") {
    val vocab = (0 until 30).map(i => s"boiler line $i")
    val docs = (1L to 200L).map { id =>
      val shared = Seq.fill(rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size)))
      val lines = rnd.shuffle(shared :+ s"unique-$id")
      (id, lines.mkString("\n"))
    }
    val inLines = docs.map { case (id, t) => id -> t.split("\n").toSeq }.toMap
    // ground-truth doc frequency per non-blank line
    val df = inLines.values.flatMap(_.distinct).groupBy(identity).view
      .mapValues(_.size).toMap
    val out = CurationOps.dropCommonLines(docs.toDF("doc_id", "body"),
        "doc_id", "body")
      .as[(Long, String, Long)].collect()
    val outMap = out.map(r => r._1 -> r._2.split("\n", -1).toSeq).toMap
    assert(outMap.keySet.subsetOf(inLines.keySet))
    for ((id, kept) <- outMap) {
      val orig = inLines(id)
      // kept lines are a subsequence of the original (order preserved)
      val it = orig.iterator
      assert(kept.forall(l => it.contains(l)), s"doc $id order broken")
      // no kept line has doc-frequency >= 2
      assert(kept.forall(l => df(l) < 2), s"doc $id kept boilerplate")
    }
    // every unique line survives (its doc must be present with it)
    for ((id, orig) <- inLines) {
      val uniq = orig.filter(l => df(l) < 2)
      if (uniq.nonEmpty)
        assert(outMap.get(id).exists(k => uniq.forall(k.contains)),
          s"doc $id lost a unique line")
    }
  }

  test("packSequences invariants on random token lengths") {
    val docs = (1L to 300L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(40))("tok").mkString(" ")))
    val budget = 64L; val strata = 7
    val rows = CurationOps.packSequences(docs.toDF("doc_id", "text"),
        "doc_id", "text", tokenBudget = budget, strata = strata)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == docs.map(_._1), "not a bijection")
    for ((id, st, n, start, pack) <- rows) {
      assert(st == (id % strata).toInt)
      assert(pack == start / budget)
      assert(n == docs(id.toInt - 1)._2.split(" ").length)
    }
    rows.groupBy(_._2).foreach { case (_, g) =>
      val ordered = g.sortBy(_._1)
      // start_tok is the exact prefix sum within the stratum
      val prefix = ordered.map(_._3).scanLeft(0L)(_ + _).init
      assert(ordered.map(_._4).toSeq == prefix.toSeq, "prefix sum broken")
    }
  }

  test("lmCoverage bounds; k >= distinct trigrams means every doc scores 1000") {
    val docs = (1L to 100L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(10))(s"w${rnd.nextInt(12)}").mkString(" ")))
    val out = TextOps.lmCoverage(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = 100000)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == docs.length)
    assert(out.forall(r => r._2 == 1000L && r._3 == r._4),
      "with the whole vocab in the model, coverage must be total")
    val small = TextOps.lmCoverage(docs.toDF("doc_id", "text"), "doc_id",
        "text", k = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(small.forall(r => r._2 >= 0 && r._2 <= 1000 && r._3 <= r._4))
  }

  test("redactPii leaves no matchable PII and is idempotent") {
    val texts = (1 to 200).map { i =>
      val pii = rnd.nextInt(4) match {
        case 0 => s"user${i}@host${rnd.nextInt(9)}.example"
        case 1 => s"10.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
        case 2 => s"+42${100000000 + rnd.nextInt(899999999)}"
        case _ => "no pii here"
      }
      (i.toLong, s"prefix $pii suffix ${rnd.nextInt(1000)}")
    }
    val once = texts.toDF("id", "t")
      .select(col("id"), PiiOps.redactPii(col("t")).as("r"))
    val twice = once.select(col("id"), PiiOps.redactPii(col("r")).as("r2"))
      .as[(Long, String)].collect().toMap
    val onceMap = once.as[(Long, String)].collect().toMap
    for (re <- Seq(PiiOps.EmailRe, PiiOps.Ipv4Re, PiiOps.PhoneRe)) {
      val p = java.util.regex.Pattern.compile(re)
      assert(onceMap.values.forall(v => !p.matcher(v).find()),
        s"residual PII for $re")
    }
    assert(onceMap == twice, "redactPii not idempotent")
  }
}
