package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{LinkOps, TextOps}

/** Web-graph and web-text operators: fixed-point integer PageRank
  * ([[LinkOps.hostRank]]), regex-tier HTML extraction
  * ([[TextOps.htmlToText]]), and the tokenizer-training vocabulary
  * ([[TextOps.vocabulary]]). Every expected value below is hand-computed.
  */
class WebGraphSpec extends AnyFunSuite {

  private def spark = SparkSessionFixture.spark

  test("hostRank: hand-computed 3-node cycle, two iterations") {
    val s = spark; import s.implicits._
    // a→b, a→c, b→c, c→a; outdeg a=2, b=1, c=1; r0 = 1e6 each.
    // iter1: r(a)=150000+850*1000000/1000=1000000
    //        r(b)=150000+850*(1000000 div 2)/1000=575000
    //        r(c)=150000+850*(500000+1000000)/1000=1425000
    // iter2: r(a)=150000+850*1425000 div 1000=1361250
    //        r(b)=575000   r(c)=150000+850*(500000+575000) div 1000=1063750
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst")
    val out = LinkOps.hostRank(edges, "src", "dst", iters = 2)
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 1361250L, "b" -> 575000L, "c" -> 1063750L))
    // iters = 0 is the initial uniform mass
    val init = LinkOps.hostRank(edges, "src", "dst", iters = 0)
      .as[(String, Long)].collect().toMap
    assert(init == Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L))
  }

  test("hostRank: dangling host leaks mass; floor division on odd outdeg") {
    val s = spark; import s.implicits._
    // a→d only: d is dangling, a gets no in-links → after one round
    // a = 150000 (pure teleport), d = 150000 + 850*1000000/1000 = 1000000
    val dangle = Seq(("a", "d")).toDF("src", "dst")
    val d1 = LinkOps.hostRank(dangle, "src", "dst", iters = 1)
      .as[(String, Long)].collect().toMap
    assert(d1 == Map("a" -> 150000L, "d" -> 1000000L))
    // outdeg 3: each contribution is 1000000 div 3 = 333333 (floored),
    // so r1(target) = 150000 + (850*333333) div 1000 = 433333
    val odd = Seq(("a", "b"), ("a", "c"), ("a", "e")).toDF("src", "dst")
    val o1 = LinkOps.hostRank(odd, "src", "dst", iters = 1)
      .as[(String, Long)].collect().toMap
    assert(o1("b") == 433333L && o1("c") == 433333L && o1("e") == 433333L)
    assert(o1("a") == 150000L)
  }

  test("hostRank: multi-edges collapse; partitioning-invariant") {
    val s = spark; import s.implicits._
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst")
    val out = LinkOps.hostRank(edges, "src", "dst", iters = 2)
      .as[(String, Long)].collect().toMap
    // duplicate a→b must not double a's outdeg or b's in-mass
    assert(out == Map("a" -> 1361250L, "b" -> 575000L, "c" -> 1063750L))
    val again = LinkOps.hostRank(edges.repartition(7), "src", "dst", iters = 2)
      .as[(String, Long)].collect().toMap
    assert(again == out)
  }

  test("htmlToText: scripts/styles/comments/tags stripped, entities decoded one level") {
    val s = spark; import s.implicits._
    val cases = Seq(
      // script content (with a literal "</div>" string inside) and style
      // and comment (with tags inside) all vanish; tags drop; text joins
      ("""<html><!-- nav <p>skip</p> --><head><script type="a">var a = 1 < 2 && "</div>";</script><style>p{margin:0}</style></head><body><h1>T</h1><p>hello world</p></body></html>""",
        "T hello world"),
      // entity decode, &amp; last: double-encoded decodes exactly one level
      ("a &amp;amp; b &lt;b&gt;&nbsp;&quot;q&quot; it&#39;s", "a &amp; b <b> \"q\" it's"),
      // whitespace collapse + trim
      ("  <p>a</p>\n\t<p>b</p>  ", "a b"),
      // documented caveat: a bare unescaped < swallows up to the next >
      ("a < b > c", "a c"))
    val out = cases.map(_._1).toDF("h")
      .select(TextOps.htmlToText(org.apache.spark.sql.functions.col("h")))
      .as[String].collect().toSeq
    assert(out == cases.map(_._2))
  }

  test("vocabulary: counts, minCount threshold, deterministic topN cut") {
    val s = spark; import s.implicits._
    // a:3 b:2 d:2 c:1 → minCount=2 keeps {a,b,d}; topN=2 cuts at
    // (cnt desc, token asc) → a(3), b(2) — d(2) loses the tie to b
    val docs = Seq((1L, "a b a"), (2L, "b  d"), (3L, "a d c"))
      .toDF("doc_id", "text")
    val out = TextOps.vocabulary(docs, "text", minCount = 2L, topN = 2)
      .as[(String, Long)].collect().toSeq
    assert(out.toSet == Set(("a", 3L), ("b", 2L)))
    // the cut compiles to TakeOrdered (per-partition heaps), not a global sort
    val plan = TextOps.vocabulary(docs, "text", minCount = 1L, topN = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // partitioning-invariant
    val again = TextOps.vocabulary(docs.repartition(5), "text", 2L, 2)
      .as[(String, Long)].collect().toSeq
    assert(again.toSet == out.toSet)
  }

  test("recrawlPriority: quality bonus in floor micros; signal-less hosts keep bare rank") {
    val s = spark; import s.implicits._
    val ranks = Seq(("a", 1000000L), ("b", 2000000L), ("c", 500000L))
      .toDF("host", "rank_micro")
    val quality = Seq(("a", 801L), ("c", 0L)).toDF("host", "quality_mill")
    val got = LinkOps.recrawlPriority(ranks, quality)
      .as[(String, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap
    // a: 1000000 + (500000·801) div 1000 = 1000000 + 400500
    assert(got("a") == (("a", 1000000L, Some(801L), 1400500L)))
    // b has no quality signal → NULL quality, bare link rank
    assert(got("b") == (("b", 2000000L, None, 2000000L)))
    // zero quality is a real (bad) signal, distinct from no signal
    assert(got("c") == (("c", 500000L, Some(0L), 500000L)))
    // weight 0 disables the feedback entirely
    val flat = LinkOps.recrawlPriority(ranks, quality, qualityWeightMicro = 0L)
      .as[(String, Long, Option[Long], Long)].collect()
    assert(flat.forall(r => r._4 == r._2))
    // host-cardinality inputs: partitioning-invariant
    val again = LinkOps.recrawlPriority(ranks.repartition(5),
        quality.repartition(3))
      .as[(String, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("activityDecay: hand-computed half-life shifts, future clamp, derived anchor") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    def at(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // halfLife=2, asOf=10: ages 0,1 → 1000; 2 → 500; 4 → 250; future(12) → 1000
    val ev = Seq(("a", at(10)), ("a", at(9)), ("a", at(8)), ("a", at(6)),
      ("a", at(12)), ("b", at(0))).toDF("host", "ts")
    val got = graft.ops.LinkOps.activityDecay(ev, Seq("host"), "ts", 2L,
        asOfDay = Some(10L))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 5L, 3750L, 12L)), s"got ${got("a")}")
    // age 10, hl 2 → shift 5 → 1000 >> 5 = 31
    assert(got("b") == (("b", 1L, 31L, 0L)))

    // None derives the anchor from the data's own max day (12): a's ages
    // become 2,3,4,6,0 → 500+500+250+125+1000 = 2375; b age 12 → shift 6 → 15
    val derived = graft.ops.LinkOps.activityDecay(ev, Seq("host"), "ts", 2L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(derived("a")._3 == 2375L && derived("b")._3 == 15L, s"$derived")

    // shift saturates at 62 (no negative-shift wraparound), result 0
    val old = Seq(("c", at(0)), ("c", at(10))).toDF("host", "ts")
    val far = graft.ops.LinkOps.activityDecay(old, Seq("host"), "ts", 1L,
        asOfDay = Some(1000L))
      .as[(String, Long, Long, Long)].collect().head
    assert(far._3 == 0L)

    // partitioning-invariant
    val again = graft.ops.LinkOps.activityDecay(ev.repartition(5),
        Seq("host"), "ts", 2L, asOfDay = Some(10L))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("degreeStats: hand-computed degrees, reciprocity, self-loop and multi-edge collapse") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    // a→b (twice: multi-edge collapses), b→a (reciprocal pair), a→c,
    // c→c (self loop: dropped entirely)
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"),
      ("c", "c")).toDF("s", "d")
    val got = graft.ops.LinkOps.degreeStats(edges, "s", "d")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got == Map(
      "a" -> (("a", 2L, 1L, 1L, 500L)),  // out {b,c}, in {b}, recip a→b
      "b" -> (("b", 1L, 1L, 1L, 1000L)), // its only out-edge reciprocated
      "c" -> (("c", 0L, 1L, 0L, 0L))),   // sink: zero out_deg, no div error
      s"got $got")
    val again = graft.ops.LinkOps.degreeStats(edges.repartition(5), "s", "d")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("anchorTerms: host/anchor extraction, per-host top-k, malformed markup inert") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val docs = Seq(
      """<a href="https://a.cz/x">best shop</a> <a href="https://b.cz/">best deal</a>""",
      """<a href="https://a.cz/y" rel="nofollow">best price</a>""",
      """<a href="https://a.cz/z"></a>""",          // empty anchor: no terms
      """no links here; <a name="x">not a link</a>""",
      """<a href="ftp://c.cz/f">wrong scheme</a>"""
    ).toDF("html")
    val got = graft.ops.LinkOps.anchorTerms(docs, "html", topK = 2)
      .as[(String, String, Long, Long)].collect().toSet
    // a.cz: best×2, shop×1, price×1 → top-2 = (best,2,1), (price,1,2 — tie
    // with shop broken term-asc)
    assert(got == Set(
      ("a.cz", "best", 2L, 1L), ("a.cz", "price", 1L, 2L),
      ("b.cz", "best", 1L, 1L), ("b.cz", "deal", 1L, 2L)), s"got $got")
  }

  test("triangleStats: hand-computed triangles and clustering; orientation-independent") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    // triangles {a,b,c} and {a,b,e}; pendant d off c; a self-loop and a
    // duplicate edge must not change anything
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
      ("a", "e"), ("b", "e"), ("b", "a"), ("e", "e")).toDF("s", "d")
    val got = graft.ops.LinkOps.triangleStats(edges, "s", "d")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got == Map(
      "a" -> (("a", 3L, 2L, 666L)),  // 2·2·1000 div (3·2)
      "b" -> (("b", 3L, 2L, 666L)),
      "c" -> (("c", 3L, 1L, 333L)),
      "d" -> (("d", 1L, 0L, 0L)),    // degree < 2: no division
      "e" -> (("e", 2L, 1L, 1000L))), s"got $got")
    // direction of input edges is irrelevant (undirected canonicalization)
    val rev = graft.ops.LinkOps.triangleStats(
        edges.select(edges("d").as("s"), edges("s").as("d")), "s", "d")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rev == got)
    val again = graft.ops.LinkOps.triangleStats(edges.repartition(7), "s", "d")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("waterFill: hand case, exact-budget sum, max-min fairness invariants") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val d = Seq(("a", 1L), ("b", 2L), ("c", 10L), ("d", 10L))
      .toDF("host", "dem")
    // budget 10: a and b grant in full (1+2), the 7 left split 3/3 over
    // {c, d} with remainder 1 to c (first in (demand, host) order)
    val got = graft.ops.LinkOps.waterFill(d, "host", "dem", 10L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map("a" -> 1L, "b" -> 2L, "c" -> 4L, "d" -> 3L), s"$got")
    // surplus budget: everyone gets exactly their demand; zero budget: 0
    val all = graft.ops.LinkOps.waterFill(d, "host", "dem", 100L)
      .as[(String, Long, Long)].collect()
    assert(all.forall(r => r._3 == r._2))
    val none = graft.ops.LinkOps.waterFill(d, "host", "dem", 0L)
      .as[(String, Long, Long)].collect()
    assert(none.forall(_._3 == 0L))
    // invariants on a pseudorandom fixture: grants sum to exactly
    // min(B, Σd); nobody over-granted; max-min — if host i is
    // unsatisfied, NO host is granted more than g_i + 1
    val rnd = (0L until 200L)
      .map(i => (s"h$i", Math.floorMod(graft.ops.TextOps.mix64(i * 31), 50L) + 1L))
      .toDF("host", "dem")
    for (b <- Seq(0L, 137L, 1000L, 100000L)) {
      val rows = graft.ops.LinkOps.waterFill(rnd, "host", "dem", b)
        .as[(String, Long, Long)].collect()
      val sumD = rows.map(_._2).sum
      assert(rows.map(_._3).sum == math.min(b, sumD), s"budget $b sum")
      assert(rows.forall(r => r._3 <= r._2), s"budget $b over-grant")
      val unsat = rows.filter(r => r._3 < r._2).map(_._3)
      if (unsat.nonEmpty) {
        val floor = unsat.min
        assert(rows.forall(_._3 <= floor + 1),
          s"budget $b: fairness violated (floor $floor)")
      }
    }
    val again = graft.ops.LinkOps.waterFill(d.repartition(3), "host",
        "dem", 10L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(again == got)
  }
}
