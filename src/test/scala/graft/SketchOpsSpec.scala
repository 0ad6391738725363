package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SketchOps

/** Sketch operators: HLL estimate quality + register-state invariants,
  * CMS never-underestimates + exactness without collisions, and the
  * partitioning-independence both rely on (associative integer merges).
  * Exact register/counter values are pinned by the q96/q97 oracles.
  */
class SketchOpsSpec extends AnyFunSuite {

  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("hllDistinct: estimate within 10% at n≫m, state is consistent") {
    val n = 5000
    val df = (0 until n).map(i => ("g", s"key-$i")).toDF("grp", "k")
    val out = SketchOps.hllDistinct(df, col("k"), Seq("grp"))
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == 1)
    val (_, hllSum, hllZeros, est) = out.head
    // n/m ≈ 19.5 — raw-estimator territory; 1.04/sqrt(256) ≈ 6.5% σ
    assert(math.abs(est - n).toDouble / n < 0.10, s"est $est vs $n")
    // with 5000 keys over 256 buckets, every register is occupied
    assert(hllZeros == 0L)
    // register sum is positive and bounded by m · 2^52
    assert(hllSum > 0L && hllSum <= 256L * (1L << 52))
  }

  test("hllDistinct: insensitive to duplication and partitioning; groups independent") {
    val base = (0 until 800).map(i => (s"g${i % 3}", s"k-${i % 200}-${i % 3}"))
    val df1 = base.toDF("grp", "k")
    val df2 = (base ++ base ++ base).toDF("grp", "k").repartition(17)
    val a = SketchOps.hllDistinct(df1, col("k"), Seq("grp"))
      .as[(String, Long, Long, Long)].collect().toSet
    val b = SketchOps.hllDistinct(df2, col("k"), Seq("grp"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(a == b, "HLL state must depend only on the distinct key set")
    assert(a.map(_._1) == Set("g0", "g1", "g2"))
  }

  test("hllDistinct: empty-ish groups estimate small, full sketch of 1 key") {
    val df = Seq(("g", "only")).toDF("grp", "k")
    val (_, hllSum, zeros, est) = SketchOps.hllDistinct(df, col("k"), Seq("grp"))
      .as[(String, Long, Long, Long)].collect().head
    assert(zeros == 255L)
    // raw HLL over-reads tiny cardinalities (linear counting is the
    // documented serving-side fix) — just pin determinism + bounds here
    assert(est >= 1L && hllSum > 0L)
  }

  test("cmsBuild/cmsEstimate: never underestimates, exact when collision-free") {
    // 8 distinct keys, highly skewed counts, width 512 → collisions
    // essentially impossible among 8 keys unless md5 collides in 16 bits
    // (checked below); estimates must then be EXACT
    val rows = (0 until 8).flatMap(i => Seq.fill((i + 1) * 10)(s"tok$i"))
    val df = rows.toDF("tok")
    val counters = SketchOps.cmsBuild(df, col("tok"))
    assert(counters.count() <= 4L * 8L)
    val probes = (0 until 8).map(i => (s"tok$i", ((i + 1) * 10).toLong))
      .toDF("tok", "n_exact")
    val est = SketchOps.cmsEstimate(counters, probes, "tok")
      .as[(String, Long, Long)].collect()
    est.foreach { case (tok, exact, e) =>
      assert(e >= exact, s"$tok: CMS underestimated ($e < $exact)")
    }
    // collision check: all 8 keys land in distinct slots in at least one
    // depth row → min picks an exact counter for every key
    val slotsByDepth = (0 until 4).map { d =>
      (0 until 8).map(i =>
        Seq(s"tok$i").toDF("t")
          .select(SketchOps.cmsSlot(col("t"), d, 512)).as[Int].head())
    }
    if (slotsByDepth.exists(s => s.distinct.size == s.size))
      est.foreach { case (tok, exact, e) =>
        assert(e == exact, s"$tok: expected exact estimate, got $e vs $exact")
      }
  }

  test("cmsEstimate: unseen probe key estimates 0 on an unloaded sketch; merge = sum") {
    val a = Seq("x", "x", "y").toDF("tok")
    val b = Seq("y", "z").toDF("tok")
    val cA = SketchOps.cmsBuild(a, col("tok"), depth = 2, width = 16)
    val cB = SketchOps.cmsBuild(b, col("tok"), depth = 2, width = 16)
    // sketch merge = counter-wise sum (associative) — the shard-then-
    // merge path a 100 TB build uses
    val merged = cA.unionByName(cB)
      .groupBy("depth", "slot").agg(sum("cnt").as("cnt"))
    val whole = SketchOps.cmsBuild(a.unionByName(b), col("tok"),
      depth = 2, width = 16)
    val mSet = merged.as[(Int, Int, Long)].collect().toSet
    assert(mSet == whole.as[(Int, Int, Long)].collect().toSet)

    val probes = Seq("zzz-unseen").toDF("tok")
    // width 16 with 3 keys: an unseen key MAY alias a loaded slot (CMS
    // overestimate); on the EMPTY sketch it must read exactly 0
    val empty = SketchOps.cmsBuild(a.where(lit(false)), col("tok"),
      depth = 2, width = 16)
    val e0 = SketchOps.cmsEstimate(empty, probes, "tok", depth = 2, width = 16)
      .as[(String, Long)].collect().head._2
    assert(e0 == 0L)
  }

  test("cms width guard: non-divisor of 2^16 rejected") {
    intercept[IllegalArgumentException] {
      SketchOps.cmsBuild(Seq("a").toDF("tok"), col("tok"), width = 500)
    }
  }

  test("bloom: zero false negatives, sane FP rate, shard merge = whole build") {
    val keys = (0L until 500L).toDF("k")
    val sketch = SketchOps.bloomBuild(keys, col("k"), mBits = 8192L, k = 4)
    // every inserted key probes true — the hard guarantee
    val fn = SketchOps.bloomMightContain(sketch, keys, "k", 8192L, 4)
      .where(!col("might_contain")).count()
    assert(fn == 0L, s"bloom produced $fn false negatives")
    // non-members: FP rate at kn/m = 0.24 is ~0.2% theoretical; < 5% is a
    // generous determinism-stable bound
    val non = (100000L until 102000L).toDF("k")
    val fp = SketchOps.bloomMightContain(sketch, non, "k", 8192L, 4)
      .where(col("might_contain")).count()
    assert(fp < 100L, s"FP rate too high: $fp / 2000")
    // sharded builds merge into exactly the whole-corpus filter (bit_or
    // associativity), and the merged filter answers identically
    val h1 = SketchOps.bloomBuild((0L until 250L).toDF("k"), col("k"), 8192L, 4)
    val h2 = SketchOps.bloomBuild((250L until 500L).toDF("k"), col("k"), 8192L, 4)
    val merged = h1.union(h2).groupBy("word")
      .agg(expr("bit_or(bits)").as("bits"))
    val a = sketch.as[(Long, Long)].collect().toSet
    val b = merged.as[(Long, Long)].collect().toSet
    assert(a == b, "shard-merged filter differs from whole-corpus build")
    // empty filter: every probe is false, and the probe side plan is
    // broadcast-join only (no shuffle on probes)
    val empty = SketchOps.bloomBuild(Seq.empty[Long].toDF("k"), col("k"), 8192L, 4)
    val none = SketchOps.bloomMightContain(empty, keys, "k", 8192L, 4)
    assert(none.where(col("might_contain")).count() == 0L)
    val plan = SketchOps.bloomMightContain(sketch, keys, "k", 8192L, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probe not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"probe side shuffled:\n$plan")
  }

  test("hllPairwiseOverlap: union ≡ one-shot sketch of both sets; planted overlap ranks") {
    // A = 0..999, B = 500..1499 (|A∩B| = 500), C = 5000..5999 (disjoint)
    val rows = (0L until 1000L).map(k => ("A", k)) ++
      (500L until 1500L).map(k => ("B", k)) ++
      (5000L until 6000L).map(k => ("C", k))
    val df = rows.toDF("label", "k")
    val got = SketchOps.hllPairwiseOverlap(df, col("k"), "label")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    // the pair-union estimate must equal the ONE-SHOT sketch of the two
    // sets' concatenated keys BIT-EXACTLY (register merge is the monoid)
    for (((a, b), row) <- got) {
      val direct = SketchOps.hllDistinct(
          df.where(col("label") === a || col("label") === b)
            .select(col("k")), col("k"), Seq.empty)
        .as[(Long, Long, Long)].collect().head._3
      assert(row._5 == direct, s"($a,$b) union ${row._5} != one-shot $direct")
    }
    // planted 500-key overlap estimates within sketch error and ranks
    // decisively above the disjoint pairs
    val ab = got(("A", "B"))
    assert(math.abs(ab._6 - 500L) <= 200L, s"A∩B estimate ${ab._6}")
    assert(ab._7 > got(("A", "C"))._7 && ab._7 > got(("B", "C"))._7)
    val again = SketchOps.hllPairwiseOverlap(df.repartition(7), col("k"),
        "label")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(again == got)
  }

  test("hllSlidingDistinct: each window label ≡ hllDistinct over that window's days") {
    // events on days 0..9, keys overlapping across days; window = 3
    val rows = (0L until 10L).flatMap(d =>
      (0L until 20L + d * 3).map(i => (s"u${i % 37}", d)))
    val df = rows.toDF("k", "day")
    val slid = SketchOps.hllSlidingDistinct(df, col("k"), col("day"), 3,
        Seq.empty)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // labels are exactly the observed days
    assert(slid.keySet == (0L until 10L).toSet)
    // the sliding merge must reproduce the one-shot sketch over each
    // window's raw events BIT-EXACTLY (register max is associative)
    for (w <- 0L until 10L) {
      val direct = SketchOps.hllDistinct(
          df.where(col("day") > w - 3 && col("day") <= w), col("k"),
          Seq.empty)
        .as[(Long, Long, Long)].collect().head
      assert(slid(w) == direct, s"window $w: ${slid(w)} vs $direct")
    }
    // partitioning-invariant
    val again = SketchOps.hllSlidingDistinct(df.repartition(7), col("k"),
        col("day"), 3, Seq.empty)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(again == slid)
  }
}
