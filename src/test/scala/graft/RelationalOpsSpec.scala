package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RelationalOps

/** As-of join and interval join: semantics pinned on hand-built frames
  * (inclusive boundary, tie-break, no-match nulls, pair uniqueness vs a
  * brute-force cross join) and the plan shapes the operators exist for
  * (as-of: zero Join operators; interval: hash equi-join, no nested
  * loop). Exact values at scale are pinned by the q94/q95 oracles.
  */
class RelationalOpsSpec extends AnyFunSuite {

  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val clicks = Seq(
    (10L, 1L, ts("2024-01-01 10:00:00")),
    (11L, 1L, ts("2024-01-01 10:05:00")),
    (12L, 1L, ts("2024-01-01 10:05:00")), // tie with 11 — max id wins
    (13L, 2L, ts("2024-01-01 12:00:00"))
  ).toDF("click_id", "user_id", "ts")

  private val purchases = Seq(
    (100L, 1L, ts("2024-01-01 10:03:00")), // after click 10
    (101L, 1L, ts("2024-01-01 10:05:00")), // AT the tied clicks — inclusive, 12 wins
    (102L, 2L, ts("2024-01-01 11:00:00")), // before any click for user 2
    (103L, 3L, ts("2024-01-01 09:00:00"))  // user with no clicks at all
  ).toDF("event_id", "user_id", "ts")

  test("asofJoin: inclusive boundary, equal-time tie to max id, nulls when no match") {
    val out = RelationalOps.asofJoin(purchases, clicks,
      leftKey = "user_id", leftTime = "ts",
      rightKey = "user_id", rightTime = "ts",
      payload = Seq("click_id"), rightTieBreak = "click_id")
      .select("event_id", "asof_click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      100L -> Some(10L), 101L -> Some(12L),
      102L -> None, 103L -> None))
  }

  test("asofJoin: every left row survives exactly once; plan has no Join operator") {
    val joined = RelationalOps.asofJoin(purchases, clicks,
      "user_id", "ts", "user_id", "ts", Seq("click_id"), "click_id")
    assert(joined.count() == purchases.count())
    assert(joined.columns.toSeq ==
      purchases.columns.toSeq :+ "asof_click_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of plan contains a join:\n$plan")
    // exactly one shuffle: the key hash-partitioning for the window
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected one Exchange:\n$plan")
  }

  test("asofJoin agrees with a brute-force per-row max on random data") {
    val right = (0L until 400L)
      .map(i => (i, i % 7, ts(f"2024-01-01 10:${(i * 13) % 60}%02d:${(i * 29) % 60}%02d")))
      .toDF("rid", "k", "ts")
    val left = (0L until 200L)
      .map(i => (i + 1000L, i % 7, ts(f"2024-01-01 10:${(i * 17) % 60}%02d:${(i * 31) % 60}%02d")))
      .toDF("lid", "k", "ts")
    val got = RelationalOps.asofJoin(left, right,
      "k", "ts", "k", "ts", Seq("rid"), "rid")
      .select("lid", "asof_rid").as[(Long, Option[Long])]
      .collect().toMap
    val rRows = right.as[(Long, Long, Timestamp)].collect()
    val expected = left.as[(Long, Long, Timestamp)].collect().map {
      case (lid, k, t) =>
        val cand = rRows.filter(r => r._2 == k && !r._3.after(t))
        lid -> (if (cand.isEmpty) None
                else Some(cand.maxBy(r => (r._3.getTime, r._1))._1))
    }.toMap
    assert(got == expected)
  }

  private val outages = Seq(
    (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
    (2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:15:00")), // overlaps 1
    (3L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"))  // empty: dropped
  ).toDF("outage_id", "lo", "hi")

  private val points = Seq(
    (20L, ts("2024-01-01 10:00:00")), // lo inclusive → in 1
    (21L, ts("2024-01-01 10:07:00")), // in 1 AND 2
    (22L, ts("2024-01-01 10:10:00")), // hi exclusive for 1 → only 2
    (23L, ts("2024-01-01 12:00:00"))  // empty interval matches nothing
  ).toDF("event_id", "ts")

  test("intervalJoin: lo inclusive, hi exclusive, overlap multiplicity, empty interval dropped") {
    val pairs = RelationalOps.intervalJoin(points, "ts", outages,
      "lo", "hi", bucketMillis = 600000L)
      .select("outage_id", "pt_event_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 20L), (1L, 21L), (2L, 21L), (2L, 22L)))
  }

  test("intervalJoin: each pair exactly once, matches brute force, plan is a hash equi-join") {
    // intervals longer than the bucket (span 3 buckets) — the dedup-free
    // claim must hold when an interval explodes to many buckets
    val ivals = (0L until 40L).map { i =>
      (i, ts(f"2024-01-01 ${10 + (i % 5)}%02d:${(i * 7) % 50}%02d:00"),
        ts(f"2024-01-01 ${10 + (i % 5)}%02d:${(i * 7) % 50 + 9}%02d:59"))
    }.toDF("iid", "lo", "hi")
    val pts = (0L until 300L).map { i =>
      (i, ts(f"2024-01-01 ${10 + (i % 6)}%02d:${(i * 11) % 60}%02d:${(i * 3) % 60}%02d"))
    }.toDF("pid", "t")

    val joined = RelationalOps.intervalJoin(pts, "t", ivals, "lo", "hi",
      bucketMillis = 240000L) // 4-min buckets, 10-min intervals
    val got = joined.select("iid", "pt_pid").as[(Long, Long)].collect().toSeq
    assert(got.size == got.toSet.size, "duplicate (interval, point) pair")

    val brute = ivals.as[(Long, Timestamp, Timestamp)].collect().flatMap {
      case (iid, lo, hi) =>
        pts.as[(Long, Timestamp)].collect().collect {
          case (pid, t) if !t.before(lo) && t.before(hi) => (iid, pid)
        }
    }.toSet
    assert(got.toSet == brute)

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"interval join fell back to a loop join:\n$plan")
    assert(plan.contains("Join"), s"expected a hash equi-join:\n$plan")
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe, changed_cols sorted") {
    val oldS = Seq(
      (1L, Some("a"), Some(10L)),  // unchanged
      (2L, Some("b"), Some(20L)),  // value change on v
      (3L, None: Option[String], Some(30L)), // null→value change on s
      (4L, Some("d"), Some(40L)),  // removed
      (6L, None: Option[String], None: Option[Long]) // all-null, unchanged
    ).toDF("k", "s", "v")
    val newS = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), Some(25L)),
      (3L, Some("c"), Some(30L)),
      (5L, Some("e"), Some(50L)),  // added
      (6L, None: Option[String], None: Option[Long])
    ).toDF("k", "s", "v")
    val got = RelationalOps.snapshotDiff(oldS, newS, Seq("k"), Seq("v", "s"))
      .as[(Long, String, Seq[String])].collect().map(r => r._1 -> r).toMap
    assert(got == Map(
      2L -> ((2L, "changed", Seq("v"))),
      3L -> ((3L, "changed", Seq("s"))),
      4L -> ((4L, "removed", Seq())),
      5L -> ((5L, "added", Seq()))),
      s"got $got")
    // both columns changed → names in column-name order regardless of the
    // caller's compareCols order
    val both = RelationalOps.snapshotDiff(
      Seq((9L, "x", 1L)).toDF("k", "s", "v"),
      Seq((9L, "y", 2L)).toDF("k", "s", "v"),
      Seq("k"), Seq("v", "s"))
      .as[(Long, String, Seq[String])].collect().toSeq
    assert(both == Seq((9L, "changed", Seq("s", "v"))))
    // includeUnchanged keeps the full-join audit rows
    val all = RelationalOps.snapshotDiff(oldS, newS, Seq("k"), Seq("s", "v"),
      includeUnchanged = true)
    assert(all.count() == 6 &&
      all.where(col("status") === "unchanged").count() == 2)
    // one shuffle-worthy operator: a single full-outer SortMergeJoin /
    // ShuffledHashJoin on the key, never a broadcast or loop join
    val plan = RelationalOps.snapshotDiff(oldS, newS, Seq("k"), Seq("s", "v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"expected full-outer join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
  }

  test("buildHistory: change/gap breaks, exclusive valid_to, non-dense versions, null payloads") {
    // versions are NON-dense (10,20,30,40) — gap detection must use the
    // global version INDEX, not version arithmetic
    val rows = Seq(
      ("A", 10L, Some("x")), ("A", 20L, Some("x")), // run of 2
      ("A", 30L, Some("y")), ("A", 40L, Some("y")), // change, open at end
      ("B", 10L, Some("b")), ("B", 30L, Some("b")), // absence gap splits
      ("D", 10L, None: Option[String]), ("D", 20L, Some("x")) // null→value
    ).toDF("k", "ver", "payload")
    val got = RelationalOps.buildHistory(rows, Seq("k"), "ver", Seq("payload"))
      .as[(String, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got == Set(
      ("A", Some("x"), 10L, Some(30L), false),
      ("A", Some("y"), 30L, None, true),
      ("B", Some("b"), 10L, Some(20L), false),
      // B reappears at 30 but is absent from the final version → CLOSED
      ("B", Some("b"), 30L, Some(40L), false),
      ("D", None, 10L, Some(20L), false),
      ("D", Some("x"), 20L, Some(30L), false)), s"got $got")
    // exactly one open interval per currently-live key; version dim
    // broadcasts; partitioning-invariant
    assert(got.count(_._5) == 1)
    val again = RelationalOps.buildHistory(rows.repartition(5), Seq("k"),
        "ver", Seq("payload"))
      .as[(String, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(again == got)
    val plan = RelationalOps.buildHistory(rows, Seq("k"), "ver",
      Seq("payload")).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"version dim not broadcast:\n$plan")
  }

  test("funnel: greedy strict-after chaining, prefix-closed nulls, equal-ts no chain") {
    val ev = Seq(
      // u1: clean 3-step chain
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "purchase", ts("2024-01-01 10:02:00")),
      // u2: click BEFORE the first view is ignored; the later click
      // chains; purchase is before that click → step 3 unreached
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 10:30:00")),
      (2L, "click", ts("2024-01-01 11:00:00")),
      // u3: view only
      (3L, "view", ts("2024-01-01 08:00:00")),
      // u4: never viewed → absent from the funnel (step 1 defines entry)
      (4L, "click", ts("2024-01-01 08:00:00")),
      // u5: click at the SAME instant as view → strict > does not chain
      (5L, "view", ts("2024-01-01 07:00:00")),
      (5L, "click", ts("2024-01-01 07:00:00"))
    ).toDF("user_id", "event_type", "ts")
    def ms(s: String): Long = ts(s).getTime
    val got = RelationalOps.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got == Map(
      1L -> ((1L, Some(ms("2024-01-01 10:00:00")),
        Some(ms("2024-01-01 10:01:00")),
        Some(ms("2024-01-01 10:02:00")), 3L)),
      2L -> ((2L, Some(ms("2024-01-01 10:00:00")),
        Some(ms("2024-01-01 11:00:00")), None, 2L)),
      3L -> ((3L, Some(ms("2024-01-01 08:00:00")), None, None, 1L)),
      5L -> ((5L, Some(ms("2024-01-01 07:00:00")), None, None, 1L))),
      s"got $got")
    val again = RelationalOps.funnel(ev.repartition(5), "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("cidrJoin: longest-prefix match, multi-bucket coarse blocks, uncovered IPs absent") {
    // /8 at 0 ("A"); /24 nested inside it at 512 ("B"); /13 at 2^24
    // ("C", width 2^19 = 8 /16-buckets — the explode path); /16 nested
    // in C at 2^24 ("D")
    val cidrs = Seq(
      (0L, 8, "A"), (512L, 24, "B"),
      (16777216L, 13, "C"), (16777216L, 16, "D")
    ).toDF("net", "plen", "name")
    val ips = Seq(
      (1L, 600L),            // inside B (512..767) → B beats A
      (2L, 100000L),         // inside A only
      (3L, 16777216L + 10L), // inside C and D → D (/16) beats C (/13)
      (4L, 16777216L + 3L * 65536L + 7L), // 4th bucket of C, outside D → C
      (5L, 999999999L)       // uncovered → absent
    ).toDF("ip_id", "ip")
    val got = RelationalOps.cidrJoin(ips, "ip", "ip_id", cidrs, "net",
        "plen", Seq("name"))
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(got == Map(
      1L -> ((512L, 24L, "B")),
      2L -> ((0L, 8L, "A")),
      3L -> ((16777216L, 16L, "D")),
      4L -> ((16777216L, 13L, "C"))), s"got $got")
    // exactly one row per covered IP; dim broadcasts
    val out = RelationalOps.cidrJoin(ips, "ip", "ip_id", cidrs, "net",
      "plen", Seq("name"))
    assert(out.count() == 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"CIDR dim not broadcast:\n$plan")
    val again = RelationalOps.cidrJoin(ips.repartition(3), "ip", "ip_id",
        cidrs.repartition(2), "net", "plen", Seq("name"))
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(again == got)
  }

  test("saltedJoin: exactly the plain inner join, under skew and at salts = 1") {
    // one hot key (0) holds 80% of the facts — the shape salting exists for
    val facts = ((0L until 400L).map(i => (i, 0L)) ++
      (400L until 500L).map(i => (i, i % 7 + 1))).toDF("fid", "k")
    val dim = (0L until 10L).map(i => (i, s"d$i")).toDF("dk", "payload")
    val plain = facts.join(dim, facts("k") === dim("dk"))
      .select(col("fid"), col("k"), col("payload"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    for (salts <- Seq(1, 4, 16)) {
      val salted = RelationalOps.saltedJoin(facts, "k", "fid", dim, "dk",
          salts)
        .select(col("fid"), col("k"), col("payload"))
        .as[(Long, Long, String)].collect().sorted.toSeq
      assert(salted == plain, s"salts=$salts diverged from the plain join")
    }
    // unmatched fact keys drop (inner semantics), like the plain join
    assert(plain.size == 500 - 100 + 100) // all keys 0..7 covered by dim
  }

  test("groupTrend: exact hand-computed OLS, degenerate groups null out") {
    val df = Seq(
      ("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 5L), // y = 2x + 1 exactly
      ("b", 7L, 9L),                               // single point
      ("c", 4L, 1L), ("c", 4L, 9L)                 // zero x-variance
    ).toDF("g", "x", "y")
    val got = RelationalOps.groupTrend(df, Seq("g"), "x", "y")
      .select(col("g"), col("slope"), col("intercept"))
      .as[(String, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((Some(2.0), Some(1.0))), s"got ${got("a")}")
    assert(got("b") == ((None, None)))
    assert(got("c") == ((None, None)))
    val again = RelationalOps.groupTrend(df.repartition(5), Seq("g"),
        "x", "y")
      .select(col("g"), col("slope"), col("intercept"))
      .as[(String, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again == got)
  }

  test("periodMovers: adjacent-only comparison, gaps null, signed floor ratio") {
    val rows =
      Seq.fill(10)(("t", 1L)) ++ Seq.fill(15)(("t", 2L)) ++
        Seq.fill(20)(("t", 4L)) ++ // gap at 3
        Seq.fill(3)(("u", 5L)) ++ Seq.fill(2)(("u", 6L))
    val df = rows.toDF("k", "p")
    val got = RelationalOps.periodMovers(df, Seq("k"), col("p"))
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("t", 1L)) == ((10L, None, None)))
    assert(got(("t", 2L)) == ((15L, Some(10L), Some(500L))))
    assert(got(("t", 4L)) == ((20L, None, None)), "gap must not compare")
    // signed non-exact ratio FLOORS (−1000/3 → −334, not the −333 a
    // truncating integer division would give)
    assert(got(("u", 6L)) == ((2L, Some(3L), Some(-334L))), s"$got")
    val again = RelationalOps.periodMovers(df.repartition(5), Seq("k"),
        col("p"))
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(again == got)
  }

  test("transitionCounts: tie-broken adjacency, corpus counts, mill probabilities") {
    val ev = Seq(
      (1L, 1L, "v", ts("2024-01-01 10:00:00")),
      (1L, 2L, "c", ts("2024-01-01 10:05:00")),
      (1L, 3L, "c", ts("2024-01-01 10:05:00")), // tie: id 2 before id 3
      (2L, 4L, "v", ts("2024-01-01 09:00:00")),
      (2L, 5L, "p", ts("2024-01-01 09:30:00")),
      (3L, 6L, "x", ts("2024-01-01 08:00:00")) // single event: no pair
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = RelationalOps.transitionCounts(ev, "user_id", "event_type",
        "ts", "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("v", "c", 1L, 500L), ("v", "p", 1L, 500L), ("c", "c", 1L, 1000L)),
      s"got $got")
    val again = RelationalOps.transitionCounts(ev.repartition(5), "user_id",
        "event_type", "ts", "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    assert(again == got)
  }

  test("retentionCohorts: min-period cohorts, sparse offsets, within-period dedup") {
    // u1 active weeks 1,2,4 (twice in week 1 — must dedup); u2 weeks
    // 1,3; u3 week 2 only → cohort 1 = {u1,u2}, cohort 2 = {u3}
    val ev = Seq((1L, 1L), (1L, 1L), (1L, 2L), (1L, 4L),
      (2L, 1L), (2L, 3L), (3L, 2L)).toDF("user_id", "week")
    val got = RelationalOps.retentionCohorts(ev, "user_id", col("week"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 2L, 2L, 1000L),  // the cohort's own week
      (1L, 1L, 1L, 2L, 500L),   // u1 in week 2
      (1L, 2L, 1L, 2L, 500L),   // u2 in week 3
      (1L, 3L, 1L, 2L, 500L),   // u1 in week 4
      (2L, 0L, 1L, 1L, 1000L)), // u3's singleton cohort
      s"got $got")
    // sparse: no zero-filled rows for quiet offsets
    assert(!got.exists(r => r._3 == 0L))
    val again = RelationalOps.retentionCohorts(ev.repartition(5),
        "user_id", col("week"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(again == got)
  }
}
