package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CurationOps, DedupOps}

/** Curation-stage operators: cluster-representative policy, deterministic
  * stratified sampling, and the composed funnel (subset/monotonicity
  * invariants; exact values are pinned by the q43/q44/q45 DuckDB oracles).
  */
class CurationOpsSpec extends AnyFunSuite {

  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("clusterRepresentatives keeps the longest text per cluster, ties to min id") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e f g"), (3L, "a b c d e f x"), // cluster 1
      (4L, "solo doc")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster")
    val reps = CurationOps.clusterRepresentatives(docs, clusters, "doc_id", "text")
      .orderBy("cluster").as[(Long, Long, Long)].collect().toSeq
    // 2 and 3 tie on length 13 → min id 2 wins
    assert(reps == Seq((1L, 2L, 3L), (4L, 4L, 1L)))
  }

  test("stratifiedSample is deterministic, per-stratum rated, and a pure filter (no shuffle)") {
    val docs = (0L until 2000L).map(i => (i, s"src${i % 8}")).toDF("doc_id", "source")
    val s1 = CurationOps.stratifiedSample(docs, "doc_id", "source")
    val rows = s1.as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(rows == CurationOps.stratifiedSample(docs, "doc_id", "source")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1))
    // per-stratum acceptance ≈ rate_hex/256 (loose band; deterministic seed)
    val byStratum = rows.groupBy(_._2)
    byStratum.foreach { case (src, rs) =>
      val rate = Integer.parseInt(rs.head._3, 16) / 256.0
      val got = rs.size / 250.0
      assert(math.abs(got - rate) < 0.15, s"$src: got $got expected ≈ $rate")
    }
    // plan: no exchange — the sample is scan-local
    val plan = s1.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample plan shuffles:\n$plan")
  }

  test("stratifiedSampleRated: realized rate tracks the requested rate per stratum") {
    val docs = (0L until 30000L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val rates = Map("src0" -> 0.10, "src1" -> 0.80, "src2" -> 1.0)
    val rows = CurationOps.stratifiedSampleRated(docs, "doc_id", "source", rates)
      .as[(Long, String)].collect().toSeq
    val byStratum = rows.groupBy(_._2).view.mapValues(_.size / 10000.0).toMap
    rates.foreach { case (src, want) =>
      val got = byStratum.getOrElse(src, 0.0)
      assert(math.abs(got - want) < 0.02, s"$src: realized $got requested $want")
    }
    // rate 1.0 keeps EVERY row of its stratum, not 'almost all'
    assert(byStratum("src2") == 1.0)
    // determinism + monotonicity: raising a rate strictly grows the sample
    // (the 10% sample is a subset of the 20% one — md5 threshold mechanics)
    val at10 = rows.filter(_._2 == "src0").map(_._1).toSet
    val at20 = CurationOps.stratifiedSampleRated(docs, "doc_id", "source",
        Map("src0" -> 0.20)).as[(Long, String)].collect()
      .filter(_._2 == "src0").map(_._1).toSet
    assert(at10.subsetOf(at20))
    // strata absent from the map: defaultRate 0.0 keeps none
    assert(at20.size < 10000 &&
      CurationOps.stratifiedSampleRated(docs, "doc_id", "source",
        Map("src0" -> 0.20)).as[(Long, String)].collect()
        .forall(_._2 == "src0"))
    // rate table rides a broadcast join, never a corpus shuffle
    val plan = CurationOps.stratifiedSampleRated(docs, "doc_id", "source", rates)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"rated sample plan:\n$plan")
  }

  test("rateHex edges: >=1 keeps all, <=0 keeps none, interior is 8 hex chars") {
    assert(CurationOps.rateHex(1.0) == "g" && CurationOps.rateHex(2.0) == "g")
    assert(CurationOps.rateHex(0.0) == "00000000")
    assert(CurationOps.rateHex(-0.5) == "00000000")
    assert(CurationOps.rateHex(0.10) == "19999999")
    assert(CurationOps.rateHex(0.80) == "cccccccc")
    assert(CurationOps.rateHex(0.25) == "40000000")
  }

  test("dropCommonLines drops df>=2 lines, keeps order, drops all-boilerplate docs") {
    val docs = Seq(
      (1L, "alpha one\nshared footer\nomega one"),
      (2L, "alpha two\nshared footer\nomega two"),
      (3L, "shared footer")).toDF("doc_id", "body")
    val out = CurationOps.dropCommonLines(docs, "doc_id", "body")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // doc 3 was pure boilerplate → gone; survivors keep original line order
    assert(out == Seq(
      (1L, "alpha one\nomega one", 2L),
      (2L, "alpha two\nomega two", 2L)))
    // blank lines are never boilerplate, even when every doc has them
    val blanky = Seq((1L, "a\n\nb"), (2L, "c\n\nd")).toDF("doc_id", "body")
    val kept = CurationOps.dropCommonLines(blanky, "doc_id", "body")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(kept == Seq((1L, "a\n\nb", 3L), (2L, "c\n\nd", 3L)))
  }

  test("packSequences: packs cut at the token budget, per-stratum, id order") {
    // one stratum (strata = 1), 3-token docs, budget 7:
    // starts 0,3,6,9,12 → packs 0,0,0,1,1
    val docs = (1L to 5L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = CurationOps.packSequences(docs, "doc_id", "text",
      tokenBudget = 7, strata = 1)
      .orderBy("doc_id")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.map(_._4) == Seq(0L, 3L, 6L, 9L, 12L), s"starts: $out")
    assert(out.map(_._5) == Seq(0L, 0L, 0L, 1L, 1L), s"packs: $out")
    // strata shard independently: same docs over 2 strata → per-stratum
    // running sums restart (ids 1,3,5 in stratum 1; 2,4 in stratum 0)
    val sharded = CurationOps.packSequences(docs, "doc_id", "text",
      tokenBudget = 7, strata = 2)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(sharded.filter(_._2 == 1).sortBy(_._1).map(_._4).toSeq == Seq(0L, 3L, 6L))
    assert(sharded.filter(_._2 == 0).sortBy(_._1).map(_._4).toSeq == Seq(0L, 3L))
    // plan: the window is PARTITIONED (one stratum-hash exchange, no
    // global single-partition sort)
    val plan = CurationOps.packSequences(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global window:\n$plan")
  }

  test("packSequencesBy packs by a precomputed tokenizer count, window logic count-agnostic") {
    // same 5 docs, but a 'BPE' count column that disagrees with whitespace
    // tokens (5,1,4,2,6): starts 0,5,6,10,12 at budget 7 → packs 0,0,0,1,1
    val docs = Seq(
      (1L, "a b c", 5L), (2L, "a b c", 1L), (3L, "a b c", 4L),
      (4L, "a b c", 2L), (5L, "a b c", 6L)).toDF("doc_id", "text", "bpe")
    val out = CurationOps.packSequencesBy(docs, "doc_id", col("bpe"),
      tokenBudget = 7, strata = 1)
      .orderBy("doc_id")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.map(_._3) == Seq(5L, 1L, 4L, 2L, 6L))
    assert(out.map(_._4) == Seq(0L, 5L, 6L, 10L, 12L), s"starts: $out")
    assert(out.map(_._5) == Seq(0L, 0L, 0L, 1L, 1L), s"packs: $out")
    // default counter: packSequences(textCol) ≡ packSequencesBy(tokenCount)
    val byText = CurationOps.packSequences(docs, "doc_id", "text",
      tokenBudget = 7, strata = 1).orderBy("doc_id")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    val byExpr = CurationOps.packSequencesBy(docs, "doc_id",
      graft.ops.TextOps.tokenCount(col("text")).cast("long"),
      tokenBudget = 7, strata = 1).orderBy("doc_id")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(byText == byExpr)
  }

  test("upsampleByWeight: w copies in [0,w), cap applies, w<1 and null drop") {
    val docs = Seq((1L, 1L), (2L, 3L), (3L, 0L), (4L, 99L))
      .toDF("doc_id", "w")
      .union(Seq((5L, Option.empty[Long])).toDF("doc_id", "w"))
    val out = CurationOps.upsampleByWeight(docs, "doc_id", "w", maxRepeat = 4)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 0L), (2L, 0L), (2L, 1L), (2L, 2L),
      (4L, 0L), (4L, 1L), (4L, 2L), (4L, 3L)))
    // scan-local: no shuffle in the plan
    val plan = CurationOps.upsampleByWeight(docs, "doc_id", "w")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"upsample plan shuffles:\n$plan")
  }

  test("incrementalDedup: ledger hits drop, batch dedups itself, fp ready to append") {
    import graft.ops.{DedupOps, TextOps}
    val ledgerDocs = Seq((100L, "already ingested")).toDF("doc_id", "text")
    val ledger = ledgerDocs.select(TextOps.normFingerprint(col("text")).as("fp"))
    val incoming = Seq(
      (1L, "already ingested"),   // in ledger → dropped
      (2L, "fresh content"),      // kept
      (3L, "fresh content"),      // within-batch dup of 2 → dropped
      (4L, "ALREADY   ingested")) // normalizes into the ledger → dropped
      .toDF("doc_id", "text")
    val kept = DedupOps.incrementalDedup(incoming, ledger, "doc_id", "text")
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    // the operator is its own successor: appending kept fps to the ledger
    // makes a re-run of the SAME batch return nothing
    val ledger2 = ledger.union(kept.select("fp"))
    assert(DedupOps.incrementalDedup(incoming, ledger2, "doc_id", "text")
      .count() == 0L)
  }

  test("splitAndShard: monotone holdout, independent balanced shards, dense shard_seq") {
    val docs = (0L until 20000L).map(i => (i, s"body $i")).toDF("doc_id", "text")
    val out = CurationOps.splitAndShard(docs, "doc_id", holdoutRate = 0.10, nShards = 8)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out.size == 20000)
    // realized holdout fraction tracks the requested rate
    val hold = out.filter(_._2 == "holdout").map(_._1).toSet
    assert(math.abs(hold.size / 20000.0 - 0.10) < 0.01, s"holdout ${hold.size}")
    // growing the rate keeps the holdout a SUPERSET (md5-threshold mechanics)
    val hold20 = CurationOps.splitAndShard(docs, "doc_id", 0.20, 8)
      .as[(Long, String, Long, Long)].collect()
      .filter(_._2 == "holdout").map(_._1).toSet
    assert(hold.subsetOf(hold20) && hold.size < hold20.size)
    // the shard slice is DISJOINT from the split slice: each document's
    // shard is identical under both rates (split membership can't skew it)
    val shardAt10 = out.map(r => r._1 -> r._3).toMap
    val shardAt20 = CurationOps.splitAndShard(docs, "doc_id", 0.20, 8)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(shardAt10 == shardAt20)
    // shards are roughly balanced within each split
    out.groupBy(r => (r._2, r._3)).foreach { case ((split, shard), rs) =>
      val expect = (if (split == "holdout") hold.size else 20000 - hold.size) / 8.0
      assert(math.abs(rs.size - expect) < expect * 0.2,
        s"($split,$shard): ${rs.size} vs ≈$expect")
    }
    // shard_seq is a dense 1..n ranking inside every (split, shard) file
    out.groupBy(r => (r._2, r._3)).foreach { case (k, rs) =>
      assert(rs.map(_._4).sorted == (1L to rs.size).toSeq, s"seq gap in $k")
    }
    // ...and decorrelated from input order: adjacent ids don't get
    // adjacent positions (the md5 order key is a deterministic shuffle)
    val trainS0 = out.filter(r => r._2 == "train" && r._3 == 0L).sortBy(_._4)
    assert(trainS0.sliding(2).count { case Seq(a, b) => b._1 == a._1 + 1 } <
      trainS0.size / 10)
    // plan: the only window is PARTITIONED by (split, shard)
    val plan = CurationOps.splitAndShard(docs, "doc_id", 0.10, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global window:\n$plan")
  }

  test("qualityGateByQuantile drops exactly the worst dropBelow fraction per stratum") {
    // 10 docs per stratum with distinct scores: pr = (rank-1)/9, keep
    // pr >= 0.2 → ranks 3..10 → exactly 8 survivors, the 2 lowest drop
    val docs = (0L until 30L).map(i => (i, s"s${i % 3}", "x" * (1 + (i / 3).toInt)))
      .toDF("doc_id", "source", "text")
    val out = CurationOps.qualityGateByQuantile(docs, "doc_id", "source",
      length(col("text")), dropBelow = 0.2)
      .as[(Long, String, Long)].collect().toSeq
    assert(out.size == 24)
    out.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.size == 8, s"$src kept ${rs.size}")
      // the dropped two are the shortest: ids i with i/3 in {0,1}
      assert(rs.forall(_._1 >= 6L), s"$src kept a bottom-quintile doc: $rs")
    }
    // determinism across partitionings
    val again = CurationOps.qualityGateByQuantile(docs.repartition(7), "doc_id",
      "source", length(col("text")), 0.2).as[(Long, String, Long)].collect().toSeq
    assert(again.sortBy(_._1) == out.sortBy(_._1))
  }

  test("approxQualityGate agrees with the exact gate away from the cut line, no sort in plan") {
    val docs = (0L until 3000L).map(i => (i, s"s${i % 3}", "x" * (1 + (i % 997).toInt)))
      .toDF("doc_id", "source", "text")
    val exact = CurationOps.qualityGateByQuantile(docs, "doc_id", "source",
      length(col("text")), dropBelow = 0.25)
      .as[(Long, String, Long)].collect().map(_._1).toSet
    val approxDf = CurationOps.approxQualityGate(docs, "doc_id", "source",
      length(col("text")), dropBelow = 0.25)
    val approx = approxDf.as[(Long, String, Long)].collect().map(_._1).toSet
    // the sketch may disagree only in a thin band at the cut line
    val diff = (exact diff approx) union (approx diff exact)
    assert(diff.size <= 3000 / 100, s"gates disagree on ${diff.size} docs")
    // shape: one sketch agg + broadcast join back — no window, no sort
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("Window"),
      s"approx gate plan:\n$plan")
  }

  test("dropRepeatedParagraphs keeps first occurrences and blanks, zero shuffle") {
    val docs = Seq(
      (1L, "x\nx\ny\n\nx\ny"),       // paras [x,x,y,'',x,y] → keep [x,y,'']
      (2L, "solo"),                   // nothing repeated
      (3L, "a\na\na")).toDF("doc_id", "body")
    val out = CurationOps.dropRepeatedParagraphs(docs, "doc_id", "body")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "x\ny\n", 3L, 3L),
      (2L, "solo", 1L, 0L),
      (3L, "a", 1L, 2L)))
    // custom separator: the sep is regex-quoted, not interpreted
    val piped = Seq((1L, "p|q|p|q")).toDF("doc_id", "body")
    val pOut = CurationOps.dropRepeatedParagraphs(piped, "doc_id", "body", sep = "|")
      .as[(Long, String, Long, Long)].collect().head
    assert(pOut == ((1L, "p|q", 2L, 2L)))
    // row-local: no exchange anywhere
    val plan = CurationOps.dropRepeatedParagraphs(docs, "doc_id", "body")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"paragraph dedup shuffles:\n$plan")
  }

  test("curationFunnel output is a subset of every gate it composes") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = CurationOps.curationFunnel(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out.nonEmpty, "funnel produced an empty corpus at sf0.001")
    // every survivor: non-benchmark, en, quality ≥ 60, uncontaminated, a rep
    assert(out.keys.forall(_ % 97 != 0))
    assert(out.values.forall(_ >= 60L))
    val corpus = docs.where(col("doc_id") % 97 =!= 0)
    val bench = docs.where(col("doc_id") % 97 === 0)
    val contaminated = DedupOps.contaminatedDocs(corpus, bench, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(out.keySet.intersect(contaminated).isEmpty)
    // tightening a gate can only shrink the output
    val stricter = CurationOps.curationFunnel(docs, "doc_id", "text",
      minStopMill = 120).as[(Long, Long)].collect().toMap
    assert(stricter.keySet.subsetOf(out.keySet))
  }

  test("chunkDocuments: window starts, short tail, short doc, zero shuffle") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7"), // 7 toks, max 3 stride 2 → 3 chunks
      (2L, "a b"),                  // ≤ max → one whole-doc chunk
      (3L, " ")                     // zero tokens → dropped
    ).toDF("doc_id", "text")
    val out = CurationOps.chunkDocuments(docs, "doc_id", "text",
      maxTokens = 3, stride = 2)
      .as[(Long, Int, String, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out == Seq(
      (1L, 0, "t1 t2 t3", 3L), (1L, 1, "t3 t4 t5", 3L), (1L, 2, "t5 t6 t7", 3L),
      (2L, 0, "a b", 2L)))
    // stride == maxTokens partitions the stream: chunks concatenate back
    // to the original token sequence (no overlap, full coverage)
    val disjoint = CurationOps.chunkDocuments(docs, "doc_id", "text", 3, 3)
      .where(col("doc_id") === 1L)
      .orderBy("chunk_id").as[(Long, Int, String, Long)].collect()
      .flatMap(_._3.split(' ')).toSeq
    assert(disjoint == (1 to 7).map(i => s"t$i"))
    // scan-local: no Exchange at any corpus size
    val plan = CurationOps.chunkDocuments(docs, "doc_id", "text", 3, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunkDocuments shuffles:\n$plan")
  }

  test("mixtureRates: targets, ppm rates, cap + shortfall, zero-inventory guard") {
    val cards = Seq(("a", 1000L), ("b", 100L), ("c", 5000L), ("z", 0L),
      ("unweighted", 99L)).toDF("source", "n_tokens")
    val out = CurationOps.mixtureRates(cards,
      Map("a" -> 500, "b" -> 300, "c" -> 0, "z" -> 100, "ghost" -> 100),
      tokenBudget = 2000L)
      .as[(String, Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out == Map(
      "a" -> ((500, 1000L, 1000L, 1000000L, 0L)), // exactly consumable
      "b" -> ((300, 100L, 600L, 1000000L, 500L)), // capped, shortfall reported
      "c" -> ((0, 5000L, 0L, 0L, 0L)),            // zero weight → zero rate
      "z" -> ((100, 0L, 200L, 0L, 200L))))        // empty source → rate 0
    // weight table broadcasts; sources without weights drop (explicit mixture)
    assert(!out.contains("unweighted") && !out.contains("ghost"))
    val plan = CurationOps.mixtureRates(cards, Map("a" -> 500), 2000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rate join not broadcast:\n$plan")
  }

  test("uniformSampleExact: exact k, prefix-monotone, partitioning-invariant, TakeOrdered") {
    val docs = (0L until 500L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val s10 = CurationOps.uniformSampleExact(docs, "doc_id", 10)
      .as[Long].collect().toSet
    val s50 = CurationOps.uniformSampleExact(docs, "doc_id", 50)
      .as[Long].collect().toSet
    assert(s10.size == 10 && s50.size == 50)
    assert(s10.subsetOf(s50), "k-sample must be a prefix of the larger sample")
    val again = CurationOps.uniformSampleExact(docs.repartition(7), "doc_id", 10)
      .as[Long].collect().toSet
    assert(again == s10)
    // per-partition heaps + driver merge, never a global sort shuffle
    val plan = CurationOps.uniformSampleExact(docs, "doc_id", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
  }

  test("stratifiedSampleRatedBy: ppm edges + monotone growth; executeMixture ≡ decomposed chain") {
    val docs = (0L until 10000L)
      .map(i => (i, "tok tok tok", if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    def rt(rs: (String, Long)*) = rs.toDF("source", "rate_ppm")

    // rate 10^6 keeps EVERY row of the stratum; absent strata contribute
    // nothing (inner join — outside the mixture is not in the mixture)
    assert(ids(CurationOps.stratifiedSampleRatedBy(docs, "doc_id", "source",
      rt("a" -> 1000000L))) == (0L until 10000L by 2).toSet)
    // rate 0 keeps none
    assert(ids(CurationOps.stratifiedSampleRatedBy(docs, "doc_id", "source",
      rt("a" -> 0L))).isEmpty)
    // realized rate tracks the requested ppm; raising a rate strictly
    // GROWS the sample (threshold mechanism, not a re-draw)
    val half = ids(CurationOps.stratifiedSampleRatedBy(docs, "doc_id",
      "source", rt("a" -> 500000L)))
    assert(math.abs(half.size / 5000.0 - 0.5) < 0.02, s"realized ${half.size}")
    val more = ids(CurationOps.stratifiedSampleRatedBy(docs, "doc_id",
      "source", rt("a" -> 750000L)))
    assert(half.subsetOf(more))

    // the one-plan composition equals the decomposed three calls exactly
    val weights = Map("a" -> 700, "b" -> 300)
    val comp = ids(CurationOps.executeMixture(docs, "doc_id", "text",
      "source", weights, tokenBudget = 9000L))
    val rates = CurationOps.mixtureRates(
      CurationOps.sourceStats(docs, "doc_id", "text", "source"),
      weights, tokenBudget = 9000L)
    val dec = ids(CurationOps.stratifiedSampleRatedBy(docs, "doc_id",
      "source", rates.select(col("source"), col("rate_ppm"))))
    assert(comp == dec && comp.nonEmpty)
    // realized tokens near target: budget 9000, w_a=700 → target 6300 of
    // a's 15000 tokens → rate 420000 ppm → ≈ 2100 of 5000 docs
    val aKept = comp.count(_ % 2 == 0)
    assert(math.abs(aKept / 5000.0 - 0.42) < 0.02, s"realized a docs $aKept")
    // rates ride a broadcast join
    val plan = CurationOps.stratifiedSampleRatedBy(docs, "doc_id", "source",
      rt("a" -> 500000L)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rates not broadcast:\n$plan")
  }

  test("shardManifest: counts + order-independent checksum vs an independent md5; caveats pinned") {
    // independent reference: java.security MD5 over "id:text", first 15
    // hex chars (60 bits) parsed as a long — the hashEmbed discipline
    def h(id: Long, text: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$text".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val rows = Seq(
      (1L, "train", 0L, "a b"), (2L, "train", 0L, "c"),
      (3L, "train", 1L, "d e f"), (4L, "holdout", 0L, "g"))
    val docs = rows.toDF("doc_id", "split", "shard", "text")
    val got = CurationOps.shardManifest(docs, "doc_id", "text")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("train", 0L)) ==
      (("train", 0L, 2L, 3L, h(1L, "a b") ^ h(2L, "c"))))
    assert(got(("train", 1L)) == (("train", 1L, 1L, 3L, h(3L, "d e f"))))
    assert(got(("holdout", 0L)) == (("holdout", 0L, 1L, 1L, h(4L, "g"))))

    // XOR is order/partitioning-independent
    val again = CurationOps.shardManifest(docs.repartition(7), "doc_id", "text")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(again == got)

    // one corrupted byte flips the shard's checksum (and only that shard's)
    val corrupted = (rows.take(1) ++ Seq((2L, "train", 0L, "C")) ++ rows.drop(2))
      .toDF("doc_id", "split", "shard", "text")
    val cGot = CurationOps.shardManifest(corrupted, "doc_id", "text")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(cGot(("train", 0L))._5 != got(("train", 0L))._5)
    assert(cGot(("train", 1L)) == got(("train", 1L)))

    // the documented XOR caveat: an EVEN duplicate cancels out of the
    // checksum — but n_docs/n_tokens still catch the drift
    val dup = (rows ++ Seq((1L, "train", 0L, "a b"), (1L, "train", 0L, "a b")))
      .toDF("doc_id", "split", "shard", "text")
    val dGot = CurationOps.shardManifest(dup, "doc_id", "text")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(dGot(("train", 0L))._5 == got(("train", 0L))._5)
    assert(dGot(("train", 0L))._3 == 4L && dGot(("train", 0L))._4 == 7L)
  }

  test("weightedBottomK: weight bias, exact k, non-positive weights dropped, monotone in k") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    // 200 light (w=1) vs 200 heavy (w=1000) rows in one stratum: the
    // priority key u div w makes heavy rows ~1000× likelier per slot —
    // deterministic given the ids, and overwhelmingly heavy in the top 50
    val rows = (0L until 200L).map(i => (i, 1L, "s")) ++
      (200L until 400L).map(i => (i, 1000L, "s"))
    val docs = rows.toDF("doc_id", "w", "src")
    val got = CurationOps.weightedBottomK(docs, "doc_id", "w", Seq("src"), 50)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length == 50)
    val heavy = got.count(_._3 == 1000L)
    assert(heavy >= 45, s"weight bias too weak: $heavy/50 heavy")
    // ranks are 1..50 by (pri asc, id asc)
    val sorted = got.sortBy(r => (r._4, r._2))
    assert(sorted.map(_._5).toSeq == (1L to 50L))
    // zero/negative/null weights never sample
    val withBad = (rows ++ Seq((500L, 0L, "s"), (501L, -5L, "s")))
      .toDF("doc_id", "w", "src")
    val got2 = CurationOps.weightedBottomK(withBad, "doc_id", "w", Seq("src"),
      1000).as[(String, Long, Long, Long, Long)].collect()
    assert(got2.length == 400 && !got2.exists(r => r._2 >= 500L))
    // the k-sample is a prefix of the (k+n)-sample; partitioning-invariant
    val k10 = CurationOps.weightedBottomK(docs, "doc_id", "w", Seq("src"), 10)
      .as[(String, Long, Long, Long, Long)].collect().map(_._2).toSet
    assert(k10.subsetOf(got.map(_._2).toSet))
    val again = CurationOps.weightedBottomK(docs.repartition(7), "doc_id",
        "w", Seq("src"), 50)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(again == got.toSet)
  }

  test("rendezvousAssign: balanced, deterministic, and minimally disruptive on node change") {
    val spark = SparkSessionFixture.spark
    import spark.implicits._
    val ids = (0L until 1000L).toDF("id")
    val n4 = Seq("n0", "n1", "n2", "n3")
    val a4 = CurationOps.rendezvousAssign(ids, "id", n4)
      .as[(Long, String)].collect().toMap
    // every node gets a sane share of 1000 keys (expected 250 each)
    val shares = a4.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(shares.keySet == n4.toSet && shares.values.forall(_ > 150),
      s"unbalanced: $shares")
    // the HRW property EXACTLY: adding a node moves keys ONLY to the new
    // node (an argmax over a superset either stands or is the new entry)
    val a5 = CurationOps.rendezvousAssign(ids, "id", n4 :+ "n4")
      .as[(Long, String)].collect().toMap
    val moved = a5.filter { case (id, n) => a4(id) != n }
    assert(moved.nonEmpty && moved.values.forall(_ == "n4"),
      s"keys moved to an old node: ${moved.filter(_._2 != "n4").take(5)}")
    // and removing a node reassigns ONLY its keys
    val a3 = CurationOps.rendezvousAssign(ids, "id", n4.filterNot(_ == "n2"))
      .as[(Long, String)].collect().toMap
    assert(a3.forall { case (id, n) => a4(id) == "n2" || a4(id) == n })
    // deterministic across partitionings
    val again = CurationOps.rendezvousAssign(ids.repartition(7), "id", n4)
      .as[(Long, String)].collect().toMap
    assert(again == a4)
  }
}
