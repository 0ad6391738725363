package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-training preparation operators: incremental vocabulary
  * maintenance, BPE merge-pair candidates, and per-label embedding
  * centroids. Complements [[TextOps.vocabulary]] (the one-shot cut) with
  * the ledger-shaped pieces a continuously-ingesting corpus needs.
  */
object TrainPrepOps {

  /** Full (token, cnt) counts — [[TextOps.vocabulary]] WITHOUT the
    * threshold/cut, i.e. the additive ledger state. Counts are the
    * commutative monoid that makes vocabulary maintenance incremental:
    * merge ledgers with [[mergeVocabCounts]], cut with [[cutVocab]] only
    * at READ time (a cut ledger has lost counts forever — spec-pinned).
    *
    * 100 TB shape: identical to the one-shot op — one hash agg with
    * map-side partial combine, skew-proof by construction.
    */
  def vocabularyCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Merge two count ledgers (either may be a delta): counts are
    * additive, so the merged ledger over batches A∪B is bit-identical to
    * counting A∪B in one pass — the invariant that makes vocabulary a
    * MERGE-maintainable snapshot table.
    *
    * 100 TB shape: one union + one hash agg on the lexicon-sized token
    * key; at scale both ledgers are parquet bucketed by token, making
    * this a co-located merge.
    */
  def mergeVocabCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("token"), col("cnt"))
      .unionByName(b.select(col("token"), col("cnt")))
      .groupBy("token").agg(sum(col("cnt")).as("cnt"))

  /** Threshold + deterministic top-N cut over a count ledger — the read
    * side of incremental vocabulary. Same total order as
    * [[TextOps.vocabulary]]: (cnt desc, token asc); compiles to
    * TakeOrdered, never a global sort.
    */
  def cutVocab(counts: DataFrame, minCount: Long, topN: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topN > 0, s"topN must be positive, got $topN")
    counts.where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topN)
  }

  /** BPE merge-pair candidates: corpus counts of ADJACENT token pairs —
    * the statistic a byte-pair/unigram tokenizer trainer greedily merges
    * on. Pairs build row-locally (an indexed `transform` over the token
    * array — no self-join, no positional shuffle); the threshold and the
    * (cnt desc, lhs asc, rhs asc) top-N cut are total-ordered so the
    * candidate list is deterministic on any engine. Returns
    * (lhs, rhs, cnt).
    *
    * 100 TB shape: like [[vocabularyCounts]] — the explode feeds ONE
    * map-side-combinable hash agg on the (lhs, rhs) key (bounded by the
    * bigram lexicon, not the corpus); the cut is a TakeOrdered.
    */
  def mergePairCandidates(docs: DataFrame, textCol: String,
      minCount: Long = 2L, topN: Int = 10000): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topN > 0, s"topN must be positive, got $topN")
    adjacentPairCounts(
      docs.select(TextOps.tokens(col(textCol)).as("_toks")), "_toks")
      .where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
      .limit(topN)
  }

  /** Corpus counts of adjacent token pairs over a token-array column:
    * pairs build ROW-LOCALLY (indexed `transform`, no self-join), then one
    * map-side-combinable hash agg on the bigram-lexicon-sized (lhs, rhs)
    * key. Shared by [[mergePairCandidates]] and [[learnMerges]].
    */
  private def adjacentPairCounts(df: DataFrame, toksCol: String): DataFrame =
    df.select(explode(expr(
      s"""transform(
            slice($toksCol, 1, greatest(cast(size($toksCol) AS INT) - 1, 0)),
            (t, i) -> struct(t AS lhs, element_at($toksCol, i + 2) AS rhs))"""))
      .as("p"))
      .select(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .groupBy(col("lhs"), col("rhs")).agg(count(lit(1)).as("cnt"))

  /** Per-label embedding centroid in FIXED-POINT arithmetic (the
    * [[SimilarityOps.ivfFitRefined]] determinism discipline, relational
    * form): each component quantizes to `floor(x · 2^20)` BIGINT, sums
    * are associative (partitioning-independent), and the mean divides in
    * IEEE double — the identical op sequence on any engine, so the
    * centroid bytes replay exactly. Labels come from a dimension table
    * (e.g. documents.source keyed by doc id). Returns
    * (label, n_vecs, centroid_q) with centroid_q[i] =
    * floor(Σ floor(x_i·2^20) / n).
    *
    * 100 TB shape: the embeddings⋈labels join is on the unique vector id
    * (broadcast the dimension or pre-bucket both); per-component rows
    * shuffle ONCE to the (label, pos) hash agg with map-side combine
    * (partials per partition ≤ |labels|·dims); reassembly keys on the
    * tiny label. `array_sort` over (pos, sum) structs makes the
    * collect_list order canonical — no reliance on shuffle order.
    */
  def labelCentroids(embs: DataFrame, idCol: String, vecCol: String,
      labels: DataFrame, labelIdCol: String, labelCol: String): DataFrame = {
    val labeled = embs.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .join(labels.select(col(labelIdCol).as("_id"), col(labelCol).as("label")),
        "_id")
    val elems = labeled
      .select(col("label"), posexplode(col("_v")).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        floor(col("x").cast("double") * lit(1048576.0)).cast("long").as("q"))
    val sums = elems.groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
    sums.groupBy(col("label"))
      .agg(max(col("n")).cast("long").as("n_vecs"),
        array_sort(collect_list(struct(col("pos"), col("s")))).as("_ps"))
      .select(col("label"), col("n_vecs"),
        transform(col("_ps"), e =>
          floor(e.getField("s").cast("double") / col("n_vecs")).cast("long"))
          .as("centroid_q"))
  }

  /** Per-label embedding outliers — the vectors FARTHEST from their own
    * label's centroid, the mislabel/junk-encoder audit a training
    * pipeline runs before trusting label-conditioned sampling (q71's
    * centroids acting as a screen): top-`topK` per label by squared L2
    * in the centroid's own fixed-point units (`dist_q2 =
    * Σ (floor(x·2^20) − centroid_q)²` — pure BIGINT, so ranks are
    * integer comparisons any engine replays; ties break id-asc). A
    * report, not a rewrite: compose with an anti-join to act, or with
    * [[graft.ops.CurationOps.qualityGateByQuantile]] for a rate-based
    * cut instead of a count-based one.
    *
    * 100 TB shape: centroids are label-cardinality and BROADCAST back;
    * the distance is a row-local codegen'd `zip_with`+`aggregate` over
    * the already-joined row (the embeddings⋈labels join is on the unique
    * vector id); the only added shuffle is the per-label top-k window,
    * carrying one (id, label, long) row per vector.
    */
  def centroidOutliers(embs: DataFrame, idCol: String, vecCol: String,
      labels: DataFrame, labelIdCol: String, labelCol: String,
      topK: Int = 3): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val cents = labelCentroids(embs, idCol, vecCol, labels, labelIdCol, labelCol)
    val labeled = embs.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .join(labels.select(col(labelIdCol).as("_id"), col(labelCol).as("label")),
        "_id")
      .join(broadcast(cents.select(col("label"), col("centroid_q"))),
        Seq("label"))
    val dist = aggregate(zip_with(col("_v"), col("centroid_q"),
        (x, c) => {
          val q = floor(x.cast("double") * lit(1048576.0)).cast("long") - c
          q * q
        }),
      lit(0L), (acc, v) => acc + v)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("label"))
      .orderBy(col("dist_q2").desc, col("_id"))
    labeled.withColumn("dist_q2", dist)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("label"), col("_id").as(idCol), col("dist_q2"), col("rank"))
  }

  /** Apply a ranked BPE merge list to each document's token stream — the
    * ACTING half of [[mergePairCandidates]] (candidates → pick top pairs →
    * apply → recount is the byte-pair training loop, and this operator
    * with a full learned list is BPE *encoding*). Each rule `(a, b)`
    * rewrites every greedy left-to-right non-overlapping adjacent
    * occurrence of `a, b` into the single symbol `a+b`; rules apply in
    * list order, so later rules see earlier rules' merged symbols
    * (standard BPE semantics — symbols are strings, matching is string
    * equality). One pass per rule reaches that rule's fixed point: a
    * merged symbol `a+b` can never re-match `(a, b)` (it is strictly
    * longer than both sides), so no rescan loop is needed.
    *
    * Determinism: greedy left-to-right is a total tie-break. The only
    * overlap case is `a == b`, where a run of k consecutive `a`s merges at
    * even offsets (⌊k/2⌋ pairs) — resolved positionally, no RNG, so any
    * engine replays the bytes.
    *
    * Docs with zero tokens are dropped (no token stream to encode).
    * Returns (idCol, toks: array<string>, n_tokens).
    *
    * 100 TB shape: entirely scan-local — one projection per rule, ZERO
    * shuffle at any corpus size; the statically-unrolled rule chain
    * composes with whatever partitioning the surrounding pipeline has.
    * Per-rule cost is O(tokens) for `a ≠ b` rules; `a == b` rules pay an
    * extra O(run) prefix scan at each same-token run position (bounded by
    * the longest same-token run in a document — constant-sized in natural
    * text). The merge list itself is plan-side (Catalyst literals), which
    * is the right encoding for the ≤ vocab-sized rule lists of real
    * tokenizers; a corpus-derived list feeds in as `collect()`ed rows of
    * [[mergePairCandidates]]'s bounded-topN output.
    */
  def applyMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "applyMerges: empty merge list")
    merges.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty, s"applyMerges: empty symbol in ($a,$b)")
      require(!a.exists(_.isWhitespace) && !b.exists(_.isWhitespace),
        s"applyMerges: symbols cannot contain whitespace: ($a,$b)")
    }
    val base = docs.select(col(idCol),
      TextOps.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
    val out = merges.foldLeft(base) { case (df, (a, b)) =>
      df.withColumn("toks", mergeOnce(col("toks"), a, b))
    }
    out.select(col(idCol), col("toks"),
      size(col("toks")).cast("long").as("n_tokens"))
  }

  /** Learn a BPE merge list from the corpus — the TRAINING LOOP that
    * [[mergePairCandidates]] (the statistic) and [[applyMerges]] (the
    * rewrite) are the halves of: each round counts adjacent pairs over the
    * CURRENT symbol streams, picks the argmax under the total order
    * (cnt desc, lhs asc, rhs asc), applies that one merge greedily
    * left-to-right, and recounts. Stops early when no pair reaches
    * `minCount`. Returns the learned list as (round, lhs, rhs, cnt) with
    * `cnt` the pair's corpus count AT SELECTION TIME (counts are over
    * merged symbols from round 2 on — the defining property of BPE
    * training, and why the loop cannot be expressed as one pass).
    *
    * Determinism: the argmax order is total and the pair counts are exact,
    * so the learned list is unique — any engine that replays the rounds
    * lands on the same rules byte-for-byte (the q73 oracle does exactly
    * that with chained window passes). Feeding the list to [[applyMerges]]
    * reproduces the loop's final token streams (spec-pinned), which is how
    * a trained tokenizer ENCODES unseen text.
    *
    * 100 TB shape: each round is one corpus pass — a row-local rewrite
    * projection plus one map-side-combinable pair-count agg bounded by the
    * bigram lexicon — and ships exactly ONE row to the driver (the
    * argmax, via TakeOrdered). Rounds checkpoint eagerly so the plan stays
    * O(1) deep at any merge count ([[DedupOps.dupClusters]] discipline):
    * `checkpointDir = Some(path)` writes round files to shared storage
    * (preemptible-executor-safe); the default `localCheckpoint` trades
    * that for zero storage on stable fleets. Training cost is
    * O(nMerges · corpus) by definition of greedy BPE — real trainers run
    * this on a SAMPLE of the corpus (compose with
    * [[CurationOps.stratifiedSampleRated]]), then [[applyMerges]] encodes
    * the full corpus in one statically-unrolled scan-local pass.
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, checkpointDir: Option[String] = None): DataFrame = {
    require(nMerges >= 1 && nMerges <= 10000,
      s"learnMerges: nMerges must be in [1, 10000], got $nMerges")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val spark = docs.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def snap(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)

    var cur = snap(docs.select(TextOps.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0))
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= nMerges && !exhausted) {
      // One row reaches the driver: the argmax pair under the total order.
      val best = adjacentPairCounts(cur, "toks")
        .where(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val a = best(0).getString(0)
        val b = best(0).getString(1)
        learned += ((round, a, b, best(0).getLong(2)))
        val prev = cur
        cur = snap(cur.select(mergeOnce(col("toks"), a, b).as("toks")))
        prev.unpersist()
        round += 1
      }
    }
    cur.unpersist()
    import spark.implicits._
    spark.createDataset(learned.toSeq)
      .toDF("round", "lhs", "rhs", "cnt")
  }

  /** One greedy left-to-right merge pass of rule `(a, b)` over a token
    * array, row-local. Two plan shapes, chosen at build time:
    *
    *  - `a != b`: matches can never overlap (a second match at i+1 would
    *    need t(i+1) = b = a), so greedy = ALL matches: mark each match
    *    start with the merged symbol, null out each match second, filter.
    *  - `a == b`: within each maximal run of k consecutive `a`s, greedy
    *    merges pairs at even run offsets. The run offset is recovered per
    *    position as the length of the all-`a` suffix of the preceding
    *    prefix (reverse + first-non-`a` position) — evaluated only at
    *    `a`-positions, O(run) each.
    *
    * `get` (0-based, null out-of-bounds) instead of `element_at` keeps the
    * boundary positions ANSI-safe: a null neighbour fails the `===` match
    * and falls through to keep, with no index guard needed.
    */
  private def mergeOnce(toks: Column, a: String, b: String): Column = {
    val marked =
      if (a != b) {
        transform(toks, (t, i) =>
          when(t === lit(a) && get(toks, i + 1) === lit(b), lit(a + b))
            .when(t === lit(b) && get(toks, i - 1) === lit(a),
              lit(null).cast("string"))
            .otherwise(t))
      } else {
        transform(toks, (t, i) => {
          // run offset: #consecutive a's immediately before position i
          val firstNonA = array_position(
            transform(reverse(slice(toks, lit(1), i)), x => x =!= lit(a)),
            lit(true))
          val off = when(firstNonA === lit(0L), i.cast("long"))
            .otherwise(firstNonA - lit(1L))
          when(t === lit(a) && off % 2 === 0 && get(toks, i + 1) === lit(a),
            lit(a + a))
            .when(t === lit(a) && off % 2 === 1, lit(null).cast("string"))
            .otherwise(t)
        })
      }
    filter(marked, _.isNotNull)
  }

  /** PMI collocations — phrase discovery for tokenizer/vocab prep: the
    * top-N adjacent token pairs by pointwise mutual information,
    * `pmi = log2(p(ab) / (p(a)·p(b)))`, in the library's INTEGER-bits
    * log2 (the [[graft.ops.TextOps.surprisalStats]] discipline):
    *
    *   pmi_bits = bitlen(c_ab) + 2·bitlen(N1) − bitlen(N2)
    *              − bitlen(c_a) − bitlen(c_b)
    *
    * where `bitlen(x) = length(bin(x))` and N1/N2 are the corpus unigram/
    * bigram totals. The bitlen SUM form never forms a product — at
    * 100 TB, `c_ab·N1²` overflows any integer, the sum of bit lengths
    * cannot — at a quantization cost of ±1 bit per term (documented; the
    * ranking tie-break (pmi desc, cnt desc, lhs, rhs) keeps the cut
    * deterministic regardless). `minCount` drops the unstable hapax tail
    * — PMI's classic failure mode is maximal scores for pairs seen once.
    *
    * 100 TB shape: bigrams build row-locally (the [[mergePairCandidates]]
    * transform — no self-join); both count aggs are map-side combinable
    * on lexicon-sized keys; the two totals join as 1-row broadcasts; the
    * unigram join keys on the lexicon; the cut is TakeOrdered — no global
    * sort shuffle.
    */
  def pmiBigrams(docs: DataFrame, textCol: String, minCount: Long = 5L,
      topN: Int = 100): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topN > 0, s"topN must be positive, got $topN")
    val toks = docs.select(explode(TextOps.tokens(col(textCol))).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("c1"))
    val n1 = uni.agg(sum(col("c1")).cast("long").as("n1"))
      .select(length(bin(col("n1"))).cast("long").as("n1_bits"))
    val pairsAll = adjacentPairCounts(
      docs.select(TextOps.tokens(col(textCol)).as("_toks")), "_toks")
    // N2 totals ALL bigrams (p(ab)'s denominator), before the stability cut
    val n2 = pairsAll.agg(sum(col("cnt")).cast("long").as("n2"))
      .select(length(bin(col("n2"))).cast("long").as("n2_bits"))
    val pairs = pairsAll.where(col("cnt") >= minCount)
    pairs
      .join(uni.select(col("tok").as("lhs"),
        length(bin(col("c1"))).cast("long").as("lhs_bits")), Seq("lhs"))
      .join(uni.select(col("tok").as("rhs"),
        length(bin(col("c1"))).cast("long").as("rhs_bits")), Seq("rhs"))
      .join(broadcast(n1)).join(broadcast(n2))
      .select(col("lhs"), col("rhs"), col("cnt").cast("long").as("n_pair"),
        (length(bin(col("cnt"))).cast("long") + lit(2L) * col("n1_bits") -
          col("n2_bits") - col("lhs_bits") - col("rhs_bits"))
          .as("pmi_bits"))
      .orderBy(col("pmi_bits").desc, col("n_pair").desc, col("lhs").asc,
        col("rhs").asc)
      .limit(topN)
  }
}
