package graft.ops

import org.apache.spark.sql.DataFrame
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
    val pairs = docs
      .select(TextOps.tokens(col(textCol)).as("_toks"))
      .select(explode(expr(
        """transform(
             slice(_toks, 1, greatest(cast(size(_toks) AS INT) - 1, 0)),
             (t, i) -> struct(t AS lhs, element_at(_toks, i + 2) AS rhs))"""))
        .as("p"))
      .select(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
    pairs.groupBy(col("lhs"), col("rhs")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
      .limit(topN)
  }

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
}
