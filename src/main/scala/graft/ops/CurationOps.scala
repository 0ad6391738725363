package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the selection stages a training-data
  * pipeline runs AFTER the analysis passes (dedup clusters, quality,
  * language ID, decontamination) have produced their facets. Everything
  * here is declarative Catalyst (windows, joins, codegen'd expressions);
  * each op documents its 100 TB plan shape.
  */
object CurationOps {

  /** One representative document per near-duplicate cluster: the LONGEST
    * text wins, ties broken by min id — the standard keep-the-best-copy
    * policy after transitive dedup (cluster ids from
    * [[DedupOps.dupClusters]]).
    *
    * Scale shape: one hash-join docs⋈clusters on the id (both sides
    * pre-partitionable by id), then a window per cluster. Near-dup
    * clusters are budget-bounded small in practice (pathological
    * mega-clusters — boilerplate pages — are exactly the rows a curation
    * pipeline wants collapsed to one, and AQE splits a skewed cluster's
    * sort); no driver-side state.
    */
  def clusterRepresentatives(docs: DataFrame, clusters: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val sized = docs.select(col(idCol), length(col(textCol)).cast("long").as("_len"))
      .join(clusters, idCol)
    val byCluster = Window.partitionBy(col("cluster"))
    sized
      .withColumn("_rn", row_number().over(
        byCluster.orderBy(col("_len").desc, col(idCol))))
      .withColumn("n_members", count(lit(1)).over(byCluster))
      .where(col("_rn") === 1)
      .select(col("cluster"), col(idCol).as("rep_id"),
        col("n_members").cast("long").as("n_members"))
  }

  /** Deterministic hash-stratified sampling: a document survives when the
    * first md5 byte of its id sorts below the first md5 byte of its
    * stratum — every stratum gets its own stable rate in [0, 255]/256,
    * derived from nothing but the stratum name, and the SAME rows survive
    * on every engine and at every parallelism (md5 hex compares are plain
    * ASCII byte compares in Spark and DuckDB alike).
    *
    * Scale shape: a narrow projection + filter — no shuffle, no state;
    * the filter sits directly on the scan, so column pruning and
    * predicate evaluation stay inside whole-stage codegen.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String)
      : DataFrame =
    docs
      .select(col(idCol), col(stratumCol),
        substring(md5(col(idCol).cast("string")), 1, 2).as("_h"),
        substring(md5(col(stratumCol)), 1, 2).as("rate_hex"))
      .where(col("_h") < col("rate_hex"))
      .select(col(idCol), col(stratumCol), col("rate_hex"))

  /** A keep-rate in [0,1] as the 8-hex-char threshold its 32-bit hash
    * slice is compared against: a row survives iff
    * `substring(md5(id),1,8) < rateHex(rate)` — lowercase hex compares are
    * plain ASCII byte compares, identical in Spark and DuckDB, so the SAME
    * rows survive on every engine. `rate ≥ 1` maps to `"g"` (lexically
    * above every hex digit — keeps all); `rate ≤ 0` maps to `"00000000"`
    * (strict `<` never true — keeps none).
    */
  def rateHex(rate: Double): String =
    if (rate >= 1.0) "g"
    else if (rate <= 0.0) "00000000"
    else f"${math.floor(rate * 4294967296.0).toLong}%08x"

  /** Caller-specified per-stratum keep rates — the production form of
    * [[stratifiedSample]]: "keep 10% of stratum X, 80% of Y". Mechanism is
    * the same deterministic md5 filter (no RNG — rerun/resume/engine
    * stable; raising a rate strictly grows the sample, so a 10% sample is
    * a subset of the 20% one); the rate comes from the caller's map
    * instead of the stratum-name hash. Strata absent from the map keep
    * `defaultRate`.
    *
    * Scale shape: the rate table is caller-small → broadcast left join
    * (no shuffle of the corpus), then a scan-local filter; the rates ride
    * as data, not as plan literals, so a million-stratum map costs plan
    * size nothing (the r4 `typedlit` lesson).
    */
  def stratifiedSampleRated(docs: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.map { case (s, r) => (s, rateHex(r)) }
      .toDF(stratumCol, "_rate_hex")
    docs
      .select(col(idCol), col(stratumCol),
        substring(md5(col(idCol).cast("string")), 1, 8).as("_h"))
      .join(broadcast(rateDf), Seq(stratumCol), "left")
      .where(col("_h") < coalesce(col("_rate_hex"), lit(rateHex(defaultRate))))
      .select(col(idCol), col(stratumCol))
  }

  /** [[stratifiedSampleRated]] with the rates as a TABLE instead of a
    * driver-side map — the form [[mixtureRates]] feeds directly (no
    * driver round-trip between calibration and execution): `rates` is
    * `(stratumCol, rate_ppm)` with rate_ppm ∈ [0, 10^6] BIGINT, and a
    * doc survives iff its 32-bit md5 slice (as a BIGINT) sorts below
    * `rate_ppm · 2^32 div 10^6` — pure integer arithmetic, exactly the
    * q55 mechanism at ppm granularity (rate_ppm = 10^6 keeps ALL;
    * raising a rate strictly grows the sample). Strata absent from the
    * rate table contribute NOTHING (inner join — a source outside the
    * mixture is not in the mixture), unlike the map variant's
    * defaultRate knob.
    *
    * 100 TB shape: identical to the map variant — scan-local md5
    * threshold behind a broadcast rate join, zero corpus shuffle.
    */
  def stratifiedSampleRatedBy(docs: DataFrame, idCol: String,
      stratumCol: String, rates: DataFrame): DataFrame =
    docs.select(col(idCol), col(stratumCol),
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long").as("_h"))
      .join(broadcast(rates.select(col(stratumCol), col("rate_ppm"))),
        Seq(stratumCol))
      .where(col("_h") < expr("rate_ppm * 4294967296 div 1000000"))
      .select(col(idCol), col(stratumCol))

  /** The mixture pipeline end to end in ONE Catalyst plan — inventory →
    * calibration → execution ([[sourceStats]] → [[mixtureRates]] →
    * [[stratifiedSampleRatedBy]]), the [[curationFunnel]] discipline
    * applied to mixture design: what a designer iterates on is the
    * `weights`/`tokenBudget` arguments, and everything downstream
    * recomputes consistently (no stale hand-carried rate tables).
    * Returns the sampled `(idCol, sourceCol)` rows.
    *
    * 100 TB shape: the cards/rates legs aggregate to source-cardinality
    * rows and broadcast; the corpus is scanned twice (once for the
    * inventory, once for the sample filter) with zero corpus shuffle in
    * the sampling leg — at scale you materialize [[sourceStats]] once
    * per snapshot and pass it in, which this composition mirrors
    * structurally (the operator takes no shortcuts the decomposed calls
    * would not).
    */
  def executeMixture(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, weights: Map[String, Int],
      tokenBudget: Long): DataFrame = {
    val cards = sourceStats(docs, idCol, textCol, sourceCol)
    val rates = mixtureRates(cards, weights, tokenBudget)
    stratifiedSampleRatedBy(docs, idCol, sourceCol,
      rates.select(col("source").as(sourceCol), col("rate_ppm")))
  }

  /** C4-style duplicated-line removal (Raffel et al. 2020 §2.2 "we
    * discarded ... any line that appeared more than once"): drop every
    * line whose exact text occurs in at least `minDocFreq` distinct
    * documents (boilerplate — cookie banners, footers, nav), then
    * reassemble each document's surviving lines in original order.
    * Returns `(idCol, clean_text, n_kept)`; a document whose every line
    * was boilerplate disappears from the output (that is the point).
    * Blank lines are never counted as boilerplate.
    *
    * Scale shape: posexplode → one hash-agg on the line text (map-side
    * combine; the doc-frequency side collapses to distinct common lines,
    * typically tiny next to the corpus) → anti-join on the line → one
    * groupBy(id) reassembly. Two shuffles total, both on keys that
    * shrink: no window, no driver state, skew on a mega-boilerplate line
    * is irrelevant because the agg output is one row per distinct line.
    */
  def dropCommonLines(docs: DataFrame, idCol: String, textCol: String,
      minDocFreq: Long = 2): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("off", "line")))
    val common = lines
      .where(trim(col("line")) =!= "")
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("df"))
      .where(col("df") >= minDocFreq)
      .select(col("line"))
    lines.join(common, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("off"), col("line")))),
            x => x.getField("line")), "\n").as("clean_text"),
        count(lit(1)).cast("long").as("n_kept"))
  }

  /** GPT-style sequence-packing ASSIGNMENT — the training-prep step after
    * curation: concatenate documents in a deterministic order and cut the
    * stream every `tokenBudget` tokens; a document belongs to the pack in
    * which it STARTS (`pack_id = start_offset div budget`; the trainer's
    * loader splits stragglers locally). Documents are first sharded into
    * `strata` independent streams (`id mod strata`) so the packing is
    * embarrassingly parallel; within a stratum order is by id, so the
    * assignment is a pure function of the input.
    *
    * Returns `(idCol, stratum, n_tokens, start_tok, pack_id)`.
    *
    * Scale shape: ONE shuffle (hash on stratum) + a PARTITIONED window —
    * never a global sort. Each stratum holds |corpus|/strata rows
    * (uniform ids), so at 10^11 docs and strata = 2^20 a window sorts
    * ~10^5 rows; raise `strata` to scale out further. The running sum is
    * the only state and it rides the window operator.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      tokenBudget: Long = 2048, strata: Int = 1024): DataFrame =
    packSequencesBy(docs, idCol,
      TextOps.tokenCount(col(textCol)).cast("long"), tokenBudget, strata)

  /** Tokenizer-pluggable form of [[packSequences]]: `tokenCountExpr`
    * supplies the per-document token count — typically a PRECOMPUTED
    * tokenizer count column (`col("bpe_count")`) from the real training
    * tokenizer, since whitespace tokens ([[TextOps.tokenCount]], the
    * [[packSequences]] default) only approximate BPE lengths. The window
    * logic is count-agnostic; the plan shape (one stratum-hash shuffle +
    * a partitioned window) is identical.
    */
  def packSequencesBy(docs: DataFrame, idCol: String, tokenCountExpr: Column,
      tokenBudget: Long = 2048, strata: Int = 1024): DataFrame = {
    require(tokenBudget > 0 && strata > 0)
    val w = Window.partitionBy(col("stratum")).orderBy(col(idCol))
    docs.select(col(idCol),
        pmod(col(idCol), lit(strata)).cast("int").as("stratum"),
        tokenCountExpr.cast("long").as("n_tokens"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .withColumn("pack_id", expr(s"start_tok div $tokenBudget"))
      .select(col(idCol), col("stratum"), col("n_tokens"),
        col("start_tok"), col("pack_id"))
  }

  /** Deterministic integer upsampling for training mixtures (the
    * quality-weighted repetition step of mixture construction — e.g.
    * Llama-style source reweighting, done per document): emit `w` copies
    * of each doc id, `w` from an integer weight column, capped at
    * `maxRepeat` (unbounded repetition of one document is never what a
    * mixture wants), docs with weight < 1 dropped. Output is
    * `(idCol, copy)` with `copy` in `[0, w)` — the trainer joins text
    * back by id, so the expansion never materializes document bytes.
    *
    * Scale shape: scan-local `explode(sequence(...))` — zero shuffle,
    * zero state; output row count = Σ min(w, maxRepeat), controlled
    * entirely by the weight expression the caller supplies.
    */
  def upsampleByWeight(docs: DataFrame, idCol: String, weightCol: String,
      maxRepeat: Int = 16): DataFrame =
    docs
      // explicit null gate: Spark's least() SKIPS nulls, so without it a
      // null weight would silently upsample to maxRepeat
      .where(col(weightCol).isNotNull)
      .select(col(idCol),
        least(col(weightCol), lit(maxRepeat)).cast("int").as("_w"))
      .where(col("_w") >= 1)
      .select(col(idCol), explode(sequence(lit(0), col("_w") - 1)).as("copy"))
      .select(col(idCol), col("copy").cast("long").as("copy"))

  /** The full curation funnel as ONE declarative plan — the composition a
    * reference user runs stage-by-stage with intermediate materialization,
    * expressed so Catalyst sees every stage at once (filters reordered
    * and pushed to the scan, shared scans reused):
    *
    *   1. hold out the benchmark slice (`id % benchMod == 0`);
    *   2. language gate: [[TextOps.langIdCol]] == `wantLang`;
    *   3. quality gate: stopword ratio ≥ `minStopMill` mills
    *      ([[TextOps.stopwordRatioMill]]; token-less docs drop with it);
    *   4. decontamination: anti-join against
    *      [[DedupOps.contaminatedDocs]] (any shared `shingleK`-gram with
    *      the benchmark slice);
    *   5. near-dup collapse: keep only cluster representatives
    *      ([[DedupOps.dupClusters]] over MinHash-LSH candidates verified
    *      at Jaccard ≥ 0.8, longest-text-wins policy).
    *
    * Scale shape: gates 1–3 are scan-local codegen; gate 4 is a broadcast
    * anti-join (benchmark shingles are the small side by construction);
    * gate 5 reuses the dedup stack's bounded shuffles. Nothing here adds
    * a driver-side structure.
    */
  def curationFunnel(docs: DataFrame, idCol: String, textCol: String,
      benchMod: Int = 97, wantLang: String = "en", minStopMill: Long = 60,
      shingleK: Int = 3): DataFrame = {
    val corpus = docs.where(col(idCol) % benchMod =!= 0)
    val bench = docs.where(col(idCol) % benchMod === 0)
    // one fused scan-side predicate (r6): [[TextOps.langStopGate]] is
    // exactly the langIdCol/stop_mill filter conjunction this block used
    // to phrase as two filters, evaluated once per row instead of
    // re-tokenizing per predicate; stop_mill is then recomputed — original
    // expression, unchanged output — for SURVIVORS only
    val gated = corpus
      .where(TextOps.langStopGate(col(textCol), wantLang, minStopMill))
      .select(col(idCol), col(textCol),
        TextOps.stopwordRatioMill(col(textCol)).cast("long").as("stop_mill"))
    val contaminated = DedupOps.contaminatedDocs(
      corpus, bench, idCol, textCol, shingleK).select(col(idCol))
    val clean = gated.join(contaminated, Seq(idCol), "left_anti")
    // dedup facets over the FULL corpus (q35's exact composition), so the
    // representative choice is independent of the upstream gates
    val reps = nearDupReps(docs, idCol, textCol)
    clean.join(reps, Seq(idCol), "left_semi")
      .select(col(idCol), col("stop_mill"))
  }

  /** The funnel's near-dup representative facet as one reusable plan:
    * MinHash-LSH candidates → exact Jaccard ≥ 0.8 verify → transitive
    * clusters → longest-text-wins representatives, over the FULL corpus
    * (q35's exact composition). Returns one `idCol` column of surviving
    * representative ids (every singleton survives as its own rep).
    */
  def nearDupReps(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cand = DedupOps.minhashCandidatePairs(docs, idCol, textCol,
      shingleK = 3, bands = 4, rowsPerBand = 2)
    val verified = DedupOps.ngramJaccardForPairs(docs, cand, idCol, textCol,
        shingleK = 3, minShared = 1)
      .where(col("n_inter") * 10 >= col("n_union") * 8)
    val clusters = DedupOps.dupClusters(docs, verified, idCol)
    clusterRepresentatives(docs, clusters, idCol, textCol)
      .select(col("rep_id").as(idCol))
  }

  /** Batch compaction of a STREAMED-accepted corpus — the hand-off
    * [[graft.streaming.StreamingCuration]] documents: the streaming funnel
    * runs the per-document stages (language/quality gates, PII scrub,
    * exact first-arrival dedup); the corpus-wide stages that keyed
    * streaming state cannot express — benchmark holdout, decontamination,
    * near-dup collapse — run here, periodically, over the accepted table.
    *
    * @param accepted  the streamed-accepted docs (ids at minimum — the
    *                  output of [[graft.streaming.StreamingCuration.curateStream]]
    *                  as committed by the ingestion job)
    * @param rawCorpus the raw archive the stream ingested from (a crawl
    *                  pipeline always retains it) — near-dup facets and
    *                  the benchmark slice compute over the FULL corpus, so
    *                  representative choice matches the batch funnel's
    *
    * Output `(idCol, stop_mill)` — the same columns [[curationFunnel]]
    * emits, and for a corpus whose exact duplicates are byte-identical the
    * same ROWS (streaming's fingerprint dedup keeps the min id of a
    * byte-identical group, which is exactly the group's longest-text/min-id
    * cluster representative; a whitespace-padded variant of a duplicate
    * would instead win the batch rep choice by raw length —
    * StreamingCurationSpec pins the equivalence and this caveat). Requires
    * the stream to have run with the same `wantLang`/`minStopMill` the
    * batch funnel uses.
    *
    * Scale shape: identical to the funnel's corpus-wide stages — broadcast
    * anti-join for decontamination, the dedup stack's bounded shuffles for
    * reps, one id-keyed join to recover `stop_mill` from the raw table.
    */
  def compactAccepted(accepted: DataFrame, rawCorpus: DataFrame,
      idCol: String, textCol: String, benchMod: Int = 97,
      shingleK: Int = 3): DataFrame = {
    val corpus = rawCorpus.where(col(idCol) % benchMod =!= 0)
    val bench = rawCorpus.where(col(idCol) % benchMod === 0)
    val contaminated = DedupOps.contaminatedDocs(
      corpus, bench, idCol, textCol, shingleK).select(col(idCol))
    val reps = nearDupReps(rawCorpus, idCol, textCol)
    accepted.select(col(idCol))
      .where(col(idCol) % benchMod =!= 0)
      .join(contaminated, Seq(idCol), "left_anti")
      .join(reps, Seq(idCol), "left_semi")
      .join(rawCorpus.select(col(idCol),
        TextOps.stopwordRatioMill(col(textCol)).cast("long").as("stop_mill")),
        Seq(idCol))
      .select(col(idCol), col("stop_mill"))
  }

  /** Deterministic train/holdout split + output sharding — the LAST step
    * of a curation pipeline, producing what the trainer actually reads:
    * each document gets a `split` ("holdout" iff its 32-bit md5 slice
    * sorts below [[rateHex]](holdoutRate), same monotone mechanism as
    * [[stratifiedSampleRated]] — growing the holdout keeps it a superset),
    * a `shard` in [0, nShards) from an INDEPENDENT md5 slice (hex chars
    * 9–12, disjoint from the split slice, so split membership never skews
    * shard balance), and `shard_seq` — the document's position within its
    * (split, shard) file in md5 order, i.e. a deterministic global
    * shuffle: adjacent input documents land in unrelated shard positions,
    * which is exactly the decorrelation a training loader wants, yet the
    * whole assignment is a pure function of the ids (rerun/resume/engine
    * stable, no RNG state).
    *
    * Scale shape: the split/shard/order keys are scan-local codegen
    * (three md5 slices); the only shuffle is the hash on (split, shard)
    * feeding a PARTITIONED window of |corpus|/nShards rows — raise
    * `nShards` to scale out (a 10^11-doc corpus at nShards = 2^20 sorts
    * ~10^5 rows per window partition). Writing the result partitioned by
    * (split, shard) then gives shuffle-free, individually-orderable
    * training files.
    */
  def splitAndShard(docs: DataFrame, idCol: String, holdoutRate: Double,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val hx = md5(col(idCol).cast("string"))
    val withKeys = docs.select(
      col(idCol),
      when(substring(hx, 1, 8) < lit(rateHex(holdoutRate)), lit("holdout"))
        .otherwise(lit("train")).as("split"),
      pmod(conv(substring(hx, 9, 4), 16, 10).cast("long"), lit(nShards.toLong))
        .as("shard"),
      substring(hx, 13, 8).as("_ord"))
    val w = Window.partitionBy(col("split"), col("shard"))
      .orderBy(col("_ord"), col(idCol))
    withKeys
      .withColumn("shard_seq", row_number().over(w).cast("long"))
      .select(col(idCol), col("split"), col("shard"), col("shard_seq"))
  }

  /** Shard manifest — the loader-side validation card for a sharded
    * training export ([[splitAndShard]]'s companion): per (split, shard),
    * `n_docs`, `n_tokens`, and an ORDER-INDEPENDENT content checksum —
    * the bit-XOR of each doc's 60-bit md5 prefix over `id ‖ ':' ‖ text`.
    * XOR is associative and commutative, so the checksum is partitioning-
    * and order-independent and any engine replays it bit-exactly; a
    * loader recomputes the card after download and refuses a shard that
    * lost, gained, corrupted, or misfiled a document (the id inside the
    * hash catches content filed under the wrong id). Documented caveat
    * inherent to XOR checksums: a row duplicated an EVEN number of times
    * cancels out of the checksum — `n_docs` still catches the count
    * drift, and the funnel's exact dedup runs upstream anyway
    * (spec-pinned).
    *
    * 100 TB shape: text is hashed AT THE SCAN and never travels; the
    * manifest is ONE hash agg on the (split, shard) key with map-side
    * combine — output rows = nSplits · nShards, driver-tiny.
    */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
      splitCol: String = "split", shardCol: String = "shard"): DataFrame =
    docs.select(col(splitCol).as("split"), col(shardCol).as("shard"),
        graft.ops.TextOps.tokenCount(col(textCol)).cast("long").as("_ntok"),
        conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
            col(textCol)).cast("binary")), 1, 15), 16, 10)
          .cast("long").as("_h"))
      .groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_ntok")).as("n_tokens"),
        expr("bit_xor(_h)").as("checksum"))

  /** Per-stratum quantile quality gate — "drop the worst `dropBelow`
    * fraction of each language/source by score" (the FineWeb/CCNet-style
    * calibration that replaces a hand-picked global threshold): a document
    * survives iff its percent_rank within its stratum (ordered by score
    * asc, id asc — ties broken deterministically) is ≥ `dropBelow`.
    * percent_rank = (rank−1)/(n−1) is integer arithmetic divided once, so
    * Spark and an oracle engine compute bit-identical values — the gate
    * is exactly replayable, unlike an interpolated-percentile threshold.
    *
    * Scale shape: one shuffle + per-stratum sort (the window). With few
    * mega-strata (a handful of languages over 10^11 docs) the sort
    * dominates — use [[approxQualityGate]] there: it computes one
    * `approx_percentile` threshold row per stratum (map-side combinable
    * sketch agg), broadcasts the tiny threshold table back, and filters
    * scan-locally — no sort anywhere, at the cost of the sketch's rank
    * error at the cut line (interior rows gate identically).
    */
  def qualityGateByQuantile(docs: DataFrame, idCol: String,
      stratumCol: String, scoreExpr: Column, dropBelow: Double): DataFrame = {
    val scored = docs.select(col(idCol), col(stratumCol),
      scoreExpr.cast("long").as("score"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("score"), col(idCol))
    scored
      .withColumn("_pr", percent_rank().over(w))
      .where(col("_pr") >= dropBelow)
      .select(col(idCol), col(stratumCol), col("score"))
  }

  /** Sketch-based form of [[qualityGateByQuantile]] for mega-strata: per
    * stratum, keep rows with score ≥ the approx `dropBelow`-quantile.
    * One agg + a broadcast join + a scan-local filter — no window, no
    * sort; `accuracy` is Spark's approx_percentile knob (1/accuracy
    * relative rank error). Not oracle-replayable (the sketch is
    * engine-specific); CurationOpsSpec bounds its disagreement with the
    * exact gate instead.
    */
  def approxQualityGate(docs: DataFrame, idCol: String, stratumCol: String,
      scoreExpr: Column, dropBelow: Double, accuracy: Int = 10000): DataFrame = {
    val scored = docs.select(col(idCol), col(stratumCol),
      scoreExpr.cast("long").as("score"))
    val thresholds = scored
      .groupBy(col(stratumCol))
      .agg(approx_percentile(col("score"), lit(dropBelow), lit(accuracy))
        .as("_thr"))
    scored.join(broadcast(thresholds), Seq(stratumCol))
      .where(col("score") >= col("_thr"))
      .select(col(idCol), col(stratumCol), col("score"))
  }

  /** Within-document repeated-paragraph removal — the scan-local sibling
    * of [[dropCommonLines]]: inside EACH document, keep only the first
    * occurrence of every exact-duplicate paragraph (templated pages
    * repeat their own nav/footer blocks between sections; C4 drops
    * dedupes at the line level, this is the paragraph-granularity form
    * that never looks outside the row). Blank paragraphs are structural
    * (they are the separators' residue) and are never deduped. Returns
    * `(idCol, clean_text, n_kept, n_dropped)`.
    *
    * Scale shape: ZERO shuffle — split, first-occurrence filter
    * (`array_position(paras, p) = i+1`, a pure higher-order expression),
    * and reassembly all happen inside the row within whole-stage codegen;
    * the op composes with any scan without changing its partitioning.
    * Per-row cost is O(paragraphs²) compares — bounded by document size,
    * never by corpus size.
    */
  def dropRepeatedParagraphs(docs: DataFrame, idCol: String,
      textCol: String, sep: String = "\n"): DataFrame = {
    val paras = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val kept = filter(paras, (p, i) =>
      p === lit("") || array_position(paras, p) === (i + 1).cast("long"))
    docs.select(col(idCol),
        array_join(kept, sep).as("clean_text"),
        size(kept).cast("long").as("n_kept"),
        (size(paras) - size(kept)).cast("long").as("n_dropped"))
  }

  /** Per-source "data card" — the aggregate table a mixture designer
    * reads before setting sampling weights ([[upsampleMixture]] /
    * [[stratifiedSampleRated]]): document and token volume, internal
    * exact-duplicate redundancy (`n_dup_docs` = removable copies,
    * Σ(group−1) over within-source fingerprint groups), and mean
    * stopword-quality. Everything is BIGINT counts and integer mills
    * (mean = floor division of two BIGINTs) — no floats, so any engine
    * replays the card exactly.
    *
    * 100 TB shape: two hash aggregates, both map-side combinable — the
    * facet rollup keys on source (tiny key space, partials collapse per
    * partition), the dup tally keys on (source, fingerprint) so
    * boilerplate mega-groups arrive at their reducer as O(partitions)
    * partials; only (source, md5, longs) shuffle, text never leaves the
    * scan. The final source⋈source join is on the tiny card key.
    */
  def sourceStats(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val facets = docs.select(col(sourceCol).as("source"),
      TextOps.tokenCount(col(textCol)).cast("long").as("_ntok"),
      coalesce(TextOps.stopwordRatioMill(col(textCol)).cast("long"), lit(0L))
        .as("_mill"),
      TextOps.normFingerprint(col(textCol)).as("_fp"))
    val card = facets.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("_ntok")).as("n_tokens"),
      sum(col("_mill")).as("_millsum"))
    val dups = facets.groupBy(col("source"), col("_fp"))
      .agg(count(lit(1)).as("_c"))
      .groupBy("source")
      .agg(sum(when(col("_c") > 1, col("_c") - 1).otherwise(0L)).as("n_dup_docs"))
    card.join(dups, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_dup_docs"),
        expr("_millsum div n_docs").as("mean_stop_mill"))
  }

  /** Context-window chunking — the SPLITTING complement to
    * [[packSequences]]' concatenation: documents longer than `maxTokens`
    * become overlapping windows that start every `stride` tokens (overlap
    * = maxTokens − stride), the standard long-document treatment when a
    * trainer's context is shorter than the text. Chunk count is
    * `1 + ⌈(n − maxTokens)/stride⌉` for n > maxTokens else 1 — the final
    * window may be short, but no window ever starts past the text, and a
    * doc is never silently truncated. Zero-token docs drop (nothing to
    * chunk). Returns `(idCol, chunk_id, text, n_tokens)` with `chunk_id`
    * the 0-based window index and `text` the window re-joined with single
    * spaces.
    *
    * Determinism: window boundaries are pure integer arithmetic on the
    * token count — no RNG, any engine replays the chunks byte-for-byte.
    *
    * 100 TB shape: entirely scan-local — tokenize, an indexed `transform`
    * over the window starts, one `posexplode` — ZERO shuffle at any
    * corpus size; output row count is Σ chunks, bounded by
    * Σ tokens/stride. Composes with [[packSequences]] downstream (chunk
    * long docs first, then pack the chunks).
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, stride: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(stride >= 1 && stride <= maxTokens,
      s"stride must be in [1, maxTokens], got $stride")
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col(idCol), posexplode(expr(
        s"""transform(
              sequence(0, CASE WHEN size(_toks) <= $maxTokens THEN 0
                ELSE (size(_toks) - $maxTokens + $stride - 1) div $stride END),
              k -> slice(_toks, k * $stride + 1, $maxTokens))"""))
        .as(Seq("chunk_id", "_c")))
      .select(col(idCol), col("chunk_id").cast("int").as("chunk_id"),
        array_join(col("_c"), " ").as("text"),
        size(col("_c")).cast("long").as("n_tokens"))
  }

  /** Mixture-rate calibration — the arithmetic between [[sourceStats]]
    * (what each source HAS) and [[stratifiedSampleRated]] (what to KEEP):
    * given per-source token inventories, target mixture weights in mills,
    * and a total token budget, compute each source's target token count
    * `budget · w_mill div 1000` and the sampling rate (in ppm, BIGINT
    * floor division end-to-end — bit-replayable on any engine) that
    * realizes it, capped at 10^6 (a source can't supply more than it
    * has — the shortfall is reported so the designer can re-weight
    * instead of silently under-delivering). Returns
    * `(source, w_mill, n_tokens, target_tokens, rate_ppm, shortfall_tokens)`.
    *
    * 100 TB shape: `cards` is one row per source (already aggregated by
    * [[sourceStats]]); the weight table broadcasts. Driver never sees
    * data — the output feeds [[stratifiedSampleRated]] as a broadcast
    * rate table.
    */
  def mixtureRates(cards: DataFrame, weights: Map[String, Int],
      tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    weights.foreach { case (s, w) =>
      require(w >= 0 && w <= 1000, s"weight mills must be in [0,1000]: ($s,$w)")
    }
    val spark = cards.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toSeq.toDF("source", "w_mill"))
    cards.select(col("source"), col("n_tokens").cast("long").as("n_tokens"))
      .join(wdf, Seq("source"))
      .withColumn("target_tokens",
        expr(s"($tokenBudget * cast(w_mill AS BIGINT)) div 1000"))
      .withColumn("rate_ppm",
        when(col("n_tokens") <= 0, lit(0L)).otherwise(
          least(lit(1000000L),
            expr("(target_tokens * 1000000) div n_tokens"))))
      .withColumn("shortfall_tokens",
        greatest(lit(0L), col("target_tokens") - col("n_tokens")))
      .select(col("source"), col("w_mill").cast("int").as("w_mill"),
        col("n_tokens"), col("target_tokens"), col("rate_ppm"),
        col("shortfall_tokens"))
  }

  /** Deterministic uniform sample of EXACTLY k documents — the "give me a
    * 100k-doc eval slice" primitive: global order by `(md5(id), id)` (the
    * id tie-break makes the order total even under hash collisions), keep
    * the first k. Rerun-stable, engine-independent, and GROWS
    * MONOTONICALLY: the k-sample is a prefix of the (k+n)-sample, so
    * enlarging a slice never invalidates previously-drawn members
    * (the [[stratifiedSampleRated]] monotonicity property, exact-count
    * form). Returns `(idCol)`.
    *
    * 100 TB shape: compiles to TakeOrderedAndProject — per-partition
    * top-k heaps, one O(k·partitions) driver-side merge, NO global sort
    * shuffle. Use the rate-based samplers when k approaches corpus scale;
    * this primitive is for k ≪ |corpus| slices.
    */
  def uniformSampleExact(docs: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    docs.select(col(idCol),
        md5(col(idCol).cast("string")).as("_h"))
      .orderBy(col("_h"), col(idCol))
      .limit(k)
      .select(col(idCol))
  }

  /** Weighted bottom-k sample per stratum — priority sampling (Duffield,
    * Lund & Thorup, JACM 2007; Cohen & Kaplan's bottom-k sketches):
    * each row draws the deterministic 32-bit uniform
    * `u = int(md5(id)[0:8])` (the [[stratifiedSampleRated]] mechanism)
    * and competes with priority key `pri = u div weight` — a heavier row
    * gets a proportionally smaller key, so the bottom-k per stratum is a
    * weight-biased sample that is rerun/engine/partitioning stable, with
    * ties broken by id. The "sample 1000 docs per source, favoring long
    * ones" primitive; the kept keys double as the sketch state for
    * subset-sum estimation (priority sampling's original purpose).
    *
    * Rows with `weight <= 0` or null never sample (documented; a
    * non-positive-weight row has no sampling mass). Output:
    * `(strata..., idCol, weight, pri, rank)` with rank 1..k by
    * (pri asc, id asc).
    *
    * 100 TB shape: u and pri are scan-local codegen; the only shuffle is
    * the per-stratum rank window on the stratum key (AQE-splittable; with
    * FEW strata and huge k prefer repartition-by-stratum + in-partition
    * sort — at k ≤ 10^5 the window is the right plan).
    */
  def weightedBottomK(docs: DataFrame, idCol: String, weightCol: String,
      strataCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val byStratum = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("pri").asc, col(idCol).asc)
    docs
      .where(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(strataCols.map(col) ++ Seq(col(idCol),
        col(weightCol).cast("long").as("weight"),
        expr(s"conv(substring(md5(cast($idCol as string)), 1, 8), 16, 10)")
          .cast("long").as("_u")): _*)
      .withColumn("pri", expr("_u div weight"))
      .withColumn("rank", row_number().over(byStratum).cast("long"))
      .where(col("rank") <= k)
      .drop("_u")
  }

  /** Rendezvous (highest-random-weight) assignment — the shard/executor
    * placement primitive for frontier partition planning: each item goes
    * to the node with the maximal salted hash `md5(node:id)`, so adding
    * or removing ONE node remaps only the ~1/|nodes| of keys whose
    * argmax changes (consistent-hashing's property without the ring
    * bookkeeping — Thaler & Ravishankar 1998, the scheme CARP and many
    * cache meshes use). Deterministic: the hash is the library's md5
    * family, ties (improbable 60-bit collisions) break by node name.
    *
    * 100 TB shape: ZERO shuffle — the candidate list is a literal array
    * of |nodes| structs folded row-locally by `array_max` (lexicographic
    * struct order = (hash, node)); per-row work O(|nodes|), the node
    * list being cluster-sized (hundreds), not data-sized.
    */
  def rendezvousAssign(items: DataFrame, idCol: String,
      nodes: Seq[String]): DataFrame = {
    require(nodes.nonEmpty, "rendezvousAssign: nodes required")
    require(nodes.distinct.size == nodes.size,
      "rendezvousAssign: duplicate node names")
    val cand = array(nodes.map(n =>
      struct(
        conv(substring(md5(concat(lit(s"$n:"), col(idCol).cast("string"))),
          1, 15), 16, 10).cast("long").as("h"),
        lit(n).as("node"))): _*)
    items.select(col(idCol),
      array_max(cand).getField("node").as("node"))
  }
}
