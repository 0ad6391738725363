package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / hostname extraction for crawl frontier discovery and corpus link
  * analysis.
  *
  * The reference crawler only ever follows redirect `Location` targets
  * (`web_utils.py:202-223`) — it never grows its domain list. A web-scale
  * frontier does: hosts discovered inside fetched documents re-enter the
  * frontier through the same canonicalize → punycode → xxhash64 →
  * seen-filter admission path as seeds (north rule: URL-frontier with a
  * cuckoo URL-seen set). This object holds the extraction primitive in two
  * twins:
  *
  *   - [[extractedHosts]]: a codegen'd `Column` tree (`regexp_extract_all`
  *     + higher-order `transform`/`array_distinct`) for relational
  *     pipelines — the corpus never leaves whole-stage codegen and the
  *     pattern is written in the RE2 ∩ java.util.regex common subset so a
  *     DuckDB oracle can replay it exactly (no lookaround, no
  *     backreferences);
  *   - [[extractHosts]]: an allocation-conscious Scala twin for the
  *     imperative probe leaves (the engine's per-result discovery hook),
  *     byte-for-byte the same matches.
  *
  * Extraction is deliberately scheme-anchored (`http://` / `https://`):
  * bare "example.net" prose tokens are NOT links (a crawler that admits
  * every domain-shaped word drowns its frontier in false positives).
  */
object LinkOps {

  /** Host capture from an absolute http(s) URL. Input is lowercased before
    * matching (cheaper than `(?i)` per-char case folding in both engines,
    * and makes the captured host already-lowercase). The host must end in
    * an alphabetic TLD of length ≥ 2; a trailing root dot, a `:port`, a
    * path, or any other delimiter simply falls outside the capture.
    */
  val UrlHostPattern: String = "https?://([a-z0-9.-]+\\.[a-z]{2,})"

  /** Distinct hosts referenced by absolute URLs in `text`, in no particular
    * order (`array_distinct` keeps first-occurrence order; consumers that
    * need a set treat it as one). Null text → null (Spark regexp semantics),
    * so gate with `coalesce` when aggregating.
    */
  def extractedHosts(text: Column): Column =
    array_distinct(regexp_extract_all(lower(text), lit(UrlHostPattern), lit(1)))

  private val UrlHostRegex = UrlHostPattern.r

  /** Scala twin of [[extractedHosts]]: distinct hosts, first-occurrence
    * order, identical matches to the relational path.
    */
  def extractHosts(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val lower = text.toLowerCase
    if (!lower.contains("http")) return Seq.empty // cheap pre-gate
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    UrlHostRegex.findAllMatchIn(lower).foreach(m => out += m.group(1))
    out.toSeq
  }

  // ------------------------------------------------------------ host rank

  /** Fixed-iteration PageRank over a host link graph, integer MICROS
    * end-to-end so any engine replays it bit-exactly (the same
    * derandomization discipline as the md5 sampling family): rank is a
    * BIGINT scaled by 10^6, initialized to 1e6 per node, and each round
    * computes
    *
    *   r'(v) = 150000 + (850 · Σ_u r(u) div outdeg(u)) div 1000
    *
    * — damping 0.85 with FLOOR division throughout. Every operand is
    * positive, so Spark's `div` and DuckDB's `//` agree on every step.
    * Multi-edges collapse first (`distinct`); dangling hosts (no
    * out-links) leak their mass each round, the standard fixed-iteration
    * simplification (a teleport-mass correction is a constant shift that
    * does not change the ordering this operator exists to produce).
    * `iters` is a caller-fixed constant, not convergence-tested, so the
    * plan is a statically unrolled chain — no driver-side loop state.
    *
    * 100 TB shape: edge dedup and out-degree are each ONE hash aggregate
    * with map-side combine; per iteration, contributions are an
    * edges⋈ranks equi-join on `src` (bucket the edge table by src to
    * co-locate every round and kill the per-round shuffle), the
    * dst-rollup is a map-side-combinable sum (a 10^8-in-link hub arrives
    * at its reducer as O(partitions) partials), and the node re-join is
    * on the near-unique host key. Only (host, BIGINT) pairs ever shuffle;
    * document text never enters the loop.
    */
  def hostRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    // nodes and the degree-annotated edge list appear in EVERY unrolled
    // iteration; persist them so the (possibly corpus-derived) edge
    // subtree is computed once, not once per round. Both are small —
    // (host) and (src, dst, outdeg) strings+long — and spill-safe.
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("host"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("host"))
        .select(col("dst").as("host"), expr("rank_micro div outdeg").as("c"))
        .groupBy("host").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("host"), "left_outer")
        .select(col("host"), (lit(150000L) +
          expr("(850 * coalesce(s, cast(0 as bigint))) div 1000")).as("rank_micro"))
    }
    ranks
  }

  // ----------------------------------------------- quality-aware recrawl

  /** Quality-aware recrawl priority — the feedback edge that closes the
    * crawl → curate → crawl loop: the frontier's per-host priority is
    * re-scored from what the CORPUS later learned about each host's
    * content. Inputs are two host-cardinality tables — [[hostRank]]'s
    * `(host, rank_micro)` link authority and a content-quality table
    * `(host, quality_mill ∈ [0, 1000])` (e.g. the stopword-density facet
    * of the per-source data card, `CurationOps.sourceStats`) — and
    *
    *   priority_micro = rank_micro + (qualityWeightMicro · quality_mill) div 1000
    *
    * in BIGINT floor arithmetic with every operand non-negative, so
    * Spark `div` ≡ DuckDB `//` on each step and the frontier's
    * binary-heap ordering is bit-replayable. Hosts the corpus holds no
    * quality signal for (never fetched, or media-only) keep their bare
    * link rank — new discoveries are never starved, junk-heavy hosts are
    * simply out-bid by quality-proven ones at the same link authority.
    *
    * 100 TB shape: both inputs are host-cardinality (tiny next to the
    * corpus that produced them); ONE left-outer equi-join on the
    * near-unique host key, scan-local arithmetic after it. The output
    * feeds the frontier pop order exactly where the engine's
    * TTL-priority sits today.
    */
  def recrawlPriority(ranks: DataFrame, quality: DataFrame,
      qualityWeightMicro: Long = 500000L): DataFrame = {
    require(qualityWeightMicro >= 0,
      s"qualityWeightMicro must be non-negative, got $qualityWeightMicro")
    ranks.join(quality, Seq("host"), "left_outer")
      .select(col("host"), col("rank_micro"), col("quality_mill"),
        (col("rank_micro") + expr(
          s"($qualityWeightMicro * coalesce(quality_mill, cast(0 as bigint))) div 1000"))
          .as("priority_micro"))
  }

  /** Half-life-decayed activity score — the recrawl-scheduler freshness
    * signal: each observed event contributes `1000 >> (age div halfLife)`
    * mills, so activity `h` half-lives ago is worth 2^-h of activity
    * today, in EXACT integer arithmetic (a bit shift, not `pow` — the
    * classic EWMA needs floats; quantizing the decay to half-life steps
    * keeps it engine-portable and associative). An event older than ~10
    * half-lives shifts to 0 and stops mattering, which is also the
    * correct crawl-scheduling semantics: a domain that changed 10 cycles
    * ago and never since is cold.
    *
    * `asOfDay` anchors "now"; `None` (audits, backtests) derives it from
    * the data's own max day via a 1-row broadcast (the documented benign
    * BNLJ of `TextOps.tfidfTopTerms`) — a production scheduler passes the
    * run date explicitly so scores are a pure function of (data, date).
    * Days are `unix_millis div 86400000` of the timestamp cast through
    * `timestamp` (NTZ→LTZ is the identity under the library-wide UTC
    * session tz).
    *
    * Output per key: `(keys..., n_events, freshness_mill, last_day)`.
    *
    * 100 TB shape: day/age/weight are scan-local codegen; the ONLY
    * data-sized shuffle is the map-side-combinable per-key sum. Skewed
    * hot keys (a portal domain with 10^8 events) arrive as partial
    * aggregates, never as rows.
    */
  def activityDecay(events: DataFrame, keyCols: Seq[String], tsCol: String,
      halfLifeDays: Long, asOfDay: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "activityDecay: key columns required")
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    val dayed = events.select(keyCols.map(col) :+
      expr(s"unix_millis(cast($tsCol as timestamp)) div 86400000")
        .as("_day"): _*)
    val anchored = asOfDay match {
      case Some(d) => dayed.withColumn("_asof", lit(d))
      case None => dayed.join(
        broadcast(dayed.agg(max(col("_day")).as("_asof"))))
    }
    anchored
      .withColumn("_w_mill",
        // age clamps at [0, 62] half-lives: events AFTER the anchor (a
        // backdated asOf) count at full weight, ancient ones shift to 0
        expr(s"shiftright(1000L, cast(least(greatest(_asof - _day, 0L) div $halfLifeDays, 62L) as int))"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("_w_mill")).cast("long").as("freshness_mill"),
        max(col("_day")).cast("long").as("last_day"))
  }

  /** Host-graph degree statistics — the structural audit next to
    * [[hostRank]]'s authority scores: per host, distinct out-degree,
    * in-degree, the number of RECIPROCATED out-edges (u→v where v→u also
    * exists — link exchanges / mutual-citation rings, the classic link-
    * spam signal), and `recip_mill = n_recip·1000 div out_deg`. Self
    * loops are dropped (a self-link is neither authority nor exchange);
    * multi-edges collapse (degree counts distinct neighbors, matching
    * [[hostRank]]'s edge dedup). A host with no out-edges reports
    * recip_mill 0, not a division error.
    *
    * 100 TB shape: edge dedup + both degree counts are map-side-
    * combinable hash aggs; reciprocity is ONE self-semi-join of the
    * deduped edge list on the reversed pair key (shuffles edges once
    * more on (dst, src) — no row multiplication, semi-join output ≤
    * edges); the final assembly is three left joins on the near-unique
    * host key. Nothing broadcasts (the graph is data-sized), nothing is
    * quadratic.
    */
  def degreeStats(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    val out = e.groupBy(col("src").as("host"))
      .agg(count(lit(1)).cast("long").as("out_deg"))
    val in = e.groupBy(col("dst").as("host"))
      .agg(count(lit(1)).cast("long").as("in_deg"))
    val recip = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      .groupBy(col("src").as("host"))
      .agg(count(lit(1)).cast("long").as("n_recip"))
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host"))).distinct()
    nodes
      .join(out, Seq("host"), "left_outer")
      .join(in, Seq("host"), "left_outer")
      .join(recip, Seq("host"), "left_outer")
      .select(col("host"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("n_recip"), lit(0L)).as("n_recip"))
      .withColumn("recip_mill",
        when(col("out_deg") > 0,
          expr("n_recip * 1000 div out_deg")).otherwise(lit(0L)))
  }
}
