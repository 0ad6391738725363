package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.canon.Canon
import graft.ops.{CurationOps, DedupOps, LinkOps, MultiModalOps, PiiOps, RelationalOps, SimilarityOps, SketchOps, TextOps, TrainPrepOps}

/** Driver contract: one `queries` entry per implemented operator family
  * (SURVEY.md §2 + the training-data-pipeline ops), with DuckDB oracle SQL
  * for every SQL-expressible one. Cross-engine discipline:
  *   - integer outputs are BIGINT on both sides (Spark counts are long;
  *     `size`/`row_number` get explicit casts);
  *   - no raw double aggregates in compared output — money/value sums go
  *     through `round(x*100) :: bigint` (cents), ratios through integer
  *     mills, similarities through ranks;
  *   - cross-engine hashing is md5 (DuckDB has no xxhash64); the engine's
  *     own frontier key stays xxhash64 internally.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: crawl a synthetic .cz seed batch through the full engine
    * (canonicalize → dedup → salted probe fan-out → nested result docs) and
    * return the span-encoded results. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q26_crawl_spans")(spark, "/root/testdata/sf0.001")

  // Shared constants (also interpolated into the oracle SQL so the two
  // sides can never drift).
  private val stop = TextOps.StopwordsEn
  private val stopSqlList = stop.map(s => s"'$s'").mkString("(", ", ", ")")

  private def markerSqlList(lang: String): String =
    TextOps.langMarkers(lang).map(s => s"'$s'").mkString("(", ", ", ")")

  /** One greedy-BPE training round as DuckDB CTEs (for q73): count
    * adjacent pairs over `t{k-1}`, pick the argmax rule into `b{k}` under
    * the (cnt desc, lhs, rhs) total order, and rewrite into `t{k}` using
    * the q72 window pass generalized to a DATA-DEPENDENT rule (scalar
    * subqueries on `b{k}`): gaps-and-islands run parity when lhs = rhs,
    * all-matches lead/lag otherwise. When `b{k}` is empty every condition
    * coalesces to "keep", so an exhausted round is a no-op on both
    * engines.
    */
  private def bpeLearnRoundSql(k: Int, minCount: Long): String = {
    val prev = s"t${k - 1}"
    s"""c$k AS (SELECT tok AS lhs, nxt AS rhs, count(*) AS cnt
         FROM (SELECT tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
               FROM $prev)
         WHERE nxt IS NOT NULL GROUP BY 1, 2 HAVING count(*) >= $minCount),
       b$k AS (SELECT lhs, rhs, cnt FROM c$k ORDER BY cnt DESC, lhs, rhs LIMIT 1),
       r${k}a AS (SELECT doc_id, pos, tok,
           tok = (SELECT lhs FROM b$k) AS is_l,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt,
           lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prv
         FROM $prev),
       r${k}b AS (SELECT doc_id, pos, tok, nxt, prv,
           CASE WHEN is_l THEN pos - row_number()
             OVER (PARTITION BY doc_id, is_l ORDER BY pos) END AS grp
         FROM r${k}a),
       r${k}c AS (SELECT doc_id, pos, tok, nxt, prv,
           CASE WHEN grp IS NOT NULL THEN row_number()
             OVER (PARTITION BY doc_id, grp ORDER BY pos) - 1 END AS off
         FROM r${k}b),
       t$k AS (SELECT doc_id,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
           CASE WHEN tok = (SELECT lhs FROM b$k) AND nxt = (SELECT rhs FROM b$k)
                  AND ((SELECT lhs <> rhs FROM b$k) OR off % 2 = 0)
                THEN (SELECT lhs || rhs FROM b$k) ELSE tok END AS tok
         FROM r${k}c
         WHERE NOT coalesce(
           CASE WHEN (SELECT lhs = rhs FROM b$k)
                THEN tok = (SELECT lhs FROM b$k) AND off % 2 = 1
                ELSE tok = (SELECT rhs FROM b$k)
                  AND coalesce(prv, '') = (SELECT lhs FROM b$k) END,
           false))"""
  }

  /** Shared DuckDB CTE chain replicating the q35 dedup composition —
    * 3-gram shingles → 2-md5 minhash family → 4×2 band buckets →
    * candidate pairs → exact Jaccard ≥ 0.8 verify → recursive
    * connected-components — ending in `cl(doc_id, cluster)` (singletons
    * labeled by their own id). q35 selects it directly; q43/q45 build the
    * representative/funnel logic on top, so all three oracles share one
    * verified definition.
    */
  /** q79's hashing-trick document vectors as CTEs ending in
    * `vecs (doc_id, vec: list<bigint>)` — shared by q79 (the embeddings
    * themselves) and q83 (IVF ANN served over them). Bucket = first 4 md5
    * hex chars mod 64, sign = parity of the 5th, densified via a
    * generate_series left join; zero-token docs never enter.
    */
  private val hashEmbedVecsCte: String =
    """tok AS (SELECT doc_id,
           unnest(list_filter(str_split_regex(text, '\s+'), x -> x <> ''))
             AS t
         FROM documents),
       e AS (SELECT doc_id,
           CAST(('0x' || substring(md5(t), 1, 4)) AS INTEGER) % 64 AS bucket,
           CASE WHEN CAST(('0x' || substring(md5(t), 5, 1)) AS INTEGER) % 2 = 0
                THEN 1 ELSE -1 END AS sgn
         FROM tok),
       s AS (SELECT doc_id, bucket, SUM(sgn) AS v FROM e GROUP BY 1, 2),
       ids AS (SELECT DISTINCT doc_id FROM e),
       g AS (SELECT doc_id, unnest(generate_series(0, 63)) AS bucket FROM ids),
       j AS (SELECT g.doc_id, g.bucket, COALESCE(s.v, 0) AS v
         FROM g LEFT JOIN s ON s.doc_id = g.doc_id AND s.bucket = g.bucket),
       vecs AS (SELECT doc_id, list(CAST(v AS BIGINT) ORDER BY bucket) AS vec
         FROM j GROUP BY doc_id)"""

  /** MinHash band-bucket CTEs over a filtered slice of `documents`,
    * name-prefixed so two slices (ledger + batch, for q80) coexist in one
    * WITH chain. Same family as [[dupClustersCteSql]]: two md5s per
    * 3-shingle, eight 8-hex chunk minima, 4 bands × 2 rows.
    */
  private def bandsCte(prefix: String, pred: String): String = {
    val minCols = (0 until 8).map { i =>
      val (h, off) = if (i < 4) ("h1", 1 + 8 * i) else ("h2", 1 + 8 * (i - 4))
      s"min(substring($h, $off, 8)) AS c$i"
    }.mkString(", ")
    val bandSelects = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS band, c${2 * b} || c${2 * b + 1} AS bucket FROM ${prefix}mins"
    }.mkString("\nUNION ALL\n")
    s"""${prefix}toks AS (
         SELECT doc_id, list_filter(str_split(lower(text), ' '), t -> t <> '') AS tk
         FROM documents WHERE $pred),
       ${prefix}sh AS (
         SELECT doc_id, list_transform(range(len(tk) - 2),
           i -> array_to_string(tk[i+1:i+3], ' ')) AS shl
         FROM ${prefix}toks WHERE len(tk) >= 3),
       ${prefix}shx AS (SELECT doc_id, unnest(shl) AS s FROM ${prefix}sh),
       ${prefix}hx AS (SELECT doc_id, md5(s) AS h1, md5('~' || s) AS h2
         FROM ${prefix}shx),
       ${prefix}mins AS (SELECT doc_id, $minCols FROM ${prefix}hx GROUP BY doc_id),
       ${prefix}bands AS (
         $bandSelects)"""
  }

  private lazy val dupClustersCteSql: String = {
    val minCols = (0 until 8).map { i =>
      val (h, off) = if (i < 4) ("h1", 1 + 8 * i) else ("h2", 1 + 8 * (i - 4))
      s"min(substring($h, $off, 8)) AS c$i"
    }.mkString(", ")
    val bandSelects = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS band, c${2 * b} || c${2 * b + 1} AS bucket FROM mins"
    }.mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE toks AS (
         SELECT doc_id, list_filter(str_split(lower(text), ' '), t -> t <> '') AS tk
         FROM documents),
       sh AS (
         SELECT doc_id, list_transform(range(len(tk) - 2),
           i -> array_to_string(tk[i+1:i+3], ' ')) AS shl
         FROM toks WHERE len(tk) >= 3),
       shx AS (SELECT doc_id, unnest(shl) AS s FROM sh),
       hx AS (SELECT doc_id, md5(s) AS h1, md5('~' || s) AS h2 FROM shx),
       mins AS (SELECT doc_id, $minCols FROM hx GROUP BY doc_id),
       bands AS (
         $bandSelects),
       cand AS (
         SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
       d AS (SELECT DISTINCT doc_id AS id, unnest(shl) AS s FROM sh),
       sizes AS (SELECT id, count(*) AS n_sh FROM d GROUP BY id),
       inter AS (
         SELECT c.id_a, c.id_b, count(*) AS n_inter
         FROM cand c
         JOIN d x ON x.id = c.id_a
         JOIN d y ON y.id = c.id_b AND y.s = x.s
         GROUP BY 1, 2),
       e AS (
         SELECT i.id_a, i.id_b
         FROM inter i
         JOIN sizes sa ON sa.id = i.id_a
         JOIN sizes sb ON sb.id = i.id_b
         WHERE i.n_inter * 10 >= (sa.n_sh + sb.n_sh - i.n_inter) * 8),
       und AS (SELECT id_a AS a, id_b AS b FROM e
               UNION SELECT id_b, id_a FROM e),
       reach AS (
         SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM und) t
         UNION
         SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst),
       clus AS (SELECT src, min(dst) AS cluster FROM reach GROUP BY src),
       cl AS (
         SELECT dd.doc_id, COALESCE(c.cluster, dd.doc_id) AS cluster
         FROM documents dd LEFT JOIN clus c ON c.src = dd.doc_id)"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queriesBase ++ queriesExt

  private def queriesBase: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/P1 — scan + trim/empty filter + predicate pushdown
    "q01_scan_filter" -> ((s, dir) => {
      T(s, dir, "documents")
        .where(length(trim(col("text"))) > 0 && col("lang") === "en")
        .select(col("doc_id"), col("source"))
    }),

    // A1-shape — hash aggregate with map-side combine (TPC-H Q1-ish).
    // Money discipline: cast the stored double to decimal(18,2) FIRST (both
    // engines recover the intended 2-dp value exactly — the stored double is
    // within ~1e-13 of it), then scale to integer cents in exact decimal
    // arithmetic. Never round(double*100) (engines' round paths differ) and
    // never SUM(double)::bigint (truncate-vs-round at the boundary).
    "q02_agg_pricing" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          floor(sum(col("l_quantity").cast("decimal(18,2)"))).cast("long").as("sum_qty"),
          sum((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")).as("sum_base_cents"),
          count(lit(1)).as("n_rows"))
    }),

    // J1 — broadcast dimension joins (GeoIP-annotate analog)
    "q03_join_regions" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val n = T(s, dir, "nation")
      val r = T(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")).as("sum_bal_cents"))
    }),

    // J2-shape — explode + re-aggregate (NS→IP expansion analog)
    "q04_explode_tokens" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
    }),

    // D1 — exact dedup groups on normalized content hash
    "q05_dedup_exact" -> ((s, dir) =>
      DedupOps.exactDupGroups(T(s, dir, "documents"), "doc_id", "text")),

    // W1 — last element per key (final_step analog)
    "q06_last_event" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      T(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"))
    }),

    // W4 — bounded top-k per group (max_ips_per_domain analog)
    "q07_topk_orders" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
    }),

    // P2 — regex predicate (TXT v=spf filter analog)
    "q08_regex_filter" -> ((s, dir) => {
      T(s, dir, "documents")
        .where(col("text").rlike("scan\\s+\\w+\\s+join"))
        .select(col("doc_id"))
    }),

    // F-family — field parse out of a raw payload (header/record parsing)
    "q09_parse_props" -> ((s, dir) => {
      T(s, dir, "events")
        .where(col("props").rlike("\"k\":\\s*\\d+"))
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("k_val"))
    }),

    // D2 — union + distinct (A+AAAA union analog)
    "q10_union_distinct" -> ((s, dir) => {
      val e = T(s, dir, "events")
      e.where(col("event_type") === "click").select(col("user_id"))
        .union(e.where(col("event_type") === "view").select(col("user_id")))
        .distinct()
    }),

    // Join shape — anti join (no-MX short-circuit analog)
    "q11_anti_join" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"))
    }),

    // T-family — event-time bucket rollup
    "q12_hourly_rollup" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("sum_value_cents"))
    }),

    // A5 — empty-aggregate → null collapse (SPF/TLSA null semantics)
    "q13_null_collapse" -> ((s, dir) => {
      val cnt = size(filter(TextOps.tokens(col("text")), t => t.startsWith("sp"))).cast("long")
      T(s, dir, "documents")
        .select(col("doc_id"),
          when(cnt === 0, lit(null).cast("long")).otherwise(cnt).as("spf_like"))
    }),

    // Text analysis — token counting
    "q14_token_stats" -> ((s, dir) => {
      T(s, dir, "documents").select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("text_chars"))
    }),

    // Text analysis — integer quality facets (stopword ratio in mills)
    "q15_quality" -> ((s, dir) => {
      T(s, dir, "documents").select(col("doc_id"),
        TextOps.stopwordCount(col("text")).cast("long").as("n_stop"),
        TextOps.stopwordRatioMill(col("text")).cast("long").as("stop_mill"))
    }),

    // Text analysis — language ID heuristic, fully relational (no UDF) and
    // replicated verbatim in the DuckDB oracle → hash-checked. (The labeled
    // `lang` column is NOT ground truth — the testdata text is the same
    // synthetic vocabulary for every label, measured 0% non-en separability
    // — so the checkable contract is heuristic parity, not accuracy.)
    "q16_langid" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), col("lang"), TextOps.langIdCol(col("text")).as("lang_guess"))
    }),

    // Dedup — MinHash band signatures (LSH bucketing, oracle-checked)
    "q17_minhash_bands" -> ((s, dir) =>
      DedupOps.minhashBands(T(s, dir, "documents"), "doc_id", "text")
        .withColumn("band", col("band").cast("long"))),

    // Dedup — SimHash band buckets, md5-based and relational → hash-checked
    "q18_simhash" -> ((s, dir) =>
      DedupOps.simhashBuckets(T(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("band").cast("long").as("band"), col("bucket"))),

    // Dedup — exact n-gram Jaccard VERIFY over MinHash+LSH candidate pairs
    // (the scale-safe composition: the shingle join only expands candidate
    // pairs, never the full corpus self-join on shingle)
    "q19_ngram_jaccard" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val cand = DedupOps.minhashCandidatePairs(docs, "doc_id", "text",
        shingleK = 3, bands = 4, rowsPerBand = 2)
      DedupOps.ngramJaccardForPairs(docs, cand, "doc_id", "text",
        shingleK = 3, minShared = 3)
    }),

    // Similarity — exact brute-force cosine top-k (rank output only)
    "q20_cosine_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimilarityOps.bruteForceTopK(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // Similarity — SRP-LSH bucketed ANN. Approximate vs brute force, but
    // EXACT as a function of the deterministic planes — the oracle
    // replicates the bucketing with the same plane constants, so even the
    // ANN path is hash-checked.
    "q21_ann_lsh" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimilarityOps.lshTopK(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", dims = 64, k = 5, bits = 8, tables = 8)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // Similarity — IVF ANN (deterministic sampled coarse quantizer; cells
    // + probes replicated by the oracle, so this approximate path is also
    // hash-checked)
    "q36_ivf_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      // centroids pinned to "first" (the oracle replays lowest-id cells);
      // the production default is "spread" (IvfSpec measures its recall win)
      SimilarityOps.ivfTopK(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4,
          centroids = "first")
        .withColumn("rank", col("rank").cast("long"))
    }),

    // ANN — product quantization (Jégou et al. 2011): 16 lowest-id corpus
    // vectors sliced into 8 subspaces form the codebook; every vector
    // encodes as 8 nearest-codeword ids (fixed-point L2 argmin); queries
    // score candidates by asymmetric distance = Σ of 8 LONG LUT lookups.
    // centroids pinned to "first" so the oracle replays the codebook; the
    // production default is "spread" (id-decorrelated seeds)
    "q85_pq_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimilarityOps.pqTopK(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, m = 8, nCodes = 16,
          centroids = "first")
        .withColumn("rank", col("rank").cast("long"))
    }),

    // ANN — IVF-PQ, the production billion-vector composition (FAISS's
    // default shape): q36's cell restriction bounds WHICH candidates are
    // scored, q85's codes bound WHAT is read per candidate. centroids
    // pinned "first" for the oracle; the library default is "spread".
    "q89_ivfpq_ann" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      SimilarityOps.ivfPqTopK(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4,
          m = 8, nCodes = 16, centroids = "first")
        .withColumn("rank", col("rank").cast("long"))
    }),

    // ANN serving — L2 normalization (cosine → bare dot at serve time):
    // fixed-point squared norm (engine/partitioning-independent LONG),
    // then two correctly-rounded IEEE ops per component, so the DOUBLE
    // outputs replay bit-exactly. Zero vectors → all-zero, not NaN.
    "q92_l2_normalize" -> ((s, dir) =>
      SimilarityOps.l2Normalize(T(s, dir, "embeddings"), "vec_id",
        "embedding")),

    // Embedding hygiene — per-source centroid outliers: the 3 vectors
    // farthest (fixed-point squared L2) from their own source's q71
    // centroid. The mislabel/junk-encoder audit before label-conditioned
    // sampling; pure BIGINT ranks, ties id-asc.
    "q90_centroid_outliers" -> ((s, dir) =>
      TrainPrepOps.centroidOutliers(T(s, dir, "embeddings"), "vec_id",
        "embedding", T(s, dir, "documents"), "doc_id", "source",
        topK = 3)),

    // Dedup — embedding near-dup pairs above cosine threshold: EXACT via a
    // block-distributed equi-join (no BroadcastNestedLoopJoin cartesian;
    // see SimilarityOps.blockedNearDupPairs for why exact-at-threshold
    // can't be LSH'd to recall 1.0 on this continuum, and
    // DedupOps.embeddingNearDupPairs for the sub-quadratic scale path)
    "q22_embedding_neardup" -> ((s, dir) =>
      SimilarityOps.blockedNearDupPairs(T(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.35, blocks = 32)),

    // Frontier — URL-level canonicalization (north-rule canonicalize →
    // punycode-normalize → seen-key): RFC 3986 §6 subset — scheme/host
    // lowercase, default ports off, fragment off, empty path → "/",
    // query params sorted with empties dropped; non-URLs → NULL. Six
    // deterministic mess shapes per doc_id residue; url_key = md5 for
    // the oracle (the library's frontier key is xxhash64, q23 precedent)
    "q87_canon_urls" -> ((s, dir) => {
      val m = col("doc_id") % 6
      val raw = when(m === 0, concat(lit("HTTP://"), col("source"),
          lit(".Example.CZ:80/a/b?b=2&a=1#frag")))
        .when(m === 1, concat(lit("https://"), col("source"),
          lit(".example.cz:443/")))
        .when(m === 2, concat(lit("http://"), col("source"),
          lit(".EXAMPLE.cz:8080")))
        .when(m === 3, concat(lit("HTTPS://"), col("source"),
          lit(".example.CZ/path/?z=1&y=&x=3#x")))
        .when(m === 4, concat(lit("http://"), col("source"),
          lit(".example.cz./q?a=1&a=1&b=&")))
        .otherwise(concat(lit("not a url "), col("doc_id").cast("string")))
      T(s, dir, "documents")
        .select(col("doc_id"), Canon.canonicalizeUrlCol(raw).as("url_canon"))
        .withColumn("url_key", md5(col("url_canon")))
    }),

    // Frontier — canonicalize→dedup admission (D1 + north-rule canon)
    "q23_canon_domains" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(Canon.canonicalizeDomainCol(
          concat(col("source"), lit(".Example.CZ."))).as("canonical"))
        .distinct()
        .withColumn("dom_key", md5(col("canonical").cast("binary")))
    }),

    // Frontier — deterministic pop order (W3: order independent of
    // partitioning; priority derived from a stable key hash). Global
    // sequence WITHOUT a global single-partition window: the md5 key's
    // 2-hex-char prefix buckets the sort (256 ranges, consistent with full-
    // key lex order), rank is a partitioned window per bucket, and the
    // global offset of each bucket comes from a tiny count aggregate
    // (256 rows) turned into a literal map — the scalable two-phase rank.
    "q24_frontier_order" -> ((s, dir) => {
      val keyed = T(s, dir, "documents")
        .select(col("doc_id"),
          md5(concat(col("source"), col("doc_id").cast("string"))).as("mk"))
        .withColumn("bkt", substring(col("mk"), 1, 2))
      val counts = keyed.groupBy("bkt").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
      val offsets = counts.zip(counts.scanLeft(0L) { case (acc, (_, n)) => acc + n })
        .map { case ((b, _), off) => b -> off }.toMap
      val w = Window.partitionBy(col("bkt")).orderBy(col("mk"), col("doc_id"))
      keyed
        .withColumn("pop_seq",
          element_at(typedlit(offsets), col("bkt")) + row_number().over(w))
        .select(col("doc_id"), col("pop_seq"))
    }),

    // Multimodal — binary column + partition-batched decode. The codec is
    // an honest STUB (no media libs in this container) but derives its fake
    // decode from md5 of the payload, so the oracle hash-checks the whole
    // binary-column path end-to-end.
    "q25_multimodal" -> ((s, dir) =>
      MultiModalOps.demoPipeline(s, s"$dir/documents.parquet")),

    // W2/A1 — order-preserving collect (steps-in-fetch-order analog)
    "q28_ordered_events" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ",").as("seq_types"))
    }),

    // J3-shape — port/type-keyed map aggregation (rendered as sorted text
    // for cross-engine hashing; Spark map columns don't hash-compare)
    "q29_type_counts" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_list(
          concat(col("event_type"), lit(":"), col("n").cast("string")))), "|").as("type_counts"))
    }),

    // A4 — higher-order filter+transform (SPF pass-ip extraction analog)
    "q30_hof_transform" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      T(s, dir, "documents").select(col("doc_id"),
        array_join(array_sort(transform(
          filter(toks, t => t.startsWith("b")), t => upper(t))), " ").as("b_tokens"))
    }),

    // W4/W7 — bounded slice + content truncation
    "q31_slice_limits" -> ((s, dir) => {
      T(s, dir, "documents").select(col("doc_id"),
        array_join(slice(TextOps.tokens(col("text")), 1, 3), " ").as("first3"),
        substring(col("text"), 1, 20).as("prefix20"))
    }),

    // F17-shape — date arithmetic (cert validity-days analog)
    "q32_ship_latency" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(min(col("l_shipdate")).as("first_ship"))
        .select(col("o_orderkey"),
          datediff(col("first_ship"), col("o_orderdate")).cast("long").as("days_to_ship"))
    }),

    // T-shape — sessionization via lag + cumulative sum (gap > 30 min)
    "q33_sessionize" -> ((s, dir) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "events")
        .withColumn("prev", lag(col("ts"), 1).over(wOrd))
        .withColumn("flag",
          when(col("prev").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev"))) > 1800, 1L)
            .otherwise(0L))
        .select(col("user_id"), col("event_id"),
          sum(col("flag")).over(wRun).as("session_id"))
    }),

    // Catalyst-free extras — rollup grouping sets
    "q34_rollup" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("qty"))
    }),

    // Dedup — transitive near-dup clusters: LSH candidates → exact Jaccard
    // verify (10·|∩| ≥ 8·|∪| ⇔ J ≥ 0.8, float-free) → connected components
    // by distributed min-label propagation; cluster = min member id
    "q35_dup_clusters" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val cand = DedupOps.minhashCandidatePairs(docs, "doc_id", "text",
        shingleK = 3, bands = 4, rowsPerBand = 2)
      val verified = DedupOps.ngramJaccardForPairs(docs, cand, "doc_id", "text",
          shingleK = 3, minShared = 1)
        .where(col("n_inter") * 10 >= col("n_union") * 8)
      DedupOps.dupClusters(docs, verified, "doc_id")
    }),

    // Star join — the canonical 100 TB OLAP plan shape: the two big fact
    // tables shuffle-join once on the fact key; every dimension broadcasts
    // (customer at this SF broadcasts too under the 10 MB default; at real
    // scale it would shuffle and nation/region still broadcast). Exact
    // decimal-cents revenue discipline as q02.
    "q38_star_join" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")).cast("long").as("rev_cents"),
          count(lit(1)).as("n_rows"))
    }),

    // Whole-operator surface — the custom CuckooAdmit logical/physical
    // operator (first-seen admission per key, Catalyst-planned shuffle).
    // Projecting only `canonical` keeps the output deterministic: key →
    // canonical is functional, so WHICH duplicate row survives is
    // irrelevant, and the oracle is plain DISTINCT.
    "q39_admit_plan" -> ((s, dir) => {
      val keyed = T(s, dir, "documents")
        .select(Canon.canonicalizeDomainCol(
          concat(col("source"), lit(".Example.CZ"))).as("canonical"))
        .withColumn("key", xxhash64(col("canonical")))
      graft.plans.GraftOps.admitFirstSeen(keyed, col("key"), partitions = 8)
        .select("canonical")
    }),

    // Text analysis — Gopher-style repetition facets (duplicate-token and
    // top-bigram fractions in integer mills). Row-local on the Spark side
    // (array_distinct + sorted-run aggregate — no token-level shuffle at
    // corpus scale); the oracle pins semantics with explode+groupBy.
    "q40_repetition" -> ((s, dir) =>
      TextOps.repetitionStats(T(s, dir, "documents"), "doc_id", "text")),

    // Benchmark decontamination — corpus docs sharing any 3-gram shingle
    // with the holdout "benchmark" slice (doc_id % 97 == 0). Benchmark
    // shingles broadcast; corpus never shuffles except the per-doc count.
    "q41_decontaminate" -> ((s, dir) => {
      val all = T(s, dir, "documents")
      DedupOps.contaminatedDocs(
        all.where(col("doc_id") % 97 =!= 0),
        all.where(col("doc_id") % 97 === 0),
        "doc_id", "text", shingleK = 3)
        .select(col("doc_id"), col("n_shared").cast("long").as("n_shared"))
    }),

    // Link extraction (frontier discovery primitive) — deterministic URLs
    // are synthesized around each doc's text (md5-derived labels, mixed
    // case, :port, trailing root dot, an in-doc duplicate, and a bare
    // domain-shaped word that must NOT match), then LinkOps.extractedHosts
    // pulls the referenced hosts back out. Entirely codegen'd
    // (regexp_extract_all + array_distinct); the RE2-safe pattern lets the
    // oracle replay extraction verbatim.
    "q42_links" -> ((s, dir) => {
      val id6 = substring(md5(col("doc_id").cast("string")), 1, 6)
      val id6b = substring(md5(col("doc_id").cast("string")), 7, 6)
      val body = concat(
        lit("doc "), col("text"),
        lit(" see https://w"), id6, lit(".example.cz/a"),
        lit(" and HTTP://M"), id6b, lit(".CZ:8080/path?x=1"),
        lit(" dup https://w"), id6, lit(".example.cz./b"),
        lit(" plain example.net is prose, not a link"))
      T(s, dir, "documents")
        .select(col("doc_id"), explode(graft.ops.LinkOps.extractedHosts(body)).as("host"))
        .groupBy(col("host"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
    }),

    // Curation — one representative per near-dup cluster (longest text,
    // ties → min id): the keep-the-best-copy policy applied to q35's
    // clusters. One window per cluster; clusters are small by nature.
    "q43_cluster_reps" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val cand = DedupOps.minhashCandidatePairs(docs, "doc_id", "text",
        shingleK = 3, bands = 4, rowsPerBand = 2)
      val verified = DedupOps.ngramJaccardForPairs(docs, cand, "doc_id", "text",
          shingleK = 3, minShared = 1)
        .where(col("n_inter") * 10 >= col("n_union") * 8)
      CurationOps.clusterRepresentatives(docs,
        DedupOps.dupClusters(docs, verified, "doc_id"), "doc_id", "text")
    }),

    // Curation — deterministic hash-stratified sampling: per-stratum rate
    // from md5(stratum), membership from md5(id); pure scan-local filter
    // (no shuffle, no RNG — the same rows survive on every engine and at
    // every parallelism).
    "q44_stratified_sample" -> ((s, dir) =>
      CurationOps.stratifiedSample(T(s, dir, "documents"), "doc_id", "source")),

    // Curation — CALLER-RATED stratified sampling (the production form of
    // q44): explicit per-stratum keep rates ride a broadcast-joined rate
    // table (never plan literals), membership is the same deterministic
    // md5 filter — 10% of src0, 80% of src1, all of src2, none of src3,
    // 25% of everything else
    "q55_rated_sample" -> ((s, dir) =>
      CurationOps.stratifiedSampleRated(T(s, dir, "documents"),
        "doc_id", "source",
        rates = Map("src0" -> 0.10, "src1" -> 0.80, "src2" -> 1.0,
          "src3" -> 0.0),
        defaultRate = 0.25)),

    // Curation — deterministic train/holdout split + output sharding (the
    // trainer-facing LAST step): split/shard/order from three DISJOINT md5
    // slices of the id, shard_seq from a partitioned window — a pure
    // function of the ids, no RNG state.
    "q56_split_shard" -> ((s, dir) =>
      CurationOps.splitAndShard(T(s, dir, "documents"), "doc_id",
        holdoutRate = 0.10, nShards = 8)),

    // Export validation — the shard manifest over q56's assignment:
    // per (split, shard) doc/token counts and an order-independent
    // bit-XOR content checksum (60-bit md5 prefix over id:text) a loader
    // recomputes before trusting a downloaded shard.
    "q91_shard_manifest" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val shards = CurationOps.splitAndShard(docs, "doc_id",
        holdoutRate = 0.10, nShards = 8)
      CurationOps.shardManifest(
        docs.join(shards.select("doc_id", "split", "shard"), "doc_id"),
        "doc_id", "text")
    }),

    // Similarity — SemDeDup-style near-dup pairs via the IVF coarse
    // quantizer: compare only within each cell (per-cell work
    // (|corpus|/nlist)², never corpus²). centroids pinned to "first" so
    // the oracle replays the cells; same 0.35 threshold as the exact q22,
    // so the spec can bound the cell-boundary recall loss directly.
    "q57_ivf_neardup" -> ((s, dir) =>
      SimilarityOps.ivfNearDupPairs(T(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.35, nlist = 16,
        centroids = "first")),

    // Quality — per-stratum quantile gate: drop the worst 20% of each
    // source by length; percent_rank is integer arithmetic divided once,
    // so the oracle replays the gate bit-exactly (ties broken by id).
    "q58_quantile_gate" -> ((s, dir) =>
      CurationOps.qualityGateByQuantile(T(s, dir, "documents"),
        "doc_id", "source", length(col("text")), dropBelow = 0.20)),

    // Curation — within-document repeated-paragraph removal over bodies
    // salted with a repeated nav block and a repeated text paragraph:
    // first occurrences and the blank separator survive, repeats drop.
    // Zero shuffle — the whole op is row-local higher-order expressions.
    "q59_para_dedup" -> ((s, dir) => {
      val nav = lit("nav menu home about")
      val body = concat(
        nav, lit("\n"),
        col("text"), lit("\n"),
        lit("\n"),
        nav, lit("\n"),
        lit("unique "), md5(col("doc_id").cast("string")), lit("\n"),
        col("text"))
      val docs = T(s, dir, "documents").select(col("doc_id"), body.as("body"))
      CurationOps.dropRepeatedParagraphs(docs, "doc_id", "body")
        .select(col("doc_id"), md5(col("clean_text")).as("clean_fp"),
          col("n_kept"), col("n_dropped"))
    }),

    // Similarity — ONE Lloyd round over the "first" seeds, then the cell
    // assignment. The refined centroids are exact checkable values
    // because the mean is a fixed-point LONG reduction (floor(v·2^20)
    // summed associatively, divided once) — the oracle replays the round
    // in integer arithmetic and lands on bit-identical float centroids.
    "q60_ivf_refined" -> ((s, dir) =>
      SimilarityOps.ivfFitRefined(T(s, dir, "embeddings"), "vec_id",
          "embedding", nlist = 16, centroids = "first", refineIters = 1)
        .cells.select(col("neighbor_id").as("vec_id"), col("cell"))),

    // Dedup — substring-granularity duplicate-span stats (Lee et al.
    // 2022): per document, how many of its 20-token sliding spans occur
    // verbatim anywhere else in the corpus (or again in itself). Docs
    // shorter than the window report (0, 0) — the row survives.
    "q61_dup_spans" -> ((s, dir) =>
      DedupOps.duplicateSpanStats(T(s, dir, "documents"), "doc_id", "text",
        window = 20)),

    // Dedup — the acting half: REMOVE all but the globally first
    // occurrence of every duplicated 20-token span (keeper = min
    // (doc_id, pos), so the rewrite is deterministic and the oracle
    // replays it token-for-token). Case-sensitive verbatim matching.
    "q62_drop_spans" -> ((s, dir) =>
      DedupOps.dropDuplicateSpans(T(s, dir, "documents"), "doc_id", "text",
        window = 20)),

    // Web text — regex-tier HTML→prose extraction over deterministically
    // HTML-wrapped bodies: script/style blocks (content is code, not
    // text), comments, and tags strip in that order, entities decode one
    // level (&amp; last), whitespace collapses. Pure scan-local codegen —
    // zero shuffle; the oracle replays the identical regexp chain with
    // the 'g' flag.
    "q63_html_text" -> ((s, dir) => {
      val body = concat(
        lit("<html><!-- nav <p>skip</p> --><head><script type=\"text/javascript\">var x = 1 < 2 && \"</div>\";</script><style>p{margin:0}</style></head><body><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"),
        lit("</p><div class=\"nav\">Home &amp; About&nbsp;&lt;b&gt;&quot;now&quot;&#39;s</div></body></html>"))
      val plain = TextOps.htmlToText(body)
      T(s, dir, "documents").select(col("doc_id"), plain.as("plain_text"),
        length(plain).cast("long").as("n_chars"))
    }),

    // Web graph — fixed-iteration PageRank over the host link graph in
    // BIGINT micros (floor division throughout, so DuckDB replays every
    // step bit-exactly): each doc's host links its successor's host (a
    // chain), a global hub, and a per-doc mail host; hub and mail hosts
    // are dangling. 3 damped iterations.
    "q64_host_rank" -> ((s, dir) => {
      val id6 = substring(md5(col("doc_id").cast("string")), 1, 6)
      val id6n = substring(md5((col("doc_id") + 1).cast("string")), 1, 6)
      val id6b = substring(md5(col("doc_id").cast("string")), 7, 6)
      val body = concat(
        lit("see https://d"), id6n, lit(".example.cz/next"),
        lit(" hub https://hub.example.cz/"),
        lit(" mail http://m"), id6b, lit(".cz/x"))
      val edges = T(s, dir, "documents").select(
        concat(lit("d"), id6, lit(".example.cz")).as("src"),
        explode(LinkOps.extractedHosts(body)).as("dst"))
      LinkOps.hostRank(edges, "src", "dst", iters = 3)
    }),

    // Frontier feedback — quality-aware recrawl priority, the crawl →
    // curate → crawl loop closed at the oracle level: q64's link ranks
    // re-scored by each host's measured content quality (mean per-doc
    // stopword mill, the q66 facet). Hub/mail hosts carry no docs →
    // NULL quality, bare link rank. BIGINT floor arithmetic throughout.
    "q88_recrawl_priority" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val id6 = substring(md5(col("doc_id").cast("string")), 1, 6)
      val id6n = substring(md5((col("doc_id") + 1).cast("string")), 1, 6)
      val id6b = substring(md5(col("doc_id").cast("string")), 7, 6)
      val body = concat(
        lit("see https://d"), id6n, lit(".example.cz/next"),
        lit(" hub https://hub.example.cz/"),
        lit(" mail http://m"), id6b, lit(".cz/x"))
      val edges = docs.select(
        concat(lit("d"), id6, lit(".example.cz")).as("src"),
        explode(LinkOps.extractedHosts(body)).as("dst"))
      val ranks = LinkOps.hostRank(edges, "src", "dst", iters = 3)
      val quality = docs.select(
          concat(lit("d"), id6, lit(".example.cz")).as("host"),
          coalesce(TextOps.stopwordRatioMill(col("text")).cast("long"),
            lit(0L)).as("_mill"))
        .groupBy("host")
        .agg(count(lit(1)).as("_n"), sum(col("_mill")).as("_ms"))
        .select(col("host"), expr("_ms div _n").as("quality_mill"))
      LinkOps.recrawlPriority(ranks, quality)
    }),

    // Vocabulary — corpus word counts thresholded at minCount and
    // deterministically truncated (cnt desc, token asc — a total order):
    // the first stage of tokenizer training. One map-side-combinable
    // hash agg, then TakeOrdered (no global sort shuffle).
    "q65_vocab" -> ((s, dir) =>
      TextOps.vocabulary(T(s, dir, "documents"), "text", minCount = 2L,
        topN = 50)),

    // Data card — per-source volume / internal-dup / quality rollup, the
    // table a mixture designer reads before setting q53/q55 weights. Two
    // map-side-combinable hash aggs; BIGINT + integer mills only.
    "q66_source_stats" -> ((s, dir) =>
      CurationOps.sourceStats(T(s, dir, "documents"), "doc_id", "text",
        "source")),

    // Keyword extraction — top-2 terms per doc by RATIONAL tf-idf
    // (score = tf · (N div df), pure BIGINT — the no-floats discipline),
    // total-order tie-break so the oracle replays the cut exactly.
    "q67_tfidf_terms" -> ((s, dir) =>
      TextOps.tfidfTopTerms(T(s, dir, "documents"), "doc_id", "text",
        topK = 2)),

    // ANN serving — symmetric int8 quantization of the embedding column
    // (scale = max|v_i|, q = floor(v·127/s), scale kept as micros);
    // scan-local higher-order codegen, zero shuffle. floor not round:
    // Java half-up vs DuckDB half-away diverge on exact halves.
    "q68_quantize_int8" -> ((s, dir) =>
      SimilarityOps.quantizeInt8(T(s, dir, "embeddings"), "vec_id",
        "embedding")),

    // Vocabulary — INCREMENTAL ledger: count each half-corpus separately,
    // merge the ledgers (counts are a commutative monoid), cut at read
    // time. Bit-identical to the one-shot q65 cut by construction; the
    // oracle counts the whole corpus in one pass.
    "q69_incr_vocab" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      TrainPrepOps.cutVocab(TrainPrepOps.mergeVocabCounts(
        TrainPrepOps.vocabularyCounts(docs.where(col("doc_id") % 2 === 0), "text"),
        TrainPrepOps.vocabularyCounts(docs.where(col("doc_id") % 2 === 1), "text")),
        minCount = 2L, topN = 50)
    }),

    // Tokenizer training — BPE merge-pair candidates: adjacent-token pair
    // counts, thresholded + total-order cut. Pairs build row-locally (no
    // self-join); one map-side-combined hash agg + TakeOrdered.
    "q70_merge_pairs" -> ((s, dir) =>
      TrainPrepOps.mergePairCandidates(T(s, dir, "documents"), "text",
        minCount = 2L, topN = 100)),

    // Embedding analytics — per-source centroid in fixed-point (floor
    // (x·2^20) BIGINT sums — associative, partitioning-independent,
    // engine-replayable; mean divides in IEEE double, identically on
    // both engines).
    "q71_source_centroids" -> ((s, dir) =>
      TrainPrepOps.labelCentroids(T(s, dir, "embeddings"), "vec_id",
        "embedding", T(s, dir, "documents"), "doc_id", "source")),

    // Tokenizer training — BPE merge APPLICATION (the acting half of
    // q70's candidate statistic; candidates → apply → recount is the
    // training loop, a full list is BPE encoding). Three corpus-real
    // rules exercising both plan shapes: ("order","order") is the a==b
    // run-parity path, the other two the non-overlapping fast path; rule
    // order matters and later rules see merged symbols. Entirely
    // scan-local — one projection per rule, zero shuffle.
    "q72_bpe_encode" -> ((s, dir) =>
      TrainPrepOps.applyMerges(T(s, dir, "documents"), "doc_id", "text",
        Seq("order" -> "order", "order" -> "fast", "data" -> "slow"))),

    // Tokenizer training — the full greedy BPE LOOP (q70's statistic and
    // q72's rewrite ITERATED): 3 rounds over documents, each counting
    // adjacent pairs over the current (merged) symbol streams, picking the
    // argmax under the (cnt desc, lhs, rhs) total order, and applying that
    // one rule. Each round ships exactly ONE row to the driver. The oracle
    // replays the rounds with scalar-subquery-selected rules and the q72
    // window rewrite generalized to a data-dependent (possibly a==b) pair.
    "q73_bpe_learn" -> ((s, dir) =>
      TrainPrepOps.learnMerges(T(s, dir, "documents"), "text",
        nMerges = 3, minCount = 2L)),

    // Curation — context-window chunking (the SPLITTING complement to
    // q51's packing): overlapping 40-token windows every 25 tokens.
    // Entirely scan-local (transform + posexplode), zero shuffle.
    "q74_chunk_docs" -> ((s, dir) =>
      CurationOps.chunkDocuments(T(s, dir, "documents"), "doc_id", "text",
        maxTokens = 40, stride = 25)),

    // Curation — mixture-rate calibration: sourceStats inventory ×
    // broadcast target weights → per-source sampling rates in ppm, BIGINT
    // floor division end-to-end. src0's 400-mill share of the 10k-token
    // budget exceeds its inventory at sf0.001, exercising the cap +
    // shortfall path.
    "q75_mixture_rates" -> ((s, dir) =>
      CurationOps.mixtureRates(
        CurationOps.sourceStats(T(s, dir, "documents"), "doc_id", "text",
          "source"),
        Map("src0" -> 400, "src1" -> 300, "src7" -> 200, "src19" -> 100),
        tokenBudget = 10000L)),

    // Curation — the mixture pipeline END TO END in one plan: q66's
    // inventory → q75's ppm calibration → rated sampling through the
    // rate TABLE (no driver round-trip). Same weights/budget as q75, so
    // the two scoreboard rows cross-check each other.
    "q93_execute_mixture" -> ((s, dir) =>
      CurationOps.executeMixture(T(s, dir, "documents"), "doc_id", "text",
        "source",
        Map("src0" -> 400, "src1" -> 300, "src7" -> 200, "src19" -> 100),
        tokenBudget = 10000L)),

    // Curation — deterministic exact-k uniform sample: global order on
    // (md5(id), id), first 100. Compiles to TakeOrderedAndProject — no
    // global sort shuffle; the k-sample is a prefix of every larger one.
    "q76_uniform_sample" -> ((s, dir) =>
      CurationOps.uniformSampleExact(T(s, dir, "documents"), "doc_id",
        k = 100)),

    // Decontamination (acting) — exact-substring removal: every 20-token
    // span appearing verbatim in the benchmark slice (doc_id % 7 == 0) is
    // excised from the corpus slice; no keeper — benchmark text must not
    // survive anywhere. Bench fps broadcast; corpus never shuffles before
    // the per-doc rollup.
    "q78_decontam_spans" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      DedupOps.dropContaminatedSpans(
        docs.where(col("doc_id") % 7 =!= 0),
        docs.where(col("doc_id") % 7 === 0),
        "doc_id", "text", window = 20)
    }),

    // Dedup analytics — cross-source duplication matrix over the q35
    // near-dup clusters: which sources duplicate which (diagonal =
    // within-source dup clusters). The mixture-design companion to q66's
    // per-source card.
    "q77_dup_matrix" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val cand = DedupOps.minhashCandidatePairs(docs, "doc_id", "text",
        shingleK = 3, bands = 4, rowsPerBand = 2)
      val verified = DedupOps.ngramJaccardForPairs(docs, cand, "doc_id", "text",
          shingleK = 3, minShared = 1)
        .where(col("n_inter") * 10 >= col("n_union") * 8)
      val clusters = DedupOps.dupClusters(docs, verified, "doc_id")
      DedupOps.crossSourceDupMatrix(clusters, docs, "doc_id", "source")
    }),

    // Similarity — feature-hashed ("hashing trick") document embeddings:
    // each token lands in bucket md5[0:4] mod 64 with a parity sign;
    // the doc vector is the signed count per bucket (dense array<bigint>).
    // The text→vector bridge into the ANN stack when no trained encoder
    // exists; md5-derandomized so the oracle replays the bytes.
    "q79_hash_embed" -> ((s, dir) =>
      SimilarityOps.hashEmbed(T(s, dir, "documents"), "doc_id", "text",
        dims = 64)),

    // Dedup — snapshot-incremental NEAR-dup screening: docs with
    // doc_id % 3 == 0 are the accumulated corpus (present only as their
    // band-bucket LEDGER — ids and text never rescanned); the rest arrive
    // as the new batch, each scored by how many of its band buckets the
    // ledger already holds, plus the min earlier batch id sharing any
    // bucket (within-batch keeper evidence).
    "q80_incr_neardup" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val ledger = DedupOps.bandLedger(docs.where(col("doc_id") % 3 === 0),
        "doc_id", "text")
      DedupOps.incrementalNearDup(docs.where(col("doc_id") % 3 =!= 0),
        ledger, "doc_id", "text")
    }),

    // Similarity — SemDeDup-style ACTING semantic dedup: q57's embed-space
    // near-dup pairs → connected components → keep min id per component
    // with the component size. Pins centroids = "first" so DuckDB replays
    // the cells (the library default stays "spread").
    "q82_semantic_dedup" -> ((s, dir) =>
      SimilarityOps.semanticDedup(T(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.35, nlist = 16, centroids = "first")),

    // Quality — MODEL-AS-TABLE inference: a fastText-style linear lexicon
    // rides as a broadcast (token, weight_mill) table (the production
    // shape of a trained quality classifier — retraining replaces a
    // table, not a deploy); the gate keeps docs with mean weight ≥ 50
    // mills via division-free cross-multiplication (exact on any engine,
    // negative weights included). 169 of 500 docs survive at sf0.001.
    "q84_lexicon_gate" -> ((s, dir) => {
      import s.implicits._
      val weights = Seq(("the", 1000L), ("and", 800L), ("of", 600L),
        ("to", 400L), ("in", 200L), ("a", 300L), ("is", 250L))
        .toDF("token", "weight_mill")
      TextOps.lexiconGate(T(s, dir, "documents"), "doc_id", "text",
        weights, minMeanMill = 50L)
    }),

    // Quality — integer-surprisal unigram LM (perplexity's portable
    // sibling): surprisal(token) = bitlen(N) − bitlen(cnt) bits, integer
    // log2 via length(bin(x)) on both engines, no float log anywhere;
    // unknown (< minCount) tokens cost the full bitlen(N). The
    // gibberish/OOV-density signal a CCNet-style fluency filter acts on.
    "q86_surprisal" -> ((s, dir) =>
      TextOps.surprisalStats(T(s, dir, "documents"), "doc_id", "text",
        minCount = 2L)),

    // Similarity — the text→ANN loop closed END TO END in one oracle
    // query: documents → hashEmbed (q79) → IVF top-k (q36's serve path)
    // with no embeddings table anywhere. Counts are small ints, so the
    // float cast is exact and both engines cosine in identical doubles.
    // Queries = every 50th doc; centroids pinned "first" for the oracle.
    "q83_text_ann" -> ((s, dir) => {
      val vecs = SimilarityOps.hashEmbed(T(s, dir, "documents"), "doc_id",
          "text", dims = 64)
        .select(col("doc_id"),
          transform(col("embedding_h"), x => x.cast("float")).as("vec"))
      SimilarityOps.ivfTopK(vecs, vecs.where(col("doc_id") % 50 === 0),
          "doc_id", "vec", k = 3, nlist = 16, nprobe = 4,
          centroids = "first")
        .withColumn("rank", col("rank").cast("long"))
    }),

    // Decontamination (audit) — per-BENCHMARK-doc leak report over the
    // same %7 split and span identity as q78's acting rewrite: how many of
    // each benchmark doc's 20-token spans exist verbatim in the corpus,
    // and how many distinct corpus docs carry them.
    "q81_contam_report" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      DedupOps.contaminationReport(
        docs.where(col("doc_id") % 7 =!= 0),
        docs.where(col("doc_id") % 7 === 0),
        "doc_id", "text", window = 20)
    }),

    // Curation — the full funnel as ONE declarative plan: benchmark
    // holdout → language gate (q16 heuristic) → stopword-quality gate
    // (q15) → decontamination anti-join (q41) → near-dup representative
    // keep (q35 + q43). The composition a training-data pipeline runs
    // stage-by-stage, planned holistically by Catalyst.
    "q45_curation_funnel" -> ((s, dir) =>
      CurationOps.curationFunnel(T(s, dir, "documents"), "doc_id", "text",
        benchMod = 97, wantLang = "en", minStopMill = 60, shingleK = 3)),

    // Curation — C4-style duplicated-line removal over synthesized
    // multi-line bodies: a corpus-wide footer and a ~1/5 group line get
    // dropped (doc-frequency ≥ 2), the document's own text and its unique
    // line survive in original order.
    "q46_line_dedup" -> ((s, dir) => {
      val body = concat(
        col("text"), lit("\n"),
        lit("shared footer (c) example registry"), lit("\n"),
        lit("group-"), (col("doc_id") % 5).cast("string"), lit("\n"),
        lit("unique "), md5(col("doc_id").cast("string")))
      val docs = T(s, dir, "documents").select(col("doc_id"), body.as("body"))
      CurationOps.dropCommonLines(docs, "doc_id", "body")
        .select(col("doc_id"), md5(col("clean_text")).as("clean_fp"), col("n_kept"))
    }),

    // Curation — PII scrub (emails → <EMAIL>, IPv4 → <IP>, E.164 phones →
    // <PHONE>) over bodies salted with one deterministic instance of each;
    // counts are staged (each category counted after the previous one
    // redacted). Pure scan-local codegen — the oracle replays the exact
    // regex pipeline.
    "q47_pii_scrub" -> ((s, dir) => {
      val body = concat(
        col("text"),
        lit(" contact admin"), substring(md5(col("doc_id").cast("string")), 1, 4),
        lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".example.cz"),
        lit(" from 192.0.2."), (col("doc_id") % 250).cast("string"),
        lit(" tel +420"), (lit(200000000L) + col("doc_id") % 1000000L).cast("string"))
      T(s, dir, "documents")
        .select(col("doc_id"),
          PiiOps.piiCounts(body).as("c"),
          md5(PiiOps.redactPii(body)).as("clean_fp"))
        .select(col("doc_id"), col("c.n_emails").as("n_emails"),
          col("c.n_ips").as("n_ips"), col("c.n_phones").as("n_phones"),
          col("clean_fp"))
    }),

    // Quality — CCNet/KenLM-style LM fluency gate, deterministic integer
    // variant: model = the corpus's k most frequent char trigrams
    // (count desc, trigram asc); score = permille of each doc's trigram
    // occurrences that hit the model. Model fit is one map-side-combined
    // agg + TakeOrdered; scoring is a broadcast join; the only real
    // shuffle carries one row per doc. k=64 here: the synthetic corpus has
    // only ~380 distinct trigrams, so 64 spreads scores 243–640 mill
    // (512 would cover everything and score every doc 1000).
    "q48_lm_coverage" -> ((s, dir) =>
      TextOps.lmCoverage(
        T(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 64)),

    // Multimodal — perceptual-hash (aHash) near-dup over binary media
    // columns with planted exact twins (every 50th doc's payload repeated
    // under doc_id+1e6): banded Hamming LSH, 4×16-bit bands, exact-recall
    // verify at Hamming ≤ 3. The sandbox payloads are text bytes (no image
    // magic), so they take the md5 fallback hash — which the oracle
    // recomputes nibble-by-nibble, hash-verifying the whole band/LSH path.
    "q49_media_neardup" -> ((s, dir) => {
      import s.implicits._
      val base = T(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"),
        lit("image").as("media_kind"),
        col("text").cast("binary").as("media"))
      val twins = base.where(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      MultiModalOps.mediaNearDupPairs(
        MultiModalOps.perceptualBands(
          base.unionByName(twins).as[MultiModalOps.MediaRow]).toDF())
    }),

    // Curation — Unicode NFC normalization + control-char strip (custom
    // codegen Expression + built-ins): bodies salted with a decomposed
    // a+U+0301 and a BEL control; normalization canonicalizes both, and
    // DuckDB's nfc_normalize replays the NFC exactly.
    "q54_text_norm" -> ((s, dir) => {
      val body = concat(col("text"), lit(" Ka\u0301va"), lit("\u0007"), lit(" end"))
      T(s, dir, "documents").select(col("doc_id"),
        md5(graft.canon.TextNorm.nfc(graft.canon.TextNorm.stripControls(body)))
          .as("norm_fp"),
        (graft.canon.TextNorm.nfc(body) =!= body).as("changed"))
    }),

    // Dedup — snapshot-incremental: the accumulated-corpus ledger is the
    // fingerprints of every third doc; the incoming batch is the whole
    // table. Kept = first copy per fingerprint among incoming, minus
    // anything already in the ledger.
    "q52_incremental_dedup" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val ledger = docs.where(col("doc_id") % 3 === 0)
        .select(graft.ops.TextOps.normFingerprint(col("text")).as("fp"))
      DedupOps.incrementalDedup(docs, ledger, "doc_id", "text")
        .select(col("doc_id"), col("fp"))
    }),

    // Training mixture — deterministic quality-weighted upsampling:
    // weight = 1 + stop_mill div 200 (0–199 mills → 1 copy, 200–399 → 2,
    // …, capped at 4); token-less docs have null stop_mill → null weight
    // → dropped by the w >= 1 gate.
    "q53_upsample_mixture" -> ((s, dir) =>
      CurationOps.upsampleByWeight(
        T(s, dir, "documents")
          .select(col("doc_id"),
            TextOps.stopwordRatioMill(col("text")).cast("long").as("stop_mill"))
          .select(col("doc_id"), (lit(1L) + expr("stop_mill div 200")).as("w")),
        "doc_id", "w", maxRepeat = 4)),

    // Training prep — sequence-packing assignment: documents sharded into
    // 8 independent streams, concatenated in id order, cut every 256
    // tokens; each doc assigned to the pack where it starts. One shuffle
    // (stratum hash) + a partitioned window — never a global sort.
    "q51_seq_packing" -> ((s, dir) =>
      CurationOps.packSequences(T(s, dir, "documents"), "doc_id", "text",
        tokenBudget = 256, strata = 8)),

    // Streaming twin (batch execution) — the streaming curation funnel
    // (language gate → stopword-quality gate → PII scrub → first-arrival
    // exact dedup, graft.streaming.StreamingCuration) over the bounded
    // documents table: Spark runs flatMapGroupsWithState with transient
    // state here, so first-arrival-wins collapses to min-id per
    // scrubbed-text fingerprint — which the oracle replays in SQL. The
    // genuinely streaming behavior (cross-micro-batch suppression, state
    // TTL) is spec-verified in StreamingCurationSpec.
    "q50_stream_curation" -> ((s, dir) => {
      import s.implicits._
      val docs = T(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .as[graft.streaming.StreamingCuration.CurationDoc]
      // ttl = None: bounded batch execution — exact dedup over the whole
      // input is the point here (the TTL choice is a required argument
      // precisely so unbounded deployments pick a state bound consciously)
      graft.streaming.StreamingCuration.curateStream(docs, ttl = None)
        .toDF()
        .select(col("doc_id"), md5(col("text")).as("clean_fp"))
    }),

    // SQL surface (U-layer) — the same operators through the registered
    // SQL functions (GraftExtensions): canonicalize_domain, is_global_ip
    // gate, token count, norm fingerprint. Exercises the SparkSessionExtensions
    // path end-to-end; the is_global_ip filter sweeps first octets 0-255.
    "q37_sql_surface" -> ((s, dir) => {
      GraftExtensions.register(s)
      T(s, dir, "documents").createOrReplaceTempView("graft_documents")
      s.sql("""
        SELECT doc_id,
               canonicalize_domain(concat(source, '.ExAmple.CZ.')) AS canon,
               CAST(graft_token_count(text) AS BIGINT) AS n_tokens,
               graft_norm_fingerprint(text) AS fp
        FROM graft_documents
        WHERE is_global_ip(concat(CAST(doc_id % 256 AS STRING), '.0.113.7'))""")
    }),

    // Crawl engine — span-encoded results of a 200-domain synthetic crawl
    // (deterministic universe; rows-only — no SQL oracle can crawl)
    "q26_crawl_spans" -> ((s, _) => {
      import s.implicits._
      val u = new graft.universe.Universe(42L)
      val eng = new graft.engine.Engine(s, u,
        workDir = graft.TmpDirs.create("graft-q26").toString)
      val seeds = s.createDataset((0L until 200L).map(u.seedDomain))
      eng.crawlDomains(seeds)
        .map(graft.spans.SpanCodec.encode)
        .select(col("doc_id"), explode(col("spans")).as("s"))
        .select(col("doc_id"), col("s.kind"), col("s.text"),
          col("s.media_ref"), col("s.offset"))
    }),

    // Crawl engine — relational projection over nested result documents
    "q27_crawl_dns_flat" -> ((s, _) => {
      import s.implicits._
      val u = new graft.universe.Universe(42L)
      val eng = new graft.engine.Engine(s, u,
        workDir = graft.TmpDirs.create("graft-q27").toString)
      val seeds = s.createDataset((0L until 200L).map(u.seedDomain))
      eng.crawlDomains(seeds).toDF()
        .select(col("domain"),
          col("DNS_LOCAL.DNSSEC.valid").as("dnssec_valid"),
          coalesce(size(col("DNS_LOCAL.NS_AUTH")), lit(0)).cast("long").as("n_ns"),
          col("HSTS").as("hsts_preloaded"))
    }),

    // As-of join — purchase→last-prior-click attribution per user: ONE
    // shuffle on the key, ZERO Join operators (tag-union + running
    // ignore-nulls window), instead of the equi-join + per-row max
    // subquery that materializes every candidate pair. A click AT the
    // purchase timestamp counts; equal-time clicks break to max id.
    "q94_asof_attrib" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      RelationalOps.asofJoin(purchases, clicks,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "user_id", rightTime = "ts",
        payload = Seq("click_id", "ts"), rightTieBreak = "click_id")
        .select(col("event_id"), col("user_id"),
          col("asof_click_id"),
          // cast: parquet ts is NTZ; session tz is UTC so this is exact
          (unix_millis(col("ts").cast("timestamp")) -
            unix_millis(col("asof_ts").cast("timestamp"))).as("gap_ms"))
    }),

    // Range join — clicks inside each error's 10-minute outage window
    // [ts, ts+10min): bucketized equi-join on the 10-min time bucket +
    // range re-check, never the BroadcastNestedLoopJoin Spark would plan
    // for the bare inequality predicate. Inner: windows with no clicks
    // are absent.
    "q95_range_join" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val outages = ev.where(col("event_type") === "error")
        .select(col("event_id").as("outage_id"), col("ts").as("lo"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("hi"))
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "ts")
      RelationalOps.intervalJoin(clicks, "ts", outages, "lo", "hi",
        bucketMillis = 600000L)
        .groupBy("outage_id")
        .agg(count(lit(1)).as("n_clicks"))
    }),

    // HLL sketch — distinct active (user, minute) sessions per event
    // type via 256 derandomized md5 registers: the shuffle carries ≤ m
    // rows per group instead of every distinct key; exact countDistinct
    // rides alongside so the oracle pins both the sketch STATE (integer
    // sum + zero count) and the one-division estimate.
    "q96_hll_sessions" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val key = concat(col("user_id").cast("string"), lit(":"),
        expr("unix_millis(cast(ts as timestamp)) div 60000").cast("string"))
      val sketch = SketchOps.hllDistinct(
        ev.select(col("event_type"), key.as("__k")), col("__k"),
        Seq("event_type"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(key).as("n_exact"))
      exact.join(sketch, "event_type")
    }),

    // Count-Min sketch — token frequencies from a fixed 4×512 counter
    // table (d·w rows total, independent of corpus size), probed with
    // the exact top-20 so over-estimation is visible next to truth:
    // est = min over 4 row-salted counters, ≥ exact by construction.
    "q97_cms_tokens" -> ((s, dir) => {
      val toks = T(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
      val counters = SketchOps.cmsBuild(toks, col("tok"))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok")).limit(20)
      SketchOps.cmsEstimate(counters, top, "tok")
    }),

    // Inverted index — serving-side postings: df counted BEFORE the cap
    // (idf stays honest), postings capped at 10 by a per-token rank
    // window (tf desc, doc_id) — a stopword's full posting list never
    // materializes as one array anywhere; two shuffles, both on
    // shrinking keys.
    "q98_inverted_index" -> ((s, dir) =>
      TextOps.invertedIndex(T(s, dir, "documents"), "doc_id", "text",
        maxPostings = 10)),

    // Quantile sketch — DDSketch-shaped doc-length percentiles per
    // source from ≤ 259 integer bins per group (octave from the binary-
    // string length, 2-bit sub-octave, γ = 2^(1/4) ⇒ ≤ 12.5% relative
    // error): rationals for thresholds, shifts for representatives — no
    // doubles anywhere, so even the estimates replay bit-exactly.
    "q99_quantile_sketch" -> ((s, dir) =>
      SketchOps.ddQuantiles(T(s, dir, "documents"), col("n_chars"),
        Seq("source")))
  )

  /** Extension-session-4 contract entries (q100+), split out so neither
    * map body trips scalac's method-size limits.
    */
  private def queriesExt
      : Map[String, (SparkSession, String) => DataFrame] = Map(

    // BM25 retrieval — fixed-point RSJ-odds idf (monotone in df ⇒
    // single-term ranks are exactly BM25's) + BM25's own rational tf
    // saturation in mills; three fixed queries ride a broadcast table,
    // the df model is restricted to query terms before broadcasting,
    // and the top-10 is a per-query rank window.
    "q100_bm25_rank" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq(("qa", "dup table scan"), ("qb", "vector join query"),
        ("qc", "slow merge batch the")).toDF("query_id", "qtext")
      TextOps.bm25Rank(T(s, dir, "documents"), "doc_id", "text", qs, k = 10)
    }),

    // Snapshot diff — the crawl-to-crawl delta. Two snapshots derived
    // deterministically from orders (old drops key%7=0 rows, new drops
    // key%3=0, bumps cents on key%5=0 and flips status on key%11=0), so
    // all four statuses occur; one full-outer hash join, scan-local
    // status/changed-cols projection, unchanged mass never materialized.
    "q101_snapshot_diff" -> ((s, dir) => {
      val base = T(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val oldSnap = base.where(expr("o_orderkey % 7 <> 0"))
      val newSnap = base.where(expr("o_orderkey % 3 <> 0"))
        .withColumn("cents",
          expr("cents + (case when o_orderkey % 5 = 0 then 1000 else 0 end)"))
        .withColumn("o_orderstatus",
          expr("case when o_orderkey % 11 = 0 then 'X' else o_orderstatus end"))
      RelationalOps.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"),
        Seq("o_orderstatus", "cents"))
    }),

    // Exact set-similarity self-join (AllPairs/PPJoin prefix filtering):
    // recall-1 shingle Jaccard ≥ 0.5 without MinHash loss — candidates
    // only ever join on each doc's RAREST shingles (df-ascending prefix),
    // so hot shingles never go quadratic; exact verify on candidates.
    "q102_setsim_join" -> ((s, dir) =>
      DedupOps.setSimJoinPrefix(T(s, dir, "documents"), "doc_id", "text",
        jacMill = 500L, shingleK = 3)),

    // Priority sampling (weighted bottom-k per stratum): pri = u div w
    // from the deterministic md5 uniform — heavier docs draw smaller
    // keys; per-source bottom-20 by n_chars weight, one stratum-keyed
    // rank window, everything else scan-local.
    "q103_weighted_sample" -> ((s, dir) =>
      CurationOps.weightedBottomK(T(s, dir, "documents"), "doc_id",
        "n_chars", Seq("source"), k = 20)),

    // Half-life-decayed activity — the recrawl freshness signal: each
    // event is worth 1000 >> (age div 7d) mills against the data's own
    // max day (1-row broadcast anchor); per-user map-side-combinable sum,
    // integer shifts only.
    "q104_activity_decay" -> ((s, dir) =>
      LinkOps.activityDecay(T(s, dir, "events"), Seq("user_id"), "ts",
        halfLifeDays = 7L)),

    // SCD2 history build — 4 synthetic snapshot versions from orders
    // (presence gaps at (k+v)%4=0, cents drift (k·v)%3 so some runs
    // collapse); intervals with exclusive valid_to, absence closes,
    // is_current = open-ended. Version dim broadcasts twice; data path
    // is ONE key shuffle.
    "q105_scd2_history" -> ((s, dir) => {
      val base = T(s, dir, "orders").select(col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents0"))
      val rows = base
        .withColumn("ver", explode(sequence(lit(1L), lit(4L))))
        .where(expr("(k + ver) % 4 <> 0"))
        .select(col("k"), col("ver"),
          expr("cents0 + 100 * ((k * ver) % 3)").as("cents"))
      RelationalOps.buildHistory(rows, Seq("k"), "ver", Seq("cents"))
    }),

    // PMI collocations — integer-bits log2 in the bitlen-SUM form (no
    // products ⇒ no overflow at any corpus size), minCount drops the
    // hapax tail, deterministic (pmi, cnt, lhs, rhs) cut.
    "q106_pmi_bigrams" -> ((s, dir) =>
      TrainPrepOps.pmiBigrams(T(s, dir, "documents"), "text",
        minCount = 5L, topN = 50)),

    // Host-graph degree/reciprocity audit — chain + planted reverse
    // edges (doc_id%3=0) + a hub sink: distinct in/out degree, reciprocal
    // out-edges via one reversed-pair semi-join, recip_mill.
    "q107_degree_stats" -> ((s, dir) => {
      val h = concat(lit("d"),
        substring(md5(col("doc_id").cast("string")), 1, 6))
      val hn = concat(lit("d"),
        substring(md5((col("doc_id") + 1).cast("string")), 1, 6))
      val docs = T(s, dir, "documents")
      val fwd = docs.select(h.as("src"), hn.as("dst"))
      val back = docs.where(expr("doc_id % 3 = 0"))
        .select(hn.as("src"), h.as("dst"))
      val hub = docs.select(h.as("src"), lit("hub.cz").as("dst"))
      LinkOps.degreeStats(fwd.union(back).union(hub), "src", "dst")
    }),

    // Bloom prefilter — filter built over the customer dim, probed with
    // member keys (orders' custkeys) and guaranteed non-members
    // (+10^9): confusion-matrix counts make the FP rate visible and the
    // zero-FN guarantee oracle-checked.
    "q108_bloom_prefilter" -> ((s, dir) => {
      val cust = T(s, dir, "customer").select(col("c_custkey"))
      val sketch = SketchOps.bloomBuild(cust, col("c_custkey"),
        mBits = 65536L, k = 4)
      val probes = T(s, dir, "orders")
        .select(col("o_custkey").as("key")).distinct()
        .union(T(s, dir, "orders")
          .select((col("o_custkey") + 1000000000L).as("key")).distinct())
      SketchOps.bloomMightContain(sketch, probes, "key",
          mBits = 65536L, k = 4)
        .join(cust.select(col("c_custkey").as("key"))
          .withColumn("is_member", lit(true)), Seq("key"), "left_outer")
        .groupBy(col("might_contain"),
          coalesce(col("is_member"), lit(false)).as("is_member"))
        .agg(count(lit(1)).as("n_keys"))
    }),

    // Anchor-text host profile — deterministic HTML bodies (per-doc
    // target link with a varying anchor word + a hub link): top-3 terms
    // per target host; extraction scan-local, one (host, term) agg.
    "q109_anchor_terms" -> ((s, dir) => {
      val id6n = substring(md5((col("doc_id") + 1).cast("string")), 1, 6)
      val word = expr("case when doc_id % 3 = 0 then 'alpha' " +
        "when doc_id % 3 = 1 then 'beta' else 'gamma' end")
      val body = concat(
        lit("<a href=\"https://d"), id6n,
        lit(".example.cz/x\">site "), word,
        lit("</a> <a href=\"https://hub.example.cz/\">hub portal</a>"))
      LinkOps.anchorTerms(T(s, dir, "documents").select(body.as("html")),
        "html", topK = 3)
    }),

    // Triangle counting — q107's chain+reverse+hub edge set makes every
    // consecutive doc pair + hub a triangle; degree-ordered
    // compact-forward wedges, no global rank anywhere.
    "q110_triangles" -> ((s, dir) => {
      val h = concat(lit("d"),
        substring(md5(col("doc_id").cast("string")), 1, 6))
      val hn = concat(lit("d"),
        substring(md5((col("doc_id") + 1).cast("string")), 1, 6))
      val docs = T(s, dir, "documents")
      val fwd = docs.select(h.as("src"), hn.as("dst"))
      val back = docs.where(expr("doc_id % 3 = 0"))
        .select(hn.as("src"), h.as("dst"))
      val hub = docs.select(h.as("src"), lit("hub.cz").as("dst"))
      LinkOps.triangleStats(fwd.union(back).union(hub), "src", "dst")
    }),

    // Rendezvous hashing — 8-node HRW assignment of the documents table:
    // zero shuffle, row-local argmax over the salted node hashes.
    "q111_rendezvous" -> ((s, dir) =>
      CurationOps.rendezvousAssign(T(s, dir, "documents"), "doc_id",
        (0 until 8).map(i => s"node$i"))),

    // Sliding-window distinct — 7-day rolling distinct users per event
    // type from day-grain HLL registers (register fan-out, per-bucket
    // max merge, labels restricted to observed days).
    "q112_sliding_hll" -> ((s, dir) =>
      SketchOps.hllSlidingDistinct(T(s, dir, "events"), col("user_id"),
        expr("unix_millis(cast(ts as timestamp)) div 86400000"), 7,
        Seq("event_type"))),

    // Ordered funnel — view → click → purchase per user, greedy earliest
    // chaining with strict-after steps; k−1 entity-keyed join+min rounds.
    "q113_funnel" -> ((s, dir) =>
      RelationalOps.funnel(T(s, dir, "events"), "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))),

    // Longest-prefix CIDR join — GeoIP/ASN annotation as a broadcast
    // bucket join: nested /8, /14 (multi-bucket explode path), and /20
    // blocks from nation; customer-derived IPs, some deliberately
    // uncovered; LPM keeps the most specific block per IP.
    "q114_cidr_join" -> ((s, dir) => {
      val n = T(s, dir, "nation")
      val cidrs = n.select(expr("n_nationkey * 16777216").as("net"),
          lit(8).as("plen"), col("n_name").as("block_name"))
        .union(n.select(
          expr("n_nationkey * 16777216 + (n_nationkey % 16) * 1048576")
            .as("net"),
          lit(20).as("plen"),
          concat(col("n_name"), lit("-z")).as("block_name")))
        .union(n.where(expr("n_nationkey % 5 = 0")).select(
          expr("n_nationkey * 16777216").as("net"), lit(14).as("plen"),
          concat(col("n_name"), lit("-w")).as("block_name")))
      val ips = T(s, dir, "customer").select(col("c_custkey").as("ip_id"),
        expr("(c_custkey % 30) * 16777216 + " +
          "cast(conv(substring(md5(cast(c_custkey as string)), 1, 6), " +
          "16, 10) as long)").as("ip"))
      RelationalOps.cidrJoin(ips, "ip", "ip_id", cidrs, "net", "plen",
        Seq("block_name"))
    }),

    // Salted skew join — the contract IS equality with the plain join:
    // the oracle runs the UNSALTED inner join, so the hash match proves
    // the salt/replicate mechanics change nothing.
    "q115_salted_join" -> ((s, dir) =>
      RelationalOps.saltedJoin(
        T(s, dir, "orders"), "o_custkey", "o_orderkey",
        T(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        "c_custkey", salts = 8)
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"))),

    // Per-group OLS trend — order value (whole dollars) against order
    // day (relative to 1995-01-01, keeping n·Σxy in LONG range) per
    // priority class; one five-sum aggregate, division-only doubles.
    "q116_group_trend" -> ((s, dir) => {
      val o = T(s, dir, "orders").select(col("o_orderpriority"),
        expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000" +
          " - 9131").as("x"),
        // explicit floor: decimal→bigint TRUNCATES in Spark but ROUNDS
        // in DuckDB — floor on both sides pins the value
        expr("cast(floor(cast(o_totalprice as decimal(18,2))) as bigint)")
          .as("y"))
      RelationalOps.groupTrend(o, Seq("o_orderpriority"), "x", "y")
    }),

    // Week-over-week movers — per event type, weekly counts vs the
    // adjacent previous week; signed ratio via the double-floor form.
    "q117_period_movers" -> ((s, dir) =>
      RelationalOps.periodMovers(T(s, dir, "events"), Seq("event_type"),
        expr("unix_millis(cast(ts as timestamp)) div 604800000"))),

    // First-order Markov transitions — per-user adjacent event-type
    // pairs, (ts, event_id) total order, corpus-wide counts + row
    // probability in mills.
    "q118_transitions" -> ((s, dir) =>
      RelationalOps.transitionCounts(T(s, dir, "events"), "user_id",
        "event_type", "ts", "event_id")),

    // Max-min-fair politeness budget (water-filling) — per-custkey order
    // counts as demands against a global budget of 6000 fetch slots:
    // small demands grant in full, the rest get the integer water level
    // (+1 for the first remainder hosts in (demand, host) order).
    "q119_water_fill" -> ((s, dir) => {
      val demands = T(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).cast("long").as("n_orders"))
      LinkOps.waterFill(demands, "o_custkey", "n_orders", budget = 6000L)
    }),

    // HLL set algebra — pairwise distinct-user overlap across all event
    // types from ONE register build: union by bucket-max merge,
    // intersection by inclusion–exclusion (raw, possibly negative —
    // documented), Jaccard in clamped mills.
    "q120_hll_overlap" -> ((s, dir) =>
      SketchOps.hllPairwiseOverlap(T(s, dir, "events"), col("user_id"),
        "event_type")),

    // Retention cohorts — users cohorted by first-activity week, sparse
    // (cohort, offset) matrix with distinct-active counts and mill
    // retention against the cohort size.
    "q121_retention" -> ((s, dir) =>
      RelationalOps.retentionCohorts(T(s, dir, "events"), "user_id",
        expr("unix_millis(cast(ts as timestamp)) div 604800000"))),

    // Inter-arrival gap quantiles — composition demo: per-type event
    // gaps (minutes) from a lag window feed the q99 DD-sketch, so even
    // the p50/p90/p99 replay bit-exactly.
    "q122_gap_quantiles" -> ((s, dir) => {
      val gaps = T(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          expr("unix_millis(cast(ts as timestamp))").as("ms"))
        .withColumn("gap_min",
          expr("(ms - lag(ms, 1) over (partition by event_type " +
            "order by ms, event_id)) div 60000"))
        .where(col("gap_min").isNotNull && col("gap_min") > 0)
      SketchOps.ddQuantiles(gaps, col("gap_min"), Seq("event_type"))
    })
  )

  def oracleSql: Map[String, String] = oracleSqlBase ++ oracleSqlExt

  private def oracleSqlBase: Map[String, String] = Map(
    "q01_scan_filter" ->
      "SELECT doc_id, source FROM documents WHERE length(trim(text)) > 0 AND lang = 'en'",

    // NOTE the outer CAST(SUM(...) AS BIGINT): DuckDB types SUM(BIGINT) as
    // HUGEINT (int128), which the driver's comparator does not hash like
    // int64 even when values agree — every SUM compared cross-engine must
    // be cast back to BIGINT.
    "q02_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(18,2)))) AS BIGINT) AS sum_qty,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_base_cents,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q03_join_regions" ->
      """SELECT r_name, count(*) AS n_cust,
         CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_bal_cents
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",

    "q04_explode_tokens" ->
      """SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
         FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents) t
         WHERE token <> '' GROUP BY token""",

    "q05_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1""",

    "q06_last_event" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
         WHERE rn = 1""",

    "q07_topk_orders" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders) t
         WHERE rnk <= 3""",

    "q08_regex_filter" ->
      """SELECT doc_id FROM documents WHERE regexp_matches(text, 'scan\s+\w+\s+join')""",

    "q09_parse_props" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k_val
         FROM events WHERE regexp_matches(props, '"k":\s*\d+')""",

    "q10_union_distinct" ->
      """SELECT DISTINCT user_id FROM (
           SELECT user_id FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT user_id FROM events WHERE event_type = 'view') t""",

    "q11_anti_join" ->
      """SELECT c_custkey FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",

    "q12_hourly_rollup" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_value_cents
         FROM events GROUP BY 1, 2""",

    "q13_null_collapse" ->
      """SELECT doc_id, CASE WHEN cnt = 0 THEN NULL ELSE cnt END AS spf_like FROM (
           SELECT doc_id, CAST(len(list_filter(str_split(text, ' '),
             t -> t <> '' AND t LIKE 'sp%')) AS BIGINT) AS cnt
           FROM documents) t""",

    "q14_token_stats" ->
      """SELECT doc_id,
         CAST(len(list_filter(str_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS text_chars
         FROM documents""",

    "q15_quality" ->
      s"""SELECT doc_id, n_stop,
         CASE WHEN n_tok = 0 THEN NULL
              ELSE CAST(FLOOR(1000.0 * n_stop / n_tok) AS BIGINT) END AS stop_mill
         FROM (
           SELECT doc_id,
             CAST(len(list_filter(str_split(lower(text), ' '),
               t -> t <> '' AND t IN $stopSqlList)) AS BIGINT) AS n_stop,
             len(list_filter(str_split(text, ' '), t -> t <> '')) AS n_tok
           FROM documents) t""",

    "q16_langid" -> {
      def inList(lang: String) =
        TextOps.langMarkers(lang).map(s => s"'$s'").mkString("(", ", ", ")")
      s"""WITH t AS (
           SELECT doc_id, lang,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[\\x{4E00}-\\x{9FFF}]', '', 'g')) AS cjk,
             list_filter(str_split(lower(text), ' '), x -> x <> '') AS tk
           FROM documents),
         s AS (
           SELECT doc_id, lang, n_chars, cjk, len(tk) AS n_tok,
             len(list_filter(tk, x -> x IN ${inList("en")})) AS s_en,
             len(list_filter(tk, x -> x IN ${inList("de")})) AS s_de,
             len(list_filter(tk, x -> x IN ${inList("fr")})) AS s_fr,
             len(list_filter(tk, x -> x IN ${inList("es")})) AS s_es
           FROM t)
         SELECT doc_id, lang,
           CASE WHEN n_chars = 0 THEN 'und'
                WHEN cjk * 5 >= n_chars THEN 'zh'
                WHEN n_tok = 0 THEN 'und'
                WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                ELSE 'de' END AS lang_guess
         FROM s"""
    },

    "q18_simhash" -> {
      val votes = (0 until 64).map { j =>
        val k = j / 4 + 1
        val p = 1 << (3 - j % 4)
        s"SUM((((strpos('0123456789abcdef', substring(hx, $k, 1)) - 1) // $p) % 2) * 2 - 1) AS v$j"
      }.mkString(",\n             ")
      val bands = (0 until 4).map { b =>
        val bucket = (0 until 16).map { i =>
          s"CASE WHEN v${b * 16 + i} > 0 THEN ${1L << (15 - i)} ELSE 0 END"
        }.mkString(" + ")
        s"SELECT doc_id, CAST($b AS BIGINT) AS band, CAST($bucket AS BIGINT) AS bucket FROM v"
      }.mkString("\nUNION ALL\n")
      s"""WITH tok AS (
           SELECT doc_id, unnest(list_filter(str_split(lower(text), ' '), x -> x <> '')) AS t
           FROM documents),
         h AS (SELECT doc_id, substring(md5(t), 1, 16) AS hx FROM tok),
         v AS (SELECT doc_id,
             $votes
           FROM h GROUP BY doc_id)
         $bands"""
    },

    "q17_minhash_bands" -> {
      val minCols = (0 until 8).map { i =>
        val (h, off) = if (i < 4) ("h1", 1 + 8 * i) else ("h2", 1 + 8 * (i - 4))
        s"min(substring($h, $off, 8)) AS c$i"
      }.mkString(", ")
      val bands = (0 until 4).map { b =>
        s"SELECT doc_id, CAST($b AS BIGINT) AS band, c${2 * b} || c${2 * b + 1} AS bucket FROM mins"
      }.mkString("\nUNION ALL\n")
      s"""WITH toks AS (
            SELECT doc_id, list_filter(str_split(lower(text), ' '), t -> t <> '') AS tk
            FROM documents),
          sh AS (
            SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
              i -> array_to_string(tk[i+1:i+3], ' '))) AS s
            FROM toks WHERE len(tk) >= 3),
          hx AS (SELECT doc_id, md5(s) AS h1, md5('~' || s) AS h2 FROM sh),
          mins AS (SELECT doc_id, $minCols FROM hx GROUP BY doc_id)
          $bands"""
    },

    "q19_ngram_jaccard" -> {
      // candidate pairs replicate the q17 MinHash band buckets (same
      // md5-chunk family), then the exact Jaccard verify runs on candidates
      val minCols = (0 until 8).map { i =>
        val (h, off) = if (i < 4) ("h1", 1 + 8 * i) else ("h2", 1 + 8 * (i - 4))
        s"min(substring($h, $off, 8)) AS c$i"
      }.mkString(", ")
      val bandSelects = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS band, c${2 * b} || c${2 * b + 1} AS bucket FROM mins"
      }.mkString("\nUNION ALL\n")
      s"""WITH toks AS (
           SELECT doc_id, list_filter(str_split(lower(text), ' '), t -> t <> '') AS tk
           FROM documents),
         sh AS (
           SELECT doc_id, list_transform(range(len(tk) - 2),
             i -> array_to_string(tk[i+1:i+3], ' ')) AS shl
           FROM toks WHERE len(tk) >= 3),
         shx AS (SELECT doc_id, unnest(shl) AS s FROM sh),
         hx AS (SELECT doc_id, md5(s) AS h1, md5('~' || s) AS h2 FROM shx),
         mins AS (SELECT doc_id, $minCols FROM hx GROUP BY doc_id),
         bands AS (
           $bandSelects),
         cand AS (
           SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
         d AS (SELECT DISTINCT doc_id AS id, unnest(shl) AS s FROM sh),
         sizes AS (SELECT id, count(*) AS n_sh FROM d GROUP BY id),
         inter AS (
           SELECT c.id_a, c.id_b, count(*) AS n_inter
           FROM cand c
           JOIN d x ON x.id = c.id_a
           JOIN d y ON y.id = c.id_b AND y.s = x.s
           GROUP BY 1, 2 HAVING count(*) >= 3)
         SELECT i.id_a, i.id_b, i.n_inter,
           sa.n_sh + sb.n_sh - i.n_inter AS n_union
         FROM inter i
         JOIN sizes sa ON sa.id = i.id_a
         JOIN sizes sb ON sb.id = i.id_b"""
    },

    "q35_dup_clusters" ->
      s"""$dupClustersCteSql
         SELECT doc_id, cluster FROM cl""",

    "q43_cluster_reps" ->
      s"""$dupClustersCteSql,
         sized AS (
           SELECT c.cluster, c.doc_id, len(dd.text) AS l
           FROM cl c JOIN documents dd USING (doc_id)),
         ranked AS (
           SELECT cluster, doc_id,
             row_number() OVER (PARTITION BY cluster ORDER BY l DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY cluster) AS n
           FROM sized)
         SELECT cluster, doc_id AS rep_id, CAST(n AS BIGINT) AS n_members
         FROM ranked WHERE rn = 1""",

    "q44_stratified_sample" ->
      """SELECT doc_id, source, substring(md5(source), 1, 2) AS rate_hex
         FROM documents
         WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
             < substring(md5(source), 1, 2)""",

    // rate→hex thresholds: floor(rate·2³²) as 8 lowercase hex chars
    // (0.10→19999999, 0.80→cccccccc, 0.25→40000000); 1.0→'g' (above every
    // hex digit), 0.0→'00000000' (strict < never true)
    "q55_rated_sample" ->
      """SELECT doc_id, source FROM documents
         WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
           CASE source
             WHEN 'src0' THEN '19999999'
             WHEN 'src1' THEN 'cccccccc'
             WHEN 'src2' THEN 'g'
             WHEN 'src3' THEN '00000000'
             ELSE '40000000' END""",

    // split threshold = rateHex(0.10) = '19999999'; shard from hex chars
    // 9-12 (an independent md5 slice), order key from chars 13-20
    "q56_split_shard" ->
      """WITH k AS (
           SELECT doc_id,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
                  THEN 'holdout' ELSE 'train' END AS split,
             CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 9, 4)) AS INTEGER) % 8 AS BIGINT) AS shard,
             substring(md5(CAST(doc_id AS VARCHAR)), 13, 8) AS ord
           FROM documents)
         SELECT doc_id, split, shard,
           CAST(row_number() OVER (PARTITION BY split, shard
             ORDER BY ord, doc_id) AS BIGINT) AS shard_seq
         FROM k""",

    // q56's split/shard derivation + one rollup; checksum = bit_xor of
    // 60-bit md5 prefixes over id:text (order-independent on any engine)
    "q91_shard_manifest" ->
      """WITH k AS (
           SELECT doc_id, text,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
                  THEN 'holdout' ELSE 'train' END AS split,
             CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 9, 4)) AS INTEGER) % 8 AS BIGINT) AS shard
           FROM documents),
         h AS (SELECT split, shard,
             CAST(len(list_filter(str_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS ntok,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15)) AS BIGINT) AS hh
           FROM k)
         SELECT split, shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens,
           CAST(bit_xor(hh) AS BIGINT) AS checksum
         FROM h GROUP BY 1, 2""",

    "q57_ivf_neardup" ->
      """WITH cent AS (
           SELECT vec_id AS cid, embedding AS cvec FROM embeddings
           ORDER BY vec_id LIMIT 16),
         assign AS (
           SELECT vec_id, embedding, cid AS cell FROM (
             SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rn
             FROM embeddings e CROSS JOIN cent c) t
           WHERE rn = 1)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35""",

    "q58_quantile_gate" ->
      """SELECT doc_id, source, CAST(l AS BIGINT) AS score FROM (
           SELECT doc_id, source, length(text) AS l,
             percent_rank() OVER (PARTITION BY source
               ORDER BY length(text), doc_id) AS pr
           FROM documents) t
         WHERE pr >= 0.20""",

    "q59_para_dedup" ->
      """WITH b AS (
           SELECT doc_id,
             'nav menu home about' || chr(10) || text || chr(10) || chr(10) ||
             'nav menu home about' || chr(10) ||
             'unique ' || md5(CAST(doc_id AS VARCHAR)) || chr(10) || text AS body
           FROM documents),
         p AS (SELECT doc_id, str_split(body, chr(10)) AS paras FROM b),
         k AS (SELECT doc_id, paras,
             list_filter(paras, (x, i) -> x = '' OR list_position(paras, x) = i) AS kept
           FROM p)
         SELECT doc_id, md5(array_to_string(kept, chr(10))) AS clean_fp,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(len(paras) - len(kept) AS BIGINT) AS n_dropped
         FROM k""",

    // One Lloyd round replayed in integer arithmetic: fixed-point sums
    // floor(v*2^20) are exact BIGINTs in both engines; the single
    // double-divide + float cast then lands on bit-identical centroids,
    // so the final assignment matches cell-for-cell.
    "q60_ivf_refined" ->
      """WITH cent0 AS (
           SELECT vec_id AS cid, embedding AS cvec FROM embeddings
           ORDER BY vec_id LIMIT 16),
         a0 AS (
           SELECT vec_id, embedding, cid AS cell FROM (
             SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rn
             FROM embeddings e CROSS JOIN cent0 c) t
           WHERE rn = 1),
         u AS (
           SELECT cell, generate_subscripts(embedding, 1) AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576) AS BIGINT) AS fx
           FROM a0),
         m AS (SELECT cell, dim, sum(fx) AS sfx, count(*) AS n
               FROM u GROUP BY cell, dim),
         cent1 AS (
           SELECT cell AS cid,
             list(CAST(CAST(sfx AS DOUBLE) / n / 1048576 AS FLOAT) ORDER BY dim) AS cvec
           FROM m GROUP BY cell),
         centf AS (
           SELECT cid, cvec FROM cent1
           UNION ALL
           SELECT cid, cvec FROM cent0
           WHERE cid NOT IN (SELECT cid FROM cent1))
         SELECT vec_id, cell FROM (
           SELECT e.vec_id, c.cid AS cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rn
           FROM embeddings e CROSS JOIN centf c) t
         WHERE rn = 1""",

    "q61_dup_spans" ->
      """WITH tok AS (
           SELECT doc_id,
             list_filter(str_split_regex(lower(text), '\s+'), x -> x <> '') AS ts
           FROM documents),
         sp0 AS (
           SELECT doc_id, ts,
             unnest(generate_series(1, len(ts) - 19)) AS i FROM tok),
         sp AS (
           SELECT doc_id,
             md5(array_to_string(list_slice(ts, i, i + 19), ' ')) AS fp
           FROM sp0),
         freq AS (SELECT fp, count(*) AS cnt FROM sp GROUP BY fp),
         per AS (SELECT s.doc_id, count(*) AS n_spans,
                   count(CASE WHEN f.cnt > 1 THEN 1 END) AS n_dup
                 FROM sp s JOIN freq f USING (fp) GROUP BY s.doc_id)
         SELECT d.doc_id, CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_spans
         FROM documents d LEFT JOIN per p USING (doc_id)""",

    "q62_drop_spans" ->
      """WITH tok AS (
           SELECT doc_id,
             list_filter(str_split_regex(text, '\s+'), x -> x <> '') AS ts
           FROM documents),
         o0 AS (SELECT doc_id, ts,
                  unnest(generate_series(1, len(ts) - 19)) AS pos FROM tok),
         occ AS (SELECT doc_id, pos,
                  md5(array_to_string(list_slice(ts, pos, pos + 19), ' ')) AS fp
                 FROM o0),
         rk AS (SELECT doc_id, pos,
                  row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rk,
                  count(*) OVER (PARTITION BY fp) AS cnt
                FROM occ),
         cov AS (SELECT doc_id, unnest(generate_series(pos, pos + 19)) AS ti
                 FROM rk WHERE cnt > 1 AND rk > 1),
         covs AS (SELECT doc_id, list(DISTINCT ti) AS cv FROM cov GROUP BY doc_id)
         SELECT t.doc_id,
           -- COALESCE: DuckDB's array_to_string([]) is NULL; a fully
           -- removed doc must read as '' like Spark's array_join
           COALESCE(array_to_string(CASE WHEN c.cv IS NULL THEN t.ts
             ELSE list_filter(t.ts, (x, i) -> NOT list_contains(c.cv, i)) END,
             ' '), '') AS clean_text,
           CAST(len(t.ts) AS BIGINT) AS n_tokens,
           CAST(COALESCE(len(c.cv), 0) AS BIGINT) AS n_removed
         FROM tok t LEFT JOIN covs c USING (doc_id)""",

    "q63_html_text" ->
      """WITH b AS (SELECT doc_id,
           concat('<html><!-- nav <p>skip</p> --><head><script type="text/javascript">var x = 1 < 2 && "</div>";</script><style>p{margin:0}</style></head><body><h1>Doc ',
             CAST(doc_id AS VARCHAR), '</h1><p>', text,
             '</p><div class="nav">Home &amp; About&nbsp;&lt;b&gt;&quot;now&quot;&#39;s</div></body></html>') AS body
         FROM documents),
         s4 AS (SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(body,
             '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
             '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
             '(?s)<!--.*?-->', ' ', 'g'),
             '<[^>]*>', ' ', 'g') AS t FROM b),
         s5 AS (SELECT doc_id,
           trim(regexp_replace(
             replace(replace(replace(replace(replace(replace(t,
               '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', ''''), '&amp;', '&'),
             '\s+', ' ', 'g')) AS plain_text FROM s4)
         SELECT doc_id, plain_text,
           CAST(length(plain_text) AS BIGINT) AS n_chars FROM s5""",

    "q64_host_rank" ->
      """WITH b AS (SELECT
           'd' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) || '.example.cz' AS src,
           concat('see https://d', substr(md5(CAST(doc_id + 1 AS VARCHAR)), 1, 6),
             '.example.cz/next', ' hub https://hub.example.cz/',
             ' mail http://m', substr(md5(CAST(doc_id AS VARCHAR)), 7, 6), '.cz/x') AS body
         FROM documents),
         e AS (SELECT DISTINCT src, dst FROM (
           SELECT src, unnest(regexp_extract_all(lower(body),
             'https?://([a-z0-9.-]+\.[a-z]{2,})', 1)) AS dst FROM b)),
         nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
         ew AS (SELECT e.src, e.dst, d.outdeg FROM e
           JOIN (SELECT src, count(*) AS outdeg FROM e GROUP BY src) d USING (src)),
         it0 AS (SELECT host, CAST(1000000 AS BIGINT) AS r FROM nodes),
         it1 AS (SELECT n.host,
             CAST(150000 + (850 * COALESCE(s.c, 0)) // 1000 AS BIGINT) AS r
           FROM nodes n LEFT JOIN (SELECT ew.dst AS host, SUM(p.r // ew.outdeg) AS c
             FROM ew JOIN it0 p ON p.host = ew.src GROUP BY ew.dst) s ON s.host = n.host),
         it2 AS (SELECT n.host,
             CAST(150000 + (850 * COALESCE(s.c, 0)) // 1000 AS BIGINT) AS r
           FROM nodes n LEFT JOIN (SELECT ew.dst AS host, SUM(p.r // ew.outdeg) AS c
             FROM ew JOIN it1 p ON p.host = ew.src GROUP BY ew.dst) s ON s.host = n.host),
         it3 AS (SELECT n.host,
             CAST(150000 + (850 * COALESCE(s.c, 0)) // 1000 AS BIGINT) AS r
           FROM nodes n LEFT JOIN (SELECT ew.dst AS host, SUM(p.r // ew.outdeg) AS c
             FROM ew JOIN it2 p ON p.host = ew.src GROUP BY ew.dst) s ON s.host = n.host)
         SELECT host, r AS rank_micro FROM it3""",

    // q64's 3-round rank replay + the q66 stopword-mill facet rolled up
    // per host; NULL quality (hub/mail hosts) keeps the bare link rank
    "q88_recrawl_priority" ->
      s"""WITH b AS (SELECT doc_id, text,
           'd' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) || '.example.cz' AS src,
           concat('see https://d', substr(md5(CAST(doc_id + 1 AS VARCHAR)), 1, 6),
             '.example.cz/next', ' hub https://hub.example.cz/',
             ' mail http://m', substr(md5(CAST(doc_id AS VARCHAR)), 7, 6), '.cz/x') AS body
         FROM documents),
         e AS (SELECT DISTINCT src, dst FROM (
           SELECT src, unnest(regexp_extract_all(lower(body),
             'https?://([a-z0-9.-]+\\.[a-z]{2,})', 1)) AS dst FROM b)),
         nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
         ew AS (SELECT e.src, e.dst, d.outdeg FROM e
           JOIN (SELECT src, count(*) AS outdeg FROM e GROUP BY src) d USING (src)),
         it0 AS (SELECT host, CAST(1000000 AS BIGINT) AS r FROM nodes),
         it1 AS (SELECT n.host,
             CAST(150000 + (850 * COALESCE(s.c, 0)) // 1000 AS BIGINT) AS r
           FROM nodes n LEFT JOIN (SELECT ew.dst AS host, SUM(p.r // ew.outdeg) AS c
             FROM ew JOIN it0 p ON p.host = ew.src GROUP BY ew.dst) s ON s.host = n.host),
         it2 AS (SELECT n.host,
             CAST(150000 + (850 * COALESCE(s.c, 0)) // 1000 AS BIGINT) AS r
           FROM nodes n LEFT JOIN (SELECT ew.dst AS host, SUM(p.r // ew.outdeg) AS c
             FROM ew JOIN it1 p ON p.host = ew.src GROUP BY ew.dst) s ON s.host = n.host),
         it3 AS (SELECT n.host,
             CAST(150000 + (850 * COALESCE(s.c, 0)) // 1000 AS BIGINT) AS r
           FROM nodes n LEFT JOIN (SELECT ew.dst AS host, SUM(p.r // ew.outdeg) AS c
             FROM ew JOIN it2 p ON p.host = ew.src GROUP BY ew.dst) s ON s.host = n.host),
         f AS (SELECT src AS host,
             CAST(len(list_filter(str_split(text, ' '), t -> t <> '')) AS BIGINT) AS ntok,
             CAST(len(list_filter(str_split(lower(text), ' '),
               t -> t <> '' AND t IN $stopSqlList)) AS BIGINT) AS nstop
           FROM b),
         qual AS (SELECT host,
             CAST(SUM(COALESCE(CASE WHEN ntok = 0 THEN NULL
                 ELSE CAST(FLOOR(1000.0 * nstop / ntok) AS BIGINT) END, 0))
               // count(*) AS BIGINT) AS quality_mill
           FROM f GROUP BY host)
         SELECT r.host, r.r AS rank_micro, q.quality_mill,
           CAST(r.r + (500000 * COALESCE(q.quality_mill, 0)) // 1000 AS BIGINT)
             AS priority_micro
         FROM it3 r LEFT JOIN qual q USING (host)""",

    "q65_vocab" ->
      """WITH tok AS (SELECT unnest(list_filter(str_split_regex(text, '\s+'),
             x -> x <> '')) AS token FROM documents),
         c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token
           HAVING count(*) >= 2)
         SELECT token, CAST(cnt AS BIGINT) AS cnt FROM c
         ORDER BY cnt DESC, token LIMIT 50""",

    "q66_source_stats" ->
      s"""WITH f AS (
           SELECT source,
             CAST(len(list_filter(str_split(text, ' '), t -> t <> '')) AS BIGINT) AS ntok,
             CAST(len(list_filter(str_split(lower(text), ' '),
               t -> t <> '' AND t IN $stopSqlList)) AS BIGINT) AS nstop,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
           FROM documents),
         f2 AS (SELECT source, ntok,
             COALESCE(CASE WHEN ntok = 0 THEN NULL
               ELSE CAST(FLOOR(1000.0 * nstop / ntok) AS BIGINT) END, 0) AS mill,
             fp FROM f),
         card AS (SELECT source, count(*) AS n_docs, SUM(ntok) AS n_tokens,
             SUM(mill) AS millsum FROM f2 GROUP BY source),
         dups AS (SELECT source,
             SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS n_dup_docs
           FROM (SELECT source, fp, count(*) AS c FROM f2 GROUP BY source, fp) g
           GROUP BY source)
         SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs,
           CAST(c.n_tokens AS BIGINT) AS n_tokens,
           CAST(d.n_dup_docs AS BIGINT) AS n_dup_docs,
           CAST(c.millsum // c.n_docs AS BIGINT) AS mean_stop_mill
         FROM card c JOIN dups d USING (source)""",

    "q67_tfidf_terms" ->
      """WITH tk AS (SELECT doc_id, unnest(list_filter(
             str_split_regex(text, '\s+'), x -> x <> '')) AS token
           FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM tk
           GROUP BY doc_id, token),
         df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         n AS (SELECT count(*) AS n FROM documents),
         sc AS (SELECT t.doc_id, t.token, CAST(t.tf AS BIGINT) AS tf,
             CAST(t.tf * (n.n // d.df) AS BIGINT) AS score
           FROM tf t JOIN df d USING (token) CROSS JOIN n),
         rk AS (SELECT doc_id, token, tf, score,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, tf DESC, token) AS BIGINT) AS rank FROM sc)
         SELECT doc_id, token, tf, score, rank FROM rk WHERE rank <= 2""",

    "q68_quantize_int8" ->
      """WITH s AS (SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS sc
         FROM embeddings)
         SELECT vec_id,
           CAST(floor(sc * 1000000) AS BIGINT) AS scale_micro,
           CASE WHEN sc = 0
                THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                ELSE list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 127 / sc) AS BIGINT))
           END AS qvec
         FROM s""",

    // q69's oracle is the ONE-PASS count over the whole corpus — the
    // merged two-ledger Spark plan must land on identical bytes.
    "q69_incr_vocab" ->
      """WITH tok AS (SELECT unnest(list_filter(str_split_regex(text, '\s+'),
             x -> x <> '')) AS token FROM documents),
         c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token
           HAVING count(*) >= 2)
         SELECT token, CAST(cnt AS BIGINT) AS cnt FROM c
         ORDER BY cnt DESC, token LIMIT 50""",

    "q70_merge_pairs" ->
      """WITH tok AS (SELECT list_filter(str_split_regex(text, '\s+'),
             x -> x <> '') AS ts FROM documents),
         p0 AS (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM tok),
         p AS (SELECT ts[i] AS lhs, ts[i + 1] AS rhs FROM p0),
         c AS (SELECT lhs, rhs, count(*) AS cnt FROM p GROUP BY lhs, rhs
           HAVING count(*) >= 2)
         SELECT lhs, rhs, CAST(cnt AS BIGINT) AS cnt FROM c
         ORDER BY cnt DESC, lhs, rhs LIMIT 100""",

    "q71_source_centroids" ->
      """WITH l AS (SELECT d.source AS label, e.embedding AS emb
           FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
         el AS (SELECT label, emb,
             unnest(generate_series(1, len(emb))) AS p FROM l),
         q AS (SELECT label, p - 1 AS pos,
             CAST(floor(CAST(emb[p] AS DOUBLE) * 1048576) AS BIGINT) AS q FROM el),
         sums AS (SELECT label, pos, SUM(q) AS s, count(*) AS n
           FROM q GROUP BY label, pos)
         SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
           list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY pos)
             AS centroid_q
         FROM sums GROUP BY label""",

    // q72 replays each merge rule as a window pass over (doc, pos, tok):
    // rule 1 (order,order) needs run parity — gaps-and-islands grp =
    // pos - row_number within the tok='order' stripe, off = within-run
    // index; merge starts sit at even offsets with an 'order' successor,
    // seconds at odd offsets. Rules 2/3 (a≠b) can never overlap, so
    // greedy = ALL matches: rewrite starts via lead, drop seconds via lag
    // (lag COALESCEd — NULL first-row prv would three-value the NOT).
    "q72_bpe_encode" ->
      """WITH base AS (SELECT doc_id,
             list_filter(str_split_regex(text, '\s+'), x -> x <> '') AS ts
           FROM documents WHERE len(list_filter(
             str_split_regex(text, '\s+'), x -> x <> '')) > 0),
         t0 AS (SELECT doc_id, i AS pos, ts[i] AS tok
           FROM (SELECT doc_id, ts,
               unnest(generate_series(1, len(ts))) AS i FROM base)),
         r1 AS (SELECT doc_id, pos, tok,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt,
             CASE WHEN tok = 'order' THEN pos - row_number()
               OVER (PARTITION BY doc_id, tok = 'order' ORDER BY pos) END AS grp
           FROM t0),
         r1o AS (SELECT doc_id, pos, tok, nxt,
             CASE WHEN grp IS NOT NULL THEN row_number()
               OVER (PARTITION BY doc_id, grp ORDER BY pos) - 1 END AS off
           FROM r1),
         t1 AS (SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
             CASE WHEN tok = 'order' AND off % 2 = 0 AND nxt = 'order'
                  THEN 'orderorder' ELSE tok END AS tok
           FROM r1o WHERE NOT (tok = 'order' AND off % 2 = 1)),
         r2 AS (SELECT doc_id, pos, tok,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt,
             lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prv
           FROM t1),
         t2 AS (SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
             CASE WHEN tok = 'order' AND nxt = 'fast'
                  THEN 'orderfast' ELSE tok END AS tok
           FROM r2 WHERE NOT (tok = 'fast' AND coalesce(prv, '') = 'order')),
         r3 AS (SELECT doc_id, pos, tok,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt,
             lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prv
           FROM t2),
         t3 AS (SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
             CASE WHEN tok = 'data' AND nxt = 'slow'
                  THEN 'dataslow' ELSE tok END AS tok
           FROM r3 WHERE NOT (tok = 'slow' AND coalesce(prv, '') = 'data'))
         SELECT doc_id, list(tok ORDER BY pos) AS toks,
           CAST(count(*) AS BIGINT) AS n_tokens
         FROM t3 GROUP BY doc_id""",

    // q73 replays the TRAINING loop: three chained rounds, each selecting
    // its own argmax rule (scalar subqueries on b{k}) before rewriting —
    // see bpeLearnRoundSql for the generalized both-shapes window pass.
    "q73_bpe_learn" ->
      s"""WITH base AS (SELECT doc_id,
             list_filter(str_split_regex(text, '\\s+'), x -> x <> '') AS ts
           FROM documents WHERE len(list_filter(
             str_split_regex(text, '\\s+'), x -> x <> '')) > 0),
         t0 AS (SELECT doc_id, i AS pos, ts[i] AS tok
           FROM (SELECT doc_id, ts,
               unnest(generate_series(1, len(ts))) AS i FROM base)),
         ${bpeLearnRoundSql(1, 2L)},
         ${bpeLearnRoundSql(2, 2L)},
         ${bpeLearnRoundSql(3, 2L)}
         SELECT CAST(round AS INT) AS round, lhs, rhs, CAST(cnt AS BIGINT) AS cnt
         FROM (SELECT 1 AS round, lhs, rhs, cnt FROM b1
           UNION ALL SELECT 2, lhs, rhs, cnt FROM b2
           UNION ALL SELECT 3, lhs, rhs, cnt FROM b3)
         ORDER BY round""",

    "q74_chunk_docs" ->
      """WITH base AS (SELECT doc_id,
             list_filter(str_split_regex(text, '\s+'), x -> x <> '') AS ts
           FROM documents WHERE len(list_filter(
             str_split_regex(text, '\s+'), x -> x <> '')) > 0),
         k AS (SELECT doc_id, ts, unnest(generate_series(0,
             CASE WHEN len(ts) <= 40 THEN 0
               ELSE (len(ts) - 40 + 25 - 1) // 25 END)) AS k
           FROM base)
         SELECT doc_id, CAST(k AS INT) AS chunk_id,
           array_to_string(ts[k * 25 + 1 : k * 25 + 40], ' ') AS text,
           CAST(len(ts[k * 25 + 1 : k * 25 + 40]) AS BIGINT) AS n_tokens
         FROM k""",

    "q75_mixture_rates" ->
      """WITH f AS (SELECT source,
             CAST(len(list_filter(str_split(text, ' '), t -> t <> ''))
               AS BIGINT) AS ntok
           FROM documents),
         card AS (SELECT source, SUM(ntok) AS n_tokens FROM f GROUP BY source),
         w AS (SELECT * FROM (VALUES ('src0', 400), ('src1', 300),
             ('src7', 200), ('src19', 100)) AS t(source, w_mill))
         SELECT c.source, CAST(w.w_mill AS INT) AS w_mill,
           CAST(c.n_tokens AS BIGINT) AS n_tokens,
           CAST((10000 * w.w_mill) // 1000 AS BIGINT) AS target_tokens,
           CAST(CASE WHEN c.n_tokens <= 0 THEN 0
             ELSE least(1000000,
               (CAST((10000 * w.w_mill) // 1000 AS BIGINT) * 1000000)
                 // c.n_tokens) END
             AS BIGINT) AS rate_ppm,
           CAST(greatest(0, (10000 * w.w_mill) // 1000 - c.n_tokens)
             AS BIGINT) AS shortfall_tokens
         FROM card c JOIN w USING (source)""",

    "q76_uniform_sample" ->
      """SELECT doc_id FROM documents
         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100""",

    // q75's rate arithmetic feeding the q55 md5-threshold mechanism at
    // ppm granularity: keep iff 32-bit md5 slice < rate_ppm·2^32 // 10^6
    "q93_execute_mixture" ->
      """WITH f AS (SELECT source,
             CAST(len(list_filter(str_split(text, ' '), t -> t <> ''))
               AS BIGINT) AS ntok
           FROM documents),
         card AS (SELECT source, SUM(ntok) AS n_tokens FROM f GROUP BY source),
         w AS (SELECT * FROM (VALUES ('src0', 400), ('src1', 300),
             ('src7', 200), ('src19', 100)) AS t(source, w_mill)),
         r AS (SELECT c.source,
             CASE WHEN c.n_tokens <= 0 THEN 0
               ELSE least(1000000,
                 (CAST((10000 * w.w_mill) // 1000 AS BIGINT) * 1000000)
                   // c.n_tokens) END AS rate_ppm
           FROM card c JOIN w USING (source))
         SELECT d.doc_id, d.source
         FROM documents d JOIN r USING (source)
         WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) < r.rate_ppm * 4294967296 // 1000000""",

    "q78_decontam_spans" ->
      """WITH tok AS (SELECT doc_id,
             list_filter(str_split_regex(text, '\s+'), x -> x <> '') AS ts
           FROM documents),
         corp AS (SELECT * FROM tok WHERE doc_id % 7 <> 0),
         ben AS (SELECT * FROM tok WHERE doc_id % 7 = 0),
         bfp AS (SELECT DISTINCT
             md5(array_to_string(list_slice(ts, pos, pos + 19), ' ')) AS fp
           FROM (SELECT ts, unnest(generate_series(1, len(ts) - 19)) AS pos
                 FROM ben)),
         occ AS (SELECT doc_id, pos,
             md5(array_to_string(list_slice(ts, pos, pos + 19), ' ')) AS fp
           FROM (SELECT doc_id, ts,
                 unnest(generate_series(1, len(ts) - 19)) AS pos FROM corp)),
         cov AS (SELECT doc_id, unnest(generate_series(pos, pos + 19)) AS ti
             FROM occ WHERE fp IN (SELECT fp FROM bfp)),
         covs AS (SELECT doc_id, list(DISTINCT ti) AS cv FROM cov GROUP BY doc_id)
         SELECT t.doc_id,
           COALESCE(array_to_string(CASE WHEN c.cv IS NULL THEN t.ts
             ELSE list_filter(t.ts, (x, i) -> NOT list_contains(c.cv, i)) END,
             ' '), '') AS clean_text,
           CAST(len(t.ts) AS BIGINT) AS n_tokens,
           CAST(COALESCE(len(c.cv), 0) AS BIGINT) AS n_removed
         FROM corp t LEFT JOIN covs c USING (doc_id)""",

    "q77_dup_matrix" ->
      s"""$dupClustersCteSql,
         lab AS (SELECT c.cluster, d.source AS src, count(*) AS n
           FROM cl c JOIN documents d USING (doc_id) GROUP BY 1, 2)
         SELECT a.src AS src_a, b.src AS src_b,
           CAST(count(*) AS BIGINT) AS n_clusters
         FROM lab a JOIN lab b ON a.cluster = b.cluster AND a.src <= b.src
         WHERE a.src < b.src OR a.n >= 2
         GROUP BY 1, 2""",

    // bucket = first 4 md5 hex chars mod 64; sign = parity of the 5th.
    // Densify via generate_series LEFT JOIN; zero-token docs drop (no
    // tokens ever enter e).
    "q79_hash_embed" ->
      s"""WITH $hashEmbedVecsCte
         SELECT doc_id, vec AS embedding_h FROM vecs""",

    // ledger = band buckets of the %3==0 slice; batch = the rest. One
    // count of ledger-held bands per batch doc + the min earlier batch id
    // sharing any bucket.
    "q80_incr_neardup" ->
      s"""WITH ${bandsCte("l", "doc_id % 3 = 0")},
         ${bandsCte("n", "doc_id % 3 <> 0")},
         lset AS (SELECT DISTINCT band, bucket FROM lbands),
         hits AS (SELECT n.doc_id, count(*) AS nl
           FROM nbands n JOIN lset USING (band, bucket) GROUP BY 1),
         prior AS (SELECT a.doc_id, min(b.doc_id) AS prior_id
           FROM nbands a JOIN nbands b
             ON a.band = b.band AND a.bucket = b.bucket AND b.doc_id < a.doc_id
           GROUP BY 1)
         SELECT d.doc_id, CAST(COALESCE(h.nl, 0) AS BIGINT) AS n_ledger_bands,
           p.prior_id
         FROM (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0) d
         LEFT JOIN hits h USING (doc_id)
         LEFT JOIN prior p USING (doc_id)""",

    // q57's cells + pair threshold, then the recursive-CTE component
    // closure and a min-id/size rollup per component
    "q82_semantic_dedup" ->
      """WITH RECURSIVE cent AS (
           SELECT vec_id AS cid, embedding AS cvec FROM embeddings
           ORDER BY vec_id LIMIT 16),
         assign AS (
           SELECT vec_id, embedding, cid AS cell FROM (
             SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rn
             FROM embeddings e CROSS JOIN cent c) t
           WHERE rn = 1),
         e AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35),
         und AS (SELECT id_a AS a, id_b AS b FROM e
                 UNION SELECT id_b, id_a FROM e),
         reach AS (
           SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM und) t
           UNION
           SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst),
         clus AS (SELECT src, min(dst) AS cluster FROM reach GROUP BY src),
         cl AS (SELECT ee.vec_id, COALESCE(c.cluster, ee.vec_id) AS cluster
           FROM embeddings ee LEFT JOIN clus c ON c.src = ee.vec_id)
         SELECT CAST(min(vec_id) AS BIGINT) AS vec_id,
           CAST(count(*) AS BIGINT) AS n_members
         FROM cl GROUP BY cluster""",

    // the lexicon as a VALUES table; gate = division-free
    // cross-multiplication (w_sum ≥ 50·n_tokens)
    "q84_lexicon_gate" ->
      """WITH tok AS (SELECT doc_id,
             unnest(list_filter(str_split_regex(text, '\s+'), x -> x <> ''))
               AS t
           FROM documents),
         w AS (SELECT * FROM (VALUES ('the', 1000), ('and', 800),
             ('of', 600), ('to', 400), ('in', 200), ('a', 300),
             ('is', 250)) v(token, weight_mill)),
         s AS (SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(w.weight_mill) AS BIGINT) AS n_scored,
             CAST(COALESCE(sum(w.weight_mill), 0) AS BIGINT) AS w_sum_mill
           FROM tok LEFT JOIN w ON w.token = tok.t GROUP BY 1)
         SELECT doc_id, n_tokens, n_scored, w_sum_mill
         FROM s WHERE w_sum_mill >= 50 * n_tokens""",

    // integer log2 via length(bin(x)); unknown tokens cost bitlen(N) bits
    "q86_surprisal" ->
      """WITH tok AS (SELECT doc_id,
             unnest(list_filter(str_split_regex(text, '\s+'), x -> x <> ''))
               AS token
           FROM documents),
         model AS (SELECT token,
             CAST(length(bin(count(*))) AS BIGINT) AS cnt_bits
           FROM tok GROUP BY 1 HAVING count(*) >= 2),
         tot AS (SELECT CAST(length(bin(count(*))) AS BIGINT) AS cb FROM tok),
         bits AS (SELECT doc_id, tot.cb - COALESCE(m.cnt_bits, 0) AS b
           FROM tok LEFT JOIN model m USING (token) CROSS JOIN tot),
         agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(b) AS BIGINT) AS total_bits
           FROM bits GROUP BY 1)
         SELECT doc_id, n_tokens, total_bits,
           total_bits * 1000 // n_tokens AS mean_bits_mill
         FROM agg""",

    // q79's vector CTE feeding q36's IVF replay — cells from the 16
    // lowest-id vectors, 4 probes per query, exact re-rank inside probes
    "q83_text_ann" ->
      s"""WITH $hashEmbedVecsCte,
         cent AS (
           SELECT doc_id AS cid, vec AS cvec FROM vecs
           ORDER BY doc_id LIMIT 16),
         assign AS (
           SELECT doc_id AS neighbor_id, cid AS cell FROM (
             SELECT v.doc_id, c.cid,
               row_number() OVER (PARTITION BY v.doc_id
                 ORDER BY list_cosine_similarity(v.vec, c.cvec) DESC, c.cid) AS rn
             FROM vecs v CROSS JOIN cent c) t
           WHERE rn = 1),
         qprobe AS (
           SELECT doc_id AS query_id, cid AS cell FROM (
             SELECT v.doc_id, c.cid,
               row_number() OVER (PARTITION BY v.doc_id
                 ORDER BY list_cosine_similarity(v.vec, c.cvec) DESC, c.cid) AS rn
             FROM vecs v CROSS JOIN cent c
             WHERE v.doc_id % 50 = 0) t
           WHERE rn <= 4),
         cand AS (
           SELECT q.query_id, a.neighbor_id
           FROM qprobe q JOIN assign a ON a.cell = q.cell
           WHERE a.neighbor_id <> q.query_id),
         scored AS (
           SELECT cand.query_id, cand.neighbor_id,
             row_number() OVER (PARTITION BY cand.query_id
               ORDER BY list_cosine_similarity(qv.vec, nv.vec) DESC,
                        cand.neighbor_id) AS rank
           FROM cand
           JOIN vecs qv ON qv.doc_id = cand.query_id
           JOIN vecs nv ON nv.doc_id = cand.neighbor_id)
         SELECT query_id, neighbor_id, rank FROM scored WHERE rank <= 3""",

    // same %7 split and 20-token span identity as q78; per-bench-doc
    // distinct leaked fps + distinct touched corpus docs
    "q81_contam_report" ->
      """WITH tok AS (SELECT doc_id,
             list_filter(str_split_regex(text, '\s+'), x -> x <> '') AS ts
           FROM documents),
         ben AS (SELECT * FROM tok WHERE doc_id % 7 = 0),
         corp AS (SELECT * FROM tok WHERE doc_id % 7 <> 0),
         bsp AS (SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(ts, pos, pos + 19), ' ')) AS fp
           FROM (SELECT doc_id, ts,
                 unnest(generate_series(1, len(ts) - 19)) AS pos FROM ben)),
         csp AS (SELECT DISTINCT doc_id AS cid,
             md5(array_to_string(list_slice(ts, pos, pos + 19), ' ')) AS fp
           FROM (SELECT doc_id, ts,
                 unnest(generate_series(1, len(ts) - 19)) AS pos FROM corp)),
         j AS (SELECT b.doc_id, b.fp, c.cid FROM bsp b JOIN csp c USING (fp)),
         leak AS (SELECT doc_id, count(DISTINCT fp) AS nl FROM j GROUP BY 1),
         td AS (SELECT doc_id, count(DISTINCT cid) AS nd FROM j GROUP BY 1),
         nsp AS (SELECT doc_id, count(*) AS ns FROM bsp GROUP BY 1)
         SELECT b.doc_id, CAST(COALESCE(n.ns, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(l.nl, 0) AS BIGINT) AS n_leaked_spans,
           CAST(COALESCE(t.nd, 0) AS BIGINT) AS n_corpus_docs
         FROM (SELECT doc_id FROM documents WHERE doc_id % 7 = 0) b
         LEFT JOIN nsp n USING (doc_id)
         LEFT JOIN leak l USING (doc_id)
         LEFT JOIN td t USING (doc_id)""",

    "q45_curation_funnel" ->
      s"""$dupClustersCteSql,
         sized AS (
           SELECT c.cluster, c.doc_id, len(dd.text) AS l
           FROM cl c JOIN documents dd USING (doc_id)),
         reps AS (
           SELECT doc_id FROM (
             SELECT doc_id, row_number() OVER (PARTITION BY cluster
               ORDER BY l DESC, doc_id) AS rn
             FROM sized) t WHERE rn = 1),
         lt AS (
           SELECT doc_id, length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[\\x{4E00}-\\x{9FFF}]', '', 'g')) AS cjk,
             list_filter(str_split(lower(text), ' '), x -> x <> '') AS ltk
           FROM documents WHERE doc_id % 97 <> 0),
         ls AS (
           SELECT doc_id, n_chars, cjk, len(ltk) AS n_tok,
             len(list_filter(ltk, x -> x IN ${markerSqlList("en")})) AS s_en,
             len(list_filter(ltk, x -> x IN ${markerSqlList("de")})) AS s_de,
             len(list_filter(ltk, x -> x IN ${markerSqlList("fr")})) AS s_fr,
             len(list_filter(ltk, x -> x IN ${markerSqlList("es")})) AS s_es
           FROM lt),
         lg AS (
           SELECT doc_id,
             CASE WHEN n_chars = 0 THEN 'und'
                  WHEN cjk * 5 >= n_chars THEN 'zh'
                  WHEN n_tok = 0 THEN 'und'
                  WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  ELSE 'de' END AS lang_guess
           FROM ls),
         q AS (
           SELECT doc_id,
             CAST(FLOOR(1000.0 *
               len(list_filter(str_split(lower(text), ' '),
                 t -> t <> '' AND t IN $stopSqlList)) /
               len(list_filter(str_split(text, ' '), t -> t <> ''))) AS BIGINT)
               AS stop_mill
           FROM documents
           WHERE doc_id % 97 <> 0
             AND len(list_filter(str_split(text, ' '), t -> t <> '')) > 0),
         contam AS (
           SELECT DISTINCT c.id AS doc_id
           FROM d c JOIN (SELECT DISTINCT s FROM d WHERE id % 97 = 0) b USING (s)
           WHERE c.id % 97 <> 0)
         SELECT q.doc_id, q.stop_mill
         FROM q
         JOIN lg ON lg.doc_id = q.doc_id AND lg.lang_guess = 'en'
         JOIN reps r ON r.doc_id = q.doc_id
         LEFT JOIN contam x ON x.doc_id = q.doc_id
         WHERE q.stop_mill >= 60 AND x.doc_id IS NULL""",

    "q46_line_dedup" ->
      """WITH bodies AS (
           SELECT doc_id, text || chr(10) ||
             'shared footer (c) example registry' || chr(10) ||
             'group-' || CAST(doc_id % 5 AS VARCHAR) || chr(10) ||
             'unique ' || md5(CAST(doc_id AS VARCHAR)) AS body
           FROM documents),
         lines AS (
           SELECT doc_id, unnest(range(len(l))) AS off, unnest(l) AS line
           FROM (SELECT doc_id, str_split(body, chr(10)) AS l FROM bodies)),
         common AS (
           SELECT line FROM lines WHERE trim(line) <> ''
           GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
         kept AS (
           SELECT doc_id, off, line FROM lines
           WHERE line NOT IN (SELECT line FROM common))
         SELECT doc_id, md5(string_agg(line, chr(10) ORDER BY off)) AS clean_fp,
           count(*) AS n_kept
         FROM kept GROUP BY doc_id""",

    "q47_pii_scrub" -> {
      import graft.ops.PiiOps.{EmailRe, Ipv4Re, PhoneRe}
      s"""WITH bodies AS (
           SELECT doc_id, text || ' contact admin' ||
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) ||
             '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.cz' ||
             ' from 192.0.2.' || CAST(doc_id % 250 AS VARCHAR) ||
             ' tel +420' || CAST(200000000 + doc_id % 1000000 AS VARCHAR) AS body
           FROM documents),
         s1 AS (
           SELECT doc_id, body,
             regexp_replace(body, '$EmailRe', '<EMAIL>', 'g') AS e1
           FROM bodies),
         s2 AS (
           SELECT doc_id, body, e1,
             regexp_replace(e1, '$Ipv4Re', '<IP>', 'g') AS e2
           FROM s1)
         SELECT doc_id,
           len(regexp_extract_all(body, '$EmailRe')) AS n_emails,
           len(regexp_extract_all(e1, '$Ipv4Re')) AS n_ips,
           len(regexp_extract_all(e2, '$PhoneRe')) AS n_phones,
           md5(regexp_replace(e2, '$PhoneRe', '<PHONE>', 'g')) AS clean_fp
         FROM s2"""
    },

    "q48_lm_coverage" ->
      """WITH gi AS (
           SELECT doc_id, lower(text) AS lt,
             unnest(range(1, len(text) - 1)) AS i
           FROM documents WHERE len(text) >= 3),
         g AS (SELECT doc_id, substr(lt, i, 3) AS tg FROM gi),
         model AS (
           SELECT tg FROM (
             SELECT tg, count(*) AS c FROM g GROUP BY tg
             ORDER BY c DESC, tg ASC LIMIT 64))
         SELECT g.doc_id,
           count(m.tg) * 1000 // count(*) AS coverage_mill,
           count(m.tg) AS covered, count(*) AS total
         FROM g LEFT JOIN model m ON g.tg = m.tg
         GROUP BY g.doc_id""",

    "q49_media_neardup" -> {
      // 16-bit band from 4 hex chars of md5 via nibble math (no hex cast
      // in DuckDB) — replays StubCodec.hash64's band split exactly
      def band(pos: Int) = (0 until 4).map(i =>
        s"(strpos('0123456789abcdef', substring(hx, ${pos + i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}")
        .mkString("(", " + ", ")")
      val ham = (0 until 4).map(i => s"bit_count(xor(aa$i, cc$i))").mkString(" + ")
      s"""WITH m AS (
           SELECT doc_id, md5(text) AS hx FROM documents
           UNION ALL
           SELECT doc_id + 1000000, md5(text) FROM documents WHERE doc_id % 50 = 0),
         b AS (
           SELECT doc_id, ${band(0)} AS b0, ${band(4)} AS b1,
                  ${band(8)} AS b2, ${band(12)} AS b3 FROM m),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             a.b0 AS aa0, a.b1 AS aa1, a.b2 AS aa2, a.b3 AS aa3,
             c.b0 AS cc0, c.b1 AS cc1, c.b2 AS cc2, c.b3 AS cc3
           FROM b a, b c
           WHERE a.doc_id < c.doc_id AND
             (a.b0 = c.b0 OR a.b1 = c.b1 OR a.b2 = c.b2 OR a.b3 = c.b3))
         SELECT id_a, id_b, CAST($ham AS BIGINT) AS hamming
         FROM cand WHERE $ham <= 3"""
    },

    "q54_text_norm" ->
      """WITH b AS (
           SELECT doc_id,
             text || ' Ka' || chr(769) || 'va' || chr(7) || ' end' AS body
           FROM documents)
         SELECT doc_id,
           md5(nfc_normalize(regexp_replace(body,
             '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'))) AS norm_fp,
           nfc_normalize(body) <> body AS changed
         FROM b""",

    "q52_incremental_dedup" ->
      """WITH f AS (
           SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
           FROM documents),
         ledger AS (SELECT DISTINCT fp FROM f WHERE doc_id % 3 = 0),
         firsts AS (
           SELECT doc_id, fp FROM (
             SELECT doc_id, fp,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
             FROM f) t WHERE rn = 1)
         SELECT doc_id, fp FROM firsts
         WHERE fp NOT IN (SELECT fp FROM ledger)""",

    "q53_upsample_mixture" ->
      s"""WITH q AS (
           SELECT doc_id,
             CAST(FLOOR(1000.0 *
               len(list_filter(str_split(lower(text), ' '),
                 t -> t <> '' AND t IN $stopSqlList)) /
               len(list_filter(str_split(text, ' '), t -> t <> ''))) AS BIGINT)
               AS stop_mill
           FROM documents
           WHERE len(list_filter(str_split(text, ' '), t -> t <> '')) > 0),
         w AS (
           SELECT doc_id,
             CAST(least(1 + stop_mill // 200, 4) AS INT) AS wv
           FROM q)
         SELECT doc_id, CAST(unnest(range(wv)) AS BIGINT) AS copy
         FROM w WHERE wv >= 1""",

    "q51_seq_packing" ->
      """WITH t AS (
           SELECT doc_id, CAST(doc_id % 8 AS INT) AS stratum,
             CAST(len(list_filter(str_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, stratum, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY stratum
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS start_tok
           FROM t)
         SELECT doc_id, stratum, n_tokens, start_tok,
           start_tok // 256 AS pack_id
         FROM c""",

    "q50_stream_curation" -> {
      import graft.ops.PiiOps.{EmailRe, Ipv4Re, PhoneRe}
      s"""WITH lt AS (
           SELECT doc_id, length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[\\x{4E00}-\\x{9FFF}]', '', 'g')) AS cjk,
             list_filter(str_split(lower(text), ' '), x -> x <> '') AS ltk
           FROM documents),
         ls AS (
           SELECT doc_id, n_chars, cjk, len(ltk) AS n_tok,
             len(list_filter(ltk, x -> x IN ${markerSqlList("en")})) AS s_en,
             len(list_filter(ltk, x -> x IN ${markerSqlList("de")})) AS s_de,
             len(list_filter(ltk, x -> x IN ${markerSqlList("fr")})) AS s_fr,
             len(list_filter(ltk, x -> x IN ${markerSqlList("es")})) AS s_es
           FROM lt),
         lg AS (
           SELECT doc_id,
             CASE WHEN n_chars = 0 THEN 'und'
                  WHEN cjk * 5 >= n_chars THEN 'zh'
                  WHEN n_tok = 0 THEN 'und'
                  WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  ELSE 'de' END AS lang_guess
           FROM ls),
         q AS (
           SELECT doc_id,
             CAST(FLOOR(1000.0 *
               len(list_filter(str_split(lower(text), ' '),
                 t -> t <> '' AND t IN $stopSqlList)) /
               len(list_filter(str_split(text, ' '), t -> t <> ''))) AS BIGINT)
               AS stop_mill
           FROM documents
           WHERE len(list_filter(str_split(text, ' '), t -> t <> '')) > 0),
         gated AS (
           SELECT d.doc_id, d.text FROM documents d
           JOIN lg ON lg.doc_id = d.doc_id AND lg.lang_guess = 'en'
           JOIN q ON q.doc_id = d.doc_id AND q.stop_mill >= 60),
         scrub AS (
           SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(text,
               '$EmailRe', '<EMAIL>', 'g'),
               '$Ipv4Re', '<IP>', 'g'),
               '$PhoneRe', '<PHONE>', 'g') AS ct
           FROM gated),
         fp AS (
           SELECT doc_id, ct,
             md5(regexp_replace(lower(trim(ct)), '\\s+', ' ', 'g')) AS f
           FROM scrub),
         keep AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY 1)
         SELECT fp.doc_id, md5(fp.ct) AS clean_fp
         FROM fp JOIN keep ON fp.f = keep.f AND fp.doc_id = keep.doc_id"""
    },

    "q20_cosine_topk" ->
      """SELECT query_id, neighbor_id, rank FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
           FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 8) t
         WHERE rank <= 5""",

    "q21_ann_lsh" -> {
      // replicate srpBuckets with the SAME plane constants: per (table,
      // bit), bit set iff the left-associated double dot product > 0 —
      // identical FP result to the Scala loop, so buckets match exactly
      val (dims, bits, tables) = (64, 8, 8)
      val pl = SimilarityOps.planes(dims, bits, tables)
      def bucketExpr(t: Int): String = (0 until bits).map { b =>
        val dot = (0 until dims).map { d =>
          val w = pl(t * bits + b)(d)
          s"${if (w < 0) "-" else "+"} ${math.abs(w)} * embedding[${d + 1}]"
        }.mkString(" ")
        // leading "0.0" keeps the +/- chain binary and left-associated —
        // the identical FP accumulation order to the Scala loop
        s"(CASE WHEN (0.0 $dot) > 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      val bucketSelects = (0 until tables).map(t =>
        s"SELECT vec_id, $t AS tbl, ${bucketExpr(t)} AS bucket FROM embeddings")
        .mkString("\nUNION ALL\n")
      s"""WITH buckets AS (
           $bucketSelects),
         cand AS (
           SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
           FROM buckets q JOIN buckets c
             ON q.tbl = c.tbl AND q.bucket = c.bucket AND c.vec_id <> q.vec_id
           WHERE q.vec_id < 8),
         scored AS (
           SELECT cand.query_id, cand.neighbor_id,
             row_number() OVER (PARTITION BY cand.query_id
               ORDER BY list_cosine_similarity(qe.embedding, ce.embedding) DESC,
                        cand.neighbor_id) AS rank
           FROM cand
           JOIN embeddings qe ON qe.vec_id = cand.query_id
           JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)
         SELECT query_id, neighbor_id, rank FROM scored WHERE rank <= 5"""
    },

    "q36_ivf_ann" ->
      """WITH cent AS (
           SELECT vec_id AS cid, embedding AS cvec FROM embeddings
           ORDER BY vec_id LIMIT 16),
         assign AS (
           SELECT vec_id AS neighbor_id, cid AS cell FROM (
             SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rn
             FROM embeddings e CROSS JOIN cent c) t
           WHERE rn = 1),
         qprobe AS (
           SELECT vec_id AS query_id, cid AS cell FROM (
             SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rn
             FROM embeddings e CROSS JOIN cent c
             WHERE e.vec_id < 8) t
           WHERE rn <= 4),
         cand AS (
           SELECT q.query_id, a.neighbor_id
           FROM qprobe q JOIN assign a ON a.cell = q.cell
           WHERE a.neighbor_id <> q.query_id),
         scored AS (
           SELECT cand.query_id, cand.neighbor_id,
             row_number() OVER (PARTITION BY cand.query_id
               ORDER BY list_cosine_similarity(qe.embedding, ce.embedding) DESC,
                        cand.neighbor_id) AS rank
           FROM cand
           JOIN embeddings qe ON qe.vec_id = cand.query_id
           JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)
         SELECT query_id, neighbor_id, rank FROM scored WHERE rank <= 5""",

    "q85_pq_ann" -> {
      // fixed-point squared L2 between two 8-dim list slices: Σ floor((a−b)²·2^20)
      // as BIGINT — associative, so every engine lands on identical longs
      def fpd(a: String, b: String) =
        s"""list_sum(list_transform(list_zip($a, $b),
           p -> CAST(FLOOR((CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                         * 1048576.0) AS BIGINT)))"""
      s"""WITH cw AS (
           SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c,
                  embedding AS cv
           FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
         subs AS (SELECT CAST(j AS BIGINT) AS j FROM generate_series(0, 7) AS t(j)),
         enc AS (
           SELECT vec_id, j, c AS code FROM (
             SELECT e.vec_id, s.j, cw.c,
               row_number() OVER (PARTITION BY e.vec_id, s.j ORDER BY
                 ${fpd("e.embedding[s.j*8+1 : s.j*8+8]", "cw.cv[s.j*8+1 : s.j*8+8]")} ASC,
                 cw.c ASC) AS rn
             FROM embeddings e CROSS JOIN subs s CROSS JOIN cw) t
           WHERE rn = 1),
         lut AS (
           SELECT q.vec_id AS query_id, s.j, cw.c,
             ${fpd("q.embedding[s.j*8+1 : s.j*8+8]", "cw.cv[s.j*8+1 : s.j*8+8]")} AS d
           FROM embeddings q CROSS JOIN subs s CROSS JOIN cw WHERE q.vec_id < 8),
         scored AS (
           SELECT l.query_id, enc.vec_id AS neighbor_id, SUM(l.d) AS dist_fp
           FROM enc JOIN lut l ON l.j = enc.j AND l.c = enc.code
           WHERE enc.vec_id <> l.query_id GROUP BY 1, 2)
         SELECT query_id, neighbor_id, dist_fp, rank FROM (
           SELECT query_id, neighbor_id, dist_fp,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY dist_fp, neighbor_id) AS BIGINT) AS rank
           FROM scored) WHERE rank <= 5"""
    },

    // q36's cent/assign/qprobe (cell restriction) composed with q85's
    // cw/enc/lut (ADC scoring): candidates = probed-cell members, scored
    // by the summed LONG lookup tables
    "q89_ivfpq_ann" -> {
      def fpd(a: String, b: String) =
        s"""list_sum(list_transform(list_zip($a, $b),
           p -> CAST(FLOOR((CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                         * 1048576.0) AS BIGINT)))"""
      s"""WITH cent AS (
           SELECT vec_id AS cid, embedding AS cvec FROM embeddings
           ORDER BY vec_id LIMIT 16),
         assign AS (
           SELECT vec_id AS neighbor_id, cid AS cell FROM (
             SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rn
             FROM embeddings e CROSS JOIN cent c) t
           WHERE rn = 1),
         qprobe AS (
           SELECT vec_id AS query_id, cid AS cell FROM (
             SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rn
             FROM embeddings e CROSS JOIN cent c
             WHERE e.vec_id < 8) t
           WHERE rn <= 4),
         cw AS (
           SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c,
                  embedding AS cv
           FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
         subs AS (SELECT CAST(j AS BIGINT) AS j FROM generate_series(0, 7) AS t(j)),
         enc AS (
           SELECT vec_id, j, c AS code FROM (
             SELECT e.vec_id, s.j, cw.c,
               row_number() OVER (PARTITION BY e.vec_id, s.j ORDER BY
                 ${fpd("e.embedding[s.j*8+1 : s.j*8+8]", "cw.cv[s.j*8+1 : s.j*8+8]")} ASC,
                 cw.c ASC) AS rn
             FROM embeddings e CROSS JOIN subs s CROSS JOIN cw) t
           WHERE rn = 1),
         lut AS (
           SELECT q.vec_id AS query_id, s.j, cw.c,
             ${fpd("q.embedding[s.j*8+1 : s.j*8+8]", "cw.cv[s.j*8+1 : s.j*8+8]")} AS d
           FROM embeddings q CROSS JOIN subs s CROSS JOIN cw WHERE q.vec_id < 8),
         cand AS (
           SELECT q.query_id, a.neighbor_id
           FROM qprobe q JOIN assign a ON a.cell = q.cell
           WHERE a.neighbor_id <> q.query_id),
         scored AS (
           SELECT c.query_id, c.neighbor_id, SUM(l.d) AS dist_fp
           FROM cand c JOIN enc e ON e.vec_id = c.neighbor_id
           JOIN lut l ON l.query_id = c.query_id AND l.j = e.j AND l.c = e.code
           GROUP BY 1, 2)
         SELECT query_id, neighbor_id, dist_fp, rank FROM (
           SELECT query_id, neighbor_id, dist_fp,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY dist_fp, neighbor_id) AS BIGINT) AS rank
           FROM scored) WHERE rank <= 5"""
    },

    // fixed-point squared norm, then double division by a correctly-
    // rounded sqrt — bit-replayable doubles on any engine
    "q92_l2_normalize" ->
      """WITH n AS (SELECT vec_id, embedding,
             list_sum(list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                               * 1048576.0) AS BIGINT))) AS norm2_fp
           FROM embeddings)
         SELECT vec_id, CAST(norm2_fp AS BIGINT) AS norm2_fp,
           CASE WHEN norm2_fp = 0 THEN list_transform(embedding, x -> 0.0)
                ELSE list_transform(embedding,
                  x -> CAST(x AS DOUBLE) / sqrt(norm2_fp / 1048576.0)) END
             AS unit
         FROM n""",

    // q71's fixed-point centroid replay + per-vector BIGINT squared
    // distance, top-3 per label by (dist desc, id asc)
    "q90_centroid_outliers" ->
      """WITH l AS (SELECT d.source AS label, e.vec_id, e.embedding AS emb
           FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
         el AS (SELECT label, vec_id, emb,
             unnest(generate_series(1, len(emb))) AS p FROM l),
         q AS (SELECT label, vec_id, p - 1 AS pos,
             CAST(floor(CAST(emb[p] AS DOUBLE) * 1048576) AS BIGINT) AS q FROM el),
         sums AS (SELECT label, pos, SUM(q) AS s, count(*) AS n
           FROM q GROUP BY label, pos),
         cent AS (SELECT label, pos,
             CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) AS c FROM sums),
         dist AS (SELECT q.label, q.vec_id,
             CAST(SUM((q.q - c.c) * (q.q - c.c)) AS BIGINT) AS dist_q2
           FROM q JOIN cent c ON c.label = q.label AND c.pos = q.pos
           GROUP BY 1, 2)
         SELECT label, vec_id, dist_q2, rank FROM (
           SELECT label, vec_id, dist_q2,
             CAST(row_number() OVER (PARTITION BY label
               ORDER BY dist_q2 DESC, vec_id) AS BIGINT) AS rank
           FROM dist) WHERE rank <= 3""",

    "q22_embedding_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35""",

    // DuckDB regexp_extract yields NULL on no-match (Spark yields '') →
    // COALESCE each extract; array_to_string([]) is NULL → COALESCE too
    "q87_canon_urls" ->
      """WITH raw AS (SELECT doc_id, CASE CAST(doc_id % 6 AS INT)
             WHEN 0 THEN 'HTTP://' || source || '.Example.CZ:80/a/b?b=2&a=1#frag'
             WHEN 1 THEN 'https://' || source || '.example.cz:443/'
             WHEN 2 THEN 'http://' || source || '.EXAMPLE.cz:8080'
             WHEN 3 THEN 'HTTPS://' || source || '.example.CZ/path/?z=1&y=&x=3#x'
             WHEN 4 THEN 'http://' || source || '.example.cz./q?a=1&a=1&b=&'
             ELSE 'not a url ' || CAST(doc_id AS VARCHAR) END AS url
           FROM documents),
         b AS (SELECT doc_id, regexp_replace(trim(url), '#.*$', '') AS base FROM raw),
         p AS (SELECT doc_id,
             lower(COALESCE(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS scheme,
             COALESCE(regexp_extract(base, '^[^:]+://([^/?#]*)', 1), '') AS auth,
             COALESCE(regexp_extract(base, '^[^:]+://[^/?#]*([^?#]*)', 1), '') AS pth,
             COALESCE(regexp_extract(base, '\?(.*)$', 1), '') AS q
           FROM b),
         h AS (SELECT *,
             regexp_replace(lower(trim(COALESCE(regexp_extract(auth, '^([^:]*)', 1), ''))), '\.$', '') AS host,
             COALESCE(regexp_extract(auth, ':([0-9]+)$', 1), '') AS port FROM p),
         c AS (SELECT doc_id, CASE WHEN scheme = '' THEN NULL ELSE
             scheme || '://' || host ||
             CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                    OR (scheme = 'https' AND port = '443')
                  THEN '' ELSE ':' || port END ||
             CASE WHEN pth = '' THEN '/' ELSE pth END ||
             CASE WHEN COALESCE(array_to_string(list_sort(list_filter(
                      string_split(q, '&'), x -> x <> '')), '&'), '') = ''
                  THEN '' ELSE '?' || array_to_string(list_sort(list_filter(
                      string_split(q, '&'), x -> x <> '')), '&') END
           END AS url_canon FROM h)
         SELECT doc_id, url_canon, md5(url_canon) AS url_key FROM c""",

    "q23_canon_domains" ->
      """SELECT canonical, md5(canonical) AS dom_key FROM (
           SELECT DISTINCT regexp_replace(lower(trim(source || '.Example.CZ.')),
             '\.$', '') AS canonical
           FROM documents) t""",

    "q24_frontier_order" ->
      """SELECT doc_id,
         row_number() OVER (ORDER BY md5(source || CAST(doc_id AS VARCHAR)), doc_id) AS pop_seq
         FROM documents""",

    "q25_multimodal" -> {
      // 3-hex-char slice of md5 → int via nibble math (no hex cast in DuckDB)
      def chunk(pos: Int) = (0 until 3).map(i =>
        s"(strpos('0123456789abcdef', substring(hx, ${pos + i + 1}, 1)) - 1) * ${1 << (4 * (2 - i))}")
        .mkString("(", " + ", ")")
      s"""WITH h AS (
           SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_kind,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS hx
           FROM documents)
         SELECT doc_id, media_kind, n_bytes,
           CAST(16 + ${chunk(0)} % 1024 AS BIGINT) AS width,
           CAST(16 + ${chunk(3)} % 1024 AS BIGINT) AS height,
           CAST(${chunk(6)} % 2000 - 1000 AS BIGINT) AS feat0_mill
         FROM h"""
    },

    "q28_ordered_events" ->
      """SELECT user_id, string_agg(event_type, ',' ORDER BY ts, event_id) AS seq_types
         FROM events GROUP BY user_id""",

    "q29_type_counts" ->
      """SELECT user_id,
           string_agg(event_type || ':' || CAST(n AS VARCHAR), '|' ORDER BY event_type) AS type_counts
         FROM (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2) t
         GROUP BY user_id""",

    "q30_hof_transform" ->
      """SELECT doc_id,
         COALESCE(array_to_string(list_sort(list_transform(
           list_filter(str_split(text, ' '), t -> t LIKE 'b%'), t -> upper(t))), ' '), '') AS b_tokens
         FROM documents""",

    "q31_slice_limits" ->
      """SELECT doc_id,
         array_to_string(list_filter(str_split(text, ' '), t -> t <> '')[1:3], ' ') AS first3,
         substring(text, 1, 20) AS prefix20
         FROM documents""",

    "q32_ship_latency" ->
      """SELECT o_orderkey,
         CAST(date_diff('day', o_orderdate, min(l_shipdate)) AS BIGINT) AS days_to_ship
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY o_orderkey, o_orderdate""",

    "q33_sessionize" ->
      """SELECT user_id, event_id,
         CAST(SUM(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
               FROM events) t""",

    "q34_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(SUM(l_quantity) AS BIGINT) AS qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "q38_star_join" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_cents,
         count(*) AS n_rows
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",

    "q39_admit_plan" ->
      """SELECT DISTINCT lower(trim(source || '.Example.CZ')) AS canonical
         FROM documents""",

    "q40_repetition" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(str_split(text, ' '), t -> t <> '') AS toks
           FROM documents
         ), base AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
                  CASE WHEN len(toks) <= 1 THEN CAST([] AS VARCHAR[])
                       ELSE list_transform(
                              list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                              p -> p[1] || ' ' || p[2]) END AS bigrams
           FROM toks
         ), cnt AS (
           SELECT doc_id, bg, count(*) AS c
           FROM (SELECT doc_id, unnest(bigrams) AS bg FROM base) GROUP BY doc_id, bg
         ), top AS (
           SELECT doc_id, max(c) AS top_c FROM cnt GROUP BY doc_id
         )
         SELECT b.doc_id, b.n_tokens,
           CASE WHEN b.n_tokens = 0 THEN NULL
                ELSE CAST(FLOOR(1000.0 * (b.n_tokens - b.n_distinct) / b.n_tokens) AS BIGINT)
           END AS dup_token_mill,
           CAST(len(b.bigrams) AS BIGINT) AS n_bigrams,
           CASE WHEN len(b.bigrams) = 0 THEN NULL
                ELSE CAST(FLOOR(1000.0 * t.top_c / len(b.bigrams)) AS BIGINT)
           END AS top_bigram_mill
         FROM base b LEFT JOIN top t USING (doc_id)""",

    "q41_decontaminate" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(str_split(lower(text), ' '), t -> t <> '') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id, list_transform(range(len(tk) - 2),
             i -> array_to_string(tk[i+1:i+3], ' ')) AS shl
           FROM toks WHERE len(tk) >= 3
         ), shx AS (
           SELECT DISTINCT doc_id, unnest(shl) AS s FROM sh
         ), bench AS (SELECT DISTINCT s FROM shx WHERE doc_id % 97 = 0),
         corpus AS (SELECT doc_id, s FROM shx WHERE doc_id % 97 <> 0)
         SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         FROM corpus c JOIN bench b USING (s)
         GROUP BY c.doc_id HAVING count(*) >= 1""",

    "q42_links" ->
      """WITH bodies AS (
           SELECT doc_id,
             concat('doc ', text,
               ' see https://w', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6), '.example.cz/a',
               ' and HTTP://M', substr(md5(CAST(doc_id AS VARCHAR)), 7, 6), '.CZ:8080/path?x=1',
               ' dup https://w', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6), '.example.cz./b',
               ' plain example.net is prose, not a link') AS body
           FROM documents
         ), hosts AS (
           SELECT doc_id,
             unnest(list_distinct(regexp_extract_all(lower(body),
               'https?://([a-z0-9.-]+\.[a-z]{2,})', 1))) AS host
           FROM bodies
         )
         SELECT host, count(DISTINCT doc_id) AS n_docs FROM hosts GROUP BY host""",

    // q37: sources are ASCII, so canonicalize_domain = lower∘trim∘strip-dot;
    // is_global_ip on <a>.0.113.7 is false iff a ∈ {0,10,127,203} ∪ [224,255]
    // (0/8, 10/8, 127/8, 203.0.113/24 TEST-NET-3, 224/4+240/4).
    "q37_sql_surface" ->
      """SELECT doc_id,
         regexp_replace(lower(trim(source || '.ExAmple.CZ.')), '\.$', '') AS canon,
         CAST(len(list_filter(str_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         FROM documents
         WHERE NOT ((doc_id % 256) IN (0, 10, 127, 203) OR (doc_id % 256) >= 224)""",

    // q94: the same tag-union + running ignore-nulls window the Spark
    // side plans — side 0 (clicks) sorts before side 1 (purchases) at
    // equal ts (inclusive as-of), click_id asc breaks equal-time clicks
    // to max id. Null ordering never decides: click_id is null only on
    // side-1 rows, which the side column already separates.
    "q94_asof_attrib" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
             WHERE event_type = 'click'),
         p AS (SELECT event_id, user_id, ts FROM events
             WHERE event_type = 'purchase'),
         u AS (
           SELECT user_id, ts, 0 AS side, click_id,
                  CAST(NULL AS BIGINT) AS event_id FROM c
           UNION ALL
           SELECT user_id, ts, 1, CAST(NULL AS BIGINT), event_id FROM p),
         w AS (SELECT *,
             last_value(click_id IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, side, click_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS asof_click_id,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, side, click_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS asof_ts
           FROM u)
         SELECT event_id, user_id, asof_click_id,
           CAST(epoch_ms(ts) - epoch_ms(asof_ts) AS BIGINT) AS gap_ms
         FROM w WHERE side = 1""",

    // q95: the bucketized equi-join collapses back to the plain range
    // predicate — lo inclusive, hi exclusive.
    "q95_range_join" ->
      """SELECT e.event_id AS outage_id, CAST(count(*) AS BIGINT) AS n_clicks
         FROM events e JOIN events c
           ON c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
         WHERE e.event_type = 'error' AND c.event_type = 'click'
         GROUP BY 1""",

    // q96: 256-register HLL replayed bit-for-bit — bucket = first 8 md5
    // bits, rho from the NEXT 52 bits via binary-string length (exact
    // integer/string ops, no log2), register sum as shifted LONGs, and
    // the estimate as the single correctly-rounded double division
    // against the Scala-interpolated numerator literal.
    "q96_hll_sessions" -> s"""
         WITH k AS (SELECT event_type,
             md5(CAST(user_id AS VARCHAR) || ':' ||
                 CAST(epoch_ms(ts) // 60000 AS VARCHAR)) AS hex
           FROM events),
         b AS (SELECT event_type,
             CAST(('0x' || substring(hex, 1, 2)) AS BIGINT) AS bucket,
             CAST(('0x' || substring(hex, 3, 13)) AS BIGINT) AS x
           FROM k),
         r AS (SELECT event_type, bucket,
             max(CASE WHEN x = 0 THEN 52
                      ELSE 53 - length(printf('%b', x)) END) AS r
           FROM b GROUP BY 1, 2),
         sk AS (SELECT event_type,
             CAST(SUM(CAST(1 AS BIGINT) << (52 - r)) +
               (256 - count(*)) * (CAST(1 AS BIGINT) << 52) AS BIGINT)
               AS hll_sum,
             CAST(256 - count(*) AS BIGINT) AS hll_zeros
           FROM r GROUP BY 1),
         ex AS (SELECT event_type,
             CAST(count(DISTINCT CAST(user_id AS VARCHAR) || ':' ||
               CAST(epoch_ms(ts) // 60000 AS VARCHAR)) AS BIGINT) AS n_exact
           FROM events GROUP BY 1)
         SELECT ex.event_type, ex.n_exact, sk.hll_sum, sk.hll_zeros,
           CAST(floor(${SketchOps.HllNumerator} /
             CAST(sk.hll_sum AS DOUBLE)) AS BIGINT) AS hll_est
         FROM ex JOIN sk USING (event_type)""",

    // q97: the 4×512 Count-Min counter table rebuilt relationally —
    // slot = 16-bit md5 slice of 'd:tok' mod 512 (unbiased: 512 | 2^16)
    // — probed with the exact (count desc, tok) top-20; a missing
    // counter row means nothing hashed there (0).
    "q97_cms_tokens" ->
      """WITH t AS (SELECT
             unnest(list_filter(str_split_regex(text, '\s+'), x -> x <> ''))
               AS tok
           FROM documents),
         t2 AS (SELECT tok, unnest([0, 1, 2, 3]) AS d FROM t),
         counters AS (SELECT d,
             CAST(('0x' || substring(md5(CAST(d AS VARCHAR) || ':' || tok),
               1, 4)) AS BIGINT) % 512 AS slot,
             CAST(count(*) AS BIGINT) AS cnt
           FROM t2 GROUP BY 1, 2),
         top AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_exact
           FROM t GROUP BY 1 ORDER BY n_exact DESC, tok LIMIT 20),
         probe AS (SELECT tok, n_exact, unnest([0, 1, 2, 3]) AS d FROM top),
         p2 AS (SELECT tok, n_exact, d,
             CAST(('0x' || substring(md5(CAST(d AS VARCHAR) || ':' || tok),
               1, 4)) AS BIGINT) % 512 AS slot
           FROM probe)
         SELECT p2.tok, p2.n_exact,
           CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
         FROM p2 LEFT JOIN counters c USING (d, slot)
         GROUP BY 1, 2""",

    // q98: df over the FULL posting set, rank window caps at 10, posting
    // order (tf desc, doc_id) carried through the list aggregation by rn
    "q98_inverted_index" ->
      """WITH t AS (SELECT doc_id,
             unnest(list_filter(str_split_regex(text, '\s+'), x -> x <> ''))
               AS tok
           FROM documents),
         tf AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf
           FROM t GROUP BY 1, 2),
         r AS (SELECT tok, doc_id, tf,
             row_number() OVER (PARTITION BY tok ORDER BY tf DESC, doc_id)
               AS rn,
             CAST(count(*) OVER (PARTITION BY tok) AS BIGINT) AS df
           FROM tf)
         SELECT tok, max(df) AS df,
           list(struct_pack(doc_id := doc_id, tf := tf) ORDER BY rn)
             AS postings
         FROM r WHERE rn <= 10 GROUP BY tok""",

    // q99: the integer DD-sketch replayed — octave from binary-string
    // length, sub-octave from shift+mask, midpoint representatives,
    // rational rank thresholds; `//` everywhere (no doubles).
    "q99_quantile_sketch" ->
      """WITH v AS (SELECT source, CAST(n_chars AS BIGINT) AS x
           FROM documents),
         b AS (SELECT source, x, length(printf('%b', x)) - 1 AS p,
             CASE WHEN x < 4 THEN 0
                  ELSE (x >> (length(printf('%b', x)) - 3)) & 3 END AS sub
           FROM v),
         c AS (SELECT source,
             CASE WHEN x < 4 THEN CAST(x AS INTEGER)
                  ELSE 4 * p + sub END AS bin,
             CASE WHEN x < 4 THEN x
                  ELSE (CAST(4 + sub AS BIGINT) << (p - 2)) +
                       ((CAST(1 AS BIGINT) << (p - 2)) - 1) // 2
             END AS rep
           FROM b),
         bins AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS cnt,
             max(rep) AS rep
           FROM c GROUP BY 1, 2),
         cum AS (SELECT source, rep,
             SUM(cnt) OVER (PARTITION BY source ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY source) AS n
           FROM bins)
         SELECT source, CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN rep END) AS p50,
           min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN rep END) AS p90,
           min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN rep END) AS p99
         FROM cum GROUP BY 1"""
  )

  /** Extension-session-4 oracles (q100+). */
  private def oracleSqlExt: Map[String, String] = Map(

    // q100: fixed-point BM25 replayed end to end — RSJ-odds idf in mills,
    // rational tf saturation, `//` everywhere; query table inlined as
    // VALUES; ties (score desc, doc_id)
    "q100_bm25_rank" ->
      """WITH q(query_id, qtext) AS (VALUES
           ('qa', 'dup table scan'), ('qb', 'vector join query'),
           ('qc', 'slow merge batch the')),
         qt AS (SELECT DISTINCT query_id,
             unnest(list_filter(str_split_regex(qtext, '\s+'), x -> x <> ''))
               AS tok
           FROM q),
         t AS (SELECT doc_id,
             unnest(list_filter(str_split_regex(text, '\s+'), x -> x <> ''))
               AS tok
           FROM documents),
         dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM t GROUP BY 1),
         stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(CAST(sum(dl) AS BIGINT) * 1000 // count(*) AS BIGINT)
               AS avgdl_mill
           FROM dl),
         tf AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf
           FROM t GROUP BY 1, 2),
         df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
           FROM tf GROUP BY 1),
         scored AS (SELECT qt.query_id, tf.doc_id,
             (2 * (s.n_docs - df.df) + 1) * 1000 // (2 * df.df + 1)
               AS idf_mill,
             tf.tf * 2200 * 1000 // (tf.tf * 1000 +
               1200 * (250 + 750 * (dl.dl * 1000000 // s.avgdl_mill) // 1000)
                 // 1000) AS tfsat_mill
           FROM tf
           JOIN qt ON tf.tok = qt.tok
           JOIN df ON tf.tok = df.tok
           JOIN dl ON tf.doc_id = dl.doc_id
           CROSS JOIN stats s),
         agg AS (SELECT query_id, doc_id,
             CAST(sum(idf_mill * tfsat_mill // 1000) AS BIGINT)
               AS score_mill,
             CAST(count(*) AS BIGINT) AS n_terms_matched
           FROM scored GROUP BY 1, 2),
         r AS (SELECT query_id, doc_id, score_mill, n_terms_matched,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY score_mill DESC, doc_id) AS BIGINT) AS rank
           FROM agg)
         SELECT query_id, rank, doc_id, score_mill, n_terms_matched
         FROM r WHERE rank <= 10""",

    // q101: full-outer diff replayed — presence markers, null-safe
    // IS DISTINCT FROM per column, changed_cols in column-name order
    // (cents < o_orderstatus), empty list for added/removed
    "q101_snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
           FROM orders),
         o AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
         n AS (SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             cents + (CASE WHEN o_orderkey % 5 = 0 THEN 1000 ELSE 0 END)
               AS cents
           FROM base WHERE o_orderkey % 3 <> 0),
         j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             o.o_orderkey IS NOT NULL AS op, n.o_orderkey IS NOT NULL AS np,
             o.o_orderstatus AS os, n.o_orderstatus AS ns,
             o.cents AS oc, n.cents AS nc
           FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey),
         d AS (SELECT o_orderkey,
             CASE WHEN NOT op THEN 'added'
                  WHEN NOT np THEN 'removed'
                  WHEN (oc IS DISTINCT FROM nc) OR (os IS DISTINCT FROM ns)
                    THEN 'changed'
                  ELSE 'unchanged' END AS status,
             CASE WHEN op AND np THEN list_filter([
                 CASE WHEN oc IS DISTINCT FROM nc THEN 'cents' END,
                 CASE WHEN os IS DISTINCT FROM ns THEN 'o_orderstatus' END],
               x -> x IS NOT NULL)
             ELSE CAST([] AS VARCHAR[]) END AS changed_cols
           FROM j)
         SELECT * FROM d WHERE status <> 'unchanged'""",

    // q102: the prefix filter replayed — df-ascending deterministic
    // shingle order, prefix length n − ceil(n/2) + 1, rare-shingle
    // candidate join with the size-compatibility filter, exact verify
    "q102_setsim_join" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(str_split(lower(text), ' '), t -> t <> '') AS tk
           FROM documents),
         sh0 AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
             i -> array_to_string(tk[i+1:i+3], ' '))) AS sh
           FROM toks WHERE len(tk) >= 3),
         ex AS (SELECT DISTINCT doc_id AS id, sh FROM sh0),
         dfreq AS (SELECT sh, CAST(count(*) AS BIGINT) AS sdf
           FROM ex GROUP BY 1),
         pos AS (SELECT id, ex.sh,
             row_number() OVER (PARTITION BY id ORDER BY sdf, ex.sh) AS pos,
             CAST(count(*) OVER (PARTITION BY id) AS BIGINT) AS n
           FROM ex JOIN dfreq USING (sh)),
         pref AS (SELECT id, sh, n FROM pos
           WHERE pos <= n - (500 * n + 999) // 1000 + 1),
         cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
           FROM pref x JOIN pref y
             ON x.sh = y.sh AND x.id < y.id
             AND y.n * 1000 >= 500 * x.n AND x.n * 1000 >= 500 * y.n),
         sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n
           FROM ex GROUP BY 1),
         inter AS (SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS n_inter
           FROM cand c
           JOIN ex a ON a.id = c.id_a
           JOIN ex b ON b.id = c.id_b AND b.sh = a.sh
           GROUP BY 1, 2),
         j AS (SELECT id_a, id_b, n_inter,
             sa.n + sb.n - n_inter AS n_union
           FROM inter
           JOIN sizes sa ON sa.id = id_a
           JOIN sizes sb ON sb.id = id_b)
         SELECT id_a, id_b, n_inter, n_union,
           n_inter * 1000 // n_union AS jac_mill
         FROM j WHERE n_inter * 1000 >= 500 * n_union""",

    // q103: priority sampling replayed — the same md5 32-bit uniform,
    // integer-div priority, (pri, id) rank window per source
    "q103_weighted_sample" ->
      """WITH w AS (SELECT source, doc_id,
             CAST(n_chars AS BIGINT) AS weight,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) AS u
           FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
         p AS (SELECT source, doc_id, weight, u // weight AS pri FROM w),
         r AS (SELECT source, doc_id, weight, pri,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY pri, doc_id) AS BIGINT) AS rank
           FROM p)
         SELECT source, doc_id, weight, pri, rank FROM r WHERE rank <= 20""",

    // q104: integer half-life decay replayed — naive epoch days (the
    // session tz is UTC so Spark's cast-through-timestamp agrees), age
    // clamped to [0, 62] half-lives, 1000 >> age, BIGINT sums
    "q104_activity_decay" ->
      """WITH d AS (SELECT user_id,
             CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day
           FROM events),
         a AS (SELECT CAST(max(day) AS BIGINT) AS anchor FROM d),
         w AS (SELECT user_id, day,
             1000 >> CAST(least(greatest(anchor - day, 0) // 7, 62)
               AS INTEGER) AS w_mill
           FROM d CROSS JOIN a)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(w_mill) AS BIGINT) AS freshness_mill,
           CAST(max(day) AS BIGINT) AS last_day
         FROM w GROUP BY 1""",

    // q105: SCD2 replayed — global version index + next-version dim,
    // per-key break flags (first / gap / null-safe change), running group
    // id, interval agg, next-version join for the exclusive valid_to
    "q105_scd2_history" ->
      """WITH base AS (SELECT o_orderkey AS k,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents0
           FROM orders),
         vers AS (SELECT unnest([1, 2, 3, 4]) AS ver),
         rows_ AS (SELECT k, CAST(ver AS BIGINT) AS ver,
             cents0 + 100 * ((k * ver) % 3) AS cents
           FROM base CROSS JOIN vers WHERE (k + ver) % 4 <> 0),
         vdim AS (SELECT ver,
             CAST(dense_rank() OVER (ORDER BY ver) AS BIGINT) AS vidx,
             lead(ver) OVER (ORDER BY ver) AS next_ver
           FROM (SELECT DISTINCT ver FROM rows_)),
         r AS (SELECT rows_.k, rows_.ver, rows_.cents, vdim.vidx
           FROM rows_ JOIN vdim USING (ver)),
         b AS (SELECT *, CASE WHEN lag(vidx) OVER w IS NULL THEN 1
                WHEN vidx - lag(vidx) OVER w > 1 THEN 1
                WHEN cents IS DISTINCT FROM lag(cents) OVER w THEN 1
                ELSE 0 END AS brk
           FROM r WINDOW w AS (PARTITION BY k ORDER BY vidx)),
         g AS (SELECT *, SUM(brk) OVER (PARTITION BY k ORDER BY vidx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
           FROM b),
         h AS (SELECT k, CAST(grp AS BIGINT) AS grp, min(cents) AS cents,
             CAST(min(ver) AS BIGINT) AS valid_from, max(vidx) AS last_vidx
           FROM g GROUP BY 1, 2)
         SELECT h.k, h.cents, h.valid_from,
           CAST(v2.next_ver AS BIGINT) AS valid_to,
           v2.next_ver IS NULL AS is_current
         FROM h LEFT JOIN vdim v2 ON v2.vidx = h.last_vidx""",

    // q106: bitlen-sum PMI replayed — row-local bigram build, unigram/
    // bigram totals, length(printf('%b', x)) bit lengths, same cut order
    "q106_pmi_bigrams" ->
      """WITH t AS (SELECT
             list_filter(str_split_regex(text, '\s+'), x -> x <> '') AS tk
           FROM documents),
         pr AS (SELECT unnest(list_transform(range(len(tk) - 1),
             i -> struct_pack(lhs := tk[i+1], rhs := tk[i+2]))) AS p
           FROM t WHERE len(tk) >= 2),
         pairs AS (SELECT p.lhs AS lhs, p.rhs AS rhs,
             CAST(count(*) AS BIGINT) AS cnt
           FROM pr GROUP BY 1, 2),
         n2 AS (SELECT CAST(length(printf('%b',
             CAST(sum(cnt) AS BIGINT))) AS BIGINT) AS n2_bits FROM pairs),
         uni AS (SELECT unnest(tk) AS tok FROM t),
         uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1
           FROM uni GROUP BY 1),
         n1 AS (SELECT CAST(length(printf('%b',
             CAST(sum(c1) AS BIGINT))) AS BIGINT) AS n1_bits FROM uc),
         s AS (SELECT pairs.lhs, pairs.rhs, pairs.cnt AS n_pair,
             CAST(length(printf('%b', pairs.cnt)) AS BIGINT)
               + 2 * n1.n1_bits - n2.n2_bits
               - CAST(length(printf('%b', la.c1)) AS BIGINT)
               - CAST(length(printf('%b', rb.c1)) AS BIGINT) AS pmi_bits
           FROM pairs
           JOIN uc la ON la.tok = pairs.lhs
           JOIN uc rb ON rb.tok = pairs.rhs
           CROSS JOIN n1 CROSS JOIN n2
           WHERE pairs.cnt >= 5)
         SELECT lhs, rhs, n_pair, pmi_bits FROM s
         ORDER BY pmi_bits DESC, n_pair DESC, lhs, rhs LIMIT 50""",

    // q107: degree/reciprocity replayed — the same md5-derived edge set,
    // distinct edges, reversed-pair semi join, left joins + zero guard
    "q107_degree_stats" ->
      """WITH d AS (SELECT doc_id,
             'd' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS h,
             'd' || substring(md5(CAST(doc_id + 1 AS VARCHAR)), 1, 6) AS hn
           FROM documents),
         raw AS (
           SELECT h AS src, hn AS dst FROM d
           UNION ALL
           SELECT hn AS src, h AS dst FROM d WHERE doc_id % 3 = 0
           UNION ALL
           SELECT h AS src, 'hub.cz' AS dst FROM d),
         e AS (SELECT DISTINCT src, dst FROM raw
           WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
         outd AS (SELECT src AS host, CAST(count(*) AS BIGINT) AS out_deg
           FROM e GROUP BY 1),
         ind AS (SELECT dst AS host, CAST(count(*) AS BIGINT) AS in_deg
           FROM e GROUP BY 1),
         rec AS (SELECT e.src AS host, CAST(count(*) AS BIGINT) AS n_recip
           FROM e WHERE EXISTS (SELECT 1 FROM e r
             WHERE r.src = e.dst AND r.dst = e.src)
           GROUP BY 1),
         nodes AS (SELECT src AS host FROM e
           UNION SELECT dst AS host FROM e)
         SELECT n.host,
           coalesce(outd.out_deg, 0) AS out_deg,
           coalesce(ind.in_deg, 0) AS in_deg,
           coalesce(rec.n_recip, 0) AS n_recip,
           CASE WHEN coalesce(outd.out_deg, 0) > 0
             THEN coalesce(rec.n_recip, 0) * 1000 // outd.out_deg
             ELSE 0 END AS recip_mill
         FROM nodes n
         LEFT JOIN outd ON outd.host = n.host
         LEFT JOIN ind ON ind.host = n.host
         LEFT JOIN rec ON rec.host = n.host""",

    // q108: the Bloom filter replayed bit for bit — same salted md5
    // positions, 63-bit word packing, bit_or build, AND-of-k probe; the
    // (false, true) cell CANNOT appear (no false negatives)
    "q108_bloom_prefilter" ->
      """WITH cust AS (SELECT c_custkey FROM customer),
         hpos AS (SELECT c_custkey,
             CAST(('0x' || substring(md5(CAST(i AS VARCHAR) || ':' ||
               CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 65536 AS pos
           FROM cust CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)),
         words AS (SELECT pos // 63 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
           FROM hpos GROUP BY 1),
         probes AS (
           SELECT DISTINCT o_custkey AS key FROM orders
           UNION
           SELECT DISTINCT o_custkey + 1000000000 AS key FROM orders),
         pp AS (SELECT key, i,
             CAST(('0x' || substring(md5(CAST(i AS VARCHAR) || ':' ||
               CAST(key AS VARCHAR)), 1, 8)) AS BIGINT) % 65536 AS pos
           FROM probes CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)),
         hits AS (SELECT key,
             bool_and((coalesce(w.bits, 0) &
               (CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER))) =
               (CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)))
               AS might_contain
           FROM pp LEFT JOIN words w ON w.word = pos // 63
           GROUP BY 1),
         m AS (SELECT h.key, h.might_contain,
             c.c_custkey IS NOT NULL AS is_member
           FROM hits h LEFT JOIN cust c ON c.c_custkey = h.key)
         SELECT might_contain, is_member, CAST(count(*) AS BIGINT) AS n_keys
         FROM m GROUP BY 1, 2""",

    // q109: anchor extraction replayed — the same RE2-safe pattern run
    // once per capture group, zipped positionally, tokenized, top-3 per
    // host by (cnt desc, term)
    "q109_anchor_terms" ->
      """WITH d AS (SELECT
             '<a href="https://d' ||
             substring(md5(CAST(doc_id + 1 AS VARCHAR)), 1, 6) ||
             '.example.cz/x">site ' ||
             (CASE WHEN doc_id % 3 = 0 THEN 'alpha'
                   WHEN doc_id % 3 = 1 THEN 'beta' ELSE 'gamma' END) ||
             '</a> <a href="https://hub.example.cz/">hub portal</a>'
               AS html
           FROM documents),
         z AS (SELECT list_zip(
             regexp_extract_all(lower(html),
               '<a href="https?://([a-z0-9.-]+\.[a-z]{2,})[^"]*"[^>]*>([^<]*)</a>', 1),
             regexp_extract_all(lower(html),
               '<a href="https?://([a-z0-9.-]+\.[a-z]{2,})[^"]*"[^>]*>([^<]*)</a>', 2))
             AS ps
           FROM d),
         p AS (SELECT unnest(ps) AS pr FROM z),
         t AS (SELECT pr[1] AS host,
             unnest(list_filter(str_split_regex(pr[2], '\s+'),
               x -> x <> '')) AS term
           FROM p),
         c AS (SELECT host, term, CAST(count(*) AS BIGINT) AS cnt
           FROM t GROUP BY 1, 2),
         r AS (SELECT host, term, cnt,
             CAST(row_number() OVER (PARTITION BY host
               ORDER BY cnt DESC, term) AS BIGINT) AS rank
           FROM c)
         SELECT host, term, cnt, rank FROM r WHERE rank <= 3""",

    // q110: compact-forward triangles replayed — canonical undirected
    // edges, degree orientation by lexicographic (deg, id), wedge join
    // with target-order condition, EXISTS-closed, per-node rollup
    "q110_triangles" ->
      """WITH d AS (SELECT doc_id,
             'd' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS h,
             'd' || substring(md5(CAST(doc_id + 1 AS VARCHAR)), 1, 6) AS hn
           FROM documents),
         raw AS (
           SELECT h AS src, hn AS dst FROM d
           UNION ALL
           SELECT hn AS src, h AS dst FROM d WHERE doc_id % 3 = 0
           UNION ALL
           SELECT h AS src, 'hub.cz' AS dst FROM d),
         und AS (SELECT DISTINCT least(src, dst) AS u,
             greatest(src, dst) AS v
           FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL
             AND src <> dst),
         deg AS (SELECT n, CAST(count(*) AS BIGINT) AS dg FROM (
             SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und)
           GROUP BY 1),
         o AS (SELECT CASE WHEN du.dg < dv.dg OR
                 (du.dg = dv.dg AND und.u < und.v) THEN und.u ELSE und.v
               END AS s,
             CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND und.u < und.v)
               THEN und.v ELSE und.u END AS t,
             CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND und.u < und.v)
               THEN dv.dg ELSE du.dg END AS dt
           FROM und
           JOIN deg du ON du.n = und.u
           JOIN deg dv ON dv.n = und.v),
         w AS (SELECT x.s AS a, x.t AS b, y.t AS c
           FROM o x JOIN o y ON x.s = y.s AND
             (x.dt < y.dt OR (x.dt = y.dt AND x.t < y.t))),
         tri AS (SELECT a, b, c FROM w
           WHERE EXISTS (SELECT 1 FROM o WHERE o.s = w.b AND o.t = w.c)),
         pn AS (SELECT n, CAST(count(*) AS BIGINT) AS n_triangles FROM (
             SELECT a AS n FROM tri UNION ALL SELECT b AS n FROM tri
             UNION ALL SELECT c AS n FROM tri)
           GROUP BY 1)
         SELECT deg.n AS host, deg.dg AS degree,
           coalesce(pn.n_triangles, 0) AS n_triangles,
           CASE WHEN deg.dg >= 2
             THEN 2 * coalesce(pn.n_triangles, 0) * 1000
               // (deg.dg * (deg.dg - 1))
             ELSE 0 END AS clustering_mill
         FROM deg LEFT JOIN pn ON pn.n = deg.n""",

    // q111: HRW replayed — row-local list argmax over the salted 60-bit
    // md5 hashes, struct order (h, node)
    "q111_rendezvous" ->
      """SELECT doc_id,
           (list_aggregate(list_transform(
             ['node0','node1','node2','node3','node4','node5','node6','node7'],
             n -> struct_pack(
               h := CAST(('0x' || substring(md5(n || ':' ||
                 CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
               node := n)), 'max')).node AS node
         FROM documents""",

    // q112: sliding HLL replayed — day-grain registers, ×7 window
    // fan-out, observed-day labels, per-bucket max merge, q96 estimator
    "q112_sliding_hll" -> s"""
         WITH e AS (SELECT event_type,
             CAST(epoch_ms(ts) AS BIGINT) // 86400000 AS day,
             md5(CAST(user_id AS VARCHAR)) AS hex
           FROM events),
         b AS (SELECT event_type, day,
             CAST(('0x' || substring(hex, 1, 2)) AS BIGINT) AS bucket,
             CAST(('0x' || substring(hex, 3, 13)) AS BIGINT) AS x
           FROM e),
         dr AS (SELECT event_type, day, bucket,
             max(CASE WHEN x = 0 THEN 52
                      ELSE 53 - length(printf('%b', x)) END) AS r0
           FROM b GROUP BY 1, 2, 3),
         labels AS (SELECT DISTINCT day AS window_day FROM e),
         f AS (SELECT dr.event_type, dr.bucket, w.window_day, dr.r0
           FROM dr JOIN labels w
             ON w.window_day BETWEEN dr.day AND dr.day + 6),
         wr AS (SELECT event_type, window_day, bucket, max(r0) AS r
           FROM f GROUP BY 1, 2, 3),
         sk AS (SELECT event_type, window_day,
             CAST(SUM(CAST(1 AS BIGINT) << (52 - r)) +
               (256 - count(*)) * (CAST(1 AS BIGINT) << 52) AS BIGINT)
               AS hll_sum,
             CAST(256 - count(*) AS BIGINT) AS hll_zeros
           FROM wr GROUP BY 1, 2)
         SELECT event_type, window_day, hll_sum, hll_zeros,
           CAST(floor(${SketchOps.HllNumerator} /
             CAST(hll_sum AS DOUBLE)) AS BIGINT) AS hll_est
         FROM sk""",

    // q113: greedy funnel replayed — min view, min click strictly after,
    // min purchase strictly after, prefix-closed nulls, reached count
    "q113_funnel" ->
      """WITH v AS (SELECT user_id,
             CAST(min(epoch_ms(ts)) AS BIGINT) AS t1_ms
           FROM events WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT v.user_id, v.t1_ms,
             CAST(min(CASE WHEN CAST(epoch_ms(e.ts) AS BIGINT) > v.t1_ms
               THEN CAST(epoch_ms(e.ts) AS BIGINT) END) AS BIGINT) AS t2_ms
           FROM v LEFT JOIN events e
             ON e.user_id = v.user_id AND e.event_type = 'click'
           GROUP BY 1, 2),
         p AS (SELECT c.user_id, c.t1_ms, c.t2_ms,
             CAST(min(CASE WHEN CAST(epoch_ms(e.ts) AS BIGINT) > c.t2_ms
               THEN CAST(epoch_ms(e.ts) AS BIGINT) END) AS BIGINT) AS t3_ms
           FROM c LEFT JOIN events e
             ON e.user_id = c.user_id AND e.event_type = 'purchase'
           GROUP BY 1, 2, 3)
         SELECT user_id, t1_ms, t2_ms, t3_ms,
           CAST(CASE WHEN t1_ms IS NOT NULL THEN 1 ELSE 0 END +
            CASE WHEN t2_ms IS NOT NULL THEN 1 ELSE 0 END +
            CASE WHEN t3_ms IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS reached
         FROM p""",

    // q114: the LPM CIDR join replayed — /16 bucket explode (the /14
    // blocks cover 4 buckets), exact range check, max-prefix rank
    "q114_cidr_join" ->
      """WITH cidrs AS (
           SELECT n_nationkey * 16777216 AS net, 8 AS plen,
             n_name AS block_name FROM nation
           UNION ALL
           SELECT n_nationkey * 16777216 + (n_nationkey % 16) * 1048576,
             20, n_name || '-z' FROM nation
           UNION ALL
           SELECT n_nationkey * 16777216, 14, n_name || '-w'
           FROM nation WHERE n_nationkey % 5 = 0),
         blocks AS (SELECT net, CAST(plen AS BIGINT) AS plen, block_name,
             CAST(1 AS BIGINT) << CAST(32 - plen AS INTEGER) AS width,
             unnest(range(net // 65536,
               (net + (CAST(1 AS BIGINT) << CAST(32 - plen AS INTEGER))
                 - 1) // 65536 + 1)) AS b
           FROM cidrs),
         ips AS (SELECT c_custkey AS ip_id,
             (c_custkey % 30) * 16777216 +
               CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)),
                 1, 6)) AS BIGINT) AS ip
           FROM customer),
         probed AS (SELECT i.ip_id, i.ip, bl.net, bl.plen, bl.block_name
           FROM ips i JOIN blocks bl ON i.ip // 65536 = bl.b
           WHERE i.ip >= bl.net AND i.ip < bl.net + bl.width),
         r AS (SELECT *, row_number() OVER (PARTITION BY ip_id
             ORDER BY plen DESC, net) AS rk
           FROM probed)
         SELECT ip_id, ip, net, plen AS prefix_len, block_name
         FROM r WHERE rk = 1""",

    // q115: the UNSALTED plain inner join — hash equality proves the
    // salted mechanics are a no-op on results
    "q115_salted_join" ->
      """SELECT o_orderkey, o_custkey, c_name
         FROM orders JOIN customer ON o_custkey = c_custkey""",

    // q116: the five BIGINT sums and the division-only doubles, in the
    // exact expression shape the Spark side evaluates
    "q116_group_trend" ->
      """WITH o AS (SELECT o_orderpriority,
             CAST(epoch_ms(o_orderdate) AS BIGINT) // 86400000 - 9131 AS x,
             CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2))) AS BIGINT)
               AS y
           FROM orders),
         s AS (SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
           FROM o GROUP BY 1)
         SELECT o_orderpriority, n, sx, sy, sxx, sxy,
           CASE WHEN n * sxx - sx * sx <> 0
             THEN CAST(n * sxy - sx * sy AS DOUBLE) /
               CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
           CASE WHEN n * sxx - sx * sx <> 0
             THEN (CAST(sy AS DOUBLE) -
               (CAST(n * sxy - sx * sy AS DOUBLE) /
                 CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) END AS intercept
         FROM s""",

    // q117: weekly counts, adjacent-week lag, signed double-floor ratio
    "q117_period_movers" ->
      """WITH c AS (SELECT event_type,
             CAST(epoch_ms(ts) AS BIGINT) // 604800000 AS period,
             CAST(count(*) AS BIGINT) AS n_cur
           FROM events GROUP BY 1, 2),
         l AS (SELECT *, lag(period) OVER w AS pp, lag(n_cur) OVER w AS pn
           FROM c WINDOW w AS (PARTITION BY event_type ORDER BY period)),
         m AS (SELECT event_type, period, n_cur,
             CASE WHEN pp = period - 1 THEN pn END AS n_prev
           FROM l)
         SELECT event_type, period, n_cur, n_prev,
           CASE WHEN n_prev IS NOT NULL THEN
             CAST(floor(CAST(n_cur - n_prev AS DOUBLE) * 1000.0 /
               CAST(n_prev AS DOUBLE)) AS BIGINT) END AS change_mill
         FROM m""",

    // q118: per-user (ts, event_id)-ordered lag pairs, corpus counts,
    // integer-mill row probabilities
    "q118_transitions" ->
      """WITH p AS (SELECT
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS from_type,
             event_type AS to_type
           FROM events),
         c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
           FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
           FROM c GROUP BY 1)
         SELECT c.from_type, c.to_type, c.n, c.n * 1000 // t.tot AS p_mill
         FROM c JOIN t USING (from_type)""",

    // q119: the water-filling closed form replayed — ascending-demand
    // rank, feasibility prefix, integer level + remainder distribution
    "q119_water_fill" ->
      """WITH d AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS demand
           FROM orders GROUP BY 1),
         r AS (SELECT o_custkey, demand,
             CAST(row_number() OVER (ORDER BY demand, o_custkey)
               AS BIGINT) AS k,
             SUM(demand) OVER (ORDER BY demand, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             CAST(count(*) OVER () AS BIGINT) AS n
           FROM d),
         f AS (SELECT *,
             demand * (n - k + 1) <= 6000 - (cum - demand) AS isfull
           FROM r),
         kk AS (SELECT CAST(sum(CASE WHEN isfull THEN 1 ELSE 0 END)
               AS BIGINT) AS bigk,
             CAST(sum(CASE WHEN isfull THEN demand ELSE 0 END)
               AS BIGINT) AS spent
           FROM f),
         g AS (SELECT f.*, kk.bigk, kk.spent,
             CASE WHEN f.n = kk.bigk THEN 0
               ELSE (6000 - kk.spent) // (f.n - kk.bigk) END AS level
           FROM f CROSS JOIN kk)
         SELECT o_custkey, demand,
           CASE WHEN isfull THEN demand
             ELSE level + (CASE WHEN k <= bigk +
               (6000 - spent - level * (n - bigk)) THEN 1 ELSE 0 END)
           END AS granted
         FROM g""",

    // q120: the register build replayed once, pair fan-out by label,
    // bucket-max union merge, q96's estimator, inclusion–exclusion
    "q120_hll_overlap" -> s"""
         WITH k AS (SELECT event_type AS l,
             md5(CAST(user_id AS VARCHAR)) AS hex
           FROM events),
         b AS (SELECT l,
             CAST(('0x' || substring(hex, 1, 2)) AS BIGINT) AS bucket,
             CAST(('0x' || substring(hex, 3, 13)) AS BIGINT) AS x
           FROM k),
         regs AS (SELECT l, bucket,
             max(CASE WHEN x = 0 THEN 52
                      ELSE 53 - length(printf('%b', x)) END) AS r
           FROM b GROUP BY 1, 2),
         labels AS (SELECT DISTINCT l AS o FROM k),
         fan AS (SELECT least(regs.l, labels.o) AS label_a,
             greatest(regs.l, labels.o) AS label_b, bucket, r
           FROM regs JOIN labels ON regs.l <> labels.o),
         pm AS (SELECT label_a, label_b, bucket, max(r) AS r
           FROM fan GROUP BY 1, 2, 3),
         un AS (SELECT label_a, label_b,
             CAST(SUM(CAST(1 AS BIGINT) << (52 - r)) +
               (256 - count(*)) * (CAST(1 AS BIGINT) << 52) AS BIGINT)
               AS hll_sum
           FROM pm GROUP BY 1, 2),
         ue AS (SELECT label_a, label_b,
             CAST(floor(${SketchOps.HllNumerator} /
               CAST(hll_sum AS DOUBLE)) AS BIGINT) AS est_union
           FROM un),
         sng AS (SELECT l,
             CAST(SUM(CAST(1 AS BIGINT) << (52 - r)) +
               (256 - count(*)) * (CAST(1 AS BIGINT) << 52) AS BIGINT)
               AS hll_sum
           FROM regs GROUP BY 1),
         se AS (SELECT l,
             CAST(floor(${SketchOps.HllNumerator} /
               CAST(hll_sum AS DOUBLE)) AS BIGINT) AS est
           FROM sng)
         SELECT ue.label_a, ue.label_b, sa.est AS est_a, sb.est AS est_b,
           ue.est_union, sa.est + sb.est - ue.est_union AS est_intersect,
           greatest(0, sa.est + sb.est - ue.est_union) * 1000
             // ue.est_union AS jac_mill
         FROM ue
         JOIN se sa ON sa.l = ue.label_a
         JOIN se sb ON sb.l = ue.label_b""",

    // q121: distinct (user, week) activity, min-week cohorts, sparse
    // (cohort, offset) distinct counts, mill retention
    "q121_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
             CAST(epoch_ms(ts) AS BIGINT) // 604800000 AS p
           FROM events),
         f AS (SELECT user_id, min(p) AS cohort FROM a GROUP BY 1),
         s AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
           FROM f GROUP BY 1),
         m AS (SELECT f.cohort, a.p - f.cohort AS offset,
             CAST(count(*) AS BIGINT) AS n_active
           FROM a JOIN f USING (user_id) GROUP BY 1, 2)
         SELECT m.cohort, m.offset, m.n_active, s.cohort_size,
           m.n_active * 1000 // s.cohort_size AS retention_mill
         FROM m JOIN s USING (cohort)""",

    // q122: (ts, event_id)-ordered inter-arrival gaps in whole minutes
    // feed the q99 DD-sketch replay (octave bins, rational thresholds)
    "q122_gap_quantiles" ->
      """WITH g AS (SELECT event_type,
             (CAST(epoch_ms(ts) AS BIGINT) -
              lag(CAST(epoch_ms(ts) AS BIGINT)) OVER (
                PARTITION BY event_type
                ORDER BY CAST(epoch_ms(ts) AS BIGINT), event_id))
               // 60000 AS x
           FROM events),
         v AS (SELECT event_type AS source, CAST(x AS BIGINT) AS x
           FROM g WHERE x IS NOT NULL AND x > 0),
         b AS (SELECT source, x, length(printf('%b', x)) - 1 AS p,
             CASE WHEN x < 4 THEN 0
                  ELSE (x >> (length(printf('%b', x)) - 3)) & 3 END AS sub
           FROM v),
         c AS (SELECT source,
             CASE WHEN x < 4 THEN CAST(x AS INTEGER)
                  ELSE 4 * p + sub END AS bin,
             CASE WHEN x < 4 THEN x
                  ELSE (CAST(4 + sub AS BIGINT) << (p - 2)) +
                       ((CAST(1 AS BIGINT) << (p - 2)) - 1) // 2
             END AS rep
           FROM b),
         bins AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS cnt,
             max(rep) AS rep
           FROM c GROUP BY 1, 2),
         cum AS (SELECT source, rep,
             SUM(cnt) OVER (PARTITION BY source ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY source) AS n
           FROM bins)
         SELECT source AS event_type, CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN rep END) AS p50,
           min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN rep END) AS p90,
           min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN rep END) AS p99
         FROM cum GROUP BY 1"""
  )
}
