package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, mirroring how a 100 TB corpus is actually served:
  *   - [[bruteForceTopK]] — exact: broadcast the (small) query set against
  *     the full corpus; one scan, no shuffle of the big side, cosine as a
  *     codegen'd `zip_with`+`aggregate` column tree.
  *   - [[lshTopK]] — approximate: sign-random-projection (SRP) bucketing;
  *     each vector hashed to a `b`-bit bucket by deterministic hyperplanes,
  *     candidates restricted to bucket collisions across `t` independent
  *     tables, then exact cosine re-rank inside buckets. At cluster scale
  *     the bucket join is a shuffle on the short bucket key instead of a
  *     full cross product — the only scalable shape for corpus×corpus.
  */
object SimilarityOps {

  /** Sequential-order double-precision cosine; identical operation order to
    * DuckDB's `list_cosine_similarity`, so oracle ranks agree.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot / sqrt(na * nb)
  }

  /** Exact top-k neighbors for each query vector.
    * @param corpus  (idCol, vecCol) big side — scanned once, never shuffled
    *                until the final per-query top-k (tiny) aggregation.
    * @param queries small side — broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic SRP hyperplane component for (table, bit, dim): a fixed
    * pseudo-random ±1/±3 weight derived from splitmix64 — no RNG state, so
    * every executor and every rerun derives identical planes (resume-safe).
    */
  private def srpWeight(table: Int, bit: Int, dim: Int): Double = {
    val h = TextOps.mix64(table.toLong * 1000003L + bit.toLong * 8191L + dim.toLong)
    // 4-level weight keeps planes cheap but better-conditioned than pure sign
    ((h & 3L) match {
      case 0L => -3.0
      case 1L => -1.0
      case 2L => 1.0
      case _  => 3.0
    })
  }

  /** Precomputed plane matrix for (tables × bits) projections — ~tables ×
    * bits × dims doubles, shipped once in the task closure. Public so the
    * DuckDB oracle generator can interpolate the identical constants
    * (deterministic planes ⇒ the ANN result is an exact, checkable value).
    */
  def planes(dims: Int, bits: Int, tables: Int): Array[Array[Double]] =
    Array.tabulate(tables * bits) { tb =>
      val t = tb / bits; val b = tb % bits
      Array.tabulate(dims)(d => srpWeight(t, b, d))
    }

  /** SRP bucket assignments as a partition-mapped projection (one tight
    * loop per row, not a 10^3-term codegen expression — whole-stage
    * codegen chokes on dims×bits×tables unrolled `element_at` trees).
    * Output: (id, vec, tbl, bucket), one row per hash table.
    */
  def srpBuckets(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, bits: Int, tables: Int, idOut: String, vecOut: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pl = planes(dims, bits, tables)
    // input-split guard (see DedupOps.spread): the projection loop is
    // compute-bound; a one-row-group test input must not serialize it
    val src = DedupOps.spread(df)
    src.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, vec) =>
          (0 until tables).iterator.map { t =>
            var bucket = 0L
            var b = 0
            while (b < bits) {
              val w = pl(t * bits + b)
              var dot = 0.0
              var d = 0
              val n = math.min(dims, vec.length)
              while (d < n) { dot += vec(d) * w(d); d += 1 }
              if (dot > 0) bucket |= (1L << b)
              b += 1
            }
            (id, vec, t, bucket)
          }
        }
      }.toDF(idOut, vecOut, "tbl", "bucket")
  }

  /** EXACT cosine-threshold pairs as a block-distributed all-pairs join.
    *
    * Exact thresholding of a dense-embedding corpus is inherently O(n²)
    * compare operations — no hashing scheme reaches recall 1.0 on a
    * similarity continuum (the testdata pairs straddle the threshold with
    * no margin gap, measured: max-below 0.349995 vs min-above 0.35000).
    * What CAN be fixed is the plan: instead of a BroadcastNestedLoopJoin
    * cartesian (single driver broadcast, unsplittable tasks), each left row
    * is replicated to `blocks` cells and equi-joined on the right side's
    * block id — a plain shuffle join whose per-task work is n·(n/blocks)
    * compares with bounded memory, spread over all executors and AQE-
    * splittable. For sub-quadratic near-dup discovery at corpus scale use
    * [[graft.ops.DedupOps.embeddingNearDupPairs]] (SRP-LSH, recall < 1).
    */
  def blockedNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blocks: Int = 32): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("blk", explode(sequence(lit(0), lit(blocks - 1))))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      pmod(col(idCol), lit(blocks)).cast("int").as("blk"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b") && cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** SemDeDup-style semantic near-dup pairs via the IVF coarse quantizer:
    * fit [[ivfFit]] once, then compare only WITHIN each cell — per-cell
    * work is (|corpus|/nlist)² instead of |corpus|², and the only shuffle
    * is the short cell key (then a self equi-join per cell, AQE-splittable
    * on a skewed mega-cell). This is the sub-quadratic scale path for
    * [[blockedNearDupPairs]]' exact blocked join: recall < 1 exactly at
    * cell boundaries (a pair split across two cells is never compared —
    * the SemDeDup tradeoff, bounded in DedupQualitySpec against the exact
    * pair set), precision 1 (every emitted pair passed the true cosine
    * test). Each vector lives in exactly one cell, so no pair dedup pass
    * is needed. Deterministic throughout — same centroids, same cells,
    * same pairs on every run and engine; q57 pins `centroids = "first"`
    * so the DuckDB oracle replays the cells, production default stays
    * `"spread"`.
    */
  def ivfNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16,
      centroids: String = "spread"): DataFrame = {
    val cells = ivfFit(emb, idCol, vecCol, nlist, centroids).cells
    val a = cells.select(col("cell"), col("neighbor_id").as("id_a"),
      col("nvec").as("_va"))
    val b = cells.select(col("cell"), col("neighbor_id").as("id_b"),
      col("nvec").as("_vb"))
    a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b") &&
        cosine(col("_va"), col("_vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023), the ACTING
    * composition over [[ivfNearDupPairs]]: embed-space near-dup pairs →
    * connected components ([[DedupOps.dupClusters]]' min-label
    * propagation) → keep ONE representative per component. Returns the
    * kept ids with their component size (`n_members` = 1 for vectors with
    * no near-dup, so output ids are exactly the deduplicated corpus). The
    * keeper is the component's min id — deterministic and engine-free
    * (the published heuristic keeps the vector farthest from the cluster
    * centroid; a float argmin is not bit-replayable across engines, and
    * keeper CHOICE does not affect which duplicates exist — documented
    * delta).
    *
    * 100 TB shape: inherits [[ivfNearDupPairs]]'s per-cell (n/nlist)²
    * bound (never corpus²) and [[DedupOps.dupClusters]]' active-set
    * propagation (rounds shrink to paired vectors only); the final rollup
    * is one hash agg on the short cluster key.
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 16,
      centroids: String = "spread"): DataFrame = {
    val pairs = ivfNearDupPairs(emb, idCol, vecCol, threshold, nlist, centroids)
    DedupOps.dupClusters(emb.select(col(idCol)), pairs, idCol)
      .groupBy(col("cluster"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_members"))
      .select(col(idCol), col("n_members"))
  }

  /** Scala-side double cosine (same accumulation order as [[cosine]]). */
  private def vecCosine(a: Array[Float], b: Array[Float]): Double = {
    var dot, na, nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** IVF (inverted-file) approximate top-k — the FAISS-style scale path:
    * a coarse quantizer of `nlist` centroids partitions the corpus into
    * cells (one shuffle on the short cell id), each query probes its
    * `nprobe` nearest cells, and candidates re-rank exactly — per-query
    * work ≈ |corpus|·nprobe/nlist instead of |corpus|.
    *
    * The quantizer is deterministic (a sampled quantizer — `nlist` corpus
    * vectors chosen by a pure id function, no float-reduction Lloyd pass
    * whose result would be partitioning-dependent), so the result is an
    * exact checkable value: the DuckDB oracle recomputes the same cells.
    * For a Lloyd-refined quantizer that KEEPS determinism (fixed-point
    * long reduction), fit with [[ivfFitRefined]] and serve via
    * [[ivfQuery]].
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      /** Quantizer selection: `"spread"` (default) = the nlist vectors
        * with the smallest `xxhash64(id)` — fully deterministic
        * (resume/incremental-safe, no RNG state) and id-decorrelated, so
        * an id-ordered corpus (e.g. cluster-then-assign ids) can't
        * collapse all centroids into one region; or `"first"` = lowest-id
        * vectors — trivially oracle-replicable, which is why q36 pins it
        * explicitly. IvfSpec measures spread-recall ≥ first-recall on an
        * id-ordered corpus; [[ivfFitRefined]] is the k-means upgrade —
        * Lloyd rounds made partitioning-independent by a fixed-point long
        * reduction.
        */
      centroids: String = "spread"): DataFrame =
    ivfQuery(ivfFit(corpus, idCol, vecCol, nlist, centroids),
      queries, idCol, vecCol, k, nprobe)

  /** A fitted IVF index: the tiny centroid table plus the cell-assigned
    * corpus. At corpus scale this is the artifact you build ONCE and
    * serve many query batches from — refitting per query batch (what a
    * naive `ivfTopK` call does) re-scans and re-shuffles the whole
    * corpus every time. `cells` is a plain DataFrame, so persisting the
    * index is just writing it (bucket by `cell` for shuffle-free probe
    * joins); [[SimilarityOps.ivfSave]]/[[SimilarityOps.ivfLoad]] do the
    * round trip.
    */
  final case class IvfIndex(cents: Seq[(Long, Array[Float])], cells: DataFrame)

  /** Fit the IVF index: pick `nlist` deterministic centroids and assign
    * every corpus vector to its nearest cell (one corpus scan; the
    * assignment travels with the vector, so serving joins shuffle only
    * the short cell key).
    */
  def ivfFit(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, centroids: String = "spread"): IvfIndex = {
    val cents = seedCents(corpus, idCol, vecCol, nlist, centroids)
    IvfIndex(cents.toSeq, assignCells(corpus, idCol, vecCol, cents))
  }

  /** Deterministic seed centroids: the `nlist` corpus vectors that sort
    * first under the quantizer order (`"spread"` = xxhash64(id) — id-
    * decorrelated; `"first"` = lowest id — trivially oracle-replayable).
    */
  private def seedCents(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, centroids: String): Array[(Long, Array[Float])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centOrder = centroids match {
      case "spread" => Seq(xxhash64(col(idCol).cast("long")), col(idCol).cast("long"))
      case _ => Seq(col(idCol).cast("long"))
    }
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(centOrder: _*).limit(nlist)
      .as[(Long, Array[Float])].collect()
  }

  /** One corpus scan assigning every vector to its nearest centroid; the
    * assignment travels with the vector, so serving joins shuffle only the
    * short cell key.
    */
  private def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[(Long, Array[Float])]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cb = spark.sparkContext.broadcast(cents)
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, vec) =>
        (id, vec, nearestCells(cb.value, vec, 1).head)
      })
      .toDF("neighbor_id", "nvec", "cell")
  }

  /** Fixed-point scale for the Lloyd reduction: centroid sums accumulate
    * `floor(v · 2^20)` as LONGS, whose addition is associative — the mean
    * is bit-identical under any partitioning (the reason [[ivfTopK]]'s doc
    * ruled out a float-reduction Lloyd pass) and exactly replayable by an
    * integer-arithmetic oracle. `floor`, not `round`: Java half-up vs
    * DuckDB half-away-from-zero diverge on exact .5 fixed-point values.
    * Quantization error ≤ 2^-20 per coordinate — noise next to the
    * embedding's own float precision. Overflow headroom: |v| ≲ 1 ⇒ a cell
    * can hold ~2^43 vectors before a long sum wraps.
    */
  private val LloydScale = 1L << 20

  /** Lloyd-refined IVF fit — the k-means upgrade [[ivfTopK]]'s doc
    * anticipates: start from the deterministic seeds, then `refineIters`
    * rounds of assign → recompute each centroid as its cell's elementwise
    * mean. Refined centroids tighten cells around the corpus's actual
    * density (seeds are corpus vectors — a seed landing in a cluster gap
    * leaves a mega-cell that [[ivfQuery]] then scans per probe).
    *
    * Deterministic throughout: seeds are hash-ordered corpus vectors, the
    * mean uses the [[LloydScale]] fixed-point long reduction
    * (partitioning-independent), and empty cells keep their previous
    * centroid (no re-seeding RNG). `refineIters = 0` degenerates to
    * [[ivfFit]] exactly. Cell ids stay the seed ids, so downstream
    * tie-breaks ([[nearestCells]] cid-asc) are unchanged.
    *
    * Scale shape: each round is ONE corpus scan emitting ≤ nlist partial
    * rows per partition (count + long-sum vector — map-side combine by
    * construction), merged associatively; only the final ≤ nlist rows
    * reach the driver. Total fit cost ≈ (refineIters + 1) corpus scans.
    */
  def ivfFitRefined(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, centroids: String = "spread",
      refineIters: Int = 3): IvfIndex = {
    require(refineIters >= 0, s"refineIters must be >= 0, got $refineIters")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    var cents = seedCents(corpus, idCol, vecCol, nlist, centroids)
    for (_ <- 0 until refineIters) {
      val cb = spark.sparkContext.broadcast(cents)
      val partials = vecs.mapPartitions { it =>
        val acc = scala.collection.mutable.LongMap.empty[(Long, Array[Long])]
        it.foreach { case (_, v) =>
          val c = nearestCells(cb.value, v, 1).head
          val (n, s) = acc.getOrElseUpdate(c, (0L, new Array[Long](v.length)))
          var i = 0
          while (i < v.length) {
            s(i) += math.floor(v(i).toDouble * LloydScale).toLong
            i += 1
          }
          acc(c) = (n + 1L, s)
        }
        acc.iterator.map { case (c, (n, s)) => (c, n, s) }
      }
      val merged = partials.groupByKey(_._1).reduceGroups { (a, b) =>
        val s = a._3.clone()
        var i = 0
        while (i < s.length) { s(i) += b._3(i); i += 1 }
        (a._1, a._2 + b._2, s)
      }.map(_._2).collect().map(r => r._1 -> (r._2, r._3)).toMap
      cents = cents.map { case (cid, old) =>
        merged.get(cid) match {
          case Some((n, s)) if n > 0L =>
            (cid, s.map(x => (x.toDouble / n / LloydScale).toFloat))
          case _ => (cid, old) // empty cell: keep the previous centroid
        }
      }
    }
    IvfIndex(cents.toSeq, assignCells(corpus, idCol, vecCol, cents))
  }

  /** Serve one query batch from a fitted index: each query probes its
    * `nprobe` nearest cells; candidates re-rank exactly. Per-query work ≈
    * |corpus|·nprobe/nlist.
    */
  def ivfQuery(index: IvfIndex, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cb = spark.sparkContext.broadcast(index.cents.toArray)
    val probes = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.flatMap { case (id, vec) =>
        nearestCells(cb.value, vec, nprobe).map(c => (id, vec, c))
      })
      .toDF("query_id", "qvec", "cell")
    val cand = index.cells.join(probes, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cand.withColumn("sim", cosine(col("qvec"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Persist a fitted index: cells parquet (bucket-worthy at scale) +
    * centroids parquet. */
  def ivfSave(index: IvfIndex, dir: String): Unit = {
    import index.cells.sparkSession.implicits._
    index.cells.write.mode("overwrite").parquet(s"$dir/cells")
    index.cents.toDF("cid", "cvec").write.mode("overwrite").parquet(s"$dir/cents")
  }

  def ivfLoad(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$dir/cents")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    IvfIndex(cents.toSeq, spark.read.parquet(s"$dir/cells"))
  }

  /** Nearest cells by (cosine desc, centroid id asc) — the same tie-break
    * the q36 oracle's row_number ordering uses.
    */
  private def nearestCells(cents: Array[(Long, Array[Float])],
      vec: Array[Float], n: Int): Seq[Long] =
    cents.map { case (cid, cvec) => (cid, vecCosine(vec, cvec)) }
      .sortBy { case (cid, sim) => (-sim, cid) }.take(n).map(_._1).toSeq

  /** LSH-bucketed approximate top-k: candidates = bucket collisions in any
    * of `tables` SRP tables; exact cosine re-rank on candidates only.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dims: Int, k: Int, bits: Int = 12, tables: Int = 4): DataFrame = {
    val c = srpBuckets(corpus, idCol, vecCol, dims, bits, tables, "neighbor_id", "nvec")
    val q = srpBuckets(queries, idCol, vecCol, dims, bits, tables, "query_id", "qvec")
    // bucket-equi join: shuffles on (tbl, bucket), never a cross product
    val cand = c.join(q, Seq("tbl", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "qvec", "nvec")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.withColumn("sim", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** L2-normalize an embedding column — the serve-time preconditioning
    * that turns every cosine into a bare dot product (no per-pair norms)
    * and conditions vectors for [[quantizeInt8]] (a unit ball has no
    * per-vector scale outliers). The squared norm accumulates as
    * `Σ floor(xᵢ²·2^20)` LONGS — the [[ivfFitRefined]] fixed-point
    * discipline, so the norm is identical on any engine and any
    * partitioning — and the division `xᵢ / sqrt(norm2_fp / 2^20)` is two
    * correctly-rounded IEEE ops, so the output DOUBLES replay bit-exactly
    * (sqrt is correctly rounded by spec — the one float function that
    * is). Zero vectors normalize to all-zero rather than NaN.
    *
    * 100 TB shape: pure scan-local higher-order codegen — ZERO shuffle,
    * composes with any partitioning. Returns (idCol, norm2_fp, unit).
    */
  def l2Normalize(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val n2 = aggregate(
      transform(col(vecCol),
        x => floor(x.cast("double") * x.cast("double") * lit(1048576.0))
          .cast("long")),
      lit(0L), (acc, v) => acc + v)
    embs.select(col(idCol), n2.as("norm2_fp"), col(vecCol))
      .select(col(idCol), col("norm2_fp"),
        when(col("norm2_fp") === 0L, transform(col(vecCol), _ => lit(0.0)))
          .otherwise(transform(col(vecCol),
            x => x.cast("double") / sqrt(col("norm2_fp") / lit(1048576.0))))
          .as("unit"))
  }

  /** Symmetric per-vector int8 quantization — the serving-side
    * compression for a billion-vector ANN index (4× smaller than
    * float32, SIMD-friendly dot products): scale `s = max_i |v_i|`,
    * quantized `q_i = floor(v_i · 127 / s)` ∈ [−127, 127], plus the
    * scale preserved as `scale_micro = floor(s · 10^6)` BIGINT for
    * dequantization. `floor`, not `round` — Java half-up and DuckDB
    * half-away diverge on exact halves (the [[ivfFitRefined]] lesson);
    * every arithmetic step is IEEE-double on values promoted exactly
    * from the stored float32, so any engine replays the bytes. Zero
    * vectors quantize to all-zero with `scale_micro = 0`.
    *
    * 100 TB shape: pure scan-local higher-order expressions
    * (`transform` / `array_max`) inside whole-stage codegen — ZERO
    * shuffle, composes with any partitioning; dequant error is bounded
    * by s/127 per component (spec-checked).
    */
  def quantizeInt8(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val s = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    embs.select(col(idCol),
      floor(s * lit(1000000.0)).cast("long").as("scale_micro"),
      when(s === lit(0.0), transform(col(vecCol), _ => lit(0L)))
        .otherwise(transform(col(vecCol),
          x => floor(x.cast("double") * lit(127.0) / s).cast("long"))).as("qvec"))
  }

  /** Feature-hashed ("hashing trick") document embeddings — the
    * text→vector bridge when no trained encoder is available: each token
    * lands in bucket `md5(token)[0:4] mod dims` with sign from the parity
    * of the next md5 nibble, and the document's vector is the signed count
    * per bucket (Weinberger et al. 2009 semantics, md5-derandomized so any
    * engine replays the bytes). Signed counts keep the estimator unbiased
    * under collisions; the output (`embedding_h: array<bigint>`, dense,
    * length `dims`) feeds the dedup/ANN stack ([[cosine]] and the
    * int-preserving paths) without a model dependency. Docs with zero
    * tokens are dropped (no signal to hash — the [[graft.ops.TrainPrepOps
    * .applyMerges]] convention).
    *
    * 100 TB shape: tokenize+hash are scan-local; the only shuffles are one
    * hash agg on the NEAR-UNIQUE (id, bucket) key (map-side combine folds
    * each doc's repeated tokens before anything travels — a 10^5-token doc
    * leaves the mapper as ≤ dims rows) and the per-doc reassembly agg on
    * the unique id. `map_from_entries` + a `sequence` transform densify
    * row-locally; no position explode ever reaches a shuffle.
    */
  def hashEmbed(docs: DataFrame, idCol: String, textCol: String,
      dims: Int = 64): DataFrame = {
    require(dims >= 2 && dims <= 65536,
      s"dims must be in [2, 65536] (bucket slice is 4 hex chars), got $dims")
    val h = md5(col("t").cast("binary"))
    val toks = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("t"))
      .select(col(idCol),
        pmod(conv(substring(h, 1, 4), 16, 10).cast("long"),
          lit(dims.toLong)).as("bucket"),
        when(conv(substring(h, 5, 1), 16, 10).cast("long") % 2 === 0,
          lit(1L)).otherwise(lit(-1L)).as("sgn"))
    toks.groupBy(col(idCol), col("bucket")).agg(sum(col("sgn")).as("v"))
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v"))))
        .as("_m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dims.toLong - 1)),
          i => coalesce(try_element_at(col("_m"), i), lit(0L)))
          .as("embedding_h"))
  }

  // -------------------------------------------------- product quantization

  /** Product-quantization codebook: `m` subspaces of `subDim` dims each,
    * `codewords(j)(c)` = codeword `c` of subspace `j`. The serving-side
    * memory path beyond [[quantizeInt8]]: a vector stores as `m` small
    * codes (here 1 byte each at k ≤ 256) instead of `m·subDim` float32s —
    * 32× smaller at (m=8, subDim=8, k=16) — and asymmetric-distance
    * (ADC) scoring reads ONLY the codes (Jégou et al. 2011). Composes
    * with [[IvfIndex]] cells (IVF-PQ): restrict candidates by cell, score
    * the survivors by ADC, exact-rerank the short list.
    */
  final case class PqCodebook(m: Int, subDim: Int,
      codewords: Array[Array[Array[Float]]]) {
    def dims: Int = m * subDim
    def k: Int = codewords.head.length
  }

  /** Fixed-point squared L2 between codeword `b` and the slice of `a`
    * starting at `off`: Σ floor((aᵢ−bᵢ)²·2^20) as a LONG. Same
    * [[LloydScale]] discipline as the Lloyd reduction — float→double
    * promotion is exact, subtraction/square/2^20-scale are correctly
    * rounded IEEE ops identical on every engine, and the LONG sum is
    * associative, so encode argmins and ADC totals are bit-replayable by
    * an integer-arithmetic oracle under any partitioning.
    */
  private def sqDistFp(a: Array[Float], off: Int, b: Array[Float]): Long = {
    var s = 0L
    var i = 0
    while (i < b.length) {
      val d = a(off + i).toDouble - b(i).toDouble
      s += math.floor(d * d * LloydScale).toLong
      i += 1
    }
    s
  }

  /** Fit a PQ codebook: the `k` corpus vectors that sort first under the
    * quantizer order (the [[ivfFit]] seed discipline — `"spread"` =
    * hash-decorrelated, `"first"` = lowest id, trivially oracle-replayable)
    * are sliced into `m` sub-vectors each; subspace `j`'s codewords are
    * the seeds' `j`-th slices. One TakeOrdered over the corpus — the
    * codebook is `m·k·subDim` floats, driver-tiny at any corpus size.
    */
  def pqFit(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, centroids: String = "spread"): PqCodebook = {
    val seeds = seedCents(corpus, idCol, vecCol, k, centroids)
    require(seeds.nonEmpty, "pqFit: empty corpus")
    val dims = seeds.head._2.length
    require(dims % m == 0, s"pqFit: dims=$dims not divisible by m=$m")
    val sub = dims / m
    val codewords = Array.tabulate(m, seeds.length) { (j, c) =>
      java.util.Arrays.copyOfRange(seeds(c)._2, j * sub, (j + 1) * sub)
    }
    PqCodebook(m, sub, codewords)
  }

  /** Encode every corpus vector as its per-subspace nearest-codeword ids
    * (fixed-point L2 argmin, ties to the lowest codeword id): one corpus
    * scan with the broadcast codebook (the [[assignCells]] pattern),
    * emitting `(neighbor_id, codes: array<int>)` — the compressed index
    * you persist and serve from. Scan-local; composes with any
    * partitioning/bucketing of the corpus.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: PqCodebook): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, vec) =>
        val b = bc.value
        require(vec.length == b.dims,
          s"pqEncode: vector dims ${vec.length} != codebook dims ${b.dims}")
        val codes = Array.tabulate(b.m) { j =>
          var best = 0
          var bestD = Long.MaxValue
          var c = 0
          while (c < b.codewords(j).length) {
            val d = sqDistFp(vec, j * b.subDim, b.codewords(j)(c))
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          best
        }
        (id, codes)
      })
      .toDF("neighbor_id", "codes")
  }

  /** Serve a query batch from PQ codes by asymmetric distance (ADC):
    * each query precomputes an `m × k` LONG lookup table (fixed-point
    * sub-distance to every codeword), and a candidate's distance is the
    * sum of `m` table lookups over its codes — the full float vector is
    * never read at serve time.
    *
    * 100 TB shape: LUTs are (queries × m·k) longs — the query batch
    * BROADCASTS and the codes table (m ints/vector, the 32×-compressed
    * side) streams once with a row-local codegen'd `zip_with`+`aggregate`
    * score; the only shuffle is the per-query top-k window on (query_id),
    * carrying one row per scored candidate. Exact-at-codes: ranks are
    * LONG comparisons, no float-sum order sensitivity anywhere.
    */
  def pqQuery(cb: PqCodebook, codes: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    val luts = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, vec) =>
        val b = bc.value
        require(vec.length == b.dims,
          s"pqQuery: vector dims ${vec.length} != codebook dims ${b.dims}")
        val lut = Array.tabulate(b.m) { j =>
          b.codewords(j).map(cw => sqDistFp(vec, j * b.subDim, cw))
        }
        (id, lut)
      })
      .toDF("query_id", "lut")
    val scored = codes.join(broadcast(luts),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("dist_fp", aggregate(
        zip_with(col("codes"), col("lut"),
          (c, tbl) => element_at(tbl, c + lit(1))),
        lit(0L), (acc, v) => acc + v))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dist_fp").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dist_fp"), col("rank"))
  }

  /** One-shot PQ ANN: fit → encode → ADC. Production fits/encodes once
    * and serves many batches ([[pqSave]]/[[pqLoad]] persist the pair);
    * this composition exists for the oracle-checked query surface.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, nCodes: Int = 16,
      centroids: String = "spread"): DataFrame = {
    val cb = pqFit(corpus, idCol, vecCol, m, nCodes, centroids)
    pqQuery(cb, pqEncode(corpus, idCol, vecCol, cb), queries, idCol, vecCol, k)
  }

  /** IVF-PQ — the production composition for billion-vector serving
    * (FAISS's default index shape): the IVF coarse quantizer bounds WHICH
    * candidates each query scores (|corpus|·nprobe/nlist, the [[ivfQuery]]
    * cell restriction) and PQ codes bound WHAT is read per candidate
    * (m LONG LUT lookups — the full float vector is never touched at
    * serve time). Every corpus vector sits in exactly one cell, so probed
    * candidates never duplicate and no dedup pass is needed.
    *
    * 100 TB shape: the serving table is `(neighbor_id, cell, codes)` —
    * the 32×-compressed side, bucketable by `cell` for a shuffle-free
    * probe join; queries broadcast as (query_id, cell, lut) rows (nprobe
    * rows × m·k longs each); scoring is a row-local codegen'd
    * `zip_with`+`aggregate`; the only shuffle is the per-query top-k
    * window. Fully fixed-point: ranks are LONG comparisons, replayable
    * by an integer-arithmetic oracle. With `nprobe = nlist` this
    * degenerates to [[pqTopK]] exactly (spec-pinned).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, nCodes: Int = 16, centroids: String = "spread"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val idx = ivfFit(corpus, idCol, vecCol, nlist, centroids)
    val cb = pqFit(corpus, idCol, vecCol, m, nCodes, centroids)
    val pqCells = idx.cells.select(col("neighbor_id"), col("cell"))
      .join(pqEncode(corpus, idCol, vecCol, cb), "neighbor_id")
    val cbc = spark.sparkContext.broadcast(cb)
    val centsB = spark.sparkContext.broadcast(idx.cents.toArray)
    val probes = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.flatMap { case (id, vec) =>
        val b = cbc.value
        val lut = Array.tabulate(b.m) { j =>
          b.codewords(j).map(cw => sqDistFp(vec, j * b.subDim, cw))
        }
        nearestCells(centsB.value, vec, nprobe).map(c => (id, c, lut))
      })
      .toDF("query_id", "cell", "lut")
    val scored = pqCells.join(broadcast(probes), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("dist_fp", aggregate(
        zip_with(col("codes"), col("lut"),
          (c, tbl) => element_at(tbl, c + lit(1))),
        lit(0L), (acc, v) => acc + v))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dist_fp").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dist_fp"), col("rank"))
  }

  /** Persist a PQ index: codes parquet (bucket-worthy at scale) + the
    * codebook as (j, c, cv) rows. */
  def pqSave(cb: PqCodebook, codes: DataFrame, dir: String): Unit = {
    val spark = codes.sparkSession
    import spark.implicits._
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    val rows = for {
      j <- 0 until cb.m
      c <- cb.codewords(j).indices
    } yield (j, c, cb.codewords(j)(c))
    rows.toDF("j", "c", "cv").write.mode("overwrite").parquet(s"$dir/codebook")
  }

  def pqLoad(spark: org.apache.spark.sql.SparkSession,
      dir: String): (PqCodebook, DataFrame) = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/codebook")
      .as[(Int, Int, Array[Float])].collect().sortBy(r => (r._1, r._2))
    val m = rows.map(_._1).max + 1
    val codewords = Array.tabulate(m)(j =>
      rows.filter(_._1 == j).sortBy(_._2).map(_._3))
    (PqCodebook(m, codewords.head.head.length, codewords),
      spark.read.parquet(s"$dir/codes"))
  }
}
