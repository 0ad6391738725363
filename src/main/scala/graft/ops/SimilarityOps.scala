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
    * The quantizer is deterministic (the `nlist` lowest-id corpus vectors
    * — a sampled quantizer, no Lloyd iterations whose float reductions
    * would make centroids partitioning-dependent), so the result is an
    * exact checkable value: the DuckDB oracle recomputes the same cells.
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
        * id-ordered corpus; a k-means refinement pass is the further
        * upgrade once a trainer stage exists.
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
    val spark = corpus.sparkSession
    import spark.implicits._
    val centOrder = centroids match {
      case "spread" => Seq(xxhash64(col(idCol).cast("long")), col(idCol).cast("long"))
      case _ => Seq(col(idCol).cast("long"))
    }
    val cents = corpus.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(centOrder: _*).limit(nlist)
      .as[(Long, Array[Float])].collect()
    val cb = spark.sparkContext.broadcast(cents)
    val assigned = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, vec) =>
        (id, vec, nearestCells(cb.value, vec, 1).head)
      })
      .toDF("neighbor_id", "nvec", "cell")
    IvfIndex(cents.toSeq, assigned)
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
}
