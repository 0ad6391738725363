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

  /** SRP bucket id (b-bit) for one hash table, as a codegen'd column. */
  def srpBucket(vec: Column, dims: Int, bits: Int, table: Int): Column = {
    val bitCols = (0 until bits).map { bit =>
      val proj = (0 until dims).map { d =>
        element_at(vec, d + 1).cast("double") * lit(srpWeight(table, bit, d))
      }.reduce(_ + _)
      when(proj > 0, lit(1L << bit)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: candidates = bucket collisions in any
    * of `tables` SRP tables; exact cosine re-rank on candidates only.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dims: Int, k: Int, bits: Int = 12, tables: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: String, v: String): DataFrame = {
      val base = df.select(col(idCol).as(id), col(vecCol).as(v))
      val tagged = (0 until tables).map { t =>
        base.withColumn("tbl", lit(t)).withColumn("bucket", srpBucket(col(v), dims, bits, t))
      }
      tagged.reduce(_ unionByName _)
    }
    val c = bucketed(corpus, "neighbor_id", "nvec")
    val q = bucketed(queries, "query_id", "qvec")
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
