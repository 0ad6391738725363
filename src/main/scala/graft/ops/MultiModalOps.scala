package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata, and decode / feature-extract
  * runs as a partition-batched transform.
  *
  * The Spark-side architecture is real and tested — schema, partition
  * batching, feature row shape, deterministic output — while the codec
  * itself is STUBBED: this container has no image/audio libraries, so
  * [[StubCodec.decode]] derives a deterministic fake feature vector from
  * the bytes. On a real cluster the stub body is replaced by the actual
  * decoder (e.g. JNI image lib, or `mapInPandas`+PIL on the PySpark side)
  * with zero changes to the pipeline shape.
  */
object MultiModalOps {

  case class MediaRow(doc_id: Long, media_kind: String, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_kind: String, n_bytes: Long,
      width: Int, height: Int, feat: Array[Float])

  /** STUB decoder — deterministic fake standing in for the real
    * image/audio decode (library not present in this environment).
    * Real implementation point: replace the body, keep the signature.
    * Values derive from md5 of the payload so the DuckDB oracle can
    * compute the identical "decode" — the stub is thus hash-verified
    * end-to-end, not just rows-counted.
    */
  object StubCodec {
    private val md5tl = ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      val md = md5tl.get(); md.reset()
      val hex = md.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
      def chunk(pos: Int): Int = Integer.parseInt(hex.substring(pos, pos + 3), 16)
      val w = 16 + chunk(0) % 1024
      val ht = 16 + chunk(3) % 1024
      val feat = Array.tabulate(8)(d => (chunk(6 + d * 3) % 2000 - 1000).toFloat / 1000f)
      (w, ht, feat)
    }
  }

  /** Partition-batched decode: one JVM-side pass per partition (the Scala
    * analog of `mapInPandas` batch shape — codec state initialized once per
    * partition, rows streamed through).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (model load, JNI handles)
      rows.map { r =>
        val (w, h, feat) = StubCodec.decode(r.media_kind, r.media)
        MediaFeatures(r.doc_id, r.media_kind, r.media.length.toLong, w, h, feat)
      }
    }
  }

  /** Demo source: wraps the `documents` table's text bytes as a fake media
    * blob so the full binary-column path (scan → binary → batch decode →
    * typed features) is exercised end-to-end on the sandbox tables.
    */
  def demoPipeline(spark: SparkSession, docsParquet: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(docsParquet)
      .select(col("doc_id").cast("long").as("doc_id"),
        (when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio"))).as("media_kind"),
        col("text").cast("binary").as("media"))
      .as[MediaRow]
    extractFeatures(media)
      .select(col("doc_id"), col("media_kind"), col("n_bytes"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"),
        // integer mills: feat0 is n/1000f, float error ≪ 0.5 so the round
        // recovers n exactly — cross-engine float-free
        round(element_at(col("feat"), 1) * 1000).cast("long").as("feat0_mill"))
  }
}
