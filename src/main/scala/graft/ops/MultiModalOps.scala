package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata, and decode / feature-extract
  * runs as a partition-batched transform.
  *
  * The decode is REAL for the formats the JDK ships codecs for —
  * PNG/JPEG/BMP/GIF ([[JvmCodec]] via `javax.imageio`) and PCM WAV
  * (`javax.sound.sampled`) — recognized by magic bytes. Formats outside
  * the JDK's reach (video, webp, ogg, …) fall back to [[StubCodec]]'s
  * deterministic md5-derived fake, the declared plug-in point for a
  * JNI/native decoder (or `mapInPandas`+PIL on the PySpark side) with
  * zero changes to the pipeline shape.
  */
object MultiModalOps {

  case class MediaRow(doc_id: Long, media_kind: String, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_kind: String, n_bytes: Long,
      width: Int, height: Int, feat: Array[Float])

  /** REAL in-JVM decoder for the common formats the JDK ships codecs for:
    * PNG/JPEG/BMP/GIF via `javax.imageio` and WAV (PCM) via
    * `javax.sound.sampled` — no external libraries. Formats are recognized
    * by magic bytes, not the caller's `media_kind` hint, so a mislabeled
    * blob still decodes (or falls back) correctly.
    *
    * Output contract (deterministic — pure function of the bytes):
    *  - images: (width, height) are the real pixel dimensions; feat is an
    *    8-dim [0,1] vector = mean grayscale of the four quadrants, global
    *    mean, global max-min spread, aspect ratio (w/(w+h)), and
    *    log-scaled byte size.
    *  - WAV audio: width = frame count (clipped to Int.MaxValue),
    *    height = sample rate; feat = RMS amplitude of four equal time
    *    segments, global RMS, peak, channel count scaled, log byte size.
    *
    * Exotic/undecodable payloads fall back to [[StubCodec]] (the
    * md5-derived deterministic fake), which keeps q25's oracle exact: the
    * sandbox demo blobs are text bytes with no image/audio magic, so they
    * take the fallback path unchanged.
    */
  object JvmCodec {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors

    /** Magic-byte sniff; None = not a format we decode in-JVM. */
    def sniff(b: Array[Byte]): Option[String] = {
      if (b.length < 12) None
      else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("png")
      else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) Some("jpeg")
      else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
      else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
      else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
               b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') Some("wav")
      else None
    }

    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
      sniff(bytes).flatMap {
        case "wav" => decodeWav(bytes)
        case _ => decodeImage(bytes)
      }

    private def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        // quadrant means on a bounded sample grid: decode cost stays
        // O(grid), not O(pixels), for arbitrarily large images
        val grid = 32
        val sums = new Array[Double](4); val counts = new Array[Long](4)
        var gMin = 1.0; var gMax = 0.0; var gSum = 0.0; var gN = 0L
        var yi = 0
        while (yi < math.min(grid, h)) {
          val y = yi * h / math.min(grid, h)
          var xi = 0
          while (xi < math.min(grid, w)) {
            val x = xi * w / math.min(grid, w)
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
              (rgb & 0xff) * 114L) / 1000.0 / 255.0
            val q = (if (y >= h / 2) 2 else 0) + (if (x >= w / 2) 1 else 0)
            sums(q) += lum; counts(q) += 1
            if (lum < gMin) gMin = lum
            if (lum > gMax) gMax = lum
            gSum += lum; gN += 1
            xi += 1
          }
          yi += 1
        }
        val feat = Array(
          if (counts(0) > 0) (sums(0) / counts(0)).toFloat else 0f,
          if (counts(1) > 0) (sums(1) / counts(1)).toFloat else 0f,
          if (counts(2) > 0) (sums(2) / counts(2)).toFloat else 0f,
          if (counts(3) > 0) (sums(3) / counts(3)).toFloat else 0f,
          if (gN > 0) (gSum / gN).toFloat else 0f,
          (gMax - gMin).toFloat,
          w.toFloat / (w + h).toFloat,
          (math.log1p(bytes.length.toDouble) / 32.0).toFloat)
        Some((w, h, feat))
      }
    }

    /** 64-bit average-hash (aHash) of a decodable image: luminance sampled
      * on a fixed 8×8 grid, bit set where the cell is brighter than the
      * grid mean (MSB = top-left, row-major). Stable under resize,
      * re-encode, and global brightness shifts — the standard cheap
      * perceptual key for media near-dup. O(64) regardless of pixel count.
      * None for payloads `javax.imageio` can't decode.
      */
    /** Sniffable kinds that are raster images (ImageIO-decodable); anything
      * else — audio, future video containers — must NOT reach ImageIO.
      */
    val ImageKinds: Set[String] = Set("png", "jpeg", "bmp", "gif")

    def aHash64(bytes: Array[Byte]): Option[Long] = {
      if (!sniff(bytes).exists(ImageKinds.contains)) return None // images only
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val lums = new Array[Double](64)
        var i = 0
        while (i < 64) {
          // center-of-cell sampling: stable under integer resize rounding
          val x = ((i % 8) * 2 + 1) * w / 16
          val y = ((i / 8) * 2 + 1) * h / 16
          val rgb = img.getRGB(math.min(x, w - 1), math.min(y, h - 1))
          lums(i) = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
            (rgb & 0xff) * 114L) / 1000.0
          i += 1
        }
        val mean = lums.sum / 64.0
        var hash = 0L
        i = 0
        while (i < 64) {
          if (lums(i) > mean) hash |= (1L << (63 - i))
          i += 1
        }
        Some(hash)
      }
    }

    private def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
          val data = in.readAllBytes()
          val nSamples = data.length / bytesPerSample
          def sampleAt(i: Int): Double = {
            val off = i * bytesPerSample
            val raw =
              if (bytesPerSample == 2)
                ((data(off + 1) << 8) | (data(off) & 0xff)).toShort.toDouble / 32768.0
              else (data(off) & 0xff).toDouble / 255.0 * 2 - 1
            raw
          }
          val segRms = new Array[Double](4)
          var peak = 0.0; var sumSq = 0.0
          var i = 0
          while (i < nSamples) {
            val s = sampleAt(i)
            val seg = math.min(3, i * 4 / math.max(1, nSamples))
            segRms(seg) += s * s
            sumSq += s * s
            if (math.abs(s) > peak) peak = math.abs(s)
            i += 1
          }
          val perSeg = math.max(1, nSamples / 4)
          val feat = Array(
            math.sqrt(segRms(0) / perSeg).toFloat,
            math.sqrt(segRms(1) / perSeg).toFloat,
            math.sqrt(segRms(2) / perSeg).toFloat,
            math.sqrt(segRms(3) / perSeg).toFloat,
            math.sqrt(sumSq / math.max(1, nSamples)).toFloat,
            peak.toFloat,
            fmt.getChannels / 8f,
            (math.log1p(bytes.length.toDouble) / 32.0).toFloat)
          Some((math.min(frames, Int.MaxValue.toLong).toInt,
            fmt.getSampleRate.toInt, feat))
        } finally in.close()
      } catch { case _: Exception => None }
    }
  }

  /** Fallback decoder — deterministic md5-derived fake for formats with no
    * in-JVM codec (real pipelines plug a JNI/native decoder here; keep the
    * signature). Values derive from md5 of the payload so the DuckDB
    * oracle can compute the identical "decode" — the fallback is thus
    * hash-verified end-to-end, not just rows-counted.
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

    /** Deterministic 64-bit fake perceptual hash: the first 16 hex chars
      * of md5(payload). Identical bytes → identical hash (Hamming 0), so
      * planted exact twins survive the near-dup path; and the oracle can
      * recompute each 16-bit band from the same hex nibbles.
      */
    def hash64(bytes: Array[Byte]): Long = {
      val md = md5tl.get(); md.reset()
      val hex = md.digest(bytes).take(8).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseUnsignedLong(hex, 16)
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
        // real in-JVM decode when the magic bytes match a JDK codec;
        // deterministic md5 fallback otherwise (exotic formats)
        val (w, h, feat) = JvmCodec.decode(r.media)
          .getOrElse(StubCodec.decode(r.media_kind, r.media))
        MediaFeatures(r.doc_id, r.media_kind, r.media.length.toLong, w, h, feat)
      }
    }
  }

  // ------------------------------------------- perceptual near-dup (aHash)

  case class MediaBands(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Per-payload perceptual hash, pre-split into 4×16-bit LSH bands
    * (b0 = the hash's top 16 bits). Real [[JvmCodec.aHash64]] for
    * JDK-decodable images; [[StubCodec.hash64]]'s md5-derived
    * deterministic fake for exotic payloads (the path the DuckDB oracle
    * replays, exactly like q25's decode fallback).
    *
    * Hamming pigeonhole: two 64-bit hashes within Hamming distance 3 must
    * agree on at least one of 4 bands, so a band equi-join has PERFECT
    * recall at `maxHamming ≤ 3` — no probabilistic miss, unlike MinHash
    * banding.
    */
  def perceptualBands(media: Dataset[MediaRow]): Dataset[MediaBands] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val h = JvmCodec.aHash64(r.media).getOrElse(StubCodec.hash64(r.media))
        MediaBands(r.doc_id,
          ((h >>> 48) & 0xffff).toInt, ((h >>> 32) & 0xffff).toInt,
          ((h >>> 16) & 0xffff).toInt, (h & 0xffff).toInt)
      }
    }
  }

  /** Media near-dup pairs by banded Hamming LSH over the perceptual hash:
    * candidates = pairs sharing any 16-bit band (4 equi-joins unioned,
    * row-identical duplicates dropped), verified by exact Hamming ≤
    * `maxHamming`, computed as the sum of per-band `bit_count(xor)` — the
    * 64-bit hash never needs reassembling. Returns `(id_a, id_b, hamming)`
    * with `id_a < id_b`.
    *
    * Scale shape: each candidate join is a shuffle on a 16-bit band value
    * — short keys, heavily combinable; vectors/payloads never travel. A
    * degenerate band (e.g. all-black images hashing alike) concentrates
    * one band value, which AQE's skew-join splitting handles; the verify
    * is a per-row expression. Recall is exact for `maxHamming ≤ 3` by the
    * pigeonhole above (require-guarded).
    */
  def mediaNearDupPairs(bands: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole only guarantees full recall up to Hamming 3")
    val a = bands.select(col("doc_id").as("id_a"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val b = bands.select(col("doc_id").as("id_b"),
      col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    val cands = (0 to 3).map(i =>
        a.join(b, col(s"a$i") === col(s"c$i") && col("id_a") < col("id_b")))
      .reduce(_ unionByName _)
      .distinct() // same pair via 2+ bands → identical rows (bands are per-id)
    cands
      .withColumn("hamming",
        (0 to 3).map(i => expr(s"bit_count(a$i ^ c$i)")).reduce(_ + _).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
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
