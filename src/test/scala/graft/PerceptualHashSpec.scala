package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultiModalOps
import graft.ops.MultiModalOps.{JvmCodec, MediaRow, StubCodec}

/** Perceptual average-hash (aHash) near-dup over binary media columns:
  * the real-image hash is stable under resize / re-encode / brightness
  * shift and far from unrelated images; the md5 fallback (which q49's
  * DuckDB oracle replays nibble-exact) feeds the same banded-LSH path.
  */
class PerceptualHashSpec extends AnyFunSuite {
  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  /** Deterministic grayscale scene in NORMALIZED coordinates — smooth
    * low-frequency waves + a bright blob, so the same `seed` renders the
    * same scene at any resolution (the resize-invariance the test needs;
    * a per-pixel modular pattern would alias into a different scene at
    * 2×). Different seeds move both the wave phase and the blob.
    */
  private def makeImage(w: Int, h: Int, brightShift: Int = 0,
      seed: Int = 1, format: String = "png"): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val bx = if (seed == 1) 1.0 / 3 else 2.0 / 3
    for (y <- 0 until h; x <- 0 until w) {
      val u = (x + 0.5) / w; val t = (y + 0.5) / h
      val wave = 90 * math.sin(u * math.Pi * 2 * seed + seed) +
        60 * math.cos(t * math.Pi * (2 + seed))
      val blob = if ((u - bx) * (u - bx) + (t - 1.0 / 3) * (t - 1.0 / 3)
        < 0.04) 80.0 else 0.0
      val v = math.min(255, math.max(0, (110 + wave / 2 + blob + brightShift).toInt))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("aHash is deterministic and survives resize, re-encode, brightness") {
    val base = makeImage(96, 64)
    val h0 = JvmCodec.aHash64(base).get
    assert(JvmCodec.aHash64(base).get == h0)
    // 2x resize of the same scene: center-of-cell sampling keeps the grid
    // aligned, so the hash barely moves
    val big = makeImage(192, 128)
    assert(ham(h0, JvmCodec.aHash64(big).get) <= 8)
    // global brightness shift: mean shifts with the pixels → bits stable
    val bright = makeImage(96, 64, brightShift = 20)
    assert(ham(h0, JvmCodec.aHash64(bright).get) <= 8)
    // re-encode as BMP: lossless change of container → tiny distance
    val bmp = makeImage(96, 64, format = "bmp")
    assert(ham(h0, JvmCodec.aHash64(bmp).get) <= 2)
    // unrelated scene: far (random would be ~32)
    val other = makeImage(96, 64, seed = 7)
    assert(ham(h0, JvmCodec.aHash64(other).get) >= 12)
  }

  test("aHash declines non-images; fallback hash64 matches md5 prefix") {
    val junk = "not an image at all, just text bytes".getBytes("UTF-8")
    assert(JvmCodec.aHash64(junk).isEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(junk).take(8).map(b => f"${b & 0xff}%02x").mkString
    assert(StubCodec.hash64(junk) == java.lang.Long.parseUnsignedLong(hex, 16))
  }

  test("mediaNearDupPairs: planted twin found at hamming 0, unrelated excluded") {
    val a = makeImage(96, 64)
    val aResized = makeImage(192, 128)
    val other = makeImage(96, 64, seed = 7)
    val junk = "fallback payload".getBytes("UTF-8")
    val rows = Seq(
      MediaRow(1L, "image", a),
      MediaRow(2L, "image", a.clone()), // exact twin
      MediaRow(3L, "image", aResized), // perceptual near-dup
      MediaRow(4L, "image", other),
      MediaRow(5L, "video", junk),
      MediaRow(6L, "video", junk.clone())) // fallback-path twin
    val bands = MultiModalOps.perceptualBands(spark.createDataset(rows))
    val pairs = MultiModalOps.mediaNearDupPairs(bands.toDF(), maxHamming = 3)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 2L)), "exact twin missed")
    assert(pairs.contains((5L, 6L)), "fallback twin missed")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated image matched")
    // the resized near-dup may exceed hamming 3; widen the verify via the
    // bands to confirm LSH recall behaves: at its true hamming it is either
    // reported or correctly below the band-collision bar
    val h1 = JvmCodec.aHash64(a).get; val h3 = JvmCodec.aHash64(aResized).get
    if (ham(h1, h3) <= 3) assert(pairs.contains((1L, 3L)))
  }

  test("pigeonhole recall: every pair at hamming <= 3 shares a band") {
    // randomized (seeded) check over synthetic hashes
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val h = rnd.nextLong()
      val flips = rnd.shuffle((0 until 64).toList).take(rnd.nextInt(4))
      val h2 = flips.foldLeft(h)((acc, b) => acc ^ (1L << b))
      val bandsA = (0 to 3).map(i => (h >>> (48 - 16 * i)) & 0xffff)
      val bandsB = (0 to 3).map(i => (h2 >>> (48 - 16 * i)) & 0xffff)
      assert(bandsA.zip(bandsB).exists(p => p._1 == p._2),
        f"hamming ${ham(h, h2)} pair shares no band: $h%016x vs $h2%016x")
    }
  }
}
