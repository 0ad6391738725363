package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultiModalOps
import graft.ops.MultiModalOps.{JvmCodec, MediaRow, StubCodec}

/** Multimodal decode — the REAL in-JVM codec path (PNG/JPEG/BMP/GIF via
  * `javax.imageio`, PCM WAV via `javax.sound.sampled`), the md5 fallback
  * for exotic bytes (which q25's oracle verifies end-to-end), and the
  * distributed partition-batched pipeline over binary columns.
  */
class MultiModalSpec extends AnyFunSuite {
  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  /** Deterministic test image: gradient left→right, brighter bottom half. */
  private def makeImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 255) / math.max(1, w - 1)
      val v = if (y >= h / 2) math.min(255, base + 64) else base
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV: a 440 Hz tone whose amplitude
    * doubles in the second half.
    */
  private def makeWav(sampleRate: Int, nFrames: Int): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val amp = if (i >= nFrames / 2) 0.5 else 0.25
      val s = (math.sin(2 * math.Pi * 440 * i / sampleRate) * amp * 32767).toInt
      data(i * 2) = (s & 0xff).toByte
      data(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("PNG decodes to its real pixel dimensions and sane features") {
    val bytes = makeImage(64, 48, "png")
    assert(JvmCodec.sniff(bytes).contains("png"))
    val (w, h, feat) = JvmCodec.decode(bytes).get
    assert(w == 64 && h == 48)
    assert(feat.length == 8)
    // gradient: right quadrants brighter than left; bottom brighter than top
    assert(feat(1) > feat(0), s"right > left: ${feat.toSeq}")
    assert(feat(2) > feat(0), s"bottom-left > top-left (+64 boost): ${feat.toSeq}")
    assert(feat(4) > 0f && feat(4) < 1f) // global mean in (0,1)
  }

  test("BMP and GIF decode; JPEG decodes with matching dimensions") {
    for (fmtName <- Seq("bmp", "gif", "jpg")) {
      val bytes = makeImage(30, 20, fmtName)
      val decoded = JvmCodec.decode(bytes)
      assert(decoded.isDefined, s"decode failed for $fmtName")
      val (w, h, _) = decoded.get
      assert(w == 30 && h == 20, s"$fmtName: got ${w}x$h")
    }
  }

  test("WAV decodes frame count + sample rate; louder half has higher RMS") {
    val bytes = makeWav(8000, 4000)
    assert(JvmCodec.sniff(bytes).contains("wav"))
    val (frames, rate, feat) = JvmCodec.decode(bytes).get
    assert(frames == 4000 && rate == 8000)
    // second half is twice the amplitude → segment RMS ordering
    assert(feat(2) > feat(0) && feat(3) > feat(1), feat.toSeq.toString)
    assert(feat(5) > 0.4f && feat(5) <= 0.55f) // peak ≈ 0.5
  }

  test("non-media bytes fall back to the md5 stub (q25 oracle path intact)") {
    val textBytes = "plain document text, no magic".getBytes("UTF-8")
    assert(JvmCodec.sniff(textBytes).isEmpty)
    val viaPipeline = MultiModalOps.extractFeatures(
      spark.createDataset(Seq(MediaRow(1L, "image", textBytes)))).collect().head
    val (w, h, feat) = StubCodec.decode("image", textBytes)
    assert(viaPipeline.width == w && viaPipeline.height == h)
    assert(viaPipeline.feat.toSeq == feat.toSeq)
  }

  test("mixed-format corpus decodes distributedly with per-row dispatch") {
    val rows = Seq(
      MediaRow(1L, "image", makeImage(40, 40, "png")),
      MediaRow(2L, "image", makeImage(20, 10, "bmp")),
      MediaRow(3L, "audio", makeWav(16000, 1600)),
      MediaRow(4L, "video", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)))
    val feats = MultiModalOps.extractFeatures(
      spark.createDataset(rows).repartition(3)).collect().sortBy(_.doc_id)
    assert(feats(0).width == 40 && feats(0).height == 40)
    assert(feats(1).width == 20 && feats(1).height == 10)
    assert(feats(2).width == 1600 && feats(2).height == 16000)
    val stub = StubCodec.decode("video", rows(3).media)
    assert(feats(3).width == stub._1 && feats(3).height == stub._2)
    // decode is deterministic: same corpus, different partitioning → same rows
    val again = MultiModalOps.extractFeatures(
      spark.createDataset(rows).repartition(1)).collect().sortBy(_.doc_id)
    assert(feats.map(_.feat.toSeq).toSeq == again.map(_.feat.toSeq).toSeq)
  }
}
