package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{JdkCodecs, Multimodal}

/** Real JDK media codecs over generated fixtures: PNG decode/resize/
  * histogram features and WAV PCM header + RMS — plus the Spark decode
  * stage running the real codec.
  */
class JdkCodecsSpec extends AnyFunSuite {

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(sampleRate: Int, ms: Int, amp: Double, hz: Double): Array[Byte] = {
    val n = sampleRate * ms / 1000
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * hz * i / sampleRate) * amp * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("ImageIoCodec: real PNG dims, resize round-trip, luminance histogram") {
    val codec = new JdkCodecs.ImageIoCodec
    val white = pngBytes(8, 4, 0xffffff)
    assert(codec.decodeDims(white) == (8, 4))

    val resized = codec.resize(white, 4, 2)
    assert(codec.decodeDims(resized) == (4, 2), "resized payload re-decodes at target dims")

    val fWhite = codec.features(white, 64)
    assert(math.abs(fWhite.map(v => v.toDouble * v).sum - 1.0) < 1e-5, "L2-normalized")
    assert(fWhite(63) > 0.99f, "white image mass lands in the top luminance bin")
    val fBlack = codec.features(pngBytes(8, 4, 0x000000), 64)
    assert(fBlack(0) > 0.99f, "black image mass lands in bin 0")

    assert(codec.decodeDims("not an image".getBytes) == (-1, -1))
  }

  test("audioInfo: WAV header + RMS of a generated sine") {
    val wav = wavBytes(8000, 500, amp = 0.5, hz = 440)
    val info = JdkCodecs.audioInfo(wav).get
    assert(info.sampleRate == 8000 && info.channels == 1 && info.bitsPerSample == 16)
    assert(math.abs(info.durationMs - 500) <= 1, s"duration ${info.durationMs}")
    // RMS of a 0.5-amplitude sine is 0.5/sqrt(2) ~= 0.3536
    assert(math.abs(info.rms - 0.3536) < 0.01, s"rms ${info.rms}")
    assert(JdkCodecs.audioInfo("nope".getBytes).isEmpty)
  }

  test("Spark decode stage runs the REAL image codec end-to-end") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq(
      (1L, pngBytes(16, 8, 0x336699), "png"),
      (2L, pngBytes(5, 7, 0xff0000), "png"))
      .toDF("doc_id", "content", "format")
    val out = Multimodal.decode(df, new JdkCodecs.ImageIoCodec)
      .select(col("doc_id"), col("meta.width"), col("meta.height"))
      .as[(Long, Int, Int)].collect().toSet
    assert(out == Set((1L, 16, 8), (2L, 5, 7)))
  }

  test("q81 path: PNG fixture -> real decode/resize/features, hash-stable") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = Seq((1L, "alpha doc"), (2L, "beta doc"), (3L, "alpha doc"))
      .toDF("doc_id", "text")
    val codec = new JdkCodecs.ImageIoCodec

    def run(): Seq[(Long, Int, Int, Seq[Float])] = {
      val fixture = JdkCodecs.pngFixtureFromDocuments(docs)
      val resized = Multimodal.resize(Multimodal.decode(fixture, codec), codec, 64, 64)
      Multimodal.extractFeatures(resized, codec, dim = 16)
        .select(col("doc_id"), col("meta.width"), col("meta.height"), col("features"))
        .as[(Long, Int, Int, Seq[Float])].collect().sortBy(_._1).toSeq
    }
    val a = run()
    // real codec evidence: source decodes at the rendered 16x16, resize
    // re-decodes at 64x64, features are an L2-normalized 16-bin histogram
    assert(a.map(_._1) == Seq(1L, 2L, 3L))
    a.foreach { case (_, w, h, f) =>
      assert((w, h) == ((64, 64)))
      assert(f.length == 16)
      assert(math.abs(f.map(v => v.toDouble * v).sum - 1.0) < 1e-5, "L2-normalized")
    }
    val fixDims = JdkCodecs.pngFixtureFromDocuments(docs)
      .as[(Long, Array[Byte], String)].collect()
      .map { case (id, bytes, fmt) => (id, codec.decodeDims(bytes), fmt) }.toSet
    assert(fixDims.forall { case (_, dims, fmt) => dims == ((16, 16)) && fmt == "png" },
      "fixture payloads are REAL decodable PNGs")

    // hash-pin: the whole pipeline is deterministic (same text -> same
    // feature vector, repeat runs identical bit-for-bit)
    val b = run()
    assert(a == b, "feature vectors must be reproducible across runs")
    assert(a(0)._4 == a(2)._4, "identical text seeds identical pixels/features")
    assert(a(0)._4 != a(1)._4, "different text diverges")
  }

  test("pHash: identical images collide, small perturbations stay near, noise lands far") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def png(seed0: Long, perturb: Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      var seed = seed0
      for (y <- 0 until 16; x <- 0 until 16) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((seed >>> 16) & 0xffffff).toInt)
      }
      for (j <- 0 until perturb) img.setRGB((j * 5) % 16, (j * 3) % 16, 0x808080)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = JdkCodecs.pHash(png(7L, 0))
    assert(JdkCodecs.pHash(png(7L, 0)) == base, "pHash must be deterministic")
    // a few perturbed pixels move the low-frequency spectrum barely
    assert(ham(base, JdkCodecs.pHash(png(7L, 5))) <= 6,
      "near-duplicate image must land within a small Hamming distance")
    // unrelated noise images land far apart (random 63-bit hashes differ
    // in ~31 bits; 16 is a generous floor)
    val far = (1L to 5L).map(s => ham(base, JdkCodecs.pHash(png(s * 1000 + 13, 0))))
    assert(far.forall(_ > 16), s"unrelated images must hash far apart: $far")
    // undecodable bytes take the documented sentinel
    assert(JdkCodecs.pHash(Array[Byte](1, 2, 3)) == 0L)
  }
}
