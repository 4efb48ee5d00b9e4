package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** REAL media decoding on the pure JDK — no external libraries.
  *
  * `javax.imageio` ships PNG/JPEG/BMP/GIF/WBMP codecs and
  * `javax.sound.sampled` ships WAV/AIFF/AU PCM parsing in every standard
  * JRE, so the common formats of a web-scraped corpus decode for real; only
  * exotic formats (webp, video containers, compressed audio) need the
  * `StubCodec`/external-library seam. Everything here is headless-safe
  * (BufferedImage raster work only, no display pipeline).
  */
object JdkCodecs {

  /** Image codec over javax.imageio: real dimensions, real resampling
    * (re-encoded as PNG), and a deterministic feature vector — an L2-
    * normalized `dim`-bin grayscale histogram, a standard cheap visual
    * signature that feeds Similarity/Dedup directly.
    */
  class ImageIoCodec extends Multimodal.Codec {
    private def read(content: Array[Byte]): Option[BufferedImage] =
      Option(ImageIO.read(new ByteArrayInputStream(content)))

    override def decodeDims(content: Array[Byte]): (Int, Int) =
      read(content).map(i => (i.getWidth, i.getHeight)).getOrElse((-1, -1))

    override def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      read(content) match {
        case None => Array.emptyByteArray
        case Some(img) =>
          val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          bos.toByteArray
      }

    override def features(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      read(content) match {
        case None => out
        case Some(img) =>
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              out(lum * dim / 256) += 1.0f
              x += 1
            }
            y += 1
          }
          val n = math.sqrt(out.map(v => v.toDouble * v).sum).toFloat max 1e-9f
          out.map(_ / n)
      }
    }
  }

  /** Deterministic REAL-PNG fixture from the documents table: each row's
    * text seeds an LCG that paints a 16x16 RGB image, encoded to actual PNG
    * bytes with ImageIO in the executors (mapPartitions, no shuffle — the
    * same distribution shape a real image corpus would use). Unlike the
    * byte-stand-in fixture, these payloads exercise the REAL codec path:
    * q81 decodes, resamples, and histograms them through ImageIoCodec.
    */
  def pngFixtureFromDocuments(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("content", BinaryType),
      StructField("format", StringType)))
    docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
          // java String.hashCode is specified (31-base polynomial), so the
          // seed — and therefore every pixel — is stable across JVMs
          var seed = r.getString(1).hashCode.toLong
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              seed = seed * 6364136223846793005L + 1442695040888963407L
              img.setRGB(x, y, ((seed >>> 16) & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", bos)
          Row(r.getLong(0), bos.toByteArray, "png")
        }
      }(Encoders.row(outSchema))
  }

  /** Parsed PCM audio header + signal stats (javax.sound.sampled). */
  case class AudioInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       frames: Long, durationMs: Long, rms: Double)

  /** Real WAV/AIFF/AU decode: header via AudioSystem, RMS over the PCM
    * samples (16-bit little-endian path; other widths report rms = -1 but
    * still parse the header). Returns None for undecodable bytes.
    */
  def audioInfo(content: Array[Byte]): Option[AudioInfo] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val durMs = (frames * 1000.0 / fmt.getSampleRate).round
        val rms =
          if (fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian) {
            val bytes = in.readAllBytes()
            var sum = 0.0
            var i = 0
            while (i + 1 < bytes.length) {
              val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort / 32768.0
              sum += s * s
              i += 2
            }
            if (bytes.length >= 2) math.sqrt(sum / (bytes.length / 2)) else 0.0
          } else -1.0
        Some(AudioInfo(fmt.getSampleRate.toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, frames, durMs, rms))
      } finally in.close()
    } catch { case _: Exception => None }
}
