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

  // ImageIO's default stream cache is a TEMP FILE ON DISK per read/write
  // call — every 16x16 fixture PNG encode and every pHash decode paid a
  // file create/delete, tying codec throughput to filesystem noise (the
  // r9 q142 bench showed a 2.3x min-to-max spread with no code change).
  // Memory-cached streams are deterministic in cost for the small images
  // this path handles; runs once per JVM at class load (executors load
  // the object before first use).
  ImageIO.setUseCache(false)

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

  /** Near-dup variant of the PNG fixture: docs in the same group of ten
    * (doc_id div 10) share one LCG-painted base image, and each member
    * perturbs `doc_id mod 10` pixels of it — so groups are planted
    * perceptual near-duplicates (few pixels moved ⇒ the low-frequency
    * DCT spectrum, and therefore the pHash, barely moves) while images
    * across groups are unrelated noise. Deterministic: the base seed is
    * the group id and the perturbation is a fixed pixel walk.
    */
  def pngNearDupFixture(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("content", BinaryType),
      StructField("format", StringType)))
    docs.select(org.apache.spark.sql.functions.col("doc_id"))
      // the source parquet is one thin file → one partition; spread the
      // per-row PNG encode (and the downstream decode+DCT) across cores
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
          var seed = docId / 10
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
          var j = 0
          while (j < (docId % 10).toInt) {
            img.setRGB((j * 5) % 16, (j * 3) % 16, 0x808080)
            j += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", bos)
          Row(docId, bos.toByteArray, "png")
        }
      }(Encoders.row(outSchema))
  }

  /** 64-bit perceptual hash — the classic DCT pHash: grayscale
    * area-resample to 32×32, 2D DCT-II, keep the 8×8 lowest-frequency
    * block, threshold each AC coefficient against the block's median.
    * Two images that differ by a few pixels (or re-encoding noise) move
    * only slightly in the low-frequency spectrum, so their hashes land
    * within a small Hamming distance — the image-side analog of SimHash,
    * and it feeds the same banded Hamming pairing ([[graft.operators
    * .Dedup.hammingPairs]]).
    *
    * Deterministic by construction, so the oracle can inline the hashes
    * and replay the pairing exactly: integer box resample, fixed
    * summation order, and StrictMath.cos (Math.cos may use platform
    * intrinsics; StrictMath is specified bit-for-bit). The median of the
    * 63 AC coefficients is the middle element of the sorted array —
    * no averaging, no float ambiguity in the compare. Undecodable bytes
    * hash to 0L (they pair only with each other at distance 0 and are
    * trivially filtered by callers that care).
    */
  /** DCT-II basis rows for the 32-sample pHash transform: dctBasis(u)(y)
    * = StrictMath.cos((2y+1)·u·π/64) — the exact expression the inner
    * loop used to evaluate per pixel, hoisted (8×32 distinct values).
    */
  private val dctBasis: Array[Array[Double]] =
    Array.tabulate(8, 32)((u, y) =>
      StrictMath.cos((2 * y + 1) * u * StrictMath.PI / (2.0 * 32)))

  def pHash(content: Array[Byte]): Long = {
    val img =
      try Option(ImageIO.read(new ByteArrayInputStream(content)))
      catch { case _: Exception => None }
    img match {
      case None => 0L
      case Some(im) =>
        val n = 32
        val w = im.getWidth
        val h = im.getHeight
        if (w <= 0 || h <= 0) return 0L
        // integer-box grayscale downsample (pixel replication when the
        // source is smaller than 32×32)
        val g = Array.ofDim[Double](n, n)
        var i = 0
        while (i < n) {
          val y0 = i * h / n
          val y1 = math.max((i + 1) * h / n, y0 + 1)
          var j = 0
          while (j < n) {
            val x0 = j * w / n
            val x1 = math.max((j + 1) * w / n, x0 + 1)
            var sum = 0.0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = im.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000.0
                x += 1
              }
              y += 1
            }
            g(i)(j) = sum / ((y1 - y0) * (x1 - x0))
            j += 1
          }
          i += 1
        }
        // 2D DCT-II of the 8×8 lowest-frequency corner only (computing
        // the 24 needed basis rows, not the full 32×32 transform). The
        // cosine basis is the precomputed `dctBasis` table — identical
        // StrictMath values and multiply order, so hashes are unchanged;
        // recomputing cos in the innermost loop was ~131k native
        // StrictMath.cos calls PER IMAGE (29s for 5000 images at sf0.1)
        val coef = Array.ofDim[Double](8, 8)
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var y = 0
            while (y < n) {
              var x = 0
              while (x < n) {
                s += g(y)(x) * dctBasis(u)(y) * dctBasis(v)(x)
                x += 1
              }
              y += 1
            }
            val cu = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
            val cv = if (v == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
            coef(u)(v) = 0.25 * cu * cv * s
            v += 1
          }
          u += 1
        }
        val ac = new Array[Double](63)
        var k = 0
        u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            if (u != 0 || v != 0) { ac(k) = coef(u)(v); k += 1 }
            v += 1
          }
          u += 1
        }
        val sorted = ac.clone()
        java.util.Arrays.sort(sorted)
        val median = sorted(31)
        var hash = 0L
        k = 0
        u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            if (u != 0 || v != 0) {
              if (ac(k) > median) hash |= (1L << (u * 8 + v))
              k += 1
            }
            v += 1
          }
          u += 1
        }
        hash
    }
  }

  /** pHash as a per-partition map over a binary column — the mapPartitions
    * distribution shape of the other codec paths (no shuffle).
    */
  def pHashes(df: org.apache.spark.sql.DataFrame, idCol: String,
              contentCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("phash", LongType)))
    df.select(org.apache.spark.sql.functions.col(idCol),
        org.apache.spark.sql.functions.col(contentCol))
      .mapPartitions { rows =>
        rows.map(r => Row(r.get(0), pHash(r.getAs[Array[Byte]](1))))
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
