package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/video
  * as opaque `binary` columns plus typed metadata, with decode / feature /
  * resize / frame-sample stages as batched per-partition transforms.
  *
  * The Spark-side shape — schema, partition-parallel batching, declared
  * output schema — is real and tested. Common formats decode for REAL on
  * the pure JDK: `JdkCodecs.ImageIoCodec` (PNG/JPEG/BMP/GIF via
  * javax.imageio) and `JdkCodecs.audioInfo` (WAV/AIFF PCM via
  * javax.sound.sampled). `StubCodec` remains the deterministic fallback for
  * formats the JDK lacks (webp, video containers, compressed audio) — the
  * seam where a JNI/JavaCV implementation drops in without touching the
  * plumbing.
  *
  * At scale: binary payloads stay columnar (parquet binary), transforms are
  * mapPartitions (no shuffle), and feature extraction emits fixed-width
  * float arrays ready for the Similarity/Dedup operators.
  */
object Multimodal {

  /** Codec boundary. Real implementations decode actual media bytes. */
  trait Codec extends Serializable {
    def decodeDims(content: Array[Byte]): (Int, Int)
    def features(content: Array[Byte], dim: Int): Array[Float]
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** STUB codec — deterministic fake decode (no media libs in the
    * container). Dims, resampling and features are pure functions of the
    * bytes.
    */
  class StubCodec extends Codec {
    override def decodeDims(content: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(content)
      (64 + math.abs(h % 193), 64 + math.abs((h / 193) % 129))
    }

    /** Nearest-neighbor byte resampling to exactly w*h bytes. */
    override def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val n = w * h
      val out = new Array[Byte](n)
      if (content.isEmpty) return out
      var i = 0
      while (i < n) {
        out(i) = content((i.toLong * content.length / n).toInt)
        i += 1
      }
      out
    }
    override def features(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var acc = 0x9E3779B9L
      var i = 0
      while (i < content.length) {
        acc = acc * 31 + (content(i) & 0xFF)
        out(math.abs((acc % dim).toInt)) += 1.0f
        i += 1
      }
      val n = math.sqrt(out.map(x => x.toDouble * x).sum).toFloat max 1e-9f
      out.map(_ / n)
    }
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("format", StringType)))

  /** Lift embedded JPEG image XObjects out of a PDF binary column
    * (PdfLite.extractImages): one output row per image, carrying the
    * dict-declared dims and the JPEG payload — ready for `decode` /
    * `extractFeatures` over `JdkCodecs.ImageIoCodec`, which reads JPEG on
    * the pure JDK. mapPartitions, no shuffle: the same per-document
    * distribution shape as every other multimodal stage.
    */
  def imagesFromPdfs(pdfs: DataFrame, idCol: String = "doc_id",
                     contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("obj_num", IntegerType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("format", StringType), StructField("content", BinaryType)))
    pdfs.select(col(idCol).cast("long").as("__id"), col(contentCol).as("__c"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          graft.sources.PdfLite.extractImages(r.getAs[Array[Byte]](1)).map(im =>
            Row(r.getLong(0), im.objNum, im.width, im.height, im.format, im.bytes))
        }
      }(Encoders.row(outSchema))
  }

  /** Deterministic binary fixture derived from the documents table (each
    * doc's text bytes stand in for an encoded image payload).
    */
  def fixtureFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("content"),
      when(col("doc_id") % 3 === 0, "png").when(col("doc_id") % 3 === 1, "jpeg")
        .otherwise("webp").as("format"))

  /** Decode stage: binary -> metadata struct. Batched per partition with a
    * declared output schema (the real-codec integration point).
    */
  def decode(df: DataFrame, codec: Codec, contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", metaSchema))
    val cIdx = df.schema.fieldIndex(contentCol)
    val fIdx = df.schema.fieldIndex("format")
    df.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = codec.decodeDims(r.getAs[Array[Byte]](cIdx))
        Row.fromSeq(r.toSeq :+ Row(w, h, r.getString(fIdx)))
      }
    }(Encoders.row(outSchema))
  }

  /** Resize stage: binary -> resized binary at target dims, meta updated.
    * Batched per partition like decode; the real-codec integration point
    * for thumbnailing / model-input normalization.
    */
  def resize(df: DataFrame, codec: Codec, w: Int, h: Int,
             contentCol: String = "content"): DataFrame = {
    val cIdx = df.schema.fieldIndex(contentCol)
    val outSchema = df.schema // content/meta change values, not shape
    val mIdx = df.schema.fieldNames.indexOf("meta")
    df.mapPartitions { rows =>
      rows.map { r =>
        val resized = codec.resize(r.getAs[Array[Byte]](cIdx), w, h)
        val vals = r.toSeq.toArray
        vals(cIdx) = resized
        if (mIdx >= 0) {
          val m = r.getStruct(mIdx)
          vals(mIdx) = Row(w, h, m.getString(2))
        }
        Row.fromSeq(vals.toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Feature-extraction stage: binary -> array<float> embedding column,
    * ready for Similarity.bruteTopK / Dedup.embeddingPairs.
    */
  def extractFeatures(df: DataFrame, codec: Codec, dim: Int = 64,
                      contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val cIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ codec.features(r.getAs[Array[Byte]](cIdx), dim).toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Audio segmentation: fixed-duration windows with overlap over PCM-style
    * byte payloads, driven by a bytes-per-second rate — the audio analog of
    * the G1 token chunker. Pure Column expressions (no shuffle); emits
    * segment id, start offset in ms, and the byte slice. The last segment
    * may be short (clipped to the payload), every byte is covered, and
    * consecutive segments overlap by `overlapMs`.
    */
  def segmentAudio(df: DataFrame, bytesPerSecond: Int, segmentMs: Int,
                   overlapMs: Int, contentCol: String = "content"): DataFrame = {
    require(overlapMs >= 0 && overlapMs < segmentMs, "0 <= overlap < segment")
    val segBytes = math.max(1, bytesPerSecond * segmentMs / 1000)
    val stepBytes = math.max(1, bytesPerSecond * (segmentMs - overlapMs) / 1000)
    val len = length(col(contentCol))
    // number of steps so that the last window reaches the end
    val nSeg = when(len <= segBytes, lit(1)).otherwise(
      ceil((len - segBytes).cast("double") / stepBytes).cast("int") + 1)
    df.withColumn("segment_id", explode(sequence(lit(0), nSeg - 1)))
      .withColumn("start_ms",
        col("segment_id").cast("long") * (segmentMs - overlapMs))
      .withColumn("segment",
        col(contentCol).substr(col("segment_id") * stepBytes + 1, lit(segBytes)))
  }

  /** Frame sampling for "video" payloads: split the binary into fixed-size
    * frames and keep every `stride`-th — pure Column expressions.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int,
                   contentCol: String = "content"): DataFrame = {
    val nFrames = ceil(length(col(contentCol)).cast("double") / frameBytes).cast("int")
    df.withColumn("frame_id",
        explode(filter(sequence(lit(0), greatest(nFrames - 1, lit(0))), i => i % stride === 0)))
      .withColumn("frame",
        col(contentCol).substr(col("frame_id") * frameBytes + 1, lit(frameBytes)))
  }
}
