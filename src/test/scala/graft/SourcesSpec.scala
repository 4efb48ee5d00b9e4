package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.semantic.{SemanticOps, StubModelClient}
import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("jsonDataset: valid rows parse, malformed rows dead-letter, job survives") {
    val dir = Files.createTempDirectory("graft_src_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.json"),
      """[{"id": 1, "name": "one"}, {"id": 2, "name": "two"}]""")
    val good = Sources.jsonDataset(spark, s"$dir/a.json", schema)
    assert(good.ok.count() == 2 && good.dead.count() == 0)

    val dir2 = Files.createTempDirectory("graft_src2_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir2/b.json"),
      "{\"id\": 1, \"name\": \"ok\"}\n{not json at all\n{\"id\": 3, \"name\": \"three\"}")
    val mixed = Sources.jsonDataset(spark, s"$dir2/b.json", schema, multiLine = false)
    assert(mixed.ok.count() == 2)
    assert(mixed.dead.count() == 1)
    assert(mixed.dead.select("error").as[String].head() == "malformed json")
  }

  test("binaryDocuments: binaryFile glob + registered parser yields full_text") {
    val dir = Files.createTempDirectory("graft_bin_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/d1.txt"), "hello binary world")
    Files.writeString(java.nio.file.Paths.get(s"$dir/d2.txt"), "second doc")
    val out = Sources.binaryDocuments(spark, s"$dir/*.txt", "txt")
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("path", "modificationTime", "segment", "full_text"))
    val texts = out.select("full_text").as[String].collect().toSet
    assert(texts == Set("hello binary world", "second doc"))
    intercept[IllegalArgumentException](Sources.binaryDocuments(spark, dir, "docx"))
  }

  test("PdfLite: binaryFile -> full_text over the checked-in PDF fixture") {
    val fixture = new java.io.File("src/test/resources/fixtures/sample.pdf")
    assert(fixture.exists, s"missing fixture ${fixture.getAbsolutePath}")
    val out = Sources.binaryDocuments(spark, fixture.getAbsolutePath, "pdf")
      .orderBy("segment")
      .select("segment", "full_text").as[(Int, String)].collect()
    assert(out.length == 2, "one row per page content stream")
    assert(out(0) == (0, "Spark-native analytics engine\ngraft parses (lite) PDFs natively."),
      s"page 1 got: ${out(0)}")
    assert(out(1) == (1, "Page two\nhex string"), s"page 2 got: ${out(1)}")
  }

  test("PdfLite: uncompressed streams, octal escapes, and non-PDF bytes") {
    import graft.sources.PdfLite
    val raw = ("1 0 obj << /Length 60 >>\nstream\n" +
      "BT (A\\051B) Tj ET\nendstream\nendobj\n").getBytes("ISO-8859-1")
    assert(PdfLite.extract(raw) == Seq("A)B"), "octal \\051 is ')'")
    // backslash-EOL inside a literal string is a line continuation (7.3.4.2)
    val cont = ("2 0 obj << >>\nstream\n" +
      "BT (hel\\\nlo) Tj ET\nendstream\nendobj\n").getBytes("ISO-8859-1")
    assert(PdfLite.extract(cont) == Seq("hello"), "escaped EOL produces no chars")
    assert(PdfLite.extract("not a pdf at all".getBytes("UTF-8")).isEmpty)
    assert(PdfLite.extract(Array.fill[Byte](64)(0x7f)).isEmpty)
  }

  // ---- PdfLite filter coverage: ASCII85 / ASCIIHex / LZW / chains ----

  private def miniPdf(dict: String, data: Array[Byte]): Array[Byte] = {
    val head = s"1 0 obj\n<< $dict /Length ${data.length} >>\nstream\n".getBytes("ISO-8859-1")
    val tail = "\nendstream\nendobj\n".getBytes("ISO-8859-1")
    head ++ data ++ tail
  }

  private def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (if (i + k < data.length) data(i + k) & 0xFFL else 0L); k += 1 }
      if (n == 4 && v == 0L) sb += 'z'
      else {
        val cs = new Array[Char](5)
        var vv = v
        var j = 4
        while (j >= 0) { cs(j) = ('!' + (vv % 85)).toChar; vv /= 85; j -= 1 }
        sb.appendAll(cs, 0, n + 1)
      }
      i += 4
    }
    (sb.toString + "~>").getBytes("ISO-8859-1")
  }

  /** PDF/TIFF-variant LZW encoder (9-12 bit MSB codes, clear first, EOD,
    * EarlyChange=1) — the round-trip partner for the integration test; the
    * decoder's external ground truth is the JDK TIFF writer test below.
    */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bits = 0; var codeLen = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << codeLen) | code; bits += codeLen
      while (bits >= 8) { out.write(((bitBuf >> (bits - 8)) & 0xFF).toInt); bits -= 8 }
    }
    val table = scala.collection.mutable.Map[Seq[Byte], Int](
      (0 until 256).map(i => Seq(i.toByte) -> i): _*)
    var next = 258
    emit(256)
    var w = Vector.empty[Byte]
    data.foreach { b =>
      val wb = w :+ b
      if (table.contains(wb)) w = wb
      else {
        emit(table(w))
        if (next >= 4093) {
          // table nearly full: emit CLEAR and restart, like real writers —
          // codes past 4095 are unrepresentable in 12 bits
          emit(256)
          table.clear(); table ++= (0 until 256).map(i => Seq(i.toByte) -> i)
          next = 258; codeLen = 9
        } else {
          table(wb) = next; next += 1
          // the decoder's table lags the writer's by one entry, so the
          // writer bumps at 2^n exactly when the (ground-truth-validated)
          // reader bumps at 2^n - 1
          if (next >= (1 << codeLen) && codeLen < 12) codeLen += 1
        }
        w = Vector(b)
      }
    }
    if (w.nonEmpty) emit(table(w))
    emit(257)
    if (bits > 0) out.write(((bitBuf << (8 - bits)) & 0xFF).toInt)
    out.toByteArray
  }

  test("PdfLite filters: ASCII85, ASCIIHex, LZW, and chained ASCII85+Flate") {
    import graft.sources.PdfLite
    val content = "BT (Filtered Hello) Tj ET".getBytes("ISO-8859-1")

    val a85 = miniPdf("/Filter /ASCII85Decode", ascii85Encode(content))
    assert(PdfLite.extract(a85) == Seq("Filtered Hello"), "ascii85")

    val hex = content.map(b => f"${b & 0xFF}%02x").mkString + ">"
    val ahx = miniPdf("/Filter /ASCIIHexDecode", hex.getBytes("ISO-8859-1"))
    assert(PdfLite.extract(ahx) == Seq("Filtered Hello"), "asciihex")

    val lzw = miniPdf("/Filter /LZWDecode", lzwEncode(content))
    assert(PdfLite.extract(lzw) == Seq("Filtered Hello"), "lzw")

    val deflater = new java.util.zip.Deflater()
    deflater.setInput(content); deflater.finish()
    val flateOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!deflater.finished()) flateOut.write(buf, 0, deflater.deflate(buf))
    val chained = miniPdf("/Filter [/ASCII85Decode /FlateDecode]",
      ascii85Encode(flateOut.toByteArray))
    assert(PdfLite.extract(chained) == Seq("Filtered Hello"), "a85+flate chain")

    // corrupt payloads and unknown (image) filters are skipped, not crashed
    assert(PdfLite.extract(miniPdf("/Filter /LZWDecode",
      Array.fill[Byte](32)(0x55))).isEmpty)
    assert(PdfLite.extract(miniPdf("/Filter /DCTDecode",
      "BT (not text) Tj ET".getBytes("ISO-8859-1"))).isEmpty)
  }

  test("PdfLite predictors: PNG filter types and TIFF horizontal undone after Flate") {
    import graft.sources.PdfLite

    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    // PNG-encode rows cycling through ALL five filter types
    def pngEncode(data: Array[Byte], cols: Int): Array[Byte] = {
      val rows = data.grouped(cols).toArray
      val out = new java.io.ByteArrayOutputStream()
      var prev = new Array[Byte](cols)
      rows.zipWithIndex.foreach { case (row, ri) =>
        val ft = Seq(1, 2, 4, 0, 3)(ri % 5)
        out.write(ft)
        row.indices.foreach { i =>
          val raw = row(i) & 0xFF
          val left = if (i > 0) row(i - 1) & 0xFF else 0
          val up = prev(i) & 0xFF
          val upLeft = if (i > 0) prev(i - 1) & 0xFF else 0
          val pred = ft match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, upLeft)
          }
          out.write((raw - pred) & 0xFF)
        }
        prev = row
      }
      out.toByteArray
    }

    val cols = 10
    val text = "BT (Predicted Hello World) Tj ET"
    val padded = (text + " " * ((cols - text.length % cols) % cols)).getBytes("ISO-8859-1")

    val png = miniPdf(
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $cols >>",
      deflate(pngEncode(padded, cols)))
    assert(PdfLite.extract(png) == Seq("Predicted Hello World"), "png predictors")

    // TIFF predictor 2: horizontal differencing within each row
    val tiffEnc = padded.grouped(cols).flatMap { row =>
      row.indices.map(i => if (i == 0) row(0)
        else ((row(i) - row(i - 1)) & 0xFF).toByte)
    }.toArray
    val tiff = miniPdf(
      s"/Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns $cols >>",
      deflate(tiffEnc))
    assert(PdfLite.extract(tiff) == Seq("Predicted Hello World"), "tiff predictor")

    // parms parsing: defaults, /DP alias, predictor 1 = no-op
    assert(PdfLite.decodeParms("<< /DP << /Predictor 2 >> >>")
      .contains(PdfLite.PredParams(2, 1, 1, 8)))
    assert(PdfLite.decodeParms("<< /DecodeParms << /Predictor 1 >> >>").isEmpty)
    assert(PdfLite.decodeParms("<< /Length 10 >>").isEmpty)
    // corrupt predicted payload (bad row alignment) -> skipped, not crashed
    val bad = miniPdf(
      "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >>",
      deflate(pngEncode(padded, cols)))
    assert(PdfLite.extract(bad).isEmpty)
  }

  test("PdfLite decodeParms: bounded to its own sub-dict, word-bounded key") {
    import graft.sources.PdfLite
    assert(PdfLite.decodeParms("<< /DecodeParms << /Predictor 12 /Columns 4 >> >>")
      .contains(PdfLite.PredParams(12, 4, 1, 8)))
    // a later key's /Columns must NOT leak into the parms
    assert(PdfLite.decodeParms(
        "<< /DecodeParms << /Predictor 12 >> /W [1 2 1] /Columns 99 >>")
      .contains(PdfLite.PredParams(12, 1, 1, 8)))
    // /DPart is not /DP (word boundary)
    assert(PdfLite.decodeParms("<< /DPart << /Predictor 15 /Columns 7 >> >>").isEmpty)
    // per-filter parms array: first sub-dict wins
    assert(PdfLite.decodeParms("<< /DP [ << /Predictor 2 /Columns 3 >> null ] >>")
      .contains(PdfLite.PredParams(2, 3, 1, 8)))
    // indirect reference: nothing inline to read
    assert(PdfLite.decodeParms("<< /DecodeParms 5 0 R /Columns 9 >>").isEmpty)
  }

  test("PdfLite DCTDecode: embedded JPEGs round-trip byte-exact into ImageIO") {
    import graft.sources.PdfLite
    import graft.multimodal.{JdkCodecs, Multimodal}
    // a real 8x8 JPEG with a deterministic pattern
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, ((x * 37 + y * 101) * 2654435761L & 0xffffff).toInt)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray

    val a85 = ascii85Encode(jpeg)
    val pdf = (
      // a text page, so text extraction coexists with the images
      "1 0 obj << /Length 20 >>\nstream\nBT (hi) Tj ET\nendstream\nendobj\n"
        .getBytes("ISO-8859-1") ++
      (s"2 0 obj << /Type /XObject /Subtype /Image /Width 8 /Height 8" +
        s" /ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode" +
        s" /Length ${jpeg.length} >>\nstream\n").getBytes("ISO-8859-1") ++
      jpeg ++ "\nendstream\nendobj\n".getBytes("ISO-8859-1") ++
      (s"3 0 obj << /Subtype /Image /Width 8 /Height 8" +
        s" /Filter [/ASCII85Decode /DCTDecode] /Length ${a85.length} >>\nstream\n")
        .getBytes("ISO-8859-1") ++
      a85 ++ "\nendstream\nendobj\n".getBytes("ISO-8859-1"))

    val images = PdfLite.extractImages(pdf)
    assert(images.map(_.objNum) == Seq(2, 3), s"got ${images.map(_.objNum)}")
    images.foreach { im =>
      assert((im.width, im.height, im.format) == (8, 8, "jpeg"))
      // byte-exact payload recovery through the container (+ filter chain)
      assert(java.util.Arrays.equals(im.bytes, jpeg),
        s"obj ${im.objNum}: extracted JPEG must equal the embedded bytes")
      // and the REAL codec reads it: decoded dims + pinned feature vector
      val codec = new JdkCodecs.ImageIoCodec
      assert(codec.decodeDims(im.bytes) == (8, 8))
      assert(codec.features(im.bytes, 16).toSeq == codec.features(jpeg, 16).toSeq)
    }
    // text extraction is undisturbed by the binary image objects
    assert(PdfLite.extract(pdf) == Seq("hi"))

    // the DataFrame plumbing: one row per image, no shuffle shape
    import spark.implicits._
    val df = Seq((7L, pdf)).toDF("doc_id", "content")
    val rows = Multimodal.imagesFromPdfs(df)
      .orderBy(col("obj_num")).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
      r.getString(4))).toSeq == Seq((7L, 2, 8, 8, "jpeg"), (7L, 3, 8, 8, "jpeg")))
    rows.foreach(r => assert(java.util.Arrays.equals(r.getAs[Array[Byte]](5), jpeg)))
  }

  test("PdfLite DCTDecode: /Length bounds a payload containing endstream/endobj bytes") {
    import graft.sources.PdfLite
    // adversarial binary: the compressed payload legitimately contains the
    // ASCII sequences a textual scan would stop at — the declared /Length
    // must win, recovering the full payload byte-exact
    val payload = ("ÿØJPEGDATA endstream MORE endobj TAILÿÙ")
      .getBytes("ISO-8859-1")
    val pdf = (
      (s"4 0 obj << /Subtype /Image /Width 3 /Height 2 /Filter /DCTDecode" +
        s" /Length ${payload.length} >>\nstream\n").getBytes("ISO-8859-1") ++
      payload ++ "\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    val images = PdfLite.extractImages(pdf)
    assert(images.map(_.objNum) == Seq(4), s"got ${images.map(_.objNum)}")
    assert(java.util.Arrays.equals(images.head.bytes, payload),
      "payload with in-band endstream/endobj bytes must be /Length-bounded")
    assert((images.head.width, images.head.height) == (3, 2))
  }

  test("PdfLite CID/Type0: /ToUnicode CMap decodes 2-byte Tj/TJ strings") {
    import graft.sources.PdfLite
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |5 beginbfchar
        |<0001> <0048>
        |<0002> <0065>
        |<0003> <006C>
        |<0004> <006F>
        |<0005> <00660069>
        |endbfchar
        |2 beginbfrange
        |<0010> <0019> <0030>
        |<0020> <0022> [<0041> <0042> <0043>]
        |endbfrange
        |endcmap""".stripMargin
    val content =
      "BT /F9 12 Tf <00010002000300030004> Tj T* [<00050010> -300 <0011>] TJ ET"
    val pdf =
      (s"""1 0 obj << /Type /Page /Resources << /Font << /F9 2 0 R >> >> >> endobj
          |2 0 obj << /Type /Font /Subtype /Type0 /BaseFont /TestCID /ToUnicode 3 0 R >> endobj
          |3 0 obj << /Length ${cmap.length} >>
          |stream
          |$cmap
          |endstream
          |endobj
          |4 0 obj << /Length ${content.length} >>
          |stream
          |$content
          |endstream
          |endobj
          |""".stripMargin).getBytes("ISO-8859-1")
    // bfchar spell Hello + the fi ligature; bfrange covers digits (scalar,
    // last-code-unit increment) and ABC (array form); the -300 kern gap
    // still becomes a word boundary AFTER CID decoding
    assert(PdfLite.extract(pdf) == Seq("Hello\nfi0 1"))

    // same content with a corrupt CMap (reversed bfrange): the map is
    // rejected, codes surface as raw control bytes whose lines trim away —
    // no decoded text, and above all no crash
    val corrupt = pdf.map(_.toChar).mkString
      .replace("<0010> <0019> <0030>", "<0019> <0010> <0030>")
      .getBytes("ISO-8859-1")
    assert(!PdfLite.extract(corrupt).exists(_.contains("Hello")),
      "corrupt CMap falls back to raw bytes, not a crash")

    // parseCMap unit edges: 1-byte codespace, multi-unit dst increment
    val one = PdfLite.parseCMap(
      "1 begincodespacerange <00> <FF> endcodespacerange " +
        "1 beginbfrange <41> <43> <00410300> endbfrange")
    assert(one.exists(_.codeBytes == 1))
    assert(one.get.map(0x42) == "A\u0301", "increment applies to the LAST code unit")
    assert(PdfLite.parseCMap("no cmap here").isEmpty)
    assert(PdfLite.parseCMap(
      "1 beginbfrange <00000> <FFFFF> <0000> endbfrange").isEmpty,
      "a range wider than any codespace is rejected, not expanded")
  }

  test("LZW round-trips data large enough to cross the 9->10->11 bit widths") {
    import graft.sources.PdfLite
    val rnd = new scala.util.Random(42)
    val data = Array.fill[Byte](20000)(rnd.nextInt(64).toByte)
    val decoded = PdfLite.lzwDecode(lzwEncode(data))
    assert(decoded.exists(_.sameElements(data)))
  }

  test("LZW decoder matches the JDK TIFF writer's LZW (external ground truth)") {
    import graft.sources.PdfLite
    // write an 8-bit gray image through ImageIO's TIFF writer with LZW
    // compression (TIFF LZW == PDF LZW, EarlyChange=1), pull the compressed
    // strip back out of the container, and decode it with PdfLite.lzwDecode.
    val w = 64; val h = 64
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(7)
    val pixels = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    img.getRaster.setDataElements(0, 0, w, h, pixels)

    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("TIFF").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val tiff = bos.toByteArray

    // minimal TIFF IFD walk: RowsPerStrip must cover the image (single strip)
    val le = tiff(0) == 'I'
    def u16(o: Int): Int =
      if (le) (tiff(o) & 0xFF) | ((tiff(o + 1) & 0xFF) << 8)
      else ((tiff(o) & 0xFF) << 8) | (tiff(o + 1) & 0xFF)
    def u32(o: Int): Int =
      if (le) (tiff(o) & 0xFF) | ((tiff(o + 1) & 0xFF) << 8) |
        ((tiff(o + 2) & 0xFF) << 16) | ((tiff(o + 3) & 0xFF) << 24)
      else ((tiff(o) & 0xFF) << 24) | ((tiff(o + 1) & 0xFF) << 16) |
        ((tiff(o + 2) & 0xFF) << 8) | (tiff(o + 3) & 0xFF)
    val ifd = u32(4)
    val nTags = u16(ifd)
    var compression = -1
    var offsets = Vector.empty[Int]
    var counts = Vector.empty[Int]
    var predictor = 1
    (0 until nTags).foreach { t =>
      val e = ifd + 2 + t * 12
      val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
      def values: Vector[Int] = {
        val sz = if (typ == 3) 2 else 4
        val base = if (cnt * sz <= 4) e + 8 else u32(e + 8)
        (0 until cnt).map(k => if (typ == 3) u16(base + k * 2) else u32(base + k * 4)).toVector
      }
      tag match {
        case 259 => compression = values.head
        case 273 => offsets = values
        case 279 => counts = values
        case 317 => predictor = values.head
        case _ => ()
      }
    }
    assert(compression == 5, s"TIFF writer must emit LZW, got $compression")
    assert(predictor == 1, s"need no predictor for a direct compare, got $predictor")
    val strip = offsets.indices.flatMap { k =>
      val raw = tiff.slice(offsets(k), offsets(k) + counts(k))
      val dec = PdfLite.lzwDecode(raw)
      assert(dec.nonEmpty, s"strip $k must decode")
      dec.get
    }.toArray
    assert(strip.sameElements(pixels),
      "PdfLite LZW must reproduce the JDK TIFF writer's pixel data exactly")
  }

  test("pendingFetches: anti-join idempotence (arxiv_hook.py:126-128 analog)") {
    val requested = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("key", "v")
    val manifest = Seq("b").toDF("key")
    val pending = Sources.pendingFetches(requested, manifest, "key")
    assert(pending.select("key").as[String].collect().toSet == Set("a", "c"))
    // re-running with an updated manifest fetches nothing new
    val done = Seq("a", "b", "c").toDF("key")
    assert(Sources.pendingFetches(requested, done, "key").isEmpty)
  }

  test("model-call accumulators: calls per batch, rows per document") {
    val m = SemanticOps.metrics(spark)
    val (calls0, rows0, retried0) = (m.calls.value, m.rows.value, m.retriedRows.value)
    val docs = Seq((1L, "x y z"), (2L, "p q r")).toDF("doc_id", "text")
      .repartition(1) // one partition => batching is deterministic
    val schema = StructType(Seq(StructField("summary", StringType), StructField("n", LongType)))
    SemanticOps.semanticMap(docs, "S: {{ input.text }}", schema, new StubModelClient(),
      validations = Seq("n < 0"), retries = 2, batchSize = 16).dead.count()
    // 2 rows, batchSize 16 => ceil(2/16) = 1 call per attempt, 3 attempts
    assert(m.calls.value - calls0 == 3,
      s"expected 3 calls (1 batch x 3 attempts), got ${m.calls.value - calls0}")
    assert(m.rows.value - rows0 == 6, "2 rows x 3 attempts")
    assert(m.retriedRows.value - retried0 == 4, "2 rows x 2 retry attempts")
  }
}
