package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Minimal from-scratch PDF text extractor (S3).
  *
  * The reference's core ingestion parses fetched PDFs into text
  * (arxiv_hook.py:145-182); this container has no PDF library offline, so
  * instead of stubbing, the common case is implemented directly from the PDF
  * spec: locate object streams, FlateDecode them with `java.util.zip`, and
  * interpret the page-content text operators (Tj / ' / TJ arrays, literal
  * + hex strings, Td/TD/T* line moves).
  *
  * Scope (documented, checked by `SourcesSpec`): PDFs with uncompressed,
  * Flate-, LZW-, ASCII85- or ASCIIHex-coded content streams — including
  * filter CHAINS (`/Filter [/ASCII85Decode /FlateDecode]`) — and simple
  * (Type1 / WinAnsi-ish) encodings, i.e. the bulk of text-first PDFs like
  * arXiv papers. PDF 1.5 cross-reference/object streams need no special
  * path here: object streams may only hold non-stream objects, so page
  * CONTENT streams remain ordinary `stream...endstream` segments, which
  * this extractor finds by scanning rather than via the xref.
  *
  * CID/Type0 composite fonts ARE handled when they carry a /ToUnicode CMap
  * (the norm for searchable arXiv PDFs — PyMuPDF reads the same table): a
  * pre-pass links /Font resource names -> font objects -> their /ToUnicode
  * streams, parses the bfchar/bfrange sections, and Tj/TJ strings shown
  * under such a font decode as (usually 2-byte) codes through the map.
  * /DecodeParms predictors on compressed streams (PNG Sub/Up/Average/Paeth
  * and TIFF horizontal, 8-bit) are undone after decompression.
  * Composite fonts WITHOUT /ToUnicode (unsearchable by design) and
  * encryption remain out of scope: their text surfaces as garbage and
  * is routed to the dead-letter channel by a downstream quality guard; a
  * corrupt CMap demotes its font to the same path rather than crashing. A
  * full-fidelity library parser can drop in behind the same `DocParser`
  * trait without touching callers.
  */
object PdfLite {

  /** Extract text, one string per content stream (== per page for PDFs that
    * keep one /Contents stream per page, the overwhelmingly common layout).
    */
  def extract(content: Array[Byte]): Seq[String] = {
    val latin1 = new String(content, ISO_8859_1)
    val cmaps = fontCMaps(content)
    val out = scala.collection.mutable.Buffer.empty[String]
    var idx = 0
    while ({ idx = latin1.indexOf("stream", idx); idx >= 0 }) {
      if (idx >= 3 && latin1.regionMatches(idx - 3, "end", 0, 3)) {
        idx += "stream".length // this is an "endstream" keyword, not a start
      } else {
        val dictStart = math.max(latin1.lastIndexOf("obj", idx), 0)
        val dict = latin1.substring(dictStart, idx)
        var dataStart = idx + "stream".length
        if (dataStart < latin1.length && latin1.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < latin1.length && latin1.charAt(dataStart) == '\n') dataStart += 1
        val end = latin1.indexOf("endstream", dataStart)
        if (end < 0) { idx = dataStart }
        else {
          val raw = content.slice(dataStart, trimEol(latin1, end))
          val decoded = applyFilters(raw, filterChain(dict), decodeParms(dict))
          decoded.map(b => new String(b, ISO_8859_1)).foreach { s =>
            if (s.contains("BT")) {
              val txt = extractTextOps(s, cmaps)
              if (txt.nonEmpty) out += txt
            }
          }
          idx = end + "endstream".length
        }
      }
    }
    out.toSeq
  }

  /** Strip the EOL that precedes `endstream` (stream data per spec ends
    * before it).
    */
  private def trimEol(latin1: String, end: Int): Int = {
    var e = end
    if (e > 0 && latin1.charAt(e - 1) == '\n') e -= 1
    if (e > 0 && latin1.charAt(e - 1) == '\r') e -= 1
    e
  }

  /** Parse the stream dictionary's /Filter entry into the ordered decode
    * chain: a bare name (`/Filter /FlateDecode`) or an array
    * (`/Filter [/ASCII85Decode /FlateDecode]`, applied left to right).
    */
  private[graft] def filterChain(dict: String): Seq[String] = {
    val fIdx = dict.indexOf("/Filter")
    if (fIdx < 0) return Nil
    val rest = dict.substring(fIdx + "/Filter".length)
    "^\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(rest) match {
      case Some(m) => "/([A-Za-z0-9]+)".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
      case None    => "^\\s*/([A-Za-z0-9]+)".r.findFirstMatchIn(rest).map(_.group(1)).toSeq
    }
  }

  /** Predictor parameters from /DecodeParms (also spelled /DP): Predictor,
    * Columns, Colors, BitsPerComponent with the spec's defaults. Only the
    * first parms dict is read — PDFs with per-filter parms arrays apply
    * the predictor to the compression filter, which is the only one that
    * takes parms in practice.
    */
  private[graft] case class PredParams(predictor: Int, columns: Int,
                                       colors: Int, bpc: Int)

  private[graft] def decodeParms(dict: String): Option[PredParams] = {
    // word-bounded key match (/DP must not prefix-match /DPart etc.), then
    // a nesting-aware scan bounded to the key's own << ... >> sub-dict —
    // searching the whole remainder would happily read a /Predictor or
    // /Columns belonging to a LATER key and mis-unpredict the stream
    val km = "/(?:DecodeParms|DP)(?![A-Za-z0-9])".r.findFirstMatchIn(dict)
      .getOrElse(return None)
    var i = km.end
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    // array form ([ <<..>> null ... ], one entry per filter): the predictor
    // belongs to the compression filter, the only parms-taking filter in
    // practice — read the first sub-dict inside the array
    if (i < dict.length && dict.charAt(i) == '[') {
      val close = dict.indexOf(']', i)
      val open = dict.indexOf("<<", i)
      if (open < 0 || (close >= 0 && open > close)) return None
      i = open
    }
    if (i + 1 >= dict.length || dict.charAt(i) != '<' || dict.charAt(i + 1) != '<')
      return None // an indirect reference (`5 0 R`) — nothing inline to read
    val start = i + 2
    var j = start
    var depth = 1
    while (j < dict.length - 1 && depth > 0) {
      if (dict.charAt(j) == '<' && dict.charAt(j + 1) == '<') { depth += 1; j += 2 }
      else if (dict.charAt(j) == '>' && dict.charAt(j + 1) == '>') { depth -= 1; j += 2 }
      else j += 1
    }
    val sub = dict.substring(start, math.max(start, j - 2))
    def num(name: String, default: Int): Int =
      s"/$name\\s+(\\d+)".r.findFirstMatchIn(sub).map(_.group(1).toInt).getOrElse(default)
    val pred = num("Predictor", 1)
    if (pred <= 1) None
    else Some(PredParams(pred, num("Columns", 1), num("Colors", 1),
      num("BitsPerComponent", 8)))
  }

  /** Undo a PNG (predictor >= 10) or TIFF horizontal (predictor 2) row
    * predictor after decompression. PNG rows carry a leading filter-type
    * byte (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) exactly as in the PNG
    * spec; 8-bit components only (the practical case). Malformed input
    * yields None.
    */
  private[graft] def unpredict(data: Array[Byte], p: PredParams): Option[Array[Byte]] =
    try {
      if (p.bpc != 8) return None
      val bpp = math.max(1, p.colors)
      val rowLen = p.columns * bpp
      if (p.predictor == 2) {
        val out = data.clone()
        var r = 0
        while (r * rowLen < out.length) {
          val off = r * rowLen
          var i = bpp
          while (i < rowLen && off + i < out.length) {
            out(off + i) = (out(off + i) + out(off + i - bpp)).toByte
            i += 1
          }
          r += 1
        }
        Some(out)
      } else if (p.predictor >= 10) {
        val stride = rowLen + 1
        if (data.length % stride != 0) return None
        val rows = data.length / stride
        val out = new Array[Byte](rows * rowLen)
        val prev = new Array[Byte](rowLen)
        var r = 0
        while (r < rows) {
          val ft = data(r * stride) & 0xFF
          val src = r * stride + 1
          val dst = r * rowLen
          var i = 0
          while (i < rowLen) {
            val raw = data(src + i) & 0xFF
            val left = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
            val up = prev(i) & 0xFF
            val upLeft = if (i >= bpp) prev(i - bpp) & 0xFF else 0
            val v = ft match {
              case 0 => raw
              case 1 => raw + left
              case 2 => raw + up
              case 3 => raw + ((left + up) / 2)
              case 4 =>
                val pp = left + up - upLeft
                val pa = math.abs(pp - left); val pb = math.abs(pp - up)
                val pc = math.abs(pp - upLeft)
                raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
              case _ => throw new IllegalArgumentException(s"bad PNG filter $ft")
            }
            out(dst + i) = (v & 0xFF).toByte
            i += 1
          }
          System.arraycopy(out, dst, prev, 0, rowLen)
          r += 1
        }
        Some(out)
      } else Some(data)
    } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }

  /** Run the filter chain; an unknown or binary filter (DCTDecode images,
    * JBIG2, ...) or a corrupt payload yields None — the stream is skipped,
    * never a crash (failures belong to the dead-letter channel upstream).
    * A /DecodeParms predictor is undone after the (single, in practice)
    * compression filter in the chain.
    */
  private def applyFilters(raw: Array[Byte], chain: Seq[String],
                           parms: Option[PredParams] = None): Option[Array[Byte]] =
    chain.foldLeft(Option(raw)) { (acc, f) =>
      acc.flatMap { b =>
        f match {
          case "FlateDecode"    => inflate(b).flatMap(d => parms.fold(Option(d))(unpredict(d, _)))
          case "LZWDecode"      => lzwDecode(b).flatMap(d => parms.fold(Option(d))(unpredict(d, _)))
          case "ASCII85Decode"  => ascii85Decode(b)
          case "ASCIIHexDecode" => asciiHexDecode(b)
          case _                => None
        }
      }
    }

  /** ASCII85 (btoa) decode: 5 chars '!'..'u' -> 4 bytes base-85, 'z' = four
    * zero bytes, optional `<~ ~>` frame, whitespace ignored, final partial
    * group of g chars yields g-1 bytes (padded with 'u' per spec).
    */
  private[graft] def ascii85Decode(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val s = new String(b, ISO_8859_1)
      val from = { val i = s.indexOf("<~"); if (i >= 0) i + 2 else 0 }
      val end = { val i = s.indexOf("~>", from); if (i >= 0) i else s.length }
      val out = new java.io.ByteArrayOutputStream()
      val grp = new Array[Long](5)
      var g = 0
      def flush(k: Int): Unit = {
        var v = 0L
        var j = 0
        while (j < 5) { v = v * 85 + (if (j < k) grp(j) else 84L); j += 1 }
        val bytes = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
          ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
        out.write(bytes, 0, k - 1)
      }
      var i = from
      while (i < end) {
        val c = s.charAt(i)
        if (c.isWhitespace) ()
        else if (c == 'z' && g == 0) out.write(Array[Byte](0, 0, 0, 0))
        else if (c >= '!' && c <= 'u') {
          grp(g) = (c - '!').toLong; g += 1
          if (g == 5) { flush(5); g = 0 }
        }
        else throw new IllegalArgumentException(s"bad ascii85 char '$c'")
        i += 1
      }
      if (g == 1) throw new IllegalArgumentException("ascii85 group of one char")
      if (g > 1) flush(g)
      Some(out.toByteArray)
    } catch { case _: IllegalArgumentException => None }

  /** ASCIIHex decode: hex pairs up to `>`, whitespace ignored, odd final
    * digit padded with 0.
    */
  private[graft] def asciiHexDecode(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val s = new String(b, ISO_8859_1)
      val end = { val i = s.indexOf('>'); if (i >= 0) i else s.length }
      val hex = s.substring(0, end).filterNot(_.isWhitespace)
      val padded = if (hex.length % 2 == 1) hex + "0" else hex
      if (!padded.forall(c => c.isDigit || ('a' to 'f').contains(c.toLower)))
        throw new IllegalArgumentException("non-hex digit")
      Some(padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    } catch { case _: IllegalArgumentException | _: NumberFormatException => None }

  /** LZW decode, PDF/TIFF variant: variable 9-12 bit MSB-first codes,
    * clear = 256 resets the table, EOD = 257, EarlyChange = 1 (the PDF
    * default: code width grows one entry EARLY, at table sizes 511/1023/
    * 2047). Corrupt codes yield None, not a crash.
    */
  private[graft] def lzwDecode(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      var table = scala.collection.mutable.ArrayBuffer.tabulate(258)(i =>
        if (i < 256) Array(i.toByte) else null)
      var codeLen = 9
      var prev: Array[Byte] = null
      var bitBuf = 0L
      var bits = 0
      var i = 0
      var done = false
      while (i < b.length && !done) {
        bitBuf = (bitBuf << 8) | (b(i) & 0xFFL); bits += 8; i += 1
        while (bits >= codeLen && !done) {
          val code = ((bitBuf >> (bits - codeLen)) & ((1L << codeLen) - 1)).toInt
          bits -= codeLen
          if (code == 256) {
            table = scala.collection.mutable.ArrayBuffer.tabulate(258)(k =>
              if (k < 256) Array(k.toByte) else null)
            codeLen = 9
            prev = null
          } else if (code == 257) done = true
          else {
            val entry =
              if (code < table.length && table(code) != null) table(code)
              else if (code == table.length && prev != null) prev :+ prev(0)
              else throw new IllegalArgumentException(s"bad LZW code $code")
            out.write(entry)
            if (prev != null) table += (prev :+ entry(0))
            prev = entry
            if (table.length >= (1 << codeLen) - 1 && codeLen < 12) codeLen += 1
          }
        }
      }
      Some(out.toByteArray)
    } catch { case _: IllegalArgumentException => None }

  private def inflate(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new java.util.zip.DataFormatException("truncated")
        out.write(buf, 0, n)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }

  /** An image XObject lifted out of a PDF: dict-declared pixel dims and the
    * image payload in a format `javax.imageio` reads directly.
    */
  case class PdfImage(objNum: Int, width: Int, height: Int,
                      format: String, bytes: Array[Byte])

  /** Extract /Subtype /Image XObjects whose filter chain ends in
    * /DCTDecode — the embedded-JPEG case (the dominant image encoding in
    * arXiv PDFs; the reference's PyMuPDF path reads the same objects,
    * arxiv_hook.py:145-182). A DCTDecode payload IS a JPEG byte stream,
    * and the JDK's ImageIO decodes JPEG natively, so the extracted bytes
    * feed `JdkCodecs.ImageIoCodec` (dims / features / resize) with no
    * external library. Wrapping ASCII85/ASCIIHex/Flate stages before the
    * DCT stage are undone with the existing filter machinery; JPXDecode /
    * JBIG2 / CCITT images stay out of scope (skipped, never a crash).
    */
  def extractImages(content: Array[Byte]): Seq[PdfImage] = {
    val latin1 = new String(content, ISO_8859_1)
    "(?s)(\\d+)\\s+\\d+\\s+obj\\b(.*?)endobj".r.findAllMatchIn(latin1).flatMap { m =>
      val num = m.group(1).toInt
      val body = m.group(2)
      val si = body.indexOf("stream")
      if (si < 0) None
      else {
        val dict = body.substring(0, si)
        val chain = filterChain(dict)
        if (!"/Subtype\\s*/Image\\b".r.findFirstIn(dict).isDefined ||
            chain.isEmpty || chain.last != "DCTDecode") None
        else {
          var ds = si + "stream".length
          if (ds < body.length && body.charAt(ds) == '\r') ds += 1
          if (ds < body.length && body.charAt(ds) == '\n') ds += 1
          // JPEG payloads are raw binary and may contain "endstream" (or
          // "endobj", which truncates the object-regex body) as byte
          // sequences — bound by the dict's direct /Length when present,
          // slicing the FULL document string so an early in-payload
          // "endobj" can't clip it; verified by the endstream keyword
          // that must follow. Textual scan only as fallback.
          val absDs = m.start(2) + ds
          // direct integers only — "/Length 12 0 R" is an indirect
          // reference whose leading number is NOT the byte count. The
          // (?!\d) pins the capture to the FULL number first: without it,
          // backtracking lets "/Length 12 0 R" match a truncated "1"
          // (the ref-shaped lookahead then fails on "2 0 R" instead of
          // rejecting), probing a bogus end offset
          val viaLength = "/Length\\s+(\\d+)(?!\\d)(?!\\s+\\d+\\s+R)".r
            .findFirstMatchIn(dict).flatMap { lm =>
              val end = absDs + lm.group(1).toInt
              if (end > latin1.length) None
              else {
                var p = end
                while (p < latin1.length &&
                  (latin1.charAt(p) == '\r' || latin1.charAt(p) == '\n' ||
                   latin1.charAt(p) == ' ')) p += 1
                if (latin1.startsWith("endstream", p))
                  Some(latin1.substring(absDs, end).getBytes(ISO_8859_1))
                else None
              }
            }
          // the textual fallback can truncate a binary payload that
          // happens to contain "endstream"/"endobj" bytes — accept its
          // slice only when it looks like a COMPLETE JPEG (SOI..EOI);
          // otherwise skip, never emit corrupt bytes downstream
          def completeJpeg(b: Array[Byte]): Boolean =
            b.length >= 4 &&
              (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
              (b(b.length - 2) & 0xff) == 0xff && (b(b.length - 1) & 0xff) == 0xd9
          val textArmored = chain.dropRight(1)
            .forall(f => f == "ASCII85Decode" || f == "ASCIIHexDecode")
          val raw = viaLength.orElse {
            val e = body.indexOf("endstream", ds)
            if (e < 0) None
            else Some(body.substring(ds, trimEol(body, e)).getBytes(ISO_8859_1))
              .filter(b =>
                if (chain.length > 1) textArmored // binary pre-filters need /Length
                else completeJpeg(b))
          }
          def dim(name: String): Int =
            s"/$name\\s+(\\d+)".r.findFirstMatchIn(dict)
              .map(_.group(1).toInt).getOrElse(-1)
          // undo everything BEFORE the DCT stage; the JPEG itself is the
          // payload (ImageIO consumes it as-is)
          raw.flatMap(applyFilters(_, chain.dropRight(1), decodeParms(dict)))
            .map(jpeg => PdfImage(num, dim("Width"), dim("Height"), "jpeg", jpeg))
        }
      }
    }.toSeq
  }

  /** A parsed /ToUnicode CMap: fixed code width in bytes (from the
    * codespacerange, 2 for the Identity-H composite fonts that dominate real
    * arXiv PDFs) and the code -> Unicode-string mapping.
    */
  private[graft] case class CidMap(codeBytes: Int, map: Map[Int, String])

  /** Parse a decoded /ToUnicode CMap stream (bfchar + bfrange sections,
    * scalar and array range forms, UTF-16BE destinations). Any structural
    * problem — or a range expansion past the 65,536 codes a codespace can
    * hold — yields None: the font then decodes as raw bytes and its garbage
    * text is routed to the dead-letter channel downstream, never a crash.
    */
  private[graft] def parseCMap(text: String): Option[CidMap] =
    try {
      def utf16(hex: String): String = {
        val padded = if (hex.length % 4 == 0) hex else ("0" * (4 - hex.length % 4)) + hex
        new String(padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
          java.nio.charset.StandardCharsets.UTF_16BE)
      }
      // dst of a scalar bfrange increments its LAST UTF-16 code unit
      def addToLast(hex: String, inc: Int): String = {
        val padded = if (hex.length % 4 == 0) hex else ("0" * (4 - hex.length % 4)) + hex
        val units = padded.grouped(4).toArray
        units(units.length - 1) = f"${Integer.parseInt(units.last, 16) + inc}%04x"
        utf16(units.mkString)
      }
      val codeBytes = "begincodespacerange\\s*<([0-9A-Fa-f]+)>".r
        .findFirstMatchIn(text).map(_.group(1).length / 2)
        .filter(w => w == 1 || w == 2).getOrElse(2)
      val m = scala.collection.mutable.Map.empty[Int, String]
      for (sec <- "(?s)beginbfchar(.*?)endbfchar".r.findAllMatchIn(text);
           mm <- "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>".r.findAllMatchIn(sec.group(1)))
        m(Integer.parseInt(mm.group(1), 16)) = utf16(mm.group(2))
      for (sec <- "(?s)beginbfrange(.*?)endbfrange".r.findAllMatchIn(text)) {
        val body = sec.group(1)
        for (mm <- "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*\\[([^\\]]*)\\]".r
               .findAllMatchIn(body)) {
          val lo = Integer.parseInt(mm.group(1), 16)
          "<([0-9A-Fa-f]+)>".r.findAllMatchIn(mm.group(3)).map(_.group(1))
            .zipWithIndex.foreach { case (d, i) => m(lo + i) = utf16(d) }
        }
        // strip array ranges so the scalar regex can't match inside their
        // bracketed destination lists
        val scalar = body.replaceAll(
          "<[0-9A-Fa-f]+>\\s*<[0-9A-Fa-f]+>\\s*\\[[^\\]]*\\]", " ")
        for (mm <- "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>".r
               .findAllMatchIn(scalar)) {
          val lo = Integer.parseInt(mm.group(1), 16)
          val hi = Integer.parseInt(mm.group(2), 16)
          if (hi < lo || hi - lo >= 65536) throw new IllegalArgumentException("bad bfrange")
          var c = lo
          while (c <= hi) { m(c) = addToLast(mm.group(3), c - lo); c += 1 }
        }
        if (m.size > 65536) throw new IllegalArgumentException("CMap too large")
      }
      if (m.isEmpty) None else Some(CidMap(codeBytes, m.toMap))
    } catch { case _: IllegalArgumentException | _: NumberFormatException => None }

  /** Link /Font resource names to parsed /ToUnicode CMaps: a lightweight
    * object-graph pass (objects by number, font dicts' /ToUnicode refs, the
    * referenced streams decoded through the same filter chains as content).
    * Latin-1 round-trips bytes losslessly, so substrings of the decoded
    * document recover exact stream bytes. Any failure -> empty map (raw-byte
    * fallback), never a crash.
    */
  private[graft] def fontCMaps(content: Array[Byte]): Map[String, CidMap] =
    try {
      val latin1 = new String(content, ISO_8859_1)
      val objs = "(?s)(\\d+)\\s+\\d+\\s+obj\\b(.*?)endobj".r.findAllMatchIn(latin1)
        .map(m => m.group(1).toInt -> m.group(2)).toMap
      val fontToCmapRef = objs.flatMap { case (num, body) =>
        if (body.contains("/Font") || body.contains("/Type0"))
          "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(body)
            .map(m => num -> m.group(1).toInt)
        else None
      }
      val cmapByRef = fontToCmapRef.values.toSet.iterator.flatMap { (ref: Int) =>
        objs.get(ref).flatMap { body =>
          val si = body.indexOf("stream")
          if (si < 0) None
          else {
            var ds = si + "stream".length
            if (ds < body.length && body.charAt(ds) == '\r') ds += 1
            if (ds < body.length && body.charAt(ds) == '\n') ds += 1
            val e = body.indexOf("endstream", ds)
            if (e < 0) None
            else applyFilters(body.substring(ds, trimEol(body, e)).getBytes(ISO_8859_1),
                filterChain(body.substring(0, si)), decodeParms(body.substring(0, si)))
              .flatMap(b => parseCMap(new String(b, ISO_8859_1)))
              .map(ref -> _)
          }
        }
      }.toMap
      // /Font resource dicts (nesting-aware scan to the matching >>)
      val names = scala.collection.mutable.Map.empty[String, Int]
      for (m <- "/Font\\s*<<".r.findAllMatchIn(latin1)) {
        var i = m.end; var depth = 1
        val start = i
        while (i < latin1.length - 1 && depth > 0) {
          if (latin1.charAt(i) == '<' && latin1.charAt(i + 1) == '<') { depth += 1; i += 2 }
          else if (latin1.charAt(i) == '>' && latin1.charAt(i + 1) == '>') { depth -= 1; i += 2 }
          else i += 1
        }
        for (e <- "/([A-Za-z0-9]+)\\s+(\\d+)\\s+\\d+\\s+R".r
               .findAllMatchIn(latin1.substring(start, math.max(start, i - 2))))
          names(e.group(1)) = e.group(2).toInt
      }
      names.iterator.flatMap { case (n, fref) =>
        fontToCmapRef.get(fref).flatMap(cmapByRef.get).map(n -> _)
      }.toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** Decode a raw (latin-1 byte-per-char) shown string as fixed-width CID
    * codes through a CMap; unmapped codes and a trailing partial code are
    * dropped (PyMuPDF's behavior for unmapped CIDs, minus the U+FFFD noise).
    */
  private def decodeCid(raw: String, cm: CidMap): String = {
    val sb = new StringBuilder
    val w = cm.codeBytes
    var i = 0
    while (i + w <= raw.length) {
      var code = 0; var j = 0
      while (j < w) { code = (code << 8) | (raw.charAt(i + j) & 0xFF); j += 1 }
      cm.map.get(code).foreach(sb ++= _)
      i += w
    }
    sb.toString
  }

  /** Interpret the text-showing subset of the content-stream language.
    * Kerning gaps below -150/1000 em in TJ arrays become spaces (the
    * standard word-boundary heuristic). The active font (`/Fx ... Tf`) is
    * tracked; strings shown under a font with a /ToUnicode CMap decode as
    * CID codes, everything else stays byte-per-char.
    */
  private[sources] def extractTextOps(s: String,
                                      cmaps: Map[String, CidMap] = Map.empty): String = {
    val lines = scala.collection.mutable.Buffer(new StringBuilder)
    def cur = lines.last
    def newline(): Unit = if (cur.nonEmpty) lines += new StringBuilder
    var pending: List[String] = Nil // strings awaiting their operator
    var lastNum = 0.0
    var lastName = ""
    var curFont = ""
    var inText = false
    // kern-gap spaces are injected POST-decode markers, not CID bytes; the
    // object identity of this constant tells them apart from a legitimate
    // one-char shown string
    val kernSpace = new String(" ")
    def shown(p: String): String = cmaps.get(curFont) match {
      case Some(cm) if p.asInstanceOf[AnyRef] ne kernSpace => decodeCid(p, cm)
      case _ => p
    }
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { val (str, j) = literalString(s, i); pending ::= str; i = j }
      else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') {
        val (str, j) = hexString(s, i); pending ::= str; i = j
      }
      else if (c == '<') i += 2 // dict open <<
      else if (c == '[' || c == ']' || c == '>') i += 1
      else if (c == '/') {
        i += 1
        val start = i
        while (i < n && !s.charAt(i).isWhitespace && !"()<>[]/".contains(s.charAt(i))) i += 1
        lastName = s.substring(start, i)
      }
      else if (c == '-' || c == '.' || c.isDigit) {
        val start = i
        i += 1
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        lastNum = try s.substring(start, i).toDouble catch { case _: NumberFormatException => 0.0 }
        // a large negative kern between TJ strings is a word boundary
        if (inText && pending.nonEmpty && lastNum < -150.0) pending ::= kernSpace
      }
      else {
        val start = i
        while (i < n && !s.charAt(i).isWhitespace && !"()<>[]/".contains(s.charAt(i))) i += 1
        s.substring(start, i) match {
          case "BT" => inText = true; pending = Nil
          case "ET" => inText = false; pending = Nil
          case "Tf" => curFont = lastName
          case "Tj" | "TJ" =>
            if (inText) cur ++= pending.reverse.map(shown).mkString("").replaceAll(" +", " ")
            pending = Nil
          case "'" | "\"" =>
            if (inText) { newline(); cur ++= pending.reverse.map(shown).mkString("") }
            pending = Nil
          case "Td" | "TD" | "T*" =>
            if (inText) newline()
            pending = Nil
          case _ => () // Tm, graphics operators, ...
        }
      }
    }
    lines.map(_.toString).mkString("\n").trim
  }

  /** Parse a PDF literal string starting at `(`; returns (text, next index).
    * Handles nesting, the standard escapes, and octal codes.
    */
  private def literalString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              sb += v.toChar; i = j
            case '\r' =>
              // backslash-EOL is a line continuation: produces NO characters
              i += (if (i + 2 < s.length && s.charAt(i + 2) == '\n') 3 else 2)
            case '\n' => i += 2
            case other => sb += other; i += 2
          }
        case '(' => depth += 1; sb += '('; i += 1
        case ')' => depth -= 1; if (depth > 0) sb += ')'; i += 1
        case ch => sb += ch; i += 1
      }
    }
    (sb.toString, i)
  }

  /** Parse a hex string starting at `<`; returns (text, next index). */
  private def hexString(s: String, start: Int): (String, Int) = {
    val end = s.indexOf('>', start + 1)
    if (end < 0) return ("", s.length)
    val hex = s.substring(start + 1, end).filterNot(_.isWhitespace)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val sb = new StringBuilder
    var i = 0
    while (i + 2 <= padded.length) {
      try sb += Integer.parseInt(padded.substring(i, i + 2), 16).toChar
      catch { case _: NumberFormatException => () }
      i += 2
    }
    (sb.toString, end + 1)
  }
}

/** `DocParser` over PdfLite: one row per extracted content stream/page. */
class PdfLiteParser extends Sources.DocParser {
  override def parse(path: String, content: Array[Byte]): Seq[String] =
    PdfLite.extract(content)
}
