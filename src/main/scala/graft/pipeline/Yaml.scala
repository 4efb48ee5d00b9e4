package graft.pipeline

/** Hand-rolled parser for the YAML subset that DocETL pipeline configs use
  * (reference: docetl/config/article_pipeline.yaml.j2, paper_extraction.yaml
  * — indentation-nested maps, `- ` lists with inline first entry, scalars,
  * quoted strings, inline `[a, b]` lists, and `|` block scalars). The
  * container resolves no external libraries (zero egress), so the loader is
  * self-contained; anything outside this subset fails loudly rather than
  * parsing wrong.
  *
  * Not supported (by design): anchors/aliases, multi-doc streams, flow maps
  * `{a: b}`, folded scalars `>`, tags. Comments (`#`) are stripped outside
  * quotes.
  */
object Yaml {

  private case class Line(indent: Int, text: String, raw: String)

  def parse(text: String): Any = {
    // blank lines are dropped everywhere, including block-scalar bodies
    // (documented subset restriction)
    val lines = text.linesIterator
      .filter(_.trim.nonEmpty)
      .map(raw => Line(raw.takeWhile(_ == ' ').length, raw.trim, raw))
      .toVector
    val (v, next) = parseBlock(lines, 0, if (lines.isEmpty) 0 else firstContent(lines, 0))
    require(next >= lines.length || lines(next).text.isEmpty,
      s"trailing unparsed content at: ${lines(next).raw}")
    v
  }

  private def firstContent(lines: Vector[Line], i: Int): Int =
    if (i < lines.length) lines(i).indent else 0

  private def stripComment(s: String): String = {
    var inS = false; var inD = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (c == '#' && !inS && !inD && (i == 0 || s.charAt(i - 1).isWhitespace))
        return s.substring(0, i).stripTrailing()
      i += 1
    }
    s
  }

  private val KeyRe = "^([A-Za-z0-9_.-]+):(.*)$".r

  /** Parse the block starting at `i` whose items sit at `indent`. */
  private def parseBlock(lines: Vector[Line], i: Int, indent: Int): (Any, Int) = {
    if (i >= lines.length) return (Map.empty[String, Any], i)
    if (lines(i).text.startsWith("- ") || lines(i).text == "-") parseList(lines, i, indent)
    else parseMap(lines, i, indent)
  }

  private def parseMap(lines: Vector[Line], start: Int, indent: Int): (Map[String, Any], Int) = {
    var m = Vector.empty[(String, Any)]
    var i = start
    while (i < lines.length && lines(i).indent == indent && !lines(i).text.startsWith("- ")) {
      stripComment(lines(i).text) match {
        case KeyRe(key, rest0) =>
          val rest = rest0.trim
          if (rest == "|" || rest == "|-") {
            val (s, n) = blockScalar(lines, i + 1, indent)
            m :+= key -> s; i = n
          } else if (rest.isEmpty) {
            // nested block (map or list) — or an empty value
            if (i + 1 < lines.length && lines(i + 1).indent > indent) {
              val (v, n) = parseBlock(lines, i + 1, lines(i + 1).indent)
              m :+= key -> v; i = n
            } else if (i + 1 < lines.length && lines(i + 1).indent == indent &&
                lines(i + 1).text.startsWith("- ")) {
              // list items at the SAME indent as the key (common YAML style)
              val (v, n) = parseList(lines, i + 1, indent)
              m :+= key -> v; i = n
            } else { m :+= key -> null; i += 1 }
          } else { m :+= key -> scalar(rest); i += 1 }
        case other =>
          throw new IllegalArgumentException(s"expected 'key:' at: ${lines(i).raw}")
      }
    }
    (m.toMap, i)
  }

  private def parseList(lines: Vector[Line], start: Int, indent: Int): (Seq[Any], Int) = {
    var out = Vector.empty[Any]
    var i = start
    while (i < lines.length && lines(i).indent == indent &&
        (lines(i).text.startsWith("- ") || lines(i).text == "-")) {
      val inline = stripComment(if (lines(i).text == "-") "" else lines(i).text.substring(2)).trim
      val itemIndent = indent + 2
      inline match {
        case KeyRe(key, rest0) =>
          // map item with its first entry on the dash line; the rest of the
          // item's entries follow at indent+2
          val rest = rest0.trim
          val (first, nAfterFirst) =
            if (rest == "|" || rest == "|-") {
              val (s, n) = blockScalar(lines, i + 1, itemIndent)
              (key -> (s: Any), n)
            } else if (rest.isEmpty && i + 1 < lines.length && lines(i + 1).indent > itemIndent) {
              val (v, n) = parseBlock(lines, i + 1, lines(i + 1).indent)
              (key -> v, n)
            } else (key -> scalar(rest), i + 1)
          val (restMap, n2) =
            if (nAfterFirst < lines.length && lines(nAfterFirst).indent == itemIndent &&
                !lines(nAfterFirst).text.startsWith("- "))
              parseMap(lines, nAfterFirst, itemIndent)
            else (Map.empty[String, Any], nAfterFirst)
          out :+= (Map(first) ++ restMap)
          i = n2
        case "" =>
          // nested structure under a bare dash
          if (i + 1 < lines.length && lines(i + 1).indent > indent) {
            val (v, n) = parseBlock(lines, i + 1, lines(i + 1).indent)
            out :+= v; i = n
          } else { out :+= null; i += 1 }
        case s => out :+= scalar(s); i += 1
      }
    }
    (out, i)
  }

  /** `|` literal block: all following lines more-indented than the key,
    * dedented by the first body line's indent, joined with newlines.
    */
  private def blockScalar(lines: Vector[Line], start: Int, keyIndent: Int): (String, Int) = {
    var i = start
    var body = Vector.empty[String]
    val bodyIndent = if (i < lines.length) lines(i).indent else keyIndent + 2
    while (i < lines.length && (lines(i).indent > keyIndent || lines(i).raw.trim.isEmpty)) {
      body :+= lines(i).raw.drop(bodyIndent)
      i += 1
    }
    (body.mkString("\n").stripTrailing(), i)
  }

  private[pipeline] def scalar(s: String): Any = s match {
    case "" => null
    case "null" | "~" => null
    case "true" => true
    case "false" => false
    case q if q.length >= 2 && q.head == '"' && q.last == '"' =>
      q.substring(1, q.length - 1).replace("\\\"", "\"").replace("\\n", "\n")
    case q if q.length >= 2 && q.head == '\'' && q.last == '\'' =>
      q.substring(1, q.length - 1).replace("''", "'")
    case l if l.startsWith("[") && l.endsWith("]") =>
      val inner = l.substring(1, l.length - 1).trim
      if (inner.isEmpty) Seq.empty[Any]
      else inner.split(",").map(x => scalar(x.trim)).toSeq
    case i if i.matches("-?\\d+") => i.toLong
    case d if d.matches("-?\\d*\\.\\d+([eE][+-]?\\d+)?") => d.toDouble
    case other => other
  }
}

/** DocETL-shaped YAML config -> PipelineSpec (the declarative entry point;
  * the reference renders such configs per run, zara_hybrid_etl.py:168-193).
  *
  * Recognized op shapes (`operations:` list):
  *   - `type: map`    -> MapOp (prompt, output.schema, validate list,
  *                       num_retries_on_validate_failure, optimize)
  *   - `type: reduce` -> ReduceOp (reduce_key or reduce_keys, prompt,
  *                       output.schema, fold_batch_size -> fanIn)
  *   - `type: split`  -> SplitOp (split_key, method_kwargs.chunk_size /
  *                       chunk_overlap — paper_extraction.yaml:17-24 shape)
  *   - `type: filter` -> FilterOp when `predicate` present (Spark SQL expr),
  *                       JudgeFilterOp when `prompt` present (P6)
  * Validation expressions are Spark SQL predicates over output columns (the
  * engine's P4 form — the reference's Python `eval` strings are not
  * executed, by design).
  */
object YamlSpec {

  def load(text: String): PipelineSpec = {
    val root = Yaml.parse(text) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => throw new IllegalArgumentException(s"top level must be a map, got $other")
    }
    val name = root.get("name").map(_.toString)
      .orElse(root.get("pipeline").collect { case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]].get("name").map(_.toString) }.flatten)
      .getOrElse("pipeline")
    val ops = root.get("operations") match {
      case Some(s: Seq[_]) => s.map(o => opFrom(o.asInstanceOf[Map[String, Any]]))
      case _ => throw new IllegalArgumentException("operations: list required")
    }
    val spec = PipelineSpec(name, ops)
    Validator.validate(spec)
    spec
  }

  private def str(m: Map[String, Any], k: String): String =
    m.getOrElse(k, throw new IllegalArgumentException(s"op missing '$k': $m")).toString

  private def schemaOf(m: Map[String, Any]): Map[String, String] = {
    val out = m.get("output") match {
      case Some(o: Map[_, _]) => o.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException(s"op missing output.schema: $m")
    }
    out.get("schema") match {
      case Some(sc: Map[_, _]) =>
        sc.asInstanceOf[Map[String, Any]].map {
          case (k, v: String) => k -> v
          case (k, other) => throw new IllegalArgumentException(
            s"nested schema group '$k' not supported by the YAML loader (use the Scala DSL): $other")
        }
      case _ => throw new IllegalArgumentException(s"op missing output.schema: $m")
    }
  }

  private def opFrom(m: Map[String, Any]): OpSpec = {
    val name = str(m, "name")
    str(m, "type") match {
      case "map" =>
        MapOp(name, str(m, "prompt"), schemaOf(m),
          validations = m.get("validate") match {
            case Some(s: Seq[_]) => s.map(_.toString)
            case _ => Nil
          },
          retries = m.get("num_retries_on_validate_failure")
            .map(_.toString.toInt).getOrElse(2),
          optimize = m.get("optimize").contains(true))
      case "reduce" =>
        val keys = m.get("reduce_keys").orElse(m.get("reduce_key")) match {
          case Some(s: Seq[_]) => s.map(_.toString)
          case Some(s) => Seq(s.toString)
          case None => throw new IllegalArgumentException(s"reduce op missing reduce_key: $m")
        }
        ReduceOp(name, keys, str(m, "prompt"), schemaOf(m),
          fanIn = m.get("fold_batch_size").map(_.toString.toInt).getOrElse(8))
      case "split" =>
        val kw = m.get("method_kwargs") match {
          case Some(k: Map[_, _]) => k.asInstanceOf[Map[String, Any]]
          case _ => Map.empty[String, Any]
        }
        SplitOp(name, str(m, "split_key"),
          chunkSize = kw.get("chunk_size").map(_.toString.toInt).getOrElse(3000),
          overlap = kw.get("chunk_overlap").map(_.toString.toInt).getOrElse(300),
          neighbors = kw.get("neighbors").map(_.toString.toInt).getOrElse(0))
      case "filter" =>
        (m.get("predicate"), m.get("prompt")) match {
          case (Some(p), _) => FilterOp(name, p.toString)
          case (None, Some(p)) => JudgeFilterOp(name, p.toString)
          case _ => throw new IllegalArgumentException(
            s"filter op needs 'predicate' (SQL) or 'prompt' (judge): $m")
        }
      case other => throw new IllegalArgumentException(s"unknown op type: $other")
    }
  }
}
