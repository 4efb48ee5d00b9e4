package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Behavior pinned to the reference implementations (SURVEY §5.2 item 1). */
class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def slug1(s: String): String =
    Seq(s).toDF("t").select(TextFns.slugify(col("t"))).as[String].head()

  test("slugify matches reference semantics (zara_hybrid_etl.py:77-80)") {
    assert(slug1("Hello, World!") == "hello-world")
    assert(slug1("  --- ") == "untitled")
    assert(slug1("") == "untitled")
    assert(slug1("A  B   C") == "a-b-c")
    assert(slug1("already-slugged") == "already-slugged")
    assert(slug1("MiXeD CaSe 42") == "mixed-case-42")
  }

  test("slugify is idempotent and emits only [a-z0-9-] (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(60)(rnd.nextString(rnd.nextInt(30))) ++
      Seq.fill(40)(Seq.fill(rnd.nextInt(8))(rnd.alphanumeric.take(5).mkString).mkString(" !@# "))
    val once = samples.toDF("t").select(TextFns.slugify(col("t"))).as[String].collect()
    once.foreach(o => assert(o.matches("[a-z0-9-]+") || o == "untitled", s"bad slug: '$o'"))
    val twice = once.toSeq.toDF("t").select(TextFns.slugify(col("t"))).as[String].collect()
    assert(once.toSeq == twice.toSeq, "slugify must be idempotent")
  }

  test("safe_filename matches reference semantics (arxiv_hook.py:115-122)") {
    def f(s: String): String =
      Seq(s).toDF("t").select(TextFns.safeFilename(col("t"))).as[String].head()
    // python: keep alnum/space/dash/underscore of title[:50], strip, spaces->_
    assert(f("A Paper: On Things!") == "A_Paper_On_Things")
    assert(f("x" * 60) == "x" * 50)
    assert(f("  padded  ") == "padded")
  }

  test("word_count = len(split()) incl. empty edge (zara_hybrid_etl.py:216)") {
    val rows = Seq("a b  c", "", "   ", "one").toDF("t")
      .select(TextFns.wordCount(col("t"))).as[Int].collect()
    assert(rows.toSeq == Seq(3, 0, 0, 1))
  }

  /** Scala port of calculate_quality_score (zara_hybrid_etl.py:212-222)
    * used as the test oracle for the Column implementation.
    */
  private def refScore(h: String, sub: String, body: String, meta: String,
                       pq: Int, kt: Int): Double = {
    var score = 0.0; var maxs = 0.0
    if (h.nonEmpty) { maxs += 0.2; score += (if (h.length >= 10 && h.length <= 60) 0.2 else 0.1) }
    val wc = if (body.nonEmpty) body.trim.split("\\s+").count(_.nonEmpty) else 0
    maxs += 0.2
    score += (if (wc >= 700 && wc <= 1000) 0.2 else if (wc >= 500 && wc <= 1200) 0.15 else if (wc > 200) 0.1 else 0.0)
    maxs += 0.3
    val present = Seq(h, sub, body, meta).count(_.trim.nonEmpty)
    score += present / 4.0 * 0.3
    maxs += 0.15; score += (if (pq >= 2) 0.15 else if (pq >= 1) 0.1 else 0.0)
    maxs += 0.15; score += (if (kt >= 3) 0.15 else if (kt >= 1) 0.1 else 0.0)
    if (maxs > 0) score / maxs else 0.0
  }

  test("qualityScore matches the python reference rubric on branch matrix") {
    val cases = for {
      h <- Seq("", "short", "a headline of a reasonable length", "h" * 70)
      wc <- Seq(0, 150, 300, 600, 800, 1100, 1300)
      pq <- Seq(0, 1, 2)
      kt <- Seq(0, 1, 3)
      meta <- Seq("", "meta")
    } yield (h, "sub", ("w " * wc).trim, meta, pq, kt)

    val df = cases.toDF("h", "sub", "body", "meta", "pq", "kt")
    val got = df.select(
      TextFns.qualityScoreParts(col("h"), col("sub"), col("body"),
        TextFns.wordCount(col("body")), col("meta"), col("pq"), col("kt"))).as[Double].collect()
    cases.zip(got).foreach { case ((h, sub, body, meta, pq, kt), g) =>
      val exp = refScore(h, sub, body, meta, pq, kt)
      assert(math.abs(g - exp) < 1e-9, s"case h=${h.take(8)} wc=${body.length} pq=$pq kt=$kt: got $g want $exp")
    }
  }

  test("fingerprint is deterministic and order-sensitive") {
    val fp = Seq("a b c", "a b c", "c b a").toDF("t")
      .select(TextFns.fingerprint(TextFns.tokens(col("t")))).as[Long].collect()
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
  }

  test("fingerprintPortable: same fold laws, values bounded by the modulus") {
    val fp = Seq("a b c", "a b c", "c b a", "").toDF("t")
      .select(TextFns.fingerprintPortable(TextFns.tokens(col("t")))).as[Long].collect()
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
    assert(fp(3) == 0L, "empty text folds to the init value")
    assert(fp.forall(v => v >= 0 && v < 2147483647L))
  }

  test("langId picks the stopword-dominant language with fixed tie-break") {
    val preds = Seq(
      "the cat and the dog is in the house",
      "le chat et la maison est dans les champs",
      "el gato y la casa es una de los campos",
      "der hund und die katze ist ein tier zu haus",
      "只有中文字符在这里没有别的",
      "zzz qqq xxx").toDF("t").select(TextFns.langId(col("t"))).as[String].collect()
    assert(preds.toSeq == Seq("en", "fr", "es", "de", "zh", "unknown"))
  }

  test("bm25: length normalization, tf saturation, and absent terms") {
    import graft.operators.Bm25
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple"),
      (3L, "cherry banana")).toDF("doc_id", "text")
    val qs = Seq((1L, "apple"), (2L, "banana"), (3L, "durian")).toDF("qid", "qtext")
    val got = Bm25.search(docs, "doc_id", "text", qs, "qid", "qtext", k = 10)
      .select("qid", "doc_id", "rn").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

    // b=0.75 length normalization outranks doc 1's double tf with the
    // 1-token doc 2: tfpart(2) = 2.2/1.75 > tfpart(1) = 4.4/3.65
    assert(got(1L) == Seq(2L, 1L), s"apple ranking: ${got(1L)}")
    // banana: the shorter doc 3 outranks doc 1; doc 2 has no banana
    assert(got(2L) == Seq(3L, 1L), s"banana ranking: ${got(2L)}")
    // a term absent from the corpus returns no rows, not an error
    assert(!got.contains(3L))
  }

  test("bigram-LM nll: improbable transitions score worse than corpus-typical ones") {
    import graft.operators.LmScore
    // docs 1-8 establish "the cat sat" as the dominant pattern; doc 9 walks
    // rare transitions and must score a higher negative log-likelihood.
    val docs = ((1 to 8).map(i => (i.toLong, "the cat sat on the mat")) :+
      (9L, "mat the sat cat on sat")).toDF("doc_id", "text")
    val nll = LmScore.bigramNll(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(nll.size == 9)
    assert(nll(9L) > nll(1L) + 0.5,
      s"rare-transition doc must score clearly worse: ${nll(9L)} vs ${nll(1L)}")
    assert(nll(1L) == nll(5L), "identical docs score identically")
    // single-token and empty docs are excluded, not scored
    val tiny = Seq((1L, "word"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    assert(LmScore.bigramNll(tiny, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("redactPii: emails, IPv4s, phones replaced in order; counts match") {
    val raw = "contact john.doe@example.com or +1 555 867-5309 at 192.168.0.1 " +
      "cc admin@sub.domain.org; not-pii: 1.2 v2.5.1x +notaphone"
    val got = Seq(raw).toDF("t").select(
        TextFns.redactPii(col("t")).as("r"),
        regexp_count(col("t"), lit(TextFns.emailRe)).as("ne"),
        regexp_count(col("t"), lit(TextFns.ipv4Re)).as("ni"),
        regexp_count(col("t"), lit(TextFns.phoneRe)).as("np"))
      .as[(String, Int, Int, Int)].head()
    assert(got._2 == 2 && got._3 == 1 && got._4 == 1, got.toString)
    assert(got._1.contains("<EMAIL>") && got._1.contains("<IP>") && got._1.contains("<PHONE>"))
    assert(!got._1.contains("example.com") && !got._1.contains("192.168.0.1")
      && !got._1.contains("867-5309"))
    assert(got._1.contains("v2.5.1x"), "version strings survive (no \\b match)")
    assert(got._1.contains("+notaphone"), "a bare + without digits survives")
  }

  test("normalize_text: NFC composition, control strip, whitespace collapse") {
    import graft.expressions.NormalizeText
    // decomposed e + combining acute (U+0301) must compose to U+00E9
    assert(NormalizeText.norm("cafe\u0301") == "caf\u00e9")
    assert(NormalizeText.norm("a\u0001b\u0007cd\u007f") == "abcd", "controls stripped")
    assert(NormalizeText.norm("  a\t\tb \n\n c  ") == "a b c", "whitespace collapsed")
    assert(NormalizeText.norm("") == "")

    // the SQL-registered codegen path agrees with the driver function
    graft.expressions.VectorExpressions.register(spark)
    Seq((1L, "cafe\u0301  bar\u0002 baz"), (2L, " x  y "))
      .toDF("id", "t").createOrReplaceTempView("norm_in")
    val got = spark.sql("SELECT id, normalize_text(t) AS n FROM norm_in ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "caf\u00e9 bar baz"), (2L, "x y")))
  }
}
