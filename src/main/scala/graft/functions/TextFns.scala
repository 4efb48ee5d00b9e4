package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic scalar text functions.
  *
  * Semantics are pinned to the reference implementation (citations below point
  * into /root/reference). Everything here is a pure Column expression —
  * Catalyst folds these into whole-stage codegen; no UDF/serialization cost,
  * and they distribute trivially at any scale.
  */
object TextFns {

  /** Slug for output paths. Reference: airflow/dags/zara_hybrid_etl.py:77-80
    * (lowercase, non-alnum runs -> "-", squeeze repeats, strip, default
    * "untitled").
    */
  def slugify(c: Column): Column = {
    val s = trim(
      regexp_replace(regexp_replace(lower(coalesce(c, lit(""))), "[^a-z0-9]+", "-"), "-{2,}", "-"),
      "-")
    when(s === "", lit("untitled")).otherwise(s)
  }

  /** Filesystem-safe filename from a title.
    * Reference: airflow/plugins/arxiv_hook.py:115-122 — keep alnum, space,
    * dash, underscore of the first 50 chars; spaces -> "_".
    */
  def safeFilename(c: Column): Column =
    regexp_replace(
      trim(regexp_replace(substring(coalesce(c, lit("")), 1, 50), "[^A-Za-z0-9 _-]", "")),
      " ", "_")

  /** Whitespace tokenization; empty/null-safe (empty -> empty array). */
  def tokens(c: Column): Column =
    when(length(trim(coalesce(c, lit("")))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Word count = len(body.split()).
    * Reference: airflow/dags/zara_hybrid_etl.py:216.
    */
  def wordCount(c: Column): Column = size(tokens(c))

  /** Adjacent-token bigrams as "a b" strings. */
  def bigrams(toks: Column): Column = {
    val n = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n), (a, b) => concat(a, lit(" "), b))
  }

  /** Word shingles of size k (for MinHash / Jaccard dedup).
    *
    * Built as k-way zip_with over k shifted slices rather than
    * element_at-in-a-lambda: expression lambdas have no let-binding, so a
    * `transform(sequence(...), i => element_at(toks, i))` shape re-evaluates
    * the whole tokenization chain per position (measured ~40x slower).
    */
  def wordShingles(toks: Column, k: Int): Column = {
    val n = greatest(size(toks) - (k - 1), lit(0))
    (0 until k)
      .map(j => slice(toks, lit(j + 1), n))
      .reduce((acc, s) => zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
  }

  /** Weighted article-quality rubric, decomposed form.
    *
    * Exact semantics of reference airflow/dags/zara_hybrid_etl.py:212-222:
    *  - headline present (len>0): contributes to max; 0.2 if 10<=len<=60 else 0.1
    *  - word count: 0.2 if 700..1000, 0.15 if 500..1200, 0.1 if >200, else 0
    *  - 0.3 * (fraction of {headline, subtitle, body, meta} non-blank after trim)
    *  - pull quotes: 0.15 if >=2, 0.1 if >=1
    *  - key takeaways: 0.15 if >=3, 0.1 if >=1
    *  - normalized by attainable max (0.8 when headline missing, else 1.0)
    */
  def qualityScoreParts(headline: Column, subtitle: Column, body: Column,
                        wc: Column, meta: Column,
                        nQuotes: Column, nTakeaways: Column): Column = {
    val h    = coalesce(headline, lit(""))
    val hasH = length(h) > 0
    val maxs = when(hasH, lit(1.0)).otherwise(lit(0.8))
    val sH   = when(hasH && length(h).between(10, 60), 0.2).when(hasH, 0.1).otherwise(0.0)
    val sW   = when(wc.between(700, 1000), 0.2)
      .when(wc.between(500, 1200), 0.15)
      .when(wc > 200, 0.1)
      .otherwise(0.0)
    def present(c: Column) = when(length(trim(coalesce(c, lit("")))) > 0, 1).otherwise(0)
    val sR = (present(h) + present(subtitle) + present(body) + present(meta)).cast("double") / 4 * 0.3
    val sQ = when(nQuotes >= 2, 0.15).when(nQuotes >= 1, 0.1).otherwise(0.0)
    val sK = when(nTakeaways >= 3, 0.15).when(nTakeaways >= 1, 0.1).otherwise(0.0)
    (sH + sW + sR + sQ + sK) / maxs
  }

  /** Faithful article form of the rubric (word count derived from the body;
    * list sizes from the array columns). Reference as above.
    */
  def qualityScore(headline: Column, subtitle: Column, body: Column, meta: Column,
                   pullQuotes: Column, takeaways: Column): Column =
    qualityScoreParts(
      headline, subtitle, body, wordCount(body), meta,
      coalesce(size(pullQuotes), lit(0)), coalesce(size(takeaways), lit(0)))

  /** Ratio of punctuation chars to total chars (text quality signal). */
  def punctRatio(c: Column): Column = {
    val total = length(c)
    val punct = length(regexp_replace(c, "[^.,;:!?'\"()-]", ""))
    when(total > 0, punct.cast("double") / total.cast("double")).otherwise(lit(0.0))
  }

  /** Ratio of tokens that are common-English stopwords (quality signal). */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with", "as", "at", "by")

  def stopwordRatio(toks: Column): Column = {
    val hits = size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))
    when(size(toks) > 0, hits.cast("double") / size(toks).cast("double")).otherwise(lit(0.0))
  }

  /** Language-ID heuristic: count stopword hits per candidate language over
    * the token array plus a CJK-character ratio for zh; argmax with a fixed
    * tie-break order (en, fr, es, de, zh). Pure Column expression.
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "en", "para"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "in", "zu", "mit"))

  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    def hits(lang: String): Column =
      size(filter(toks, t => t.isin(langStopwords(lang).map(x => x: Any): _*)))
    val cjk = length(regexp_replace(text, "[^\\x{4E00}-\\x{9FFF}]", ""))
    val zhScore = when(length(text) > 0,
      cjk * 20 / greatest(length(text), lit(1))).otherwise(0)
    val scores = Seq("en", "fr", "es", "de").map(l => l -> hits(l)) :+ ("zh" -> zhScore)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown")) { case ((l, sc), acc) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Composite text-quality score in [0,1]: length band + stopword ratio +
    * punctuation sanity (training-data quality scoring).
    */
  def textQuality(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val lenScore = when(n.between(50, 10000), 0.4)
      .when(n.between(10, 50000), 0.2).otherwise(0.0)
    val sw = stopwordRatio(toks)
    val swScore = when(sw.between(0.01, 0.6), 0.3).when(sw > 0.0, 0.15).otherwise(0.0)
    val pr = punctRatio(text)
    val prScore = when(pr < 0.2, 0.3).when(pr < 0.4, 0.15).otherwise(0.0)
    lenScore + swScore + prScore
  }

  /** BPE-ish token count: letter runs, digit runs, or single non-space
    * symbols (the regex analog of a byte-pair pre-tokenizer).
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(coalesce(text, lit("")), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Order-sensitive 64-bit-ish rolling fingerprint over tokens (polynomial
    * hash, overflow-free so it is ANSI-mode safe: accumulator is kept < 2^31
    * and each step multiplies by a constant < 2^20). The per-token hash is
    * pluggable: the algorithm is the Horner fold; the hash only needs to be
    * deterministic and < 2^31.
    */
  def rollingFingerprint(toks: Column, tokHash: Column => Column): Column =
    aggregate(
      toks,
      lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + tokHash(t), lit(2147483647L)))

  /** Production form: xxhash64 token hash (codegen'd, fastest). */
  def fingerprint(toks: Column): Column =
    rollingFingerprint(toks, t => pmod(xxhash64(t), lit(2147483647L)))

  /** The portable deterministic bucket: first 8 md5 hex digits of the key
    * as an integer, mod `buckets`. One definition for every sampling /
    * mixing / split site (q68, DomainMix, train/val split) so the idiom
    * and its DuckDB replay (`CAST(concat('0x', substr(md5(k), 1, 8)) AS
    * BIGINT) % n`) can never drift apart per call site.
    */
  def md5Bucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("binary")), 1, 8), 16, 10).cast("long") % buckets

  /** Cross-engine-verifiable form: md5-derived token hash (first 15 hex
    * chars = 60 bits, so the conv result fits a signed long) — byte-for-byte
    * reproducible in any engine with md5 + integer arithmetic, which is what
    * lets the DuckDB oracle replay the exact fold (q36).
    */
  def fingerprintPortable(toks: Column): Column =
    rollingFingerprint(toks,
      t => pmod(conv(substring(md5(t), 1, 15), 16, 10).cast("long"), lit(2147483647L)))

  /** PII scrubbing patterns + redaction — the privacy stage of a
    * training-data pipeline. Patterns deliberately use only constructs
    * shared by Java regex and RE2 (character classes, bounded repeats,
    * \b), so any engine replays them identically; replacement order is
    * fixed (email, then IPv4, then phone) because the classes can overlap
    * in raw text.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phoneRe = "\\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")
}
