package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Text-analysis surface over the `documents` table: the reference's scalar
  * functions (slugify F1, word_count F4, quality rubric F3) plus the
  * training-pipeline text stats (token counting, exact dedup, n-gram
  * frequencies).
  */
object TextQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** The q97 BM25 oracle, parameterized by a document filter so the
    * index-lifecycle queries reuse it verbatim: q315/q317 prove
    * increment-built == batch-computed on the full corpus (`where` =
    * ""), q316 proves the purge repaired nd/avgdl/df/tf exactly
    * (`where` = the surviving-corpus predicate).
    */
  private def bm25OracleSql(where: String,
                            conjunctive: Boolean = false): String =
    s"""WITH q(qid, qtext) AS (VALUES
       |    (1::BIGINT, 'fast table scan'),
       |    (2::BIGINT, 'hash join merge'),
       |    (3::BIGINT, 'stream window batch group')),
       |toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
       |         FROM documents WHERE length(trim(text)) > 0 $where),
       |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
       |stats AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS BIGINT) AS nd FROM dl),
       |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |qt AS (SELECT DISTINCT qid, unnest(string_split_regex(lower(trim(qtext)), '\\s+')) AS t
       |       FROM q),
       |contrib AS (SELECT qt.qid, tf.doc_id, qt.t,
       |    round(ln(1.0 + (stats.nd - df.df + 0.5) / (df.df + 0.5)), 6)
       |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS c
       |  FROM qt JOIN tf ON tf.t = qt.t
       |          JOIN dl ON dl.doc_id = tf.doc_id
       |          JOIN df ON df.t = qt.t
       |          CROSS JOIN stats),
       |qn AS (SELECT qid, CAST(count(*) AS BIGINT) AS nq FROM qt GROUP BY 1),
       |scored AS (SELECT qid, doc_id, list_sum(list(c ORDER BY t)) AS score,
       |             CAST(count(*) AS BIGINT) AS nm
       |           FROM contrib GROUP BY qid, doc_id),
       |flt AS (SELECT scored.* FROM scored JOIN qn USING (qid)
       |        ${if (conjunctive) "WHERE scored.nm = qn.nq" else ""}),
       |r AS (SELECT qid, doc_id, score,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
       |      FROM flt)
       |SELECT qid, doc_id, round(score, 4) AS score, rn FROM r WHERE rn <= 10
       |ORDER BY qid, rn""".stripMargin

  /** The corpus-hygiene chain (repetition -> exact dedup -> benchmark
    * decontamination -> uniform domain mix) as DuckDB CTEs `t0..s4` —
    * shared verbatim by the q106 oracle and the q122 pretraining-pipeline
    * generator so the two replays can never drift apart.
    */
  private val hygienePrefixSql: String =
    """WITH t0 AS (SELECT doc_id, lang, text,
      |        CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |             ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
      |      FROM documents),
      |bgx AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS i, toks
      |        FROM t0 WHERE len(toks) >= 2),
      |bgc AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g, count(*) AS c
      |        FROM bgx GROUP BY 1, 2),
      |bgs AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top2
      |        FROM bgc GROUP BY 1),
      |tgx AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 2)) AS i, toks
      |        FROM t0 WHERE len(toks) >= 3),
      |tgc AS (SELECT doc_id,
      |          toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g, count(*) AS c
      |        FROM tgx GROUP BY 1, 2),
      |tgs AS (SELECT doc_id,
      |          CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
      |            / CAST(sum(c) AS DOUBLE) AS dup3
      |        FROM tgc GROUP BY 1),
      |s1 AS (SELECT t0.doc_id, t0.lang, t0.text, t0.toks
      |       FROM t0 LEFT JOIN bgs USING (doc_id) LEFT JOIN tgs USING (doc_id)
      |       WHERE round(coalesce(top2, 0.0), 6) <= 0.2::DOUBLE
      |         AND round(coalesce(dup3, 0.0), 6) <= 0.3::DOUBLE),
      |dd AS (SELECT doc_id, lang, text, toks FROM (
      |         SELECT s1.*, row_number() OVER (PARTITION BY md5(text)
      |           ORDER BY doc_id) AS rn FROM s1) WHERE rn = 1),
      |bgrams AS (SELECT DISTINCT array_to_string(toks[i : i + 7], ' ') AS g
      |           FROM (SELECT toks, unnest(generate_series(1, len(toks) - 7)) AS i
      |                 FROM t0 WHERE doc_id % 41 = 0 AND len(toks) >= 8)),
      |cg AS (SELECT doc_id, array_to_string(toks[i : i + 7], ' ') AS g
      |       FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
      |             FROM dd WHERE doc_id % 41 != 0 AND len(toks) >= 8)),
      |contam AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bgrams USING (g)),
      |s3 AS (SELECT * FROM dd WHERE doc_id % 41 != 0
      |         AND doc_id NOT IN (SELECT doc_id FROM contam)),
      |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM s3 GROUP BY lang),
      |k AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM c),
      |sc AS (SELECT min(CAST(n AS DOUBLE) / (1.0 / k.k)) AS scale FROM c, k),
      |th AS (SELECT lang,
      |         CAST(floor(least(1.0, (1.0 / k.k) * sc.scale / CAST(n AS DOUBLE))
      |           * 10000 + 1e-9) AS BIGINT) AS th
      |       FROM c, k, sc),
      |s4 AS (SELECT s3.doc_id FROM s3 JOIN th USING (lang)
      |       WHERE CAST(concat('0x', substr(md5(
      |           concat(CAST(s3.doc_id AS VARCHAR), ':', s3.lang)), 1, 8)) AS BIGINT)
      |         % 10000 < th.th)""".stripMargin

  def all: Seq[Q] = Seq(

    // ---- F1 slugify (reference zara_hybrid_etl.py:77-80). ----
    Q("q30_slugify",
      (s, dir) => {
        t(s, dir, "part")
          .select(col("p_partkey"), TextFns.slugify(col("p_name")).as("slug"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |  CASE WHEN s IS NULL OR s = '' THEN 'untitled' ELSE s END AS slug
             |FROM (SELECT p_partkey,
             |        trim(regexp_replace(regexp_replace(lower(p_name),
             |          '[^a-z0-9]+', '-', 'g'), '-{2,}', '-', 'g'), '-') AS s
             |      FROM part)
             |ORDER BY p_partkey""".stripMargin)),

    // ---- F4 word_count (reference zara_hybrid_etl.py:216). ----
    Q("q31_word_count",
      (s, dir) => {
        t(s, dir, "documents")
          .select(col("doc_id"),
            TextFns.wordCount(col("text")).cast("long").as("n_tokens"),
            col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  len(string_split_regex(trim(text), '\s+')) AS n_tokens, n_chars
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Corpus quality stats per language (training-data QA). ----
    Q("q32_text_stats",
      (s, dir) => {
        t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg(col("n_chars")), 4).as("avg_chars"),
            round(avg(TextFns.wordCount(col("text")).cast("double")), 4).as("avg_tokens"),
            round(avg(when(col("n_chars") > 300, 1).otherwise(0)), 4).as("frac_long"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |  round(avg(n_chars), 4) AS avg_chars,
             |  round(avg(len(string_split_regex(trim(text), '\s+'))), 4) AS avg_tokens,
             |  round(avg(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END), 4) AS frac_long
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- F3 quality rubric (reference zara_hybrid_etl.py:212-222) applied
    // to deterministic article-shaped inputs derived from `documents`, so
    // every branch of the rubric is exercised. The oracle mirrors the exact
    // double arithmetic (all constants cast to DOUBLE, same fold order).
    Q("q33_quality_score",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val headline = expr("substring(text, 1, CAST(doc_id % 70 AS INT))")
        val wc = (TextFns.wordCount(col("text")) * 37) % 1400
        val meta = when(col("doc_id") % 3 === 0, lit("")).otherwise(col("lang"))
        val score = TextFns.qualityScoreParts(
          headline, col("source"), col("text"), wc, meta,
          col("doc_id") % 4, col("doc_id") % 5)
        d.select(col("doc_id"), round(score, 4).as("score"),
            (score >= 0.7).as("pass"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH a AS (
             |  SELECT doc_id,
             |    substring(text, 1, CAST(doc_id % 70 AS INT)) AS h,
             |    source AS subtitle, text AS body,
             |    (len(string_split_regex(trim(text), '\s+')) * 37) % 1400 AS wc,
             |    CASE WHEN doc_id % 3 = 0 THEN '' ELSE lang END AS meta,
             |    doc_id % 4 AS nq, doc_id % 5 AS nk
             |  FROM documents),
             |sc AS (
             |  SELECT doc_id,
             |    (CASE WHEN len(h) > 0 AND len(h) BETWEEN 10 AND 60 THEN 0.2::DOUBLE
             |          WHEN len(h) > 0 THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END
             |     + CASE WHEN wc BETWEEN 700 AND 1000 THEN 0.2::DOUBLE
             |            WHEN wc BETWEEN 500 AND 1200 THEN 0.15::DOUBLE
             |            WHEN wc > 200 THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END
             |     + CAST(((CASE WHEN len(trim(h)) > 0 THEN 1 ELSE 0 END)
             |           + (CASE WHEN len(trim(subtitle)) > 0 THEN 1 ELSE 0 END)
             |           + (CASE WHEN len(trim(body)) > 0 THEN 1 ELSE 0 END)
             |           + (CASE WHEN len(trim(meta)) > 0 THEN 1 ELSE 0 END)) AS DOUBLE) / 4 * 0.3::DOUBLE
             |     + CASE WHEN nq >= 2 THEN 0.15::DOUBLE WHEN nq >= 1 THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END
             |     + CASE WHEN nk >= 3 THEN 0.15::DOUBLE WHEN nk >= 1 THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END)
             |    / (CASE WHEN len(h) > 0 THEN 1.0::DOUBLE ELSE 0.8::DOUBLE END) AS score
             |  FROM a)
             |SELECT doc_id, round(score, 4) AS score, score >= 0.7::DOUBLE AS pass
             |FROM sc ORDER BY doc_id""".stripMargin)),

    // ---- Exact dedup by content hash (hash-groupBy; scales as a single
    // shuffle on the digest, no pairwise comparison). ----
    Q("q34_dedup_exact",
      (s, dir) => {
        t(s, dir, "documents")
          .groupBy(md5(col("text").cast("binary")).as("h"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep"))
          .orderBy(col("h"))
      },
      Some("""SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep
             |FROM documents GROUP BY 1 ORDER BY h""".stripMargin)),

    // ---- Token n-gram frequencies (explode + count; partial agg keeps the
    // shuffle to distinct-ngram cardinality). ----
    Q("q35_top_bigrams",
      (s, dir) => {
        t(s, dir, "documents")
          .select(explode(TextFns.bigrams(TextFns.tokens(col("text")))).as("bg"))
          .groupBy(col("bg"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bg"))
          .limit(20)
      },
      Some("""WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents),
             |b AS (SELECT unnest(list_transform(
             |        list_zip(toks[1:len(toks)-1], toks[2:]),
             |        x -> x[1] || ' ' || x[2])) AS bg FROM t)
             |SELECT bg, count(*) AS n FROM b
             |GROUP BY bg ORDER BY n DESC, bg LIMIT 20""".stripMargin)),

    // ---- Readability scoring (Flesch-style): words/sentences/vowel-group
    // syllable proxy, all via regexp counts that both engines share. ----
    Q("q66_readability",
      (s, dir) => {
        val words = size(split(trim(col("text")), "\\s+")).cast("double")
        val sentences = greatest(
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("double"),
          lit(1.0))
        val syllables = greatest(
          size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))).cast("double"),
          lit(1.0))
        val flesch = lit(206.835) - lit(1.015) * (words / sentences) -
          lit(84.6) * (syllables / words)
        t(s, dir, "documents")
          .select(col("doc_id"),
            words.cast("long").as("n_words"),
            sentences.cast("long").as("n_sents"),
            syllables.cast("long").as("n_syl"),
            round(flesch, 4).as("flesch"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
             |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sents,
             |  CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS BIGINT) AS n_syl,
             |  round(206.835::DOUBLE
             |    - 1.015::DOUBLE * (len(string_split_regex(trim(text), '\s+'))::DOUBLE
             |        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::DOUBLE)
             |    - 84.6::DOUBLE * (greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)::DOUBLE
             |        / len(string_split_regex(trim(text), '\s+'))::DOUBLE), 4) AS flesch
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Deterministic stratified sampling (training-data op): per-stratum
    // rates via content-addressed md5 bucketing — stable under reruns,
    // retries and repartitioning (unlike rng-based sampleBy), and portable
    // enough to oracle exactly. en is kept at 50%, other langs at 10%. ----
    Q("q68_stratified_sample",
      (s, dir) => {
        val bucket = TextFns.md5Bucket(
          concat(col("doc_id").cast("string"), lit(":"), col("lang")), 100)
        val keep = bucket < when(col("lang") === "en", 50).otherwise(10)
        t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(keep, 1L).otherwise(0L)).as("n_sampled"))
          .orderBy(col("lang"))
      },
      // NB: the sum MUST be cast to BIGINT — DuckDB's sum(int) is HUGEINT,
      // which round-trips through Arrow as double (99.0 != 99 under the
      // driver's value hash even though rows/schema "match").
      Some("""SELECT lang, count(*) AS n_total,
             |  CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(
             |        concat(CAST(doc_id AS VARCHAR), ':', lang)), 1, 8)) AS BIGINT) % 100
             |      < (CASE WHEN lang = 'en' THEN 50 ELSE 10 END)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- Order-sensitive document fingerprint (rolling polynomial hash).
    // The oracle replays the exact Horner fold via list_reduce with the
    // md5-derived 60-bit token hash (portable integer arithmetic); the
    // xxhash64 production default runs the identical fold. ----
    Q("q36_fingerprint",
      (s, dir) => {
        t(s, dir, "documents")
          .select(col("doc_id"),
            TextFns.fingerprintPortable(TextFns.tokens(col("text"))).as("fp"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CASE WHEN length(trim(text)) = 0 THEN 0
             |       ELSE list_reduce(list_prepend(0::BIGINT,
             |         list_transform(string_split_regex(trim(text), '\s+'),
             |           t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 2147483647)),
             |         (acc, x) -> (acc * 1000003 + x) % 2147483647)
             |  END AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- PERSISTED INVERTED INDEX, incremental build + serve
    // (TextIndex.buildTextIndex + mergeIntoTextIndex + serveTextIndex):
    // the q97 BM25 computation as a maintained lakehouse index — ⅓ of
    // the documents append AFTER the build, and serving reads ONLY the
    // query terms' posting buckets (+ candidate dl buckets + one stats
    // row), never scanning or shuffling the corpus. All three substores
    // are additive GenStore tables (postings/dl/stats) with the
    // three-ledger exactly-once discipline (TextIndexSpec pins replay).
    // Oracle: the ONE-SHOT full-corpus BM25 (q97's SQL verbatim) — the
    // hash proves increment-built == batch-computed, idf quantization
    // and term-ordered fold included. ----
    Q("q315_text_index_search",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val queries = Seq(
          (1L, "fast table scan"),
          (2L, "hash join merge"),
          (3L, "stream window batch group")).toDF("qid", "qtext")
        val docs = t(s, dir, "documents")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q315_").toString + "/ix"
        graft.operators.TextIndex.buildTextIndex(
          docs.filter(col("doc_id") % 3 =!= 0), tmp, "doc_id", "text")
        graft.operators.TextIndex.mergeIntoTextIndex(
          docs.filter(col("doc_id") % 3 === 0), tmp, "doc_id", "text",
          appliedId = Some("day-1"))
        graft.operators.TextIndex.serveTextIndex(s, tmp, queries,
            "qid", "qtext", "doc_id", k = 10)
          .select(col("qid"), col("doc_id"),
            round(col("score"), 4).as("score"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(bm25OracleSql(where = ""))),

    // ---- COMPLIANCE PURGE on the inverted index (TextIndex
    // .purgeTextIndexDocs): erasing documents erases their posting rows
    // (located across term buckets), their dl rows, and their stats
    // contribution — the decrement rides the purge ticket through the
    // stats ledger (exactly-once on a crash re-run), df self-repairs
    // because serve derives it from postings. Oracle: BM25 recomputed
    // on the SURVIVING corpus — the hash proves nd/avgdl/df/tf all
    // repaired exactly (a stale stats row or posting residue would
    // shift every score). ----
    Q("q316_text_index_purge",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val queries = Seq(
          (1L, "fast table scan"),
          (2L, "hash join merge"),
          (3L, "stream window batch group")).toDF("qid", "qtext")
        val docs = t(s, dir, "documents")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q316_").toString + "/ix"
        graft.operators.TextIndex.buildTextIndex(docs, tmp, "doc_id", "text")
        graft.operators.TextIndex.purgeTextIndexDocs(
          docs.filter(col("doc_id") % 7 === 0).select(col("doc_id").as("id")),
          tmp, purgeId = "q316-ticket")
        graft.operators.TextIndex.serveTextIndex(s, tmp, queries,
            "qid", "qtext", "doc_id", k = 10)
          .select(col("qid"), col("doc_id"),
            round(col("score"), 4).as("score"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(bm25OracleSql(where = "AND doc_id % 7 <> 0"))),

    // ---- CONJUNCTIVE retrieval on the index (serveTextIndex
    // requireAll): only documents matching EVERY query term rank — the
    // posting-list intersection, decided on the contribution rows
    // already in hand (matched-term count == query term count, zero
    // extra reads). The precision mode for short keyword queries at
    // corpus scale, where disjunctive top-k drowns in single-term
    // matches. Same BM25 scores as q315 on the surviving candidates
    // (the oracle replays the intersection with a HAVING-style join
    // filter). ----
    Q("q319_text_index_conjunctive",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val queries = Seq(
          (1L, "fast table scan"),
          (2L, "hash join merge"),
          (3L, "stream window batch group")).toDF("qid", "qtext")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q319_").toString + "/ix"
        graft.operators.TextIndex.buildTextIndex(
          t(s, dir, "documents"), tmp, "doc_id", "text")
        graft.operators.TextIndex.serveTextIndex(s, tmp, queries,
            "qid", "qtext", "doc_id", k = 10, requireAll = true)
          .select(col("qid"), col("doc_id"),
            round(col("score"), 4).as("score"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(bm25OracleSql(where = "", conjunctive = true))),

    // ---- PHRASE SEARCH over the positional substore (TextIndex
    // .phraseSearch): documents containing the EXACT token sequence,
    // ranked by phrase frequency — the i-th term's occurrences
    // start-align (pos − i) and the lists intersect by equi-join on
    // (id, start), reading ≤ n posting buckets. Half the corpus is
    // indexed positionally at build, half appends — the oracle counts
    // adjacent pairs over the FULL corpus, proving the positional
    // increment discipline. ----
    Q("q320_text_index_phrase",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q320_").toString + "/ix"
        graft.operators.TextIndex.buildTextIndex(
          docs.filter(col("doc_id") % 2 =!= 0), tmp, "doc_id", "text",
          positional = true)
        graft.operators.TextIndex.mergeIntoTextIndex(
          docs.filter(col("doc_id") % 2 === 0), tmp, "doc_id", "text",
          appliedId = Some("day-1"))
        graft.operators.TextIndex.phraseSearch(s, tmp, "fast table",
            "doc_id", k = 20)
          .orderBy(col("rn"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |      string_split_regex(lower(trim(text)), '\s+') AS toks
             |    FROM documents WHERE length(trim(text)) > 0),
             |bg AS (SELECT doc_id,
             |      unnest(generate_series(1, len(toks) - 1)) AS i, toks
             |    FROM t WHERE len(toks) >= 2),
             |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS phrase_tf
             |    FROM bg WHERE toks[i] = 'fast' AND toks[i + 1] = 'table'
             |    GROUP BY 1),
             |r AS (SELECT doc_id, phrase_tf,
             |    row_number() OVER (ORDER BY phrase_tf DESC, doc_id) AS rn
             |  FROM p)
             |SELECT doc_id, phrase_tf, rn FROM r WHERE rn <= 20
             |ORDER BY rn""".stripMargin)),

    // ---- TIME-TRAVEL serving on the index (serveTextIndex asOfGen):
    // every append advances all substores by exactly one generation,
    // so one number addresses a consistent snapshot — postings,
    // lengths, AND the corpus stats as that batch committed them.
    // Build on ⅔, append ⅓, then serve AS OF generation 1: the oracle
    // is BM25 over ONLY the build-time corpus — the hash proves the
    // archived generation replays bit-exact (stale stats or leaked
    // postings from the append would shift every score). ----
    Q("q325_text_index_time_travel",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val queries = Seq(
          (1L, "fast table scan"),
          (2L, "hash join merge"),
          (3L, "stream window batch group")).toDF("qid", "qtext")
        val docs = t(s, dir, "documents")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q325_").toString + "/ix"
        graft.operators.TextIndex.buildTextIndex(
          docs.filter(col("doc_id") % 3 =!= 0), tmp, "doc_id", "text")
        graft.operators.TextIndex.mergeIntoTextIndex(
          docs.filter(col("doc_id") % 3 === 0), tmp, "doc_id", "text",
          appliedId = Some("day-1"))
        graft.operators.TextIndex.serveTextIndex(s, tmp, queries,
            "qid", "qtext", "doc_id", k = 10, asOfGen = Some(1L))
          .select(col("qid"), col("doc_id"),
            round(col("score"), 4).as("score"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(bm25OracleSql(where = "AND doc_id % 3 <> 0"))),

    // ---- LSM lifecycle on the text index (q333's lexical twin:
    // GenStore delta segments + TextIndex.compactTextIndex + vacuum):
    // a build and TWO document appends land as per-batch segments
    // across the substores, compaction folds every multi-segment
    // bucket (each substore advancing exactly one generation,
    // pointer-only where nothing folds — the batch-relative alignment
    // invariant), vacuum reclaims the superseded segments, and BM25
    // serving over the compacted index hash-matches the one-shot
    // full-corpus computation — the land-fold-reclaim cycle is
    // lossless on the lexical store too. ----
    Q("q340_text_index_compaction",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val queries = Seq(
          (1L, "fast table scan"),
          (2L, "hash join merge"),
          (3L, "stream window batch group")).toDF("qid", "qtext")
        val docs = t(s, dir, "documents")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q340_").toString + "/ix"
        graft.operators.TextIndex.buildTextIndex(
          docs.filter(col("doc_id") % 3 === 0), tmp, "doc_id", "text",
          appliedId = Some("b0"))
        graft.operators.TextIndex.mergeIntoTextIndex(
          docs.filter(col("doc_id") % 3 === 1), tmp, "doc_id", "text",
          appliedId = Some("b1"))
        graft.operators.TextIndex.mergeIntoTextIndex(
          docs.filter(col("doc_id") % 3 === 2), tmp, "doc_id", "text",
          appliedId = Some("b2"))
        graft.operators.TextIndex.compactTextIndex(s, tmp)
        graft.operators.TextIndex.vacuumTextIndex(s, tmp)
        graft.operators.TextIndex.serveTextIndex(s, tmp, queries,
            "qid", "qtext", "doc_id", k = 10)
          .select(col("qid"), col("doc_id"),
            round(col("score"), 4).as("score"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(bm25OracleSql(where = ""))),

    // ---- STREAMING index maintenance (StreamingTextIndex
    // .textIndexSink): documents arrive as a stream, each microbatch
    // folds its posting/dl/stats deltas — exactly-once by the
    // three-ledger discipline, batch id as appliedId. Final index
    // serves the full-corpus BM25, hash-proven. ----
    Q("q317_stream_text_index",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import s.implicits._
        val queries = Seq(
          (1L, "fast table scan"),
          (2L, "hash join merge"),
          (3L, "stream window batch group")).toDF("qid", "qtext")
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q317_").toString
        val input = MemoryStream[(Long, String)]
        val q = graft.streaming.StreamingTextIndex.textIndexSink(
          input.toDF().toDF("doc_id", "text"),
          s"$tmp/ix", s"$tmp/ckpt", idCol = "doc_id", textCol = "text")
        try {
          for (r <- 0 to 2) {
            input.addData(docs.filter(col("doc_id") % 3 === r)
              .as[(Long, String)].collect().toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        graft.operators.TextIndex.serveTextIndex(s, s"$tmp/ix", queries,
            "qid", "qtext", "doc_id", k = 10)
          .select(col("qid"), col("doc_id"),
            round(col("score"), 4).as("score"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(bm25OracleSql(where = ""))),

    // ---- BM25 keyword retrieval (operators/Bm25): lexical top-k, the
    // counterpart of the embedding ANN family. The oracle replays the
    // whole pipeline — postings, tf/df/dl/avgdl, 6-dp-quantized idf (the
    // only transcendental), and the TERM-ORDERED score fold (double
    // addition is not associative; list_sum over list(ORDER BY t) mirrors
    // Spark's sorted collect_list fold exactly). ----
    Q("q97_bm25",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val queries = Seq(
          (1L, "fast table scan"),
          (2L, "hash join merge"),
          (3L, "stream window batch group")).toDF("qid", "qtext")
        graft.operators.Bm25.search(
            t(s, dir, "documents"), "doc_id", "text", queries, "qid", "qtext", k = 10)
          .select(col("qid"), col("doc_id"), round(col("score"), 4).as("score"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some("""WITH q(qid, qtext) AS (VALUES
             |    (1::BIGINT, 'fast table scan'),
             |    (2::BIGINT, 'hash join merge'),
             |    (3::BIGINT, 'stream window batch group')),
             |toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
             |         FROM documents WHERE length(trim(text)) > 0),
             |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
             |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
             |stats AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS BIGINT) AS nd FROM dl),
             |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
             |qt AS (SELECT DISTINCT qid, unnest(string_split_regex(lower(trim(qtext)), '\s+')) AS t
             |       FROM q),
             |contrib AS (SELECT qt.qid, tf.doc_id, qt.t,
             |    round(ln(1.0 + (stats.nd - df.df + 0.5) / (df.df + 0.5)), 6)
             |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS c
             |  FROM qt JOIN tf ON tf.t = qt.t
             |          JOIN dl ON dl.doc_id = tf.doc_id
             |          JOIN df ON df.t = qt.t
             |          CROSS JOIN stats),
             |scored AS (SELECT qid, doc_id, list_sum(list(c ORDER BY t)) AS score
             |           FROM contrib GROUP BY qid, doc_id),
             |r AS (SELECT qid, doc_id, score,
             |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
             |      FROM scored)
             |SELECT qid, doc_id, round(score, 4) AS score, rn FROM r WHERE rn <= 10
             |ORDER BY qid, rn""".stripMargin)),

    // ---- Bigram-LM perplexity scoring (operators/LmScore): the CCNet-
    // style quality filter, trained on the corpus itself. Oracle replays
    // counts, add-0.5 smoothing, the 6-dp-quantized ln, and the
    // POSITION-ordered per-document log-prob fold. ----
    Q("q98_lm_score",
      (s, dir) => {
        graft.operators.LmScore.bigramNll(t(s, dir, "documents"), "doc_id", "text")
          .select(col("doc_id"), round(col("nll"), 4).as("nll"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
             |           FROM documents WHERE length(trim(text)) > 0),
             |t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
             |bg AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS pos, toks
             |       FROM t2),
             |bg2 AS (SELECT doc_id, pos, toks[pos] AS w1, toks[pos + 1] AS w2 FROM bg),
             |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg2 GROUP BY 1),
             |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg2 GROUP BY 1, 2),
             |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
             |      FROM (SELECT unnest(toks) AS w FROM t2)),
             |lp AS (SELECT bg2.doc_id, bg2.pos,
             |         round(ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * v.v)), 6) AS lp
             |       FROM bg2 JOIN c2 ON c2.w1 = bg2.w1 AND c2.w2 = bg2.w2
             |                JOIN c1 ON c1.w1 = bg2.w1
             |                CROSS JOIN v),
             |d AS (SELECT doc_id, list_sum(list(lp ORDER BY pos)) AS s,
             |        CAST(count(*) AS BIGINT) AS n
             |      FROM lp GROUP BY doc_id)
             |SELECT doc_id, round(-(s) / n, 4) AS nll FROM d ORDER BY doc_id""".stripMargin)),

    // ---- Gopher-style repetition filters (operators/QualityFilters):
    // top-bigram share + duplicated-trigram share, the corpus-level
    // pathologies the per-doc rubric can't see. Full oracle. ----
    Q("q100_gopher_repetition",
      (s, dir) => {
        graft.operators.QualityFilters
          .repetitionStats(t(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |        CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
             |             ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
             |      FROM documents),
             |bgx AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS i, toks
             |        FROM d WHERE len(toks) >= 2),
             |bgc AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g, count(*) AS c
             |        FROM bgx GROUP BY 1, 2),
             |bgs AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top2
             |        FROM bgc GROUP BY 1),
             |tgx AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 2)) AS i, toks
             |        FROM d WHERE len(toks) >= 3),
             |tgc AS (SELECT doc_id,
             |          toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g, count(*) AS c
             |        FROM tgx GROUP BY 1, 2),
             |tgs AS (SELECT doc_id,
             |          CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
             |            / CAST(sum(c) AS DOUBLE) AS dup3
             |        FROM tgc GROUP BY 1)
             |SELECT d.doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
             |  round(coalesce(top2, 0.0), 6) AS top_bigram_frac,
             |  round(coalesce(dup3, 0.0), 6) AS dup_trigram_frac,
             |  (round(coalesce(top2, 0.0), 6) <= 0.2::DOUBLE
             |    AND round(coalesce(dup3, 0.0), 6) <= 0.3::DOUBLE) AS keep
             |FROM d LEFT JOIN bgs USING (doc_id) LEFT JOIN tgs USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ---- Benchmark decontamination (operators/QualityFilters): corpus
    // docs sharing any 8-token window with the held-out set (doc_id % 41
    // as the stand-in benchmark). Full oracle. ----
    Q("q101_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.operators.QualityFilters.decontaminate(
            docs, "doc_id", "text",
            docs.filter(col("doc_id") % 41 === 0), "doc_id", "text", n = 8)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |        CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
             |             ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
             |      FROM documents),
             |bgrams AS (SELECT DISTINCT array_to_string(toks[i : i + 7], ' ') AS g
             |           FROM (SELECT toks, unnest(generate_series(1, len(toks) - 7)) AS i
             |                 FROM d WHERE doc_id % 41 = 0 AND len(toks) >= 8)),
             |cg AS (SELECT doc_id, array_to_string(toks[i : i + 7], ' ') AS g
             |       FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
             |             FROM d WHERE doc_id % 41 != 0 AND len(toks) >= 8)),
             |hits AS (SELECT cg.doc_id, CAST(count(DISTINCT cg.g) AS BIGINT) AS n_hits
             |         FROM cg JOIN bgrams ON cg.g = bgrams.g GROUP BY 1)
             |SELECT d.doc_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
             |  coalesce(n_hits, 0) > 0 AS contaminated
             |FROM d LEFT JOIN hits USING (doc_id)
             |WHERE doc_id % 41 != 0
             |ORDER BY doc_id""".stripMargin)),

    // ---- Vocabulary build + token-id encoding (operators/Vocab): the
    // tokenizer-dictionary step. Rank ties break lexicographically; ids are
    // position-ordered; OOV -> -1. Full oracle incl. the id sequence —
    // emitted as a space-joined string, not a raw array, because the
    // driver's gate sorts rows via pandas and crashes on top-level array
    // columns (registry rule: no query emits a top-level array column). ----
    Q("q102_vocab_encode",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val vocab = graft.operators.Vocab.buildVocab(docs, "text", size = 256)
        graft.operators.Vocab.encode(docs, "doc_id", "text", vocab)
          .select(col("doc_id"), array_join(col("ids"), " ").as("ids_str"),
            col("n_toks"), col("n_oov"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |        CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
             |             ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
             |      FROM documents),
             |f AS (SELECT t AS token, CAST(count(*) AS BIGINT) AS freq
             |      FROM (SELECT unnest(toks) AS t FROM d) GROUP BY 1),
             |v AS (SELECT token,
             |        CAST(row_number() OVER (ORDER BY freq DESC, token) - 1 AS BIGINT) AS token_id
             |      FROM f ORDER BY freq DESC, token LIMIT 256),
             |tok AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
             |        FROM d WHERE len(toks) > 0),
             |tid AS (SELECT doc_id, pos, coalesce(v.token_id, -1) AS tid
             |        FROM (SELECT doc_id, pos, toks[pos] AS token FROM tok) x
             |        LEFT JOIN v USING (token))
             |SELECT doc_id,
             |  array_to_string(list(tid ORDER BY pos), ' ') AS ids_str,
             |  CAST(count(*) AS BIGINT) AS n_toks,
             |  CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
             |FROM tid GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Offset-based sequence packing (operators/Packing): each doc's
    // absolute token offset in the id-ordered concatenated stream, computed
    // by a two-phase distributed scan (never a one-partition window). The
    // oracle is the textbook exclusive running sum. ----
    Q("q103_pack_sequences",
      (s, dir) => {
        graft.operators.Packing
          .packSequences(t(s, dir, "documents"), "doc_id", "text", seqLen = 512)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |        CASE WHEN length(trim(text)) = 0 THEN 0
             |             ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n
             |      FROM documents),
             |c AS (SELECT doc_id, CAST(n AS BIGINT) AS n_toks,
             |        CAST(coalesce(sum(n) OVER (ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
             |      FROM d)
             |SELECT doc_id, n_toks, tok_start,
             |  CAST(tok_start // 512 AS BIGINT) AS seq_id,
             |  CAST(tok_start % 512 AS BIGINT) AS seq_offset
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ---- The corpus-hygiene pipeline COMPOSED: repetition filter ->
    // exact dedup -> benchmark decontamination -> domain mixing, emitting
    // per-stage survival counts. Every stage is individually oracle-proven
    // (q100/q34-family/q101/q105); this query proves the COMPOSITION —
    // the DuckDB oracle replays all four stages chained. ----
    Q("q106_corpus_pipeline",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val keepRep = graft.operators.QualityFilters
          .repetitionStats(docs, "doc_id", "text")
          .filter(col("keep")).select(col("doc_id"))
        val s1 = docs.join(keepRep, Seq("doc_id"), "left_semi")
        val dd = s1.withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))))
          .filter(col("__rn") === 1).drop("__rn")
        // benchmark docs are held OUT (decontaminate drops them from the
        // corpus side), so stage 4 counts only trainable survivors
        val clean = graft.operators.QualityFilters.decontaminate(
            dd, "doc_id", "text",
            docs.filter(col("doc_id") % 41 === 0), "doc_id", "text", n = 8)
          .filter(!col("contaminated")).select(col("doc_id"))
        val s3 = dd.join(clean, Seq("doc_id"), "left_semi")
        // each stage feeds both the next stage AND its own count — persist
        // so the five counts execute each stage's lineage once, not
        // O(stages^2) times (dd alone would otherwise recompute the
        // repetition filter three times)
        Seq(s1, dd, s3).foreach(_.persist())
        try {
          val langs = s3.select(col("lang")).distinct().collect().map(_.getString(0))
          val s4 = graft.operators.DomainMix.reweight(s3, "doc_id", "lang",
              langs.map(_ -> 1.0).toMap)
            .filter(col("keep"))
          val counts = Seq(
            (1L, "total", docs.count()),
            (2L, "repetition", s1.count()),
            (3L, "exact_dedup", dd.count()),
            (4L, "decontaminated", s3.count()),
            (5L, "domain_mix", s4.count()))
          import s.implicits._
          counts.toDF("stage", "name", "n").orderBy(col("stage"))
        } finally Seq(s1, dd, s3).foreach(_.unpersist(false))
      },
      Some(hygienePrefixSql + "\n" +
        """SELECT * FROM (
          |  SELECT CAST(1 AS BIGINT) AS stage, 'total' AS name,
          |    CAST((SELECT count(*) FROM documents) AS BIGINT) AS n
          |  UNION ALL SELECT 2, 'repetition', CAST((SELECT count(*) FROM s1) AS BIGINT)
          |  UNION ALL SELECT 3, 'exact_dedup', CAST((SELECT count(*) FROM dd) AS BIGINT)
          |  UNION ALL SELECT 4, 'decontaminated', CAST((SELECT count(*) FROM s3) AS BIGINT)
          |  UNION ALL SELECT 5, 'domain_mix', CAST((SELECT count(*) FROM s4) AS BIGINT)
          |) ORDER BY stage""".stripMargin)),

    // ---- Domain mixing (operators/DomainMix): downsample each language to
    // a uniform target mix, deterministically (q68's portable md5 bucket).
    // The oracle re-derives the per-domain thresholds with the SAME IEEE
    // double operations in the same order, so floor() agrees bit-exactly. ----
    Q("q105_domain_mix",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val langs = docs.select(col("lang")).distinct()
          .collect().map(_.getString(0))
        graft.operators.DomainMix.reweight(docs, "doc_id", "lang",
            langs.map(_ -> 1.0).toMap)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy(col("lang"))
      },
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
             |           FROM documents GROUP BY lang),
             |k AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM c),
             |s AS (SELECT min(CAST(n AS DOUBLE) / (1.0 / k.k)) AS scale FROM c, k),
             |th AS (SELECT lang, n,
             |         CAST(floor(least(1.0, (1.0 / k.k) * s.scale / CAST(n AS DOUBLE))
             |           * 10000 + 1e-9) AS BIGINT) AS th
             |       FROM c, k, s)
             |SELECT d.lang, count(*) AS n_total,
             |  CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(
             |        concat(CAST(doc_id AS VARCHAR), ':', d.lang)), 1, 8)) AS BIGINT)
             |        % 10000 < th.th
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
             |FROM documents d JOIN th ON d.lang = th.lang
             |GROUP BY d.lang ORDER BY d.lang""".stripMargin)),

    // ---- Adaptive perplexity gate: keep docs at or below the corpus's own
    // 90th-percentile bigram-LM nll — a DATA-DEPENDENT threshold (CCNet's
    // actual deployment shape: percentile cuts, not fixed constants). The
    // nll doubles are bit-identical cross-engine (q98), and Spark's exact
    // percentile interpolates like DuckDB's quantile_cont; the keep
    // comparison runs on 4-dp-rounded values on BOTH sides so a last-ulp
    // interpolation wobble can never flip a row. ----
    Q("q111_perplexity_gate",
      (s, dir) => {
        val nll = graft.operators.LmScore
          .bigramNll(t(s, dir, "documents"), "doc_id", "text")
        val cut = nll.agg(percentile(col("nll"), lit(0.9)).as("p90"))
        nll.crossJoin(broadcast(cut))
          .select(col("doc_id"), round(col("nll"), 4).as("nll"),
            round(col("p90"), 4).as("p90"))
          .withColumn("keep", col("nll") <= col("p90"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
             |           FROM documents WHERE length(trim(text)) > 0),
             |t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
             |bg AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS pos, toks
             |       FROM t2),
             |bg2 AS (SELECT doc_id, pos, toks[pos] AS w1, toks[pos + 1] AS w2 FROM bg),
             |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg2 GROUP BY 1),
             |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg2 GROUP BY 1, 2),
             |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
             |      FROM (SELECT unnest(toks) AS w FROM t2)),
             |lp AS (SELECT bg2.doc_id, bg2.pos,
             |         round(ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * v.v)), 6) AS lp
             |       FROM bg2 JOIN c2 ON c2.w1 = bg2.w1 AND c2.w2 = bg2.w2
             |                JOIN c1 ON c1.w1 = bg2.w1
             |                CROSS JOIN v),
             |d AS (SELECT doc_id,
             |        -(list_sum(list(lp ORDER BY pos))) / CAST(count(*) AS BIGINT) AS nll
             |      FROM lp GROUP BY doc_id),
             |p AS (SELECT quantile_cont(nll, 0.9) AS p90 FROM d)
             |SELECT doc_id, round(nll, 4) AS nll, round(p90, 4) AS p90,
             |  round(nll, 4) <= round(p90, 4) AS keep
             |FROM d, p ORDER BY doc_id""".stripMargin)),

    // ---- PII scrubbing (TextFns.redactPii): email/IPv4/phone counts and
    // the redacted-text hash. Patterns use only Java-regex/RE2-shared
    // constructs and a fixed replacement order, so DuckDB replays both the
    // counts and the full redaction byte-for-byte. ----
    Q("q110_pii_redact",
      (s, dir) => {
        t(s, dir, "documents").select(col("doc_id"),
            regexp_count(col("text"), lit(TextFns.emailRe)).cast("long").as("n_email"),
            regexp_count(col("text"), lit(TextFns.ipv4Re)).cast("long").as("n_ip"),
            regexp_count(col("text"), lit(TextFns.phoneRe)).cast("long").as("n_phone"),
            md5(TextFns.redactPii(col("text")).cast("binary")).as("redacted_hash"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
             |  CAST(len(regexp_extract_all(text,
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
             |  CAST(len(regexp_extract_all(text,
             |    '\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}\b')) AS BIGINT) AS n_phone,
             |  md5(regexp_replace(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
             |    '\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}\b', '<PHONE>', 'g'))
             |    AS redacted_hash
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Substring-level dedup signals (operators/QualityFilters): the
    // fraction of each doc's 10-token windows repeated corpus-wide. The
    // documents table has PLANTED near-dups, so nonzero fractions exist.
    // Full oracle. ----
    Q("q109_dup_spans",
      (s, dir) => {
        graft.operators.QualityFilters
          .duplicatedSpans(t(s, dir, "documents"), "doc_id", "text", k = 10)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |        CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
             |             ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
             |      FROM documents),
             |w AS (SELECT doc_id, array_to_string(toks[i : i + 9], ' ') AS g
             |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 9)) AS i
             |            FROM d WHERE len(toks) >= 10)),
             |c AS (SELECT g, count(*) AS c FROM w GROUP BY g),
             |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_win,
             |        CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
             |      FROM w JOIN c USING (g) GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(coalesce(n_win, 0) AS BIGINT) AS n_win,
             |  CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup,
             |  round(CASE WHEN coalesce(n_win, 0) = 0 THEN 0.0
             |             ELSE CAST(coalesce(n_dup, 0) AS DOUBLE) / coalesce(n_win, 0) END, 6)
             |    AS dup_frac,
             |  round(CASE WHEN coalesce(n_win, 0) = 0 THEN 0.0
             |             ELSE CAST(coalesce(n_dup, 0) AS DOUBLE) / coalesce(n_win, 0) END, 6)
             |    <= 0.3::DOUBLE AS keep
             |FROM d LEFT JOIN p USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ---- Count-Min sketch as a TABLE (operators/Sketches): depth x width
    // bucket weights from one explode + partial agg; estimates are the
    // row-wise min. Portable md5 hashing -> the oracle recomputes the FULL
    // sketch and the estimates for the true top-20 tokens in DuckDB. ----
    Q("q107_countmin",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sketch = graft.operators.Sketches.countMin(docs, "text", depth = 4, width = 256)
        val top = docs
          .select(explode(TextFns.tokens(lower(col("text")))).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("true_n"))
          .orderBy(col("true_n").desc, col("t")).limit(20)
          .withColumnRenamed("t", "term")
        graft.operators.Sketches.estimate(sketch, top, "term", depth = 4, width = 256)
          .join(top, Seq("term"))
          .select(col("term"), col("true_n"), col("est"))
          .orderBy(col("term"))
      },
      Some("""WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
             |             FROM documents WHERE length(trim(text)) > 0),
             |cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS true_n FROM tok GROUP BY t),
             |top AS (SELECT t AS term, true_n FROM cnt ORDER BY true_n DESC, t LIMIT 20),
             |r AS (SELECT unnest(range(4)) AS row),
             |sk AS (SELECT r.row,
             |         CAST(concat('0x', substr(md5(concat(r.row, ':', t)), 1, 8)) AS BIGINT)
             |           % 256 AS bucket,
             |         CAST(count(*) AS BIGINT) AS w
             |       FROM tok, r GROUP BY 1, 2),
             |q AS (SELECT top.term, r.row,
             |        CAST(concat('0x', substr(md5(concat(r.row, ':', term)), 1, 8)) AS BIGINT)
             |          % 256 AS bucket
             |      FROM top, r),
             |est AS (SELECT term, CAST(min(coalesce(w, 0)) AS BIGINT) AS est
             |        FROM q LEFT JOIN sk ON sk.row = q.row AND sk.bucket = q.bucket
             |        GROUP BY term)
             |SELECT top.term, top.true_n, est.est
             |FROM top JOIN est USING (term) ORDER BY term""".stripMargin)),

    // ---- Portable HyperLogLog (operators/Sketches.hll*): q67's
    // approx_count_distinct is Spark's fast path; this is its fully
    // oracle-provable twin (the q92/q94 convention). Registers are pure
    // bit arithmetic (trailing zeros via bit_count, no log2), the
    // harmonic sum is an exact integer at scale 2^32, the raw estimate
    // one integer division, and the linear-counting branch choice is
    // itself part of the hash-verified output. Per-lang doc_id
    // cardinalities (64–218 at m=64) exercise BOTH branches. ----
    Q("q150_hll_portable",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val regs = graft.operators.Sketches
          .hllRegisters(docs, "doc_id", Seq("lang"))
        graft.operators.Sketches.hllEstimate(regs, Seq("lang"))
          .join(docs.groupBy(col("lang"))
            .agg(countDistinct(col("doc_id")).as("true_nd")), Seq("lang"))
          .select(col("lang"), col("true_nd"), col("raw_est"),
            col("v_empty"), col("est"))
          .orderBy(col("lang"))
      },
      Some("""WITH h AS (SELECT lang, doc_id,
             |        CAST(concat('0x', substr(md5(concat('b:', doc_id)), 1, 8))
             |          AS BIGINT) % 64 AS bucket,
             |        CAST(concat('0x', substr(md5(concat('r:', doc_id)), 1, 15))
             |          AS BIGINT) AS hr
             |      FROM documents),
             |reg AS (SELECT lang, bucket,
             |          max(least(CAST(bit_count((hr & -hr) - 1) AS BIGINT) + 1,
             |                    32)) AS r
             |        FROM h GROUP BY 1, 2),
             |z AS (SELECT lang,
             |        CAST(sum(CAST(1 AS BIGINT) << CAST(32 - r AS INT))
             |          AS BIGINT)
             |          + (64 - count(*)) * 4294967296 AS z_scaled,
             |        64 - count(*) AS v_empty
             |      FROM reg GROUP BY 1),
             |e AS (SELECT lang, v_empty,
             |        CAST((2904064 * 4294967296) // (1000 * z_scaled)
             |          AS BIGINT) AS raw_est
             |      FROM z),
             |t AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS true_nd
             |      FROM documents GROUP BY 1)
             |SELECT t.lang, t.true_nd, e.raw_est,
             |  CAST(e.v_empty AS BIGINT) AS v_empty,
             |  CAST(CASE WHEN e.raw_est <= 160 AND e.v_empty > 0
             |    THEN round(64 * ln(64.0 / e.v_empty), 0)
             |    ELSE e.raw_est END AS BIGINT) AS est
             |FROM t JOIN e USING (lang) ORDER BY lang""".stripMargin)),

    // ---- Unicode normalization (expressions/NormalizeText): NFC + control
    // strip + whitespace collapse, the pre-tokenization cleanup pass, as a
    // native codegen expression (Spark has no NFC builtin). DuckDB's
    // nfc_normalize replays it exactly. ----
    Q("q104_normalize_text",
      (s, dir) => {
        graft.expressions.VectorExpressions.register(s)
        t(s, dir, "documents").createOrReplaceTempView("docs_norm")
        s.sql("""SELECT doc_id, normalize_text(text) AS norm_text
                 FROM docs_norm ORDER BY doc_id""")
      },
      Some("""SELECT doc_id,
             |  trim(regexp_replace(regexp_replace(nfc_normalize(text),
             |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
             |    '\s+', ' ', 'g')) AS norm_text
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Subword (BPE) tokenization (operators/Bpe): deterministic
    // Sennrich-style merge training on the word-frequency table, then a
    // fully distributed encode (dictionary pass over distinct words,
    // joined back into the token stream). The oracle is session-generated
    // (the q57/q96 trained-artifact pattern): the learned per-word subword
    // encoding is inlined as a VALUES dictionary and DuckDB independently
    // replays the tokenize -> dictionary join -> per-doc reassembly.
    // ids emitted as a space-joined string (registry rule: no top-level
    // array columns). ----
    Q("q116_bpe_encode",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = graft.operators.Bpe.train(docs, "text", numMerges = 40)
        graft.operators.Bpe.encode(docs, "doc_id", "text", model)
          .select(col("doc_id"), array_join(col("ids"), " ").as("ids_str"),
            col("n_words"), col("n_toks"), col("n_unk"))
          .orderBy(col("doc_id"))
      },
      None,
      oracleGen = Some(q116OracleGen _)),

    // ---- BPE decode ROUND-TRIP (Bpe.decodeDf): the q116 encoding decoded
    // back distributed — broadcast piece dim, token-order reassembly —
    // and compared against the canonical whitespace-tokenized text. The
    // tokenizer trains on the corpus it encodes, so every character is in
    // vocabulary and the round-trip law decode(encode(text)) == canon
    // holds exactly; `ok` makes the law itself the hash-verified output.
    // Oracle = the q116 dictionary augmented with each word's driver-side
    // decode, reassembled per doc in SQL. ----
    Q("q279_bpe_roundtrip",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = graft.operators.Bpe.train(docs, "text", numMerges = 40)
        val enc = graft.operators.Bpe.encode(docs, "doc_id", "text", model)
        val dec = graft.operators.Bpe.decodeDf(enc, "doc_id", "ids", model)
        val canon = docs.select(col("doc_id"),
            concat_ws(" ", TextFns.tokens(lower(col("text")))).as("canon"))
        dec.join(canon, "doc_id")
          .select(col("doc_id"),
            length(col("text_decoded")).cast("long").as("n_chars_decoded"),
            (col("text_decoded") === col("canon")).as("ok"))
          .orderBy(col("doc_id"))
      },
      None,
      oracleGen = Some(q279OracleGen _)),

    // ---- Sequence packing re-based on BPE subword counts (the VERDICT-r5
    // ask): identical two-phase distributed exclusive scan as q103, but the
    // per-document token count comes from the learned tokenizer, which is
    // what a real pre-training layout uses. Empty/token-free docs keep
    // count 0 so every document still gets an offset. ----
    Q("q117_pack_bpe",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = graft.operators.Bpe.train(docs, "text", numMerges = 40)
        val enc = graft.operators.Bpe.encode(docs, "doc_id", "text", model)
          .select(col("doc_id"), col("n_toks"))
        val counts = docs.select(col("doc_id")).join(enc, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("n_toks"), lit(0L)).as("n_toks"))
        graft.operators.Packing.packCounted(counts, "doc_id", "n_toks", seqLen = 512)
          .orderBy(col("doc_id"))
      },
      None,
      oracleGen = Some(q117OracleGen _)),

    // ---- Temperature-scaled domain mixing (DomainMix.temperatureReweight):
    // targets ∝ (n_d/N)^alpha, the exponentiated-unigram sampling formula
    // multilingual pretraining uses to up-weight tail languages. alpha=0.5
    // over the skewed `lang` column. The per-domain thresholds are computed
    // driver-side (math.pow isn't bit-portable across engines) and inlined
    // into the generated oracle, which independently replays the
    // distributed part: md5 bucketing, filtering, per-domain counts. The
    // threshold derivation itself is pinned by PropertySpec laws
    // (alpha=1 keeps everything; alpha=0 is the uniform floor). ----
    Q("q118_temperature_mix",
      (s, dir) => {
        graft.operators.DomainMix
          .temperatureReweight(t(s, dir, "documents"), "doc_id", "lang", alpha = 0.5)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy(col("lang"))
      },
      None,
      oracleGen = Some(q118OracleGen _)),

    // ---- The END-TO-END pre-training data pipeline: q106's hygiene chain
    // (repetition -> exact dedup -> decontamination -> domain mix), then a
    // BPE tokenizer TRAINED ON THE SURVIVORS, the surviving corpus encoded
    // with it, and the packed-sequence budget derived — the complete
    // corpus-to-training-rows story in one oracle-proven query. The
    // generated oracle chains the proven q106 CTEs with the survivor-
    // trained dictionary inlined; the sequence count stays in integer
    // arithmetic ((t + 511) // 512) so both engines agree exactly. ----
    Q("q122_pretraining_pipeline",
      (s, dir) => {
        withHygieneSurvivors(s, dir) { surv0 =>
          val surv = surv0.persist()
          try {
            val nSurv = surv.count()
            val model = graft.operators.Bpe.train(surv, "text", numMerges = 40)
            val enc = graft.operators.Bpe.encode(surv, "doc_id", "text", model)
            val totalToks = enc.agg(coalesce(sum(col("n_toks")), lit(0L)))
              .collect()(0).getLong(0)
            import s.implicits._
            Seq((1L, "survivors", nSurv),
              (2L, "bpe_tokens", totalToks),
              (3L, "sequences", (totalToks + 511L) / 512L))
              .toDF("stage", "name", "n").orderBy(col("stage"))
              // the loan frame unpersists on exit — materialize the tiny
              // result before the caches go away
              .localCheckpoint(true)
          } finally surv.unpersist(false)
        }
      },
      None,
      oracleGen = Some(q122OracleGen _)),

    // ---- Deterministic training-order shuffle (Layout.shuffledOrder):
    // the global permutation applied to packed sequences before training.
    // md5(seed:id) keys, two-phase distributed rank (never a
    // one-partition window); hex-string ordering is identical in any
    // engine, so the oracle is the textbook row_number. ----
    Q("q123_training_shuffle",
      (s, dir) => {
        graft.operators.Layout.shuffledOrder(
            t(s, dir, "documents").select(col("doc_id")), "doc_id", seed = 42L)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(row_number() OVER (
             |    ORDER BY md5(concat('42:', CAST(doc_id AS VARCHAR))), doc_id)
             |    - 1 AS BIGINT) AS pos
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Deterministic train/validation split: the md5-bucket holdout
    // every training run needs, rerun-stable and engine-portable (no RNG
    // state; q68's bucket discipline). 90/10 by document. ----
    Q("q124_train_val_split",
      (s, dir) => {
        val bucket = TextFns.md5Bucket(
          concat(lit("split:"), col("doc_id").cast("string")), 100)
        t(s, dir, "documents")
          .withColumn("split", when(bucket < 90, "train").otherwise("val"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("n_chars"))
          .orderBy(col("split"))
      },
      Some("""SELECT CASE WHEN CAST(concat('0x', substr(md5(
             |      concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
             |      % 100 < 90 THEN 'train' ELSE 'val' END AS split,
             |  count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS n_chars
             |FROM documents GROUP BY 1 ORDER BY split""".stripMargin)),

    // ---- STREAMING pretraining ingest (streaming/StreamingIngest): the
    // q122 story against an unbounded source — each microbatch is PII-
    // scrubbed, length-gated, encoded with a pre-trained broadcast BPE
    // model (train/serve parity: the stream only LOADS the artifact),
    // and appended as an idempotent _SUCCESS-guarded shard. Documents
    // arrive as three microbatches; the generated oracle replays scrub ->
    // gate -> dictionary encode in DuckDB, which the drained stream must
    // equal exactly (replay safety pinned in StreamingSpec). ----
    Q("q125_stream_ingest",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import s.implicits._
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val model = graft.operators.Bpe.train(
          docs.select(TextFns.redactPii(col("text")).as("text")), "text",
          numMerges = 40)
        val tmp = java.nio.file.Files.createTempDirectory("graft_q125_").toString
        val input = MemoryStream[(Long, String)]
        val q = graft.streaming.StreamingIngest.sink(
          input.toDF().toDF("doc_id", "text"), "doc_id", "text",
          model, minTokens = 5, s"$tmp/shards", s"$tmp/ckpt")
        try {
          for (r <- 0 to 2) {
            input.addData(docs.filter(col("doc_id") % 3 === r)
              .as[(Long, String)].collect().toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        graft.streaming.StreamingIngest.shards(s, s"$tmp/shards", "doc_id")
          .orderBy(col("doc_id"))
      },
      None,
      oracleGen = Some(q125OracleGen _)),

    // ---- TF-IDF top terms per document: the classic keyword-extraction
    // IR op. df derives from the (doc, term) tf aggregate — the second
    // groupBy consumes the first's output, so the corpus tokenizes once.
    // idf quantized at 6 dp (the q97 BM25 discipline) so ln() is
    // cross-engine safe; per-doc ranking windows are keyed by doc_id
    // (high cardinality, no skew). ----
    Q("q126_tfidf_topk",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          explode(TextFns.tokens(lower(col("text")))).as("term"))
        val tf = toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val nd = docs.agg(count(lit(1)).cast("double").as("nd"))
        val scored = tf.join(df, "term").crossJoin(broadcast(nd))
          .withColumn("idf", round(log(col("nd") / col("df")), 6))
          .withColumn("score", round(col("idf") * col("tf"), 6))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
        scored.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            col("score"), col("rn"))
          .orderBy(col("doc_id"), col("rn"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |        unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
             |      FROM documents WHERE length(trim(text)) > 0),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |       FROM t GROUP BY 1, 2),
             |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
             |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
             |s AS (SELECT doc_id, term, tf, df,
             |        round(round(ln(nd.nd / df), 6) * tf, 6) AS score
             |      FROM tf JOIN df USING (term), nd),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             |        ORDER BY score DESC, term) AS rn FROM s)
             |SELECT doc_id, term, tf, df, score, CAST(rn AS BIGINT) AS rn
             |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin)),

    // ---- Bigram collocations by LIFT — P(ab) / (P(a)·P(b)) — the
    // log-free PMI variant, so every number is a division chain over
    // exact integer counts (identical op order on both sides, no
    // transcendentals at all). min-count floor 5, top 20 by lift. ----
    Q("q127_bigram_lift",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val toks = docs.select(TextFns.tokens(lower(col("text"))).as("toks"))
        val uni = toks.select(explode(col("toks")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
        // one bigram explode serves the filtered counts AND the total —
        // nBi sums the pre-filter aggregate instead of re-exploding
        val bi0 = toks.select(explode(TextFns.bigrams(col("toks"))).as("bg"))
          .groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
        val bi = bi0.filter(col("c_ab") >= 5)
        val nUni = uni.agg(sum(col("c")).cast("double").as("n_uni"))
        val nBi = bi0.agg(sum(col("c_ab")).cast("double").as("n_bi"))
        val parts = bi
          .withColumn("a", split(col("bg"), " ").getItem(0))
          .withColumn("b", split(col("bg"), " ").getItem(1))
          .join(uni.select(col("w").as("a"), col("c").as("c_a")), "a")
          .join(uni.select(col("w").as("b"), col("c").as("c_b")), "b")
          .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
        parts
          .withColumn("lift", round(
            (col("c_ab") / col("n_bi")) /
              ((col("c_a") / col("n_uni")) * (col("c_b") / col("n_uni"))), 6))
          .select(col("bg"), col("c_ab"), col("c_a"), col("c_b"), col("lift"))
          .orderBy(col("lift").desc, col("bg"))
          .limit(20)
      },
      Some("""WITH tk AS (SELECT CASE WHEN length(trim(text)) = 0
             |          THEN CAST([] AS VARCHAR[])
             |          ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
             |      FROM documents),
             |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c
             |        FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY 1),
             |bg0 AS (SELECT unnest(list_transform(
             |          list_zip(toks[1:len(toks)-1], toks[2:]),
             |          x -> x[1] || ' ' || x[2])) AS bg FROM tk),
             |bi AS (SELECT bg, CAST(count(*) AS BIGINT) AS c_ab FROM bg0
             |       GROUP BY 1 HAVING count(*) >= 5),
             |nu AS (SELECT CAST(sum(c) AS DOUBLE) AS n_uni FROM uni),
             |nb AS (SELECT CAST(count(*) AS DOUBLE) AS n_bi FROM bg0),
             |p AS (SELECT bg, c_ab,
             |        string_split(bg, ' ')[1] AS a, string_split(bg, ' ')[2] AS b
             |      FROM bi),
             |j AS (SELECT p.bg, p.c_ab, ua.c AS c_a, ub.c AS c_b
             |      FROM p JOIN uni ua ON p.a = ua.w JOIN uni ub ON p.b = ub.w)
             |SELECT bg, c_ab, c_a, c_b,
             |  round((CAST(c_ab AS DOUBLE) / nb.n_bi)
             |    / ((CAST(c_a AS DOUBLE) / nu.n_uni)
             |       * (CAST(c_b AS DOUBLE) / nu.n_uni)), 6) AS lift
             |FROM j, nu, nb
             |ORDER BY lift DESC, bg LIMIT 20""".stripMargin)),

    // ---- HLL sketch CUBE (Sketches.hllCube): one register build at the
    // finest grain (lang, source), every rollup level — per (lang,
    // source), per lang, global — derived by max-merging those SAME
    // registers (the merge law), never rescanning documents. Joined to
    // the exact rollup so the sketch error is part of the verified
    // contract. The oracle replays the register fold with GROUPING SETS
    // over the q150 md5 construction — bucket and rank depend only on
    // the value, so registers merged UP equal registers built AT the
    // coarser grain, which is exactly the law the cube exploits. ----
    Q("q163_hll_cube",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cube = graft.operators.Sketches
          .hllCube(docs, "doc_id", Seq("lang", "source"))
        val truth = docs.rollup(col("lang"), col("source"))
          .agg(countDistinct(col("doc_id")).as("true_nd"))
          .select(coalesce(col("lang"), lit("*")).as("lang"),
            coalesce(col("source"), lit("*")).as("source"), col("true_nd"))
        cube.join(truth, Seq("lang", "source"))
          .select(col("lang"), col("source"), col("true_nd"),
            col("raw_est"), col("v_empty"), col("est"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""WITH h AS (SELECT lang, source, doc_id,
             |        CAST(concat('0x', substr(md5(concat('b:', doc_id)), 1, 8))
             |          AS BIGINT) % 64 AS bucket,
             |        CAST(concat('0x', substr(md5(concat('r:', doc_id)), 1, 15))
             |          AS BIGINT) AS hr
             |      FROM documents),
             |reg AS (SELECT coalesce(lang, '*') AS lang,
             |          coalesce(source, '*') AS source, bucket,
             |          max(least(CAST(bit_count((hr & -hr) - 1) AS BIGINT) + 1,
             |                    32)) AS r
             |        FROM h GROUP BY GROUPING SETS
             |          ((lang, source, bucket), (lang, bucket), (bucket))),
             |z AS (SELECT lang, source,
             |        CAST(sum(CAST(1 AS BIGINT) << CAST(32 - r AS INT))
             |          AS BIGINT)
             |          + (64 - count(*)) * 4294967296 AS z_scaled,
             |        64 - count(*) AS v_empty
             |      FROM reg GROUP BY 1, 2),
             |e AS (SELECT lang, source, v_empty,
             |        CAST((2904064 * 4294967296) // (1000 * z_scaled)
             |          AS BIGINT) AS raw_est
             |      FROM z),
             |t AS (SELECT coalesce(lang, '*') AS lang,
             |        coalesce(source, '*') AS source,
             |        CAST(count(DISTINCT doc_id) AS BIGINT) AS true_nd
             |      FROM documents
             |      GROUP BY GROUPING SETS ((lang, source), (lang), ()))
             |SELECT t.lang, t.source, t.true_nd, e.raw_est,
             |  CAST(e.v_empty AS BIGINT) AS v_empty,
             |  CAST(CASE WHEN e.raw_est <= 160 AND e.v_empty > 0
             |    THEN round(64 * ln(64.0 / e.v_empty), 0)
             |    ELSE e.raw_est END AS BIGINT) AS est
             |FROM t JOIN e ON t.lang = e.lang AND t.source = e.source
             |ORDER BY t.lang, t.source""".stripMargin)),

    // ---- Positional inverted index — the retrieval wing's missing
    // foundation (BM25/q97 consumes postings; this MATERIALIZES them):
    // per (term, doc) the term frequency and first 1-based position, per
    // term the document frequency via a term-partitioned window (never
    // global). One tokenize pass; shuffle keyed on (term, doc) with
    // map-side partial counts — the same build a 100-TB index shards by
    // term. ----
    Q("q171_inverted_index",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
        t(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(TextFns.tokens(lower(col("text")))).as(Seq("pos", "term")))
          .groupBy(col("term"), col("doc_id"))
          .agg(count(lit(1)).as("tf"), (min(col("pos")) + 1).as("first_pos"))
          .withColumn("df", count(lit(1)).over(w))
          .select(col("term"), col("doc_id"), col("tf"),
            col("first_pos").cast("long").as("first_pos"), col("df"))
          .orderBy(col("term"), col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0
             |          THEN CAST([] AS VARCHAR[])
             |          ELSE string_split_regex(lower(trim(text)), '\s+') END
             |          AS toks
             |      FROM documents),
             |tok AS (SELECT doc_id,
             |          unnest(generate_series(1, len(toks))) AS pos, toks
             |        FROM d WHERE len(toks) > 0),
             |post AS (SELECT toks[pos] AS term, doc_id,
             |           CAST(count(*) AS BIGINT) AS tf,
             |           CAST(min(pos) AS BIGINT) AS first_pos
             |         FROM tok GROUP BY 1, 2)
             |SELECT term, doc_id, tf, first_pos,
             |  CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
             |FROM post ORDER BY term, doc_id""".stripMargin)),

    // ---- Positional phrase search (Phrase.phraseMatches): exact
    // n-word-phrase occurrence counts per document by a lead-chain over a
    // document-partitioned window — one tokenize pass, ONE shuffle, any
    // phrase length; the self-join formulation would shuffle the postings
    // n−1 times. Phrase "customer join" is a frequent corpus bigram, so
    // the result is non-trivial at every SF. ----
    Q("q174_phrase_search",
      (s, dir) => {
        graft.operators.Phrase
          .phraseMatches(t(s, dir, "documents"), "doc_id", "text",
            "customer join")
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0
             |          THEN CAST([] AS VARCHAR[])
             |          ELSE string_split_regex(lower(trim(text)), '\s+') END
             |          AS toks
             |      FROM documents),
             |tok AS (SELECT doc_id,
             |          unnest(generate_series(1, len(toks))) AS pos, toks
             |        FROM d WHERE len(toks) > 0),
             |l AS (SELECT doc_id, pos, toks[pos] AS term,
             |        lead(toks[pos], 1) OVER (PARTITION BY doc_id
             |          ORDER BY pos) AS t1
             |      FROM tok)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
             |  CAST(min(pos) AS BIGINT) AS first_pos
             |FROM l WHERE term = 'customer' AND t1 = 'join'
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Sketch-screened EXACT heavy hitters: the two-phase pattern
    // that makes exact thresholds affordable at 100 TB — a Count-Min
    // screen first (est >= T has NO false negatives, since est >= true
    // by construction), then the exact count runs ONLY over the
    // candidate tokens (broadcast semi-join prunes the stream before the
    // counting shuffle). The output EQUALS the plain exact threshold —
    // that transparency IS the no-false-negative guarantee made
    // testable, so the oracle is the direct exact query with no sketch
    // in sight. ----
    Q("q189_heavy_hitters",
      (s, dir) => {
        import graft.operators.Sketches
        val docs = t(s, dir, "documents")
        val sketch = Sketches.countMin(docs, "text")
        val toks = docs
          .select(explode(TextFns.tokens(lower(col("text")))).as("t"))
        val cand = Sketches.estimate(sketch, toks.distinct(), "t")
          .filter(col("est") >= 300)
          .select(col("term"))
        toks.join(broadcast(cand), toks("t") === cand("term"), "left_semi")
          .groupBy(col("t").as("term")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= 300)
          .orderBy(col("n").desc, col("term"))
      },
      Some("""WITH tk AS (SELECT unnest(CASE WHEN length(trim(text)) = 0
             |          THEN CAST([] AS VARCHAR[])
             |          ELSE string_split_regex(lower(trim(text)), '\s+') END)
             |          AS t
             |      FROM documents)
             |SELECT t AS term, CAST(count(*) AS BIGINT) AS n
             |FROM tk GROUP BY 1 HAVING count(*) >= 300
             |ORDER BY n DESC, term""".stripMargin)),

    // ---- Misra–Gries heavy hitters (operators/Mg): ONE-PASS candidate
    // surfacing — k counters per partition + the PODS'12 merge law — with
    // the deterministic no-false-negative guarantee above N/(k+1); the
    // exact tail then recounts ONLY the ≤ k candidates (broadcast
    // semi-join) and keeps the support set f·(k+1) > N. Unlike q189's
    // CMS screen this needs NO term list and no full-corpus distinct:
    // the sketch itself proposes. Counters are order-dependent (inherent
    // to MG), the support set is not — the oracle is the plain exact
    // threshold with no sketch in sight. ----
    Q("q219_heavy_hitters_mg",
      (s, dir) => {
        import graft.operators.Mg
        val k = 128
        val toks = t(s, dir, "documents")
          .select(explode(TextFns.tokens(lower(col("text")))).as("t"))
        val cand = Mg.summary(toks, "t", Nil, k).select(col("value"))
        val tot = toks.agg(count(lit(1)).as("n_total"))
        toks.join(broadcast(cand), toks("t") === cand("value"), "left_semi")
          .groupBy(col("t").as("term")).agg(count(lit(1)).as("f"))
          .crossJoin(broadcast(tot))
          .filter(col("f") * (k + 1) > col("n_total"))
          .select(col("term"), col("f"), col("n_total"))
          .orderBy(col("f").desc, col("term"))
      },
      Some(q219OracleSql)),

    // ---- STREAMING Misra–Gries (Mg.streamingSummary): per-microbatch MG
    // summaries land as _SUCCESS-guarded shards and fold on read by the
    // same mergeable-summaries law the batch build uses internally — the
    // invariants (and so the support set f·(k+1) > N) survive ANY batch
    // split, which is why the drained three-batch stream answers with
    // q219's oracle verbatim. Completes the streaming-shard discipline
    // across all five summary families (CMS/HLL/KMV/GK/MG). ----
    Q("q223_stream_heavy_hitters_mg",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import s.implicits._
        import graft.operators.Mg
        val k = 128
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val tmp = java.nio.file.Files.createTempDirectory("graft_q223_").toString
        val input = MemoryStream[(Long, String)]
        for (r <- 0 to 2) {
          input.addData(docs.filter(col("doc_id") % 3 === r)
            .as[(Long, String)].collect().toSeq)
          Mg.streamingSummary(
            input.toDF().toDF("doc_id", "text")
              .select(explode(TextFns.tokens(lower(col("text")))).as("t")),
            "t", Nil, s"$tmp/shards", s"$tmp/ckpt", k)
        }
        val cand = Mg.readMergedSummary(s, s"$tmp/shards", Nil, k)
          .select(col("value"))
        val toks = docs.select(explode(TextFns.tokens(lower(col("text")))).as("t"))
        val tot = toks.agg(count(lit(1)).as("n_total"))
        toks.join(broadcast(cand), toks("t") === cand("value"), "left_semi")
          .groupBy(col("t").as("term")).agg(count(lit(1)).as("f"))
          .crossJoin(broadcast(tot))
          .filter(col("f") * (k + 1) > col("n_total"))
          .select(col("term"), col("f"), col("n_total"))
          .orderBy(col("f").desc, col("term"))
      },
      Some(q219OracleSql)),

    // ---- Characteristic vocabulary per language: terms whose in-language
    // frequency share most exceeds their corpus-wide share — the ratio of
    // ppm shares in integer per-mille, min support 20, top-5 per lang by
    // (ratio, term). The TF-IDF idea as exact integer cross-division:
    // distinctive terms surface without a single float. One tokenize
    // pass; the per-language totals broadcast, the per-term join shuffles
    // on term. ----
    Q("q208_char_terms",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(col("ratio_pm").desc, col("t"))
        val tok = t(s, dir, "documents")
          .select(col("lang"), explode(TextFns.tokens(lower(col("text")))).as("t"))
        val lt = tok.groupBy(col("lang"), col("t")).agg(count(lit(1)).as("n_lt"))
        val tl = tok.groupBy(col("lang")).agg(count(lit(1)).as("tot_lang"))
        val tg = tok.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
        val tot = tok.agg(count(lit(1)).as("tot_all"))
        lt.join(broadcast(tl), "lang").join(tg, "t")
          .crossJoin(broadcast(tot))
          .filter(col("n_lt") >= 20)
          .withColumn("ratio_pm",
            expr("(n_lt * 1000000 DIV tot_lang) * 1000 DIV " +
              "greatest(n_t * 1000000 DIV tot_all, 1)"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .select(col("lang"), col("rn"), col("t").as("term"), col("n_lt"),
            col("ratio_pm"))
          .orderBy(col("lang"), col("rn"))
      },
      Some("""WITH tk AS (SELECT lang, unnest(CASE WHEN length(trim(text)) = 0
             |          THEN CAST([] AS VARCHAR[])
             |          ELSE string_split_regex(lower(trim(text)), '\s+') END)
             |          AS t
             |      FROM documents),
             |lt AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS n_lt
             |       FROM tk GROUP BY 1, 2),
             |tl AS (SELECT lang, CAST(count(*) AS BIGINT) AS tot_lang
             |       FROM tk GROUP BY 1),
             |tg AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t
             |       FROM tk GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS tot_all FROM tk),
             |j AS (SELECT lt.lang, lt.t, lt.n_lt,
             |        (lt.n_lt * 1000000 // tl.tot_lang) * 1000
             |          // greatest(tg.n_t * 1000000 // tot.tot_all, 1)
             |          AS ratio_pm
             |      FROM lt JOIN tl USING (lang) JOIN tg USING (t), tot
             |      WHERE lt.n_lt >= 20),
             |r AS (SELECT lang, t, n_lt, ratio_pm,
             |        CAST(row_number() OVER (PARTITION BY lang
             |          ORDER BY ratio_pm DESC, t) AS BIGINT) AS rn
             |      FROM j)
             |SELECT lang, rn, t AS term, n_lt, ratio_pm
             |FROM r WHERE rn <= 5 ORDER BY lang, rn""".stripMargin)),

    // ---- Skip-gram co-occurrence counts (the word2vec-style training
    // pair extraction): (center, following-context) pairs for contexts
    // 1–3 positions ahead, via THREE leads over one doc-partitioned
    // window — one tokenize pass, one shuffle, where the position
    // self-join costs a join of the token table against itself. Top-20
    // pairs with support ≥ 30, fully deterministic ordering. ----
    Q("q210_skipgrams",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("pos"))
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(TextFns.tokens(lower(col("text")))).as(Seq("pos", "t")))
        toks
          .select(col("t") +: (1 to 3).map(i =>
            lead(col("t"), i).over(w).as(s"c$i")): _*)
          .select(col("t"), explode(array(col("c1"), col("c2"), col("c3")))
            .as("ctx"))
          .filter(col("ctx").isNotNull)
          .groupBy(col("t"), col("ctx"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 30)
          .orderBy(col("n").desc, col("t"), col("ctx"))
          .limit(20)
      },
      Some("""WITH d AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0
             |          THEN CAST([] AS VARCHAR[])
             |          ELSE string_split_regex(lower(trim(text)), '\s+') END
             |          AS toks
             |      FROM documents),
             |tok AS (SELECT doc_id,
             |          unnest(generate_series(1, len(toks))) AS pos, toks
             |        FROM d WHERE len(toks) > 0),
             |p AS (SELECT a.toks[a.pos] AS t, a.toks[a.pos + k.k] AS ctx
             |      FROM tok a, unnest(generate_series(1, 3)) AS k(k)
             |      WHERE a.pos + k.k <= len(a.toks)),
             |c AS (SELECT t, ctx, CAST(count(*) AS BIGINT) AS n
             |      FROM p GROUP BY 1, 2 HAVING count(*) >= 30)
             |SELECT t, ctx, n FROM c
             |ORDER BY n DESC, t, ctx LIMIT 20""".stripMargin))
  )

  private def q125OracleGen(s: SparkSession, dir: String): String = {
    val docs = t(s, dir, "documents")
    val clean = docs.select(col("doc_id"),
      TextFns.redactPii(col("text")).as("text"))
    val model = graft.operators.Bpe.train(clean, "text", numMerges = 40)
    val words = clean
      .select(explode(TextFns.tokens(lower(col("text")))).as("w"))
      .distinct().orderBy(col("w")).collect().map(_.getString(0))
    require(words.nonEmpty, "stream-ingest oracle: empty corpus")
    val dictRows = words.map { w =>
      val ids = graft.operators.Bpe.encodeWord(w, model)
      s"('${w.replace("'", "''")}', '${ids.mkString(" ")}', ${ids.length}, ${ids.count(_ == model.unkId)})"
    }.mkString(",\n    ")
    """WITH dict(word, sub_str, n_sub, n_unk_w) AS (VALUES
      |    __DICT__),
      |r AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text,
      |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |        '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
      |        '\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}\b', '<PHONE>', 'g')
      |        AS clean
      |      FROM documents),
      |d AS (SELECT doc_id,
      |        CASE WHEN length(trim(clean)) = 0 THEN CAST([] AS VARCHAR[])
      |             ELSE string_split_regex(lower(trim(clean)), '\s+') END AS toks
      |      FROM r),
      |f AS (SELECT doc_id, toks FROM d WHERE len(toks) >= 5),
      |tok AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
      |        FROM f),
      |j AS (SELECT doc_id, pos, sub_str, n_sub, n_unk_w
      |      FROM (SELECT doc_id, pos, toks[pos] AS word FROM tok) x
      |      JOIN dict USING (word))
      |SELECT doc_id,
      |  array_to_string(list(sub_str ORDER BY pos), ' ') AS ids_str,
      |  CAST(count(*) AS BIGINT) AS n_words,
      |  CAST(sum(n_sub) AS BIGINT) AS n_toks,
      |  CAST(sum(n_unk_w) AS BIGINT) AS n_unk
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
      .replace("__DICT__", dictRows)
  }

  /** The q106 hygiene chain as a reusable frame: repetition filter ->
    * exact dedup -> benchmark decontamination -> uniform domain mix.
    * Loan-pattern: dd and s3 are persisted for `body`'s lifetime (dd
    * feeds two branches and s3 feeds the mix counts collect PLUS every
    * downstream consumer — uncached, the filter chain would re-execute
    * per consumer, the exact O(stages²) recompute q106 persists against)
    * and released on exit. Shared by q122's query and its oracle
    * generator (which trains the BPE dictionary on these survivors).
    */
  private def withHygieneSurvivors[T](s: SparkSession, dir: String)
                                     (body: DataFrame => T): T = {
    val docs = t(s, dir, "documents")
    val keepRep = graft.operators.QualityFilters
      .repetitionStats(docs, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    val s1 = docs.join(keepRep, Seq("doc_id"), "left_semi")
    val dd = s1.withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
      .persist()
    try {
      val clean = graft.operators.QualityFilters.decontaminate(
          dd, "doc_id", "text",
          docs.filter(col("doc_id") % 41 === 0), "doc_id", "text", n = 8)
        .filter(!col("contaminated")).select(col("doc_id"))
      val s3 = dd.join(clean, Seq("doc_id"), "left_semi").persist()
      try {
        // uniformReweight derives the domain set from its single counts
        // collect — a separate distinct-langs action would re-execute
        // the whole filter chain a second time
        body(graft.operators.DomainMix.uniformReweight(s3, "doc_id", "lang")
          .filter(col("keep")).drop("keep"))
      } finally s3.unpersist(false)
    } finally dd.unpersist(false)
  }

  private def q122OracleGen(s: SparkSession, dir: String): String =
    withHygieneSurvivors(s, dir) { surv0 =>
      val surv = surv0.persist()
      try {
        val model = graft.operators.Bpe.train(surv, "text", numMerges = 40)
        val words = surv
          .select(explode(TextFns.tokens(lower(col("text")))).as("w"))
          .distinct().orderBy(col("w")).collect().map(_.getString(0))
        require(words.nonEmpty, "pretraining-pipeline oracle: no survivors")
        val dictRows = words.map { w =>
          val ids = graft.operators.Bpe.encodeWord(w, model)
          s"('${w.replace("'", "''")}', ${ids.length})"
        }.mkString(",\n    ")
        hygienePrefixSql + ",\n" +
        """dict(word, n_sub) AS (VALUES
          |    __DICT__),
          |surv AS (SELECT s3.doc_id, s3.toks FROM s3 JOIN s4 USING (doc_id)),
          |tokx AS (SELECT doc_id, unnest(toks) AS word FROM surv),
          |tot AS (SELECT CAST(coalesce(sum(n_sub), 0) AS BIGINT) AS tk
          |        FROM tokx JOIN dict USING (word))
          |SELECT * FROM (
          |  SELECT CAST(1 AS BIGINT) AS stage, 'survivors' AS name,
          |    CAST((SELECT count(*) FROM s4) AS BIGINT) AS n
          |  UNION ALL SELECT 2, 'bpe_tokens', (SELECT tk FROM tot)
          |  UNION ALL SELECT 3, 'sequences', (SELECT (tk + 511) // 512 FROM tot)
          |) ORDER BY stage""".stripMargin
          .replace("__DICT__", dictRows)
      } finally surv.unpersist(false)
    }

  private def q118OracleGen(s: SparkSession, dir: String): String = {
    val docs = t(s, dir, "documents")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val targets = counts.map { case (d, n) => d -> math.pow(n / total, 0.5) }
    val th = graft.operators.DomainMix.thresholds(counts, targets, 10000)
    val thRows = th.toSeq.sortBy(_._1)
      .map { case (d, v) => s"('${d.replace("'", "''")}', $v)" }.mkString(",\n    ")
    s"""WITH th(lang, th) AS (VALUES
       |    $thRows)
       |SELECT d.lang, count(*) AS n_total,
       |  CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(
       |        concat(CAST(doc_id AS VARCHAR), ':', d.lang)), 1, 8)) AS BIGINT)
       |        % 10000 < th.th
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM documents d JOIN th ON d.lang = th.lang
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  /** The trained BPE dictionary as oracle-inlinable rows: every distinct
    * corpus word with its subword id sequence, subword count, and unk
    * count — computed driver-side by the same deterministic
    * [[graft.operators.Bpe]] trainer/encoder the queries use. The SQL
    * oracle then replays the DISTRIBUTED part (tokenize, dictionary join,
    * position-ordered per-doc reassembly, counts) independently; the
    * per-word encoding itself is pinned by BpeSpec's textbook cases.
    */
  private def bpeDictRows(s: SparkSession, dir: String): String = {
    val docs = t(s, dir, "documents")
    val model = graft.operators.Bpe.train(docs, "text", numMerges = 40)
    val words = docs
      .select(explode(TextFns.tokens(lower(col("text")))).as("w"))
      .distinct().orderBy(col("w")).collect().map(_.getString(0))
    require(words.nonEmpty, "bpe oracle: empty corpus")
    words.map { w =>
      val ids = graft.operators.Bpe.encodeWord(w, model)
      val esc = w.replace("'", "''")
      s"('$esc', '${ids.mkString(" ")}', ${ids.length}, ${ids.count(_ == model.unkId)})"
    }.mkString(",\n    ")
  }

  // plain (non-interpolated) strings so the oracle's regex escapes survive
  // verbatim; the generated dictionary is spliced in with replace()
  private def q116OracleGen(s: SparkSession, dir: String): String =
    """WITH dict(word, sub_str, n_sub, n_unk_w) AS (VALUES
       |    __DICT__),
       |d AS (SELECT doc_id,
       |        CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |             ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
       |      FROM documents),
       |tok AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
       |        FROM d WHERE len(toks) > 0),
       |j AS (SELECT doc_id, pos, sub_str, n_sub, n_unk_w
       |      FROM (SELECT doc_id, pos, toks[pos] AS word FROM tok) x
       |      JOIN dict USING (word))
       |SELECT doc_id,
       |  array_to_string(list(sub_str ORDER BY pos), ' ') AS ids_str,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_sub) AS BIGINT) AS n_toks,
       |  CAST(sum(n_unk_w) AS BIGINT) AS n_unk
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
      .replace("__DICT__", bpeDictRows(s, dir))

  /** q279 oracle GENERATOR: per-word driver-side decode of the trained
    * encoding inlined as a VALUES dict; DuckDB independently replays the
    * distributed part (tokenize, dict join, position-ordered reassembly,
    * canonical compare). Word-joined reassembly equals the piece-stream
    * decode exactly because the corpus-trained vocabulary has no unknown
    * ids (every character was seen in training).
    */
  private def q279OracleGen(s: SparkSession, dir: String): String = {
    val docs = t(s, dir, "documents")
    val model = graft.operators.Bpe.train(docs, "text", numMerges = 40)
    val words = docs
      .select(explode(TextFns.tokens(lower(col("text")))).as("w"))
      .distinct().orderBy(col("w")).collect().map(_.getString(0))
    require(words.nonEmpty, "bpe oracle: empty corpus")
    val rows = words.map { w =>
      val dec = graft.operators.Bpe.decode(
        graft.operators.Bpe.encodeWord(w, model).toSeq, model)
      s"('${w.replace("'", "''")}', '${dec.replace("'", "''")}')"
    }.mkString(",\n    ")
    """WITH dict(word, dec) AS (VALUES
      |    __DICT__),
      |d AS (SELECT doc_id,
      |        CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |             ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
      |      FROM documents),
      |tok AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
      |        FROM d WHERE len(toks) > 0),
      |j AS (SELECT doc_id, pos, toks[pos] AS word FROM tok),
      |r AS (SELECT j.doc_id,
      |        array_to_string(list(dict.dec ORDER BY j.pos), ' ') AS dec_text,
      |        array_to_string(list(j.word ORDER BY j.pos), ' ') AS canon
      |      FROM j JOIN dict USING (word) GROUP BY j.doc_id)
      |SELECT doc_id, CAST(length(dec_text) AS BIGINT) AS n_chars_decoded,
      |  dec_text = canon AS ok
      |FROM r ORDER BY doc_id""".stripMargin
      .replace("__DICT__", rows)
  }

  private def q117OracleGen(s: SparkSession, dir: String): String =
    """WITH dict(word, sub_str, n_sub, n_unk_w) AS (VALUES
       |    __DICT__),
       |d AS (SELECT doc_id,
       |        CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       |             ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
       |      FROM documents),
       |tok AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
       |        FROM d WHERE len(toks) > 0),
       |cnt AS (SELECT doc_id, CAST(sum(n_sub) AS BIGINT) AS n
       |        FROM (SELECT doc_id, toks[pos] AS word FROM tok) x
       |        JOIN dict USING (word) GROUP BY doc_id),
       |alld AS (SELECT documents.doc_id, CAST(coalesce(n, 0) AS BIGINT) AS n_toks
       |         FROM documents LEFT JOIN cnt ON documents.doc_id = cnt.doc_id),
       |c AS (SELECT doc_id, n_toks,
       |        CAST(coalesce(sum(n_toks) OVER (ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
       |      FROM alld)
       |SELECT doc_id, n_toks, tok_start,
       |  CAST(tok_start // 512 AS BIGINT) AS seq_id,
       |  CAST(tok_start % 512 AS BIGINT) AS seq_offset
       |FROM c ORDER BY doc_id""".stripMargin
      .replace("__DICT__", bpeDictRows(s, dir))

  /** Shared q219/q223 oracle: the plain exact support-set threshold with
    * no sketch in sight — both the batch and the drained-stream MG
    * summaries must surface exactly this set.
    */
  private def q219OracleSql: String =
    """WITH tk AS (SELECT unnest(CASE WHEN length(trim(text)) = 0
      |          THEN CAST([] AS VARCHAR[])
      |          ELSE string_split_regex(lower(trim(text)), '\s+') END)
      |          AS t
      |      FROM documents),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tk)
      |SELECT t AS term, CAST(count(*) AS BIGINT) AS f, tot.n_total
      |FROM tk, tot GROUP BY 1, 3
      |HAVING count(*) * 129 > tot.n_total
      |ORDER BY f DESC, term""".stripMargin
}
