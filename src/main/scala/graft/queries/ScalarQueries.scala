package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Remaining scalar-function surface from SURVEY.md §2.9: safe_filename
  * (F2), regex extraction (F5), timestamp formatting (F6/F7), and the
  * declarative validation predicates (P4).
  */
object ScalarQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  def all: Seq[Q] = Seq(

    // ---- F2 safe_filename (reference arxiv_hook.py:115-122). ----
    Q("q60_safe_filename",
      (s, dir) => {
        t(s, dir, "part")
          .select(col("p_partkey"), TextFns.safeFilename(col("p_name")).as("fname"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |  replace(trim(regexp_replace(substring(p_name, 1, 50),
             |    '[^A-Za-z0-9 _-]', '', 'g')), ' ', '_') AS fname
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ---- F5 regex extraction (the reference's cost-scrape pattern,
    // zara_hybrid_etl.py:39-75, applied to the events props strings). ----
    Q("q61_regex_extract",
      (s, dir) => {
        t(s, dir, "events")
          .select(col("event_id"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_str"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, regexp_extract(props, '"k": (\d+)', 1) AS k_str
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- F5 proper: the reference's multi-pattern CLI-log scrape
    // (per-op cost line, total-time line, output-path line —
    // zara_hybrid_etl.py:39-75) over deterministically synthesized log
    // texts; every field recovered by regexp_extract in both engines. ----
    Q("q65_log_extract",
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderkey") <= 3000)
        val logText = concat(
          lit("✓ op"), col("o_orderkey") % 7,
          lit(" (Cost: $"), floor(col("o_totalprice")).cast("long"),
          lit(")\nTotal time: "), col("o_orderkey") % 3600,
          lit("s\nOutput saved to: /data/output/run_"), col("o_orderkey"), lit(".json"))
        o.select(col("o_orderkey"), logText.as("log"))
          .select(col("o_orderkey"),
            regexp_extract(col("log"), "✓ (\\w+) \\(Cost: \\$(\\d+)\\)", 1).as("op"),
            regexp_extract(col("log"), "\\(Cost: \\$(\\d+)\\)", 1).cast("long").as("cost"),
            regexp_extract(col("log"), "Total time: (\\d+)s", 1).cast("long").as("secs"),
            regexp_extract(col("log"), "Output saved to: (\\S+)", 1).as("path"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH l AS (SELECT o_orderkey,
             |    concat(chr(10003), ' op', o_orderkey % 7,
             |      ' (Cost: $', CAST(floor(o_totalprice) AS BIGINT),
             |      ')', chr(10), 'Total time: ', o_orderkey % 3600,
             |      's', chr(10), 'Output saved to: /data/output/run_',
             |      o_orderkey, '.json') AS log
             |  FROM orders WHERE o_orderkey <= 3000)
             |SELECT o_orderkey,
             |  regexp_extract(log, concat(chr(10003), ' (\w+) \(Cost: \$(\d+)\)'), 1) AS op,
             |  CAST(regexp_extract(log, '\(Cost: \$(\d+)\)', 1) AS BIGINT) AS cost,
             |  CAST(regexp_extract(log, 'Total time: (\d+)s', 1) AS BIGINT) AS secs,
             |  regexp_extract(log, 'Output saved to: (\S+)', 1) AS path
             |FROM l ORDER BY o_orderkey""".stripMargin)),

    // ---- F11 stdout heuristics (docetl_operator.py:297-317): error/
    // warning/success containment plus the "processed ... <digit>" line
    // picker, over synthesized runner output. ----
    Q("q88_stdout_heuristics",
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderkey") <= 3000)
        val out = concat(
          when(col("o_orderkey") % 5 === 0, lit("ERROR: stage failed\n")).otherwise(lit("")),
          when(col("o_orderkey") % 3 === 0, lit("Warning: slow stage\n")).otherwise(lit("")),
          lit("processed "), col("o_orderkey") % 97, lit(" records\nSuccess: done"))
        o.select(col("o_orderkey"), out.as("stdout"))
          .select(col("o_orderkey"),
            lower(col("stdout")).contains("error").as("has_error"),
            lower(col("stdout")).contains("warning").as("has_warning"),
            lower(col("stdout")).contains("success").as("has_success"),
            regexp_extract(col("stdout"), "processed (\\d+) records", 1)
              .cast("long").as("n_processed"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH l AS (SELECT o_orderkey,
             |    concat(CASE WHEN o_orderkey % 5 = 0 THEN 'ERROR: stage failed' || chr(10) ELSE '' END,
             |      CASE WHEN o_orderkey % 3 = 0 THEN 'Warning: slow stage' || chr(10) ELSE '' END,
             |      'processed ', o_orderkey % 97, ' records', chr(10), 'Success: done') AS stdout
             |  FROM orders WHERE o_orderkey <= 3000)
             |SELECT o_orderkey,
             |  contains(lower(stdout), 'error') AS has_error,
             |  contains(lower(stdout), 'warning') AS has_warning,
             |  contains(lower(stdout), 'success') AS has_success,
             |  CAST(regexp_extract(stdout, 'processed (\d+) records', 1) AS BIGINT) AS n_processed
             |FROM l ORDER BY o_orderkey""".stripMargin)),

    // ---- F6/F7 timestamp formatting (zara_hybrid_etl.py:108/240/265:
    // strftime %Y%m%d_%H%M%S and ISO-8601+Z). ----
    Q("q62_date_format",
      (s, dir) => {
        t(s, dir, "orders")
          .filter(col("o_orderkey") % 37 === 0)
          .select(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyyMMdd_HHmmss").as("ts_key"),
            date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  strftime(o_orderdate, '%Y%m%d_%H%M%S') AS ts_key,
             |  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso
             |FROM orders WHERE o_orderkey % 37 = 0 ORDER BY o_orderkey""".stripMargin)),

    // ---- P4 declarative validation predicates as Column exprs
    // (article_pipeline.yaml.j2:45-48, :85-88). ----
    Q("q63_validate_predicates",
      (s, dir) => {
        val wcSynth = (TextFns.wordCount(col("text")) * 37) % 1400
        t(s, dir, "documents")
          .select(col("doc_id"),
            (TextFns.wordCount(col("text")) >= 25).as("v_abstract_25w"),
            wcSynth.between(700, 1000).as("v_wc_700_1000"),
            (length(expr("substring(text, 1, CAST(doc_id % 70 AS INT))")) <= 60).as("v_headline_60"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  len(string_split_regex(trim(text), '\s+')) >= 25 AS v_abstract_25w,
             |  (len(string_split_regex(trim(text), '\s+')) * 37) % 1400 BETWEEN 700 AND 1000 AS v_wc_700_1000,
             |  len(substring(text, 1, CAST(doc_id % 70 AS INT))) <= 60 AS v_headline_60
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
