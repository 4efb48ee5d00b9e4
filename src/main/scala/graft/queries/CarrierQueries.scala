package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Second wave of relational-carrier coverage (SURVEY §2.4-2.9): pivot /
  * unpivot reshaping, correlated subqueries through the SQL surface
  * (Catalyst decorrelation to semi/anti/aggregate joins), distribution
  * window functions, moment-based statistical aggregates, ordered group
  * concatenation, and the date/interval scalar family.
  *
  * Conventions as everywhere: identical column aliases on both sides,
  * deterministic total ORDER BY, doubles rounded identically.
  */
object CarrierQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  def all: Seq[Q] = Seq(

    // ---- Pivot: long -> wide, explicit value list for a deterministic
    // schema (A6 family). Spark null-fills empty cells; the oracle's CASE
    // without ELSE does the same. ----
    Q("q43_pivot",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(round(sum(col("l_quantity")), 2))
          .withColumnRenamed("F", "qty_f")
          .withColumnRenamed("O", "qty_o")
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- Unpivot: wide -> long via Dataset.unpivot (melt). ----
    Q("q44_unpivot",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_price"),
            count(lit(1)).cast("double").as("n_rows"))
          .unpivot(Array(col("l_returnflag")),
            Array(col("sum_qty"), col("sum_price"), col("n_rows")),
            "metric", "value")
          .orderBy(col("l_returnflag"), col("metric"))
      },
      Some("""WITH a AS (SELECT l_returnflag,
             |    round(sum(l_quantity), 2) AS sum_qty,
             |    round(sum(l_extendedprice), 2) AS sum_price,
             |    CAST(count(*) AS DOUBLE) AS n_rows
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, metric, value FROM (
             |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
             |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
             |  UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM a)
             |ORDER BY l_returnflag, metric""".stripMargin)),

    // ---- Correlated EXISTS / NOT EXISTS through spark.sql — Catalyst
    // decorrelates to one semi and one anti join (RewritePredicateSubquery);
    // same SQL runs verbatim on the oracle. ----
    Q("q45_exists_subquery",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT o_orderpriority, count(*) AS n
                |FROM orders_v o
                |WHERE EXISTS (SELECT 1 FROM lineitem_v l
                |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
                |  AND NOT EXISTS (SELECT 1 FROM lineitem_v l
                |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
                |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, count(*) AS n
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l
             |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- Correlated SCALAR subquery: per-nation top-balance customers
    // (decorrelated to an aggregate + join). Equality on the max is exact —
    // no double accumulation. ----
    Q("q46_corr_subquery",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer_v")
        s.sql("""SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS bal
                |FROM customer_v c
                |WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer_v c2
                |                   WHERE c2.c_nationkey = c.c_nationkey)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS bal
             |FROM customer c
             |WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
             |                   WHERE c2.c_nationkey = c.c_nationkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- Distribution window functions: ntile / percent_rank / cume_dist /
    // nth_value with an explicit ROWS frame (§2.6). The ratios are exact
    // small-integer divisions — bit-identical across engines. ----
    Q("q47_window_extras",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, dir, "orders")
          .filter(col("o_orderkey") <= 4000)
          .select(col("o_orderkey"), col("o_orderpriority"),
            ntile(4).over(w).as("tile"),
            round(percent_rank().over(w), 4).as("pr"),
            round(cume_dist().over(w), 4).as("cd"),
            nth_value(col("o_orderkey"), 2).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("second_k"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |  ntile(4) OVER w AS tile,
             |  round(percent_rank() OVER w, 4) AS pr,
             |  round(cume_dist() OVER w, 4) AS cd,
             |  nth_value(o_orderkey, 2) OVER
             |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_k
             |FROM orders WHERE o_orderkey <= 4000
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- Moment-based statistical aggregates (A6): stddev / variance /
    // correlation / covariance. Rounded to 4 (integer-domain quantity side)
    // and 2 (price covariance) — co-moment accumulation order differs across
    // engines at ~1e-10 relative. ----
    Q("q48_stats_aggs",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qe"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qe"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  round(stddev_samp(l_quantity), 4) AS sd_qty,
             |  round(var_samp(l_quantity), 4) AS var_qty,
             |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qe,
             |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qe
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- Ordered group concatenation (top-5 per group -> one string):
    // window rank + sort_array(collect_list) vs string_agg ORDER BY. ----
    Q("q49_group_concat",
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .groupBy(col("c_nationkey"))
          .agg(concat_ws("|", sort_array(collect_list(col("c_name")))).as("top_names"))
          .orderBy(col("c_nationkey"))
      },
      Some("""WITH r AS (SELECT c_nationkey, c_name,
             |    row_number() OVER (PARTITION BY c_nationkey
             |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer)
             |SELECT c_nationkey, string_agg(c_name, '|' ORDER BY c_name) AS top_names
             |FROM r WHERE rn <= 5 GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // ---- Date scalar family (F6/F7 carrier): quarter truncation, month
    // end, day-of-week, day arithmetic. Engines differ on dow origin
    // (Spark: Sunday=1; DuckDB: Sunday=0) — the oracle normalizes. ----
    Q("q58_date_funcs",
      (s, dir) => {
        t(s, dir, "orders")
          .filter(col("o_orderkey") <= 2000)
          .select(col("o_orderkey"),
            col("o_orderdate").cast("date").as("d"),
            date_trunc("quarter", col("o_orderdate")).cast("date").as("q_start"),
            last_day(col("o_orderdate")).as("m_end"),
            dayofweek(col("o_orderdate")).cast("long").as("dow"),
            datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
              .cast("long").as("days_left"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(o_orderdate AS DATE) AS d,
             |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
             |  last_day(CAST(o_orderdate AS DATE)) AS m_end,
             |  dayofweek(o_orderdate) + 1 AS dow,
             |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_left
             |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin)),

    // ---- Range join, rewritten to an equi join (J4 scale path): joining
    // events into [start, end) time bins with a raw inequality condition
    // plans as a nested-loop join — quadratic at scale. Aligning the bins to
    // a fixed grid lets the join key be the floored timestamp: one hash
    // shuffle, same result. The oracle states the ORIGINAL range form
    // (BETWEEN), proving the rewrite's semantics. ----
    Q("q69_range_bin_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val bins = ev
          .select(date_trunc("hour", col("ts")).as("bin_start"))
          .distinct()
          .withColumn("bin_end", col("bin_start") + expr("INTERVAL 1 HOUR"))
        ev.select(col("event_id"), col("event_type"), col("ts"),
            date_trunc("hour", col("ts")).as("bin_start"))
          .join(bins, "bin_start")
          .groupBy(col("bin_start"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("bin_start"), col("event_type"))
      },
      Some("""WITH bins AS (
             |  SELECT DISTINCT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bin_start,
             |    CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR AS bin_end
             |  FROM events)
             |SELECT b.bin_start, e.event_type, count(*) AS n
             |FROM events e JOIN bins b
             |  ON CAST(e.ts AS TIMESTAMP) >= b.bin_start
             | AND CAST(e.ts AS TIMESTAMP) < b.bin_end
             |GROUP BY b.bin_start, e.event_type
             |ORDER BY b.bin_start, e.event_type""".stripMargin)),

    // ---- Interval arithmetic over event timestamps (§2.9 carrier):
    // shift, bucket-floor, and window-end computations. ----
    Q("q59_intervals",
      (s, dir) => {
        t(s, dir, "events")
          .filter(col("event_id") <= 3000)
          .select(col("event_id"),
            col("ts"),
            (col("ts") + expr("INTERVAL 90 MINUTE")).as("ts_plus"),
            (col("ts") - expr("INTERVAL 1 DAY")).as("ts_minus"),
            date_trunc("minute", col("ts")).as("minute_floor"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  CAST(ts AS TIMESTAMP) AS ts,
             |  CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE AS ts_plus,
             |  CAST(ts AS TIMESTAMP) - INTERVAL 1 DAY AS ts_minus,
             |  CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute_floor
             |FROM events WHERE event_id <= 3000 ORDER BY event_id""".stripMargin))
  )
}
