package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** Relational carrier surface (SURVEY.md §2.3-§2.8): projections, filters,
  * joins (broadcast / semi / anti / range / as-of), aggregations, windows,
  * rollup/cube, set ops, sorts/limits.
  *
  * Scale notes are inline per query: small dimensions are broadcast
  * explicitly, aggregations rely on partial (map-side) aggregation, and the
  * as-of join is the single-shuffle union+window formulation.
  */
object RelationalQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  def all: Seq[Q] = Seq(

    // ---- P3/A2-style scan + filter + group aggregate (TPC-H Q1 shape). ----
    // Filter and the two scanned columns push down to parquet; hash agg is
    // partial+final, so at 100 TB only 4 groups cross the shuffle.
    Q("q01_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  count(*) AS n
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- J1/J4: multi-way join with broadcast dimensions. ----
    // nation/region/customer are tiny vs orders at any SF: broadcast them so
    // the only big table never shuffles for the join; agg output is small.
    Q("q02_market_share",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("r_name"), col("c_mktsegment"))
      },
      Some("""SELECT r_name, c_mktsegment, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, c_mktsegment
             |ORDER BY r_name, c_mktsegment""".stripMargin)),

    // ---- TPC-H Q3 shape: join + agg + top-N. ----
    Q("q03_revenue_topn",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        // Aggregate-then-join: revenue depends only on lineitem and
        // o_orderdate is functionally dependent on the order key, so the
        // top-10 is computed from lineitem alone (partial-agg + global
        // TakeOrdered) and the orders join touches 10 rows instead of the
        // whole fact table. At 100 TB this removes the fact-side join
        // entirely from the hot path.
        l.groupBy(col("l_orderkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
          .join(o, col("l_orderkey") === o("o_orderkey"))
          .select(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"), col("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
      },
      Some("""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin)),

    // ---- L2-style per-group top-k via window rank (SURVEY §2.7). ----
    Q("q04_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        t(s, dir, "lineitem")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice"), 2).as("price"), col("rn"))
          .orderBy(col("l_returnflag"), col("rn"))
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber,
             |  round(l_extendedprice, 2) AS price, rn
             |FROM (SELECT *, row_number() OVER (
             |        PARTITION BY l_returnflag
             |        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
             |      FROM lineitem)
             |WHERE rn <= 3
             |ORDER BY l_returnflag, rn""".stripMargin)),

    // ---- J4 semi join (EXISTS). ----
    Q("q05_semi_join",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS total
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- J2/J4 anti join (NOT EXISTS) — the reference's skip-if-present
    // idempotence pattern (arxiv_hook.py:126-128) as a distributed anti join.
    Q("q06_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- U2 set operations. ----
    Q("q07_setops",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val early = o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("o_custkey").as("k"))
        val late = o.filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey").as("k"))
        val ex = early.except(late).agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
        val in = early.intersect(late).agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
        val un = early.union(late).distinct().agg(count(lit(1)).as("n")).select(lit("union_distinct").as("op"), col("n"))
        ex.unionByName(in).unionByName(un).orderBy(col("op"))
      },
      Some("""WITH early AS (SELECT o_custkey AS k FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
             |     late  AS (SELECT o_custkey AS k FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
             |SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM early EXCEPT SELECT * FROM late)
             |UNION ALL
             |SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM early INTERSECT SELECT * FROM late)
             |UNION ALL
             |SELECT 'union_distinct' AS op, count(*) AS n FROM (SELECT DISTINCT * FROM (SELECT * FROM early UNION ALL SELECT * FROM late))
             |ORDER BY op""".stripMargin)),

    // ---- A6 rollup (grouping sets family). ----
    Q("q08_rollup",
      (s, dir) => {
        t(s, dir, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders
             |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // ---- A6 cube. ----
    Q("q09_cube",
      (s, dir) => {
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  round(sum(l_quantity), 2) AS qty
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ---- §2.6 window frame: running total per customer. ----
    Q("q10_running_total",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum(col("o_totalprice")).over(w), 2).as("run_total"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
             |FROM orders
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- J4 range (non-equi band) join against a broadcast-tiny band table.
    Q("q11_quantity_bands",
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        val bands = Seq((0, 10, "00-10"), (10, 20, "10-20"), (20, 30, "20-30"),
          (30, 40, "30-40"), (40, 60, "40+")).toDF("lo", "hi", "band")
        t(s, dir, "lineitem")
          .join(broadcast(bands), col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("total"))
          .orderBy(col("band"))
      },
      Some("""WITH bands(lo, hi, band) AS (VALUES
             |  (0, 10, '00-10'), (10, 20, '10-20'), (20, 30, '20-30'),
             |  (30, 40, '30-40'), (40, 60, '40+'))
             |SELECT band, count(*) AS n, round(sum(l_extendedprice), 2) AS total
             |FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
             |GROUP BY band
             |ORDER BY band""".stripMargin)),

    // ---- J4 as-of join: each event matched to the user's most recent order.
    // Single-shuffle union+window formulation (see AsOfJoin scaladoc).
    Q("q12_asof_join",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").cast("timestamp").as("t"))
          .agg(max(col("o_totalprice")).as("price"))
          .withColumn("od", col("t").cast("date"))
        val e = t(s, dir, "events").select(col("user_id"), col("ts").as("t"), col("event_id"))
        AsOfJoin.asof(e, o, "user_id", "t")
          .filter(col("price").isNotNull)
          .select(col("event_id"), col("user_id"), col("od"), round(col("price"), 2).as("price"))
          .orderBy(col("event_id"))
      },
      Some("""WITH o AS (SELECT o_custkey, o_orderdate, max(o_totalprice) AS price
             |           FROM orders GROUP BY o_custkey, o_orderdate)
             |SELECT e.event_id, e.user_id, CAST(o.o_orderdate AS DATE) AS od,
             |  round(o.price, 2) AS price
             |FROM events e ASOF JOIN o
             |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
             |ORDER BY e.event_id""".stripMargin)),

    // ---- §2.6 ranking/analytic window family in one pass over one sort. ----
    Q("q15_rank_family",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("rn"),
            rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderpriority"))).as("rk"),
            dense_rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderpriority"))).as("drk"),
            lead(col("o_orderkey"), 1).over(w).as("next_ok"),
            first(col("o_orderkey")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_ok"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  row_number() OVER w AS rn,
             |  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rk,
             |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drk,
             |  lead(o_orderkey, 1) OVER w AS next_ok,
             |  first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_ok
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- Salted join for skewed keys: result must equal the plain join
    // (the oracle IS the unsalted formulation). ----
    Q("q17_salted_join",
      (s, dir) => {
        graft.operators.Skew.saltedJoin(
            t(s, dir, "lineitem"),
            t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus")),
            "l_orderkey", factor = 4)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ---- J4 outer-join family (right + full outer; left/semi/anti are
    // q05/q06). Customers with no orders keep null order columns. ----
    Q("q16_outer_joins",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 4000)
        c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_no_order"),
            sum(when(col("c_custkey").isNull, 1).otherwise(0)).as("n_no_cust"))
          .orderBy(asc_nulls_first("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_order,
             |  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_cust
             |FROM customer FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 4000) o
             |  ON c_custkey = o_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin)),

    // ---- A6 exact interpolated percentiles (Spark `percentile` and DuckDB
    // `quantile_cont` share linear-interpolation semantics). ----
    Q("q18_percentiles",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
            round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- A6 approx distinct (HLL++). Algorithm-specific => no SQL oracle;
    // driver records rows>0. Exact distinct is q13's own sanity column pair.
    Q("q13_approx_distinct",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey")).as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          .orderBy(col("l_returnflag"))
      },
      None),

    // ---- Mergeable HLL sketches (A6 scale path): build fine-grained
    // per-(flag, status) sketches ONCE, then answer the coarser per-flag
    // distinct question by unioning sketch partials — the pre-aggregated
    // sketch-table pattern that replaces re-scanning 100 TB per rollup.
    // Not oracle-able (binary sketch format); the <2% relative-error
    // invariant vs the exact count is asserted in a spec. ----
    Q("q67_hll_sketch",
      (s, dir) => {
        val fine = t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
        fine
          .groupBy(col("l_returnflag"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_parts"),
            count(lit(1)).as("n_partials"))
          .orderBy(col("l_returnflag"))
      },
      None)
  )
}
