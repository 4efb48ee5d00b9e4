package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-table queries: JSON accessors (F12), time bucketing (the batch
  * equivalent of the streaming tumbling window, §2.12), lag/lead analytics
  * (§2.6) and gaps-and-islands sessionization (batch analog of
  * session_window).
  */
object EventQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** SCD2 oracle over the full events log — shared by q132 (batch) and
    * q137 (streaming maintenance), whose batch-equivalence contract is
    * exactly "the maintained dimension equals this".
    */
  private lazy val scd2OracleSql: String =
    """WITH ch AS (SELECT user_id, event_type, ts, event_id,
      |        lag(event_type) OVER (PARTITION BY user_id
      |          ORDER BY ts, event_id) AS prev
      |      FROM events),
      |k AS (SELECT user_id, event_type, ts, event_id FROM ch
      |      WHERE prev IS NULL OR prev <> event_type),
      |v AS (SELECT user_id,
      |        CAST(row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts, event_id) AS BIGINT) AS version,
      |        event_type AS state, ts AS valid_from,
      |        lead(ts) OVER (PARTITION BY user_id
      |          ORDER BY ts, event_id) AS valid_to
      |      FROM k)
      |SELECT user_id, version, state, valid_from, valid_to,
      |  valid_to IS NULL AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  /** q306 oracle: the scd2 replay over the observations MINUS the purged
    * subjects — what a batch run over the purged log produces, which the
    * purge's regenerated dimension must equal exactly.
    */
  private lazy val q306OracleSql: String =
    """WITH ch AS (SELECT user_id, event_type, ts, event_id,
      |        lag(event_type) OVER (PARTITION BY user_id
      |          ORDER BY ts, event_id) AS prev
      |      FROM events WHERE user_id % 9 <> 0),
      |k AS (SELECT user_id, event_type, ts, event_id FROM ch
      |      WHERE prev IS NULL OR prev <> event_type),
      |v AS (SELECT user_id,
      |        CAST(row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts, event_id) AS BIGINT) AS version,
      |        event_type AS state, ts AS valid_from,
      |        lead(ts) OVER (PARTITION BY user_id
      |          ORDER BY ts, event_id) AS valid_to
      |      FROM k)
      |SELECT user_id, version, state, valid_from, valid_to,
      |  valid_to IS NULL AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  /** CDC merge oracle over customer base + orders change feed — shared by
    * q145 (batch MERGE) and q148 (streaming maintenance), whose
    * batch-equivalence contract is exactly "the maintained snapshot
    * equals this".
    */
  private lazy val cdcMergedOracleSql: String =
    """WITH base AS (SELECT c_custkey AS id, round(c_acctbal, 2) AS bal,
      |        c_mktsegment AS seg, 0 AS src,
      |        CAST(NULL AS TIMESTAMP) AS s1, CAST(NULL AS BIGINT) AS s2,
      |        CAST(NULL AS VARCHAR) AS op
      |      FROM customer),
      |d AS (SELECT o_custkey AS id, round(o_totalprice, 2) AS bal,
      |        o_orderpriority AS seg, 1 AS src,
      |        o_orderdate AS s1, o_orderkey AS s2,
      |        CASE WHEN o_orderstatus = 'F'
      |              AND o_orderpriority = '1-URGENT'
      |          THEN 'D' ELSE 'U' END AS op
      |      FROM orders),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM d),
      |r AS (SELECT *, row_number() OVER (PARTITION BY id
      |        ORDER BY src DESC, s1 DESC NULLS LAST, s2 DESC NULLS LAST)
      |        AS rn
      |      FROM u)
      |SELECT id, bal, seg FROM r
      |WHERE rn = 1 AND (op IS NULL OR op <> 'D')
      |ORDER BY id""".stripMargin

  def all: Seq[Q] = Seq(

    // ---- F12 JSON accessor + aggregate. ----
    Q("q20_json_extract",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- §2.12 tumbling window, batch form (date_trunc == window('1 hour')).
    Q("q21_hourly_tumbling",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
          .orderBy(col("h"), col("event_type"))
      },
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
             |  count(*) AS n, round(sum(value), 4) AS sv
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- §2.6 lag analytics: per-user value deltas. ----
    Q("q22_event_deltas",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            round(col("value") - lag(col("value"), 1).over(w), 4).as("delta"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
             |  round(value - lag(value) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // ---- Sessionization (gaps-and-islands, 30 min inactivity gap) — the
    // batch analog of session_window; one shuffle on user_id, then two
    // window passes over the same sort order (no extra exchange).
    Q("q23_sessionize",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        t(s, dir, "events")
          .withColumn("new_s", when(gapUs.isNull || gapUs > 1800000000L, 1).otherwise(0))
          .withColumn("sess", sum(col("new_s")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess"))
          .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_ev"),
            max(col("event_id")).as("last_ev"))
          .orderBy(col("user_id"), col("sess"))
      },
      Some("""WITH x AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events),
             |y AS (
             |  SELECT user_id, event_id,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                     ROWS UNBOUNDED PRECEDING) AS sess
             |  FROM x)
             |SELECT user_id, CAST(sess AS BIGINT) AS sess, count(*) AS n,
             |  min(event_id) AS first_ev, max(event_id) AS last_ev
             |FROM y GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin)),

    // ---- Ordered funnel: the view -> click -> purchase progression, each
    // stage's timestamp the FIRST occurrence strictly after the previous
    // stage (so an out-of-order purchase before any click does not count).
    // Three conditional-min aggregations, each stage joining the (tiny,
    // one row per user) previous stage back — no windows, no sort. ----
    Q("q113_funnel",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val c = e.join(v, "user_id")
          .filter(col("event_type") === "click" && col("ts") > col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
        val p = e.join(c, "user_id")
          .filter(col("event_type") === "purchase" && col("ts") > col("t_click"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("t_purchase").isNotNull, 3)
              .when(col("t_click").isNotNull, 2).otherwise(1).as("stage"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |v AS (SELECT user_id, min(ts) AS t_view FROM e
             |      WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(e.ts) AS t_click
             |      FROM e JOIN v ON v.user_id = e.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t_view
             |      GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
             |      FROM e JOIN c ON c.user_id = e.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             |      GROUP BY e.user_id)
             |SELECT v.user_id,
             |  CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
             |            WHEN c.t_click IS NOT NULL THEN 2 ELSE 1 END AS INT) AS stage
             |FROM v LEFT JOIN c ON c.user_id = v.user_id
             |       LEFT JOIN p ON p.user_id = v.user_id
             |ORDER BY v.user_id""".stripMargin)),

    // ---- Weekly cohort retention: users grouped by first-seen week,
    // counted per week offset they return in. Week offsets are integer
    // day-diffs floor-divided by 7 (both engines truncate non-negative
    // values identically; a raw CAST would ROUND in DuckDB). ----
    Q("q114_cohort_retention",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
          .distinct()
        val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
        e.join(first, "user_id")
          .select(col("cohort"),
            floor(datediff(col("wk"), col("cohort")) / 7).cast("int").as("wk_offset"),
            col("user_id"))
          .groupBy(col("cohort"), col("wk_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort"), col("wk_offset"))
      },
      Some("""WITH e AS (SELECT DISTINCT user_id,
             |        CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
             |      FROM events),
             |f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id)
             |SELECT f.cohort, CAST(date_diff('day', f.cohort, e.wk) // 7 AS INT) AS wk_offset,
             |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
             |FROM e JOIN f ON f.user_id = e.user_id
             |GROUP BY 1, 2 ORDER BY cohort, wk_offset""".stripMargin)),

    // ---- Markov event-transition matrix: per-user next-event chains
    // (lag windows keyed by user_id — high cardinality, no skew), counts
    // plus the empirical transition probability. The division runs on
    // exact integer counts with one op order on both sides. Ties in
    // event time are broken by event_id so the chain is total. ----
    Q("q130_markov_transitions",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val trans = t(s, dir, "events")
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val totals = trans.groupBy(col("from_type"))
          .agg(sum(col("n")).as("n_from"))
        trans.join(totals, "from_type")
          .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
            round(col("n").cast("double") / col("n_from"), 6).as("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH tr AS (SELECT event_type AS from_type,
             |        lead(event_type) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS to_type
             |      FROM events),
             |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |      FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
             |      FROM c GROUP BY 1)
             |SELECT c.from_type, c.to_type, c.n, f.n_from,
             |  round(CAST(c.n AS DOUBLE) / f.n_from, 6) AS p
             |FROM c JOIN f USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // ---- Market-basket co-purchase pairs: parts bought together in one
    // order (frequent-itemset support), ranked by lift. Pair generation
    // is WITHIN-order (work bounded by basket size squared, never
    // corpus^2 — the same blocking discipline as LSH buckets); support
    // and item counts are exact integers, lift one shared division
    // chain. ----
    Q("q131_copurchase",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val nOrders = t(s, dir, "orders")
          .agg(countDistinct(col("o_orderkey")).cast("double").as("n_ord"))
        val itemN = li.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
        val pairs = li.select(col("ok"), col("pk").as("pa"))
          .join(li.select(col("ok"), col("pk").as("pb")), "ok")
          .filter(col("pa") < col("pb"))
          .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
        pairs
          .join(itemN.select(col("pk").as("pa"), col("n_item").as("na")), "pa")
          .join(itemN.select(col("pk").as("pb"), col("n_item").as("nb")), "pb")
          .crossJoin(broadcast(nOrders))
          .select(col("pa"), col("pb"), col("support"), col("na"), col("nb"),
            round((col("support") / col("n_ord")) /
              ((col("na") / col("n_ord")) * (col("nb") / col("n_ord"))), 6)
              .as("lift"))
          .orderBy(col("lift").desc, col("pa"), col("pb"))
          .limit(20)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             |            FROM lineitem),
             |no AS (SELECT CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS n_ord
             |       FROM orders),
             |it AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_item FROM li GROUP BY 1),
             |p AS (SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS support
             |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
             |      GROUP BY 1, 2 HAVING count(*) >= 2)
             |SELECT p.pa, p.pb, p.support, ia.n_item AS na, ib.n_item AS nb,
             |  round((CAST(p.support AS DOUBLE) / no.n_ord)
             |    / ((CAST(ia.n_item AS DOUBLE) / no.n_ord)
             |       * (CAST(ib.n_item AS DOUBLE) / no.n_ord)), 6) AS lift
             |FROM p JOIN it ia ON ia.pk = p.pa JOIN it ib ON ib.pk = p.pb, no
             |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin)),

    // ---- SCD Type-2 dimension history (operators/Scd): collapse each
    // user's event-type observation log into version rows with
    // [valid_from, valid_to) intervals — re-observations of the same
    // state extend the current version. Two key-partitioned window
    // passes, ts+event_id total order; the oracle is the identical
    // lag/lead formulation. ----
    Q("q132_scd2_history",
      (s, dir) => {
        graft.operators.Scd.scd2(t(s, dir, "events"),
            "user_id", "event_type", "ts", "event_id")
          .orderBy(col("user_id"), col("version"))
      },
      Some(scd2OracleSql)),

    // ---- STREAMING SCD2 maintenance (streaming/StreamingScd):
    // observations arrive in three microbatches split by event_id % 3 —
    // heavily out-of-order, so most batches REWRITE touched keys'
    // histories — against an idempotent observation log and a
    // bucket-partitioned dimension rewritten only where touched. The
    // final dimension must equal the one-shot batch scd2 over all
    // events: the oracle IS q132's. ----
    Q("q137_stream_scd2",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import s.implicits._
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        val tmp = java.nio.file.Files.createTempDirectory("graft_q137_").toString
        val input = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
        val q = graft.streaming.StreamingScd.sink(
          input.toDF().toDF("user_id", "event_type", "ts", "event_id"),
          "user_id", Seq("event_type"), "ts", "event_id",
          s"$tmp/obs", s"$tmp/dim", s"$tmp/ckpt")
        try {
          for (r <- 0 to 2) {
            input.addData(ev.filter(col("event_id") % 3 === r)
              .as[(Long, String, java.sql.Timestamp, Long)].collect().toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        graft.streaming.StreamingScd.dim(s, s"$tmp/dim")
          .select(col("user_id"), col("version"),
            col("state.event_type").as("state"),
            col("valid_from"), col("valid_to"), col("is_current"))
          .orderBy(col("user_id"), col("version"))
      },
      Some(scd2OracleSql)),

    // ---- COMPLIANCE PURGE of the SCD pair (StreamingScd.purgeKeys): the
    // q137 maintained stores, then every user_id ≡ 0 (mod 9) erased from
    // BOTH — observations rewritten out of the touched log buckets, and
    // the dimension needing no purge logic of its own because it is a
    // pure function of the log per bucket: the touched buckets simply
    // REGENERATE from the purged log, co-bucketed survivors re-version to
    // what a batch run over the purged observations produces (exactly
    // this oracle), and a purged user yields no versions at all.
    // Emptied buckets drop explicitly (the q148 rule — dynamic overwrite
    // cannot replace a partition the write produces no rows for, and the
    // un-replaced files would be exactly where the purged bytes
    // survive). ----
    Q("q306_scd2_purge",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import s.implicits._
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        val tmp = java.nio.file.Files.createTempDirectory("graft_q306_").toString
        val input = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
        val q = graft.streaming.StreamingScd.sink(
          input.toDF().toDF("user_id", "event_type", "ts", "event_id"),
          "user_id", Seq("event_type"), "ts", "event_id",
          s"$tmp/obs", s"$tmp/dim", s"$tmp/ckpt")
        try {
          for (r <- 0 to 2) {
            input.addData(ev.filter(col("event_id") % 3 === r)
              .as[(Long, String, java.sql.Timestamp, Long)].collect().toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        graft.streaming.StreamingScd.purgeKeys(
          ev.filter(col("user_id") % 9 === 0).select(col("user_id")),
          "user_id", Seq("event_type"), "ts", "event_id",
          s"$tmp/obs", s"$tmp/dim")
        graft.streaming.StreamingScd.dim(s, s"$tmp/dim")
          .select(col("user_id"), col("version"),
            col("state.event_type").as("state"),
            col("valid_from"), col("valid_to"), col("is_current"))
          .orderBy(col("user_id"), col("version"))
      },
      Some(q306OracleSql)),

    // ---- Point-in-time SCD2 consumption (operators/Scd.pointInTime):
    // the dimension is each user's non-purchase activity state; the facts
    // are the purchases; each purchase is joined to the version valid at
    // its timestamp. The as-of union+window shape shuffles each side once
    // on the key — PlanSpec pins that no broadcast-nested-loop/cartesian
    // plan sneaks in — while the oracle states the same semantics as the
    // plain interval range join it IS. ----
    Q("q138_scd2_pit",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val dim = graft.operators.Scd.scd2(
          ev.filter(col("event_type") =!= "purchase"),
          "user_id", "event_type", "ts", "event_id")
        val facts = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            round(col("value"), 4).as("fact_value"))
        graft.operators.Scd.pointInTime(facts, dim, "user_id", "ts")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("fact_value"), col("version"), col("state"), col("valid_to"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH ch AS (SELECT user_id, event_type, ts, event_id,
             |        lag(event_type) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS prev
             |      FROM events WHERE event_type <> 'purchase'),
             |k AS (SELECT user_id, event_type, ts, event_id FROM ch
             |      WHERE prev IS NULL OR prev <> event_type),
             |v AS (SELECT user_id,
             |        CAST(row_number() OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS BIGINT) AS version,
             |        event_type AS state, ts AS valid_from,
             |        lead(ts) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS valid_to
             |      FROM k),
             |f AS (SELECT user_id, ts, event_id, round(value, 4) AS fact_value
             |      FROM events WHERE event_type = 'purchase')
             |SELECT f.user_id, f.event_id, f.ts, f.fact_value,
             |  v.version, v.state, v.valid_to
             |FROM f LEFT JOIN v
             |  ON f.user_id = v.user_id AND f.ts >= v.valid_from
             | AND (v.valid_to IS NULL OR f.ts < v.valid_to)
             |ORDER BY f.user_id, f.event_id""".stripMargin)),

    // ---- Multi-attribute SCD2: the dimension state is the TUPLE
    // (event_type, k-band); a version opens when EITHER attribute moves.
    // The operator compares the whole struct null-safely in one lag; the
    // query flattens the struct for the driver compare, and the oracle is
    // the identical two-lag formulation. ----
    Q("q135_scd2_multi_attr",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("band",
            expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 25"))
        graft.operators.Scd.scd2(ev, "user_id", Seq("event_type", "band"),
            "ts", "event_id")
          .select(col("user_id"), col("version"),
            col("state.event_type").as("state_event_type"),
            col("state.band").as("state_band"),
            col("valid_from"), col("valid_to"), col("is_current"))
          .orderBy(col("user_id"), col("version"))
      },
      Some("""WITH e0 AS (SELECT user_id, event_type,
             |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS kk,
             |        ts, event_id FROM events),
             |e AS (SELECT user_id, event_type,
             |        CASE WHEN kk >= 0 THEN kk // 25
             |             ELSE -((-kk) // 25) END AS band,
             |        ts, event_id FROM e0),
             |ch AS (SELECT user_id, event_type, band, ts, event_id,
             |        lag(event_type) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS pet,
             |        lag(band) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS pb
             |      FROM e),
             |k AS (SELECT user_id, event_type, band, ts, event_id FROM ch
             |      WHERE (pet IS DISTINCT FROM event_type)
             |         OR (pb IS DISTINCT FROM band)),
             |v AS (SELECT user_id,
             |        CAST(row_number() OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS BIGINT) AS version,
             |        event_type AS state_event_type, band AS state_band,
             |        ts AS valid_from,
             |        lead(ts) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS valid_to
             |      FROM k)
             |SELECT user_id, version, state_event_type, state_band,
             |  valid_from, valid_to, valid_to IS NULL AS is_current
             |FROM v ORDER BY user_id, version""".stripMargin)),

    // ---- CDC apply (operators/Cdc): MERGE the orders log into the
    // customer snapshot as last-writer-wins upserts with deletes — each
    // order is a change record for its customer (payload: price, priority
    // band), sequenced by (o_orderdate, o_orderkey); a finalized urgent
    // order is the tombstone. One key-partitioned window pass, no join;
    // the oracle replays the same union + row_number recipe (and is
    // shared with q148, whose contract is "the maintained streaming
    // snapshot equals this batch MERGE"). ----
    Q("q145_cdc_apply",
      (s, dir) => {
        val snap = t(s, dir, "customer")
          .select(col("c_custkey").as("id"),
            round(col("c_acctbal"), 2).as("bal"),
            col("c_mktsegment").as("seg"))
        val deltas = t(s, dir, "orders")
          .select(col("o_custkey").as("id"),
            round(col("o_totalprice"), 2).as("bal"),
            col("o_orderpriority").as("seg"),
            when(col("o_orderstatus") === "F" &&
              col("o_orderpriority") === "1-URGENT", "D")
              .otherwise("U").as("op"),
            col("o_orderdate").as("seq_ts"), col("o_orderkey").as("seq_id"))
        graft.operators.Cdc.applyDeltas(snap, deltas, "id",
            Seq("seq_ts", "seq_id"))
          .orderBy(col("id"))
      },
      Some(cdcMergedOracleSql)),

    // ---- STREAMING CDC apply (streaming/StreamingCdc): the same change
    // feed arrives in three microbatches keyed o_orderkey % 3 — i.e. NOT
    // in sequence order — against a bootstrapped customer snapshot.
    // Latest-seq-wins resolution is commutative over batches, tombstones
    // persist in the log, and touched key-hash buckets are resolved
    // whole as a pure function of the log (the StreamingScd crash-safety
    // argument). The maintained snapshot must equal the q145 batch
    // MERGE: the oracle IS q145's. ----
    Q("q148_stream_cdc",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import s.implicits._
        val snap = t(s, dir, "customer")
          .select(col("c_custkey").as("id"),
            round(col("c_acctbal"), 2).as("bal"),
            col("c_mktsegment").as("seg"))
        val deltas = t(s, dir, "orders")
          .select(col("o_custkey").as("id"),
            round(col("o_totalprice"), 2).as("bal"),
            col("o_orderpriority").as("seg"),
            when(col("o_orderstatus") === "F" &&
              col("o_orderpriority") === "1-URGENT", "D")
              .otherwise("U").as("op"),
            col("o_orderdate").as("seq_ts"), col("o_orderkey").as("seq_id"),
            col("o_orderkey").as("change_id"))
        val tmp = java.nio.file.Files.createTempDirectory("graft_q148_").toString
        graft.streaming.StreamingCdc.bootstrap(snap, "id",
          Seq("seq_ts", "seq_id"), Seq("timestamp", "bigint"),
          "op", "change_id", s"$tmp/log", s"$tmp/snap")
        val input = MemoryStream[
          (Long, Double, String, String, java.sql.Timestamp, Long, Long)]
        val q = graft.streaming.StreamingCdc.sink(
          input.toDF().toDF("id", "bal", "seg", "op", "seq_ts", "seq_id",
            "change_id"),
          "id", Seq("seq_ts", "seq_id"), "op", "change_id",
          s"$tmp/log", s"$tmp/snap", s"$tmp/ckpt")
        try {
          for (r <- 0 to 2) {
            input.addData(deltas.filter(col("seq_id") % 3 === r)
              .as[(Long, Double, String, String, java.sql.Timestamp, Long, Long)]
              .collect().toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        graft.streaming.StreamingCdc.snapshot(s, s"$tmp/snap")
          .orderBy(col("id"))
      },
      Some(cdcMergedOracleSql)),

    // ---- COMPLIANCE PURGE of the CDC pair (StreamingCdc.purgeKeys):
    // the q148 maintained stores, then every custkey ≡ 0 (mod 13) erased
    // from BOTH — change records AND the bootstrap base rows rewritten
    // out of the touched log buckets (a CDC delete record still carries
    // the subject's key and last payload, exactly what a purge must not
    // retain), and the snapshot needing no purge logic of its own: the
    // touched buckets re-resolve from the purged log, per-key resolution
    // making end-filtering and log-filtering provably identical — which
    // is what the oracle checks: the q148 merge over the non-purged keys
    // only. ----
    Q("q308_cdc_purge",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import s.implicits._
        val snap = t(s, dir, "customer")
          .select(col("c_custkey").as("id"),
            round(col("c_acctbal"), 2).as("bal"),
            col("c_mktsegment").as("seg"))
        val deltas = t(s, dir, "orders")
          .select(col("o_custkey").as("id"),
            round(col("o_totalprice"), 2).as("bal"),
            col("o_orderpriority").as("seg"),
            when(col("o_orderstatus") === "F" &&
              col("o_orderpriority") === "1-URGENT", "D")
              .otherwise("U").as("op"),
            col("o_orderdate").as("seq_ts"), col("o_orderkey").as("seq_id"),
            col("o_orderkey").as("change_id"))
        val tmp = java.nio.file.Files.createTempDirectory("graft_q308_").toString
        graft.streaming.StreamingCdc.bootstrap(snap, "id",
          Seq("seq_ts", "seq_id"), Seq("timestamp", "bigint"),
          "op", "change_id", s"$tmp/log", s"$tmp/snap")
        val input = MemoryStream[
          (Long, Double, String, String, java.sql.Timestamp, Long, Long)]
        val q = graft.streaming.StreamingCdc.sink(
          input.toDF().toDF("id", "bal", "seg", "op", "seq_ts", "seq_id",
            "change_id"),
          "id", Seq("seq_ts", "seq_id"), "op", "change_id",
          s"$tmp/log", s"$tmp/snap", s"$tmp/ckpt")
        try {
          for (r <- 0 to 2) {
            input.addData(deltas.filter(col("seq_id") % 3 === r)
              .as[(Long, Double, String, String, java.sql.Timestamp, Long, Long)]
              .collect().toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        graft.streaming.StreamingCdc.purgeKeys(
          snap.select(col("id")).unionByName(deltas.select(col("id")))
            .filter(col("id") % 13 === 0),
          "id", Seq("seq_ts", "seq_id"), "op", "change_id",
          s"$tmp/log", s"$tmp/snap")
        graft.streaming.StreamingCdc.snapshot(s, s"$tmp/snap")
          .orderBy(col("id"))
      },
      Some(
        """WITH base AS (SELECT c_custkey AS id, round(c_acctbal, 2) AS bal,
          |        c_mktsegment AS seg, 0 AS src,
          |        CAST(NULL AS TIMESTAMP) AS s1, CAST(NULL AS BIGINT) AS s2,
          |        CAST(NULL AS VARCHAR) AS op
          |      FROM customer WHERE c_custkey % 13 <> 0),
          |d AS (SELECT o_custkey AS id, round(o_totalprice, 2) AS bal,
          |        o_orderpriority AS seg, 1 AS src,
          |        o_orderdate AS s1, o_orderkey AS s2,
          |        CASE WHEN o_orderstatus = 'F'
          |              AND o_orderpriority = '1-URGENT'
          |          THEN 'D' ELSE 'U' END AS op
          |      FROM orders WHERE o_custkey % 13 <> 0),
          |u AS (SELECT * FROM base UNION ALL SELECT * FROM d),
          |r AS (SELECT *, row_number() OVER (PARTITION BY id
          |        ORDER BY src DESC, s1 DESC NULLS LAST, s2 DESC NULLS LAST)
          |        AS rn
          |      FROM u)
          |SELECT id, bal, seg FROM r
          |WHERE rn = 1 AND (op IS NULL OR op <> 'D')
          |ORDER BY id""".stripMargin)),

    // ---- Time-series gap fill + interpolation (operators/TimeSeries):
    // per-user daily purchase cents densified onto each user's own day
    // span, forward-filled and linearly interpolated. Cents are per-event
    // half-up-rounded integers BEFORE the sum so every engine's total is
    // bit-exact; interp is the one double column (exact integer product,
    // one IEEE division, round 2 — same op sequence in the oracle). ----
    Q("q146_gap_fill",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
        graft.operators.TimeSeries
          .gapFillInterpolate(daily, "user_id", "day", "cents")
          .orderBy(col("user_id"), col("day"))
      },
      Some("""WITH daily AS (
             |  SELECT user_id, date_trunc('day', ts) AS day,
             |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
             |         FROM daily GROUP BY 1),
             |grid AS (SELECT user_id,
             |           unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
             |         FROM span),
             |j AS (SELECT g.user_id, g.day, d.cents AS observed
             |      FROM grid g LEFT JOIN daily d
             |        ON g.user_id = d.user_id AND g.day = d.day),
             |w AS (SELECT user_id, day, observed,
             |        last_value(observed IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
             |        last_value(CASE WHEN observed IS NOT NULL THEN day END
             |          IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY day
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             |        first_value(observed IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY day
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |        first_value(CASE WHEN observed IS NOT NULL THEN day END
             |          IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY day
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
             |      FROM j)
             |SELECT user_id, day, observed, ffill,
             |  CASE WHEN observed IS NOT NULL THEN CAST(observed AS DOUBLE)
             |       WHEN ffill IS NOT NULL AND nv IS NOT NULL THEN
             |         round(ffill + ((nv - ffill) * date_diff('day', pd, day))
             |           / date_diff('day', pd, nd), 2)
             |       ELSE NULL END AS interp
             |FROM w ORDER BY user_id, day""".stripMargin)),

    // ---- Last-touch marketing attribution: each purchase's value lands
    // on the most recent preceding click/view of the same user within a
    // 3-day lookback, else 'unattributed'. Two IGNORE-NULLS window reads
    // over the (ts, event_id)-ordered event stream — the same frame both
    // sides, so both engines pick the identical touch row; revenue is
    // per-event integer cents. ----
    Q("q147_attribution",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val touch = when(col("event_type").isin("click", "view"), col("ts"))
        val touchTy =
          when(col("event_type").isin("click", "view"), col("event_type"))
        t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), col("value"),
            last(touch, ignoreNulls = true).over(w).as("lt_ts"),
            last(touchTy, ignoreNulls = true).over(w).as("lt_ty"))
          .filter(col("event_type") === "purchase")
          .select(
            when(col("lt_ts").isNotNull &&
              col("ts").cast("long") - col("lt_ts").cast("long") <= 259200L,
              col("lt_ty")).otherwise(lit("unattributed")).as("channel"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
          .orderBy(col("channel"))
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type, value,
             |        last_value(CASE WHEN event_type IN ('click', 'view')
             |          THEN ts END IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_ts,
             |        last_value(CASE WHEN event_type IN ('click', 'view')
             |          THEN event_type END IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_ty
             |      FROM events),
             |p AS (SELECT CASE WHEN lt_ts IS NOT NULL
             |          AND date_diff('second', lt_ts, ts) <= 259200
             |        THEN lt_ty ELSE 'unattributed' END AS channel,
             |        CAST(round(value * 100) AS BIGINT) AS cents
             |      FROM e WHERE event_type = 'purchase')
             |SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
             |  CAST(sum(cents) AS BIGINT) AS cents
             |FROM p GROUP BY channel ORDER BY channel""".stripMargin)),

    // ---- OHLC time-series downsample: per (hour, event_type) candle —
    // open/close are the values at the earliest/latest (ts, event_id),
    // high/low the extremes, all in integer cents. One hash shuffle with
    // full map-side partial aggregation: min_by/max_by over the unique
    // (ts, event_id) struct replaces the two-window row_number approach,
    // which would sort every partition twice. OHLC is a mergeable
    // summary (min_by/max_by/min/max/count all fold associatively), so
    // per-shard candles union+re-aggregate at 100 TB without rescanning
    // — same law the sketch family leans on. ----
    Q("q164_ohlc",
      (s, dir) => {
        t(s, dir, "events")
          .select(date_trunc("hour", col("ts")).as("h"), col("event_type"),
            col("ts"), col("event_id"),
            round(col("value") * 100).cast("long").as("c"))
          .groupBy(col("h"), col("event_type"))
          .agg(
            min_by(col("c"), struct(col("ts"), col("event_id"))).as("open"),
            max(col("c")).as("high"),
            min(col("c")).as("low"),
            max_by(col("c"), struct(col("ts"), col("event_id"))).as("close"),
            count(lit(1)).as("volume"))
          .orderBy(col("h"), col("event_type"))
      },
      Some("""WITH e AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             |        event_type, ts, event_id,
             |        CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events),
             |r AS (SELECT *,
             |        row_number() OVER (PARTITION BY h, event_type
             |          ORDER BY ts, event_id) AS rn_a,
             |        row_number() OVER (PARTITION BY h, event_type
             |          ORDER BY ts DESC, event_id DESC) AS rn_d
             |      FROM e)
             |SELECT h, event_type,
             |  max(CASE WHEN rn_a = 1 THEN c END) AS open,
             |  max(c) AS high, min(c) AS low,
             |  max(CASE WHEN rn_d = 1 THEN c END) AS close,
             |  CAST(count(*) AS BIGINT) AS volume
             |FROM r GROUP BY h, event_type
             |ORDER BY h, event_type""".stripMargin)),

    // ---- Trailing-window anomaly detection: per user, flag events whose
    // cents deviate from the trailing-10-event mean by more than 200%,
    // entirely in integers — dev_bp = |c·n − S|·10⁴ div S is the
    // deviation in basis points with the mean's division cross-multiplied
    // away, so there is no float in the contract and the oracle replays
    // it exactly. The window is partitioned by user and bounded (ROWS 10
    // PRECEDING..1 PRECEDING): per-key state is O(10) — the same shape a
    // streaming fMGWS port would keep — and never a global sort. Warm-up
    // guard n >= 5 keeps early-history noise out. ----
    Q("q169_anomaly",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-10, -1)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            round(col("value") * 100).cast("long").as("c"),
            count(lit(1)).over(w).as("n_trail"),
            sum(round(col("value") * 100).cast("long")).over(w).as("s_trail"))
          .filter(col("n_trail") >= 5)
          .withColumn("dev_bp",
            expr("abs(c * n_trail - s_trail) * 10000L DIV s_trail"))
          .filter(col("dev_bp") > 20000)
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, ts,
             |        CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events),
             |w AS (SELECT user_id, event_id, c,
             |        CAST(count(*) OVER win AS BIGINT) AS n_trail,
             |        CAST(sum(c) OVER win AS BIGINT) AS s_trail
             |      FROM e WINDOW win AS (PARTITION BY user_id
             |        ORDER BY ts, event_id
             |        ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
             |SELECT user_id, event_id, c, n_trail, s_trail,
             |  CAST(abs(c * n_trail - s_trail) * 10000 // s_trail
             |    AS BIGINT) AS dev_bp
             |FROM w WHERE n_trail >= 5
             |  AND abs(c * n_trail - s_trail) * 10000 // s_trail > 20000
             |ORDER BY user_id, event_id""".stripMargin)),

    // ---- Group-wise linear trend (Trend.groupTrend): OLS slope of cents
    // over epoch DAYS per event type, as the integer rational
    // (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — five plain sums, one shuffle,
    // float-free contract (the 6-dp double is a ride-along). x is
    // pre-scaled to days so BIGINT holds to ~10⁹ rows per group
    // (Trend.scala's overflow budget). ----
    Q("q172_groupwise_trend",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"),
            expr("CAST(ts AS LONG) DIV 86400").as("x"),
            round(col("value") * 100).cast("long").as("y"))
        graft.operators.Trend.groupTrend(ev, Seq("event_type"), "x", "y")
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT event_type,
             |        CAST(epoch(ts) AS BIGINT) // 86400 AS x,
             |        CAST(round(value * 100) AS BIGINT) AS y
             |      FROM events),
             |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(x) AS BIGINT) AS sx,
             |        CAST(sum(y) AS BIGINT) AS sy,
             |        CAST(sum(x * y) AS BIGINT) AS sxy,
             |        CAST(sum(x * x) AS BIGINT) AS sxx
             |      FROM e GROUP BY 1)
             |SELECT event_type, n,
             |  n * sxy - sx * sy AS slope_num,
             |  n * sxx - sx * sx AS slope_den,
             |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
             |    ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
             |      / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope6
             |FROM a ORDER BY event_type""".stripMargin)),

    // ---- Winsorization (Selection.groupQuantileBounds): clamp each
    // group's cents to its exact [p5, p95] — the robust-stats guard a
    // metrics pipeline applies before averaging over heavy tails. Bounds
    // come from per-group counting selection over a GROUP-partitioned
    // cumulative window (distributed across groups; a single colossal
    // group would use the q170 two-phase scan), then broadcast back for
    // the clamped re-aggregate. All integer. ----
    Q("q178_winsorize",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        val bounds = graft.operators.Selection
          .groupQuantileBounds(ev, "event_type", "c", 5, 95)
        ev.join(broadcast(bounds), Seq("event_type"))
          .groupBy(col("event_type"), col("n"), col("lo"), col("hi"))
          .agg(sum(col("c")).as("sum_raw"),
            sum(greatest(col("lo"), least(col("hi"), col("c"))))
              .as("sum_wins"))
          .select(col("event_type"), col("n"), col("lo"), col("hi"),
            col("sum_raw"), col("sum_wins"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT event_type,
             |        CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events),
             |g AS (SELECT event_type, c AS v, count(*) AS n
             |      FROM e GROUP BY 1, 2),
             |w AS (SELECT event_type, v,
             |        CAST(sum(n) OVER (PARTITION BY event_type
             |          ORDER BY v) AS BIGINT) AS cum,
             |        CAST(sum(n) OVER (PARTITION BY event_type)
             |          AS BIGINT) AS tot
             |      FROM g),
             |b AS (SELECT event_type,
             |        min(CASE WHEN cum >= (tot * 5 + 99) // 100
             |          THEN v END) AS lo,
             |        min(CASE WHEN cum >= (tot * 95 + 99) // 100
             |          THEN v END) AS hi,
             |        max(tot) AS n
             |      FROM w GROUP BY 1)
             |SELECT e.event_type, CAST(b.n AS BIGINT) AS n, b.lo, b.hi,
             |  CAST(sum(e.c) AS BIGINT) AS sum_raw,
             |  CAST(sum(greatest(b.lo, least(b.hi, e.c))) AS BIGINT)
             |    AS sum_wins
             |FROM e JOIN b USING (event_type)
             |GROUP BY 1, 2, 3, 4 ORDER BY event_type""".stripMargin)),

    // ---- Skew diagnosis (Skew.skewReport): per-key row share in ppm +
    // hot flag — the decision input for the salted join/agg family
    // (q17): salting cold keys wastes a shuffle, not salting hot ones
    // loses the stage. One partial-aggregated count per key, broadcast
    // scalar total, integer shares. ----
    Q("q182_skew_report",
      (s, dir) => {
        graft.operators.Skew
          .skewReport(t(s, dir, "events"), "event_type", 200000L)
          .orderBy(col("event_type"))
      },
      Some("""WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
             |      FROM events GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
             |SELECT event_type, n, n * 1000000 // tot AS share_ppm,
             |  n * 1000000 // tot > 200000 AS is_hot
             |FROM c, t ORDER BY event_type""".stripMargin)),

    // ---- Equal-frequency binning (Selection.equiFreqBins): every event
    // assigned its quartile bucket within its type — exact ceil-rank
    // bounds from one windowed pass over the group's value counts, all
    // three bounds in a single aggregate, broadcast back; the bucket id
    // is a pure Column expression (no second data shuffle). Ties share a
    // bucket by construction. The ML feature-discretization step,
    // summarized per (type, bucket). ----
    Q("q185_equifreq_binning",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        graft.operators.Selection.equiFreqBins(ev, "event_type", "c", 4)
          .groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("n"), min(col("c")).as("vmin"),
            max(col("c")).as("vmax"))
          .orderBy(col("event_type"), col("bucket"))
      },
      Some("""WITH e AS (SELECT event_type,
             |        CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events),
             |g AS (SELECT event_type, c AS v, count(*) AS n
             |      FROM e GROUP BY 1, 2),
             |w AS (SELECT event_type, v,
             |        CAST(sum(n) OVER (PARTITION BY event_type
             |          ORDER BY v) AS BIGINT) AS cum,
             |        CAST(sum(n) OVER (PARTITION BY event_type)
             |          AS BIGINT) AS tot
             |      FROM g),
             |b AS (SELECT event_type,
             |        min(CASE WHEN cum >= (tot * 1 + 3) // 4 THEN v END) AS b1,
             |        min(CASE WHEN cum >= (tot * 2 + 3) // 4 THEN v END) AS b2,
             |        min(CASE WHEN cum >= (tot * 3 + 3) // 4 THEN v END) AS b3
             |      FROM w GROUP BY 1),
             |x AS (SELECT e.event_type,
             |        1 + (CASE WHEN e.c > b.b1 THEN 1 ELSE 0 END)
             |          + (CASE WHEN e.c > b.b2 THEN 1 ELSE 0 END)
             |          + (CASE WHEN e.c > b.b3 THEN 1 ELSE 0 END) AS bucket,
             |        e.c
             |      FROM e JOIN b USING (event_type))
             |SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
             |  min(c) AS vmin, max(c) AS vmax
             |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Presence-bitmap retention (the ClickHouse-retention shape):
    // each user's first-28-days activity folded into ONE BIGINT bitmask
    // by bit_or(1 << day_offset) — a per-user month of history in 8
    // bytes, mergeable across shards by bit_or, with day-set algebra
    // (retained day0∧day7 = mask & 129) as pure integer ops. Output:
    // users per active-day count + how many of them include day 0.
    // At 100 TB the mask build is one partial-aggregated shuffle on
    // user, and every retention curve after that reads masks, never
    // events. ----
    Q("q187_presence_bitmap",
      (s, dir) => {
        val days = t(s, dir, "events")
          .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
        val d0 = days.agg(min(col("day")).as("d0"))
        val masks = days.crossJoin(broadcast(d0))
          .filter(col("day") - col("d0") < 28)
          .groupBy(col("user_id"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), " +
            "CAST(day - d0 AS INT)))").as("mask"))
        masks
          .groupBy(bit_count(col("mask")).cast("long").as("n_active"))
          .agg(count(lit(1)).as("n_users"),
            sum(when(col("mask").bitwiseAND(1L) === 1L, 1L).otherwise(0L))
              .as("with_day0"))
          .orderBy(col("n_active"))
      },
      Some("""WITH d AS (SELECT user_id,
             |        CAST(epoch(ts) AS BIGINT) // 86400 AS day
             |      FROM events),
             |d0 AS (SELECT min(day) AS d0 FROM d),
             |m AS (SELECT user_id,
             |        bit_or(CAST(1 AS BIGINT) << CAST(day - d0 AS INT))
             |          AS mask
             |      FROM d, d0 WHERE day - d0 < 28 GROUP BY user_id)
             |SELECT CAST(bit_count(mask) AS BIGINT) AS n_active,
             |  CAST(count(*) AS BIGINT) AS n_users,
             |  CAST(sum(CASE WHEN mask & 1 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS with_day0
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Distribution drift report (the PSI mechanics in integers):
    // events split into early/late halves at the midpoint day, cents
    // histogrammed into fixed 50.00-unit bins, per-bin shares in ppm and
    // a drift flag at |Δshare| > 10000 ppm. The two halves' bin counts
    // are independent partial-aggregated scans; shares are integer
    // cross-divisions, so the report replays exactly — the deploy-gate
    // check a feature pipeline runs between training and serving
    // snapshots. ----
    Q("q188_drift_report",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(expr("CAST(ts AS LONG) DIV 86400").as("day"),
            round(col("value") * 100).cast("long").as("c"))
        val mid = ev.agg(expr("(min(day) + max(day) + 1) DIV 2").as("mid"))
        val binned = ev.crossJoin(broadcast(mid))
          .select(expr("c DIV 5000").as("bin"),
            when(col("day") < col("mid"), 1L).otherwise(0L).as("is_a"))
        val agg = binned.groupBy(col("bin"))
          .agg(sum(col("is_a")).as("n_a"),
            sum(lit(1L) - col("is_a")).as("n_b"))
        val tots = agg.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
        agg.crossJoin(broadcast(tots))
          .select(col("bin"), col("n_a"), col("n_b"),
            expr("n_a * 1000000 DIV ta").as("share_a_ppm"),
            expr("n_b * 1000000 DIV tb").as("share_b_ppm"))
          .withColumn("drift",
            abs(col("share_a_ppm") - col("share_b_ppm")) > 10000L)
          .orderBy(col("bin"))
      },
      Some("""WITH e AS (SELECT CAST(epoch(ts) AS BIGINT) // 86400 AS day,
             |        CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events),
             |md AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),
             |b AS (SELECT c // 5000 AS bin,
             |        CASE WHEN day < mid THEN 1 ELSE 0 END AS is_a
             |      FROM e, md),
             |a AS (SELECT bin, CAST(sum(is_a) AS BIGINT) AS n_a,
             |        CAST(sum(1 - is_a) AS BIGINT) AS n_b
             |      FROM b GROUP BY 1),
             |t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
             |        CAST(sum(n_b) AS BIGINT) AS tb FROM a)
             |SELECT bin, n_a, n_b,
             |  n_a * 1000000 // ta AS share_a_ppm,
             |  n_b * 1000000 // tb AS share_b_ppm,
             |  abs(n_a * 1000000 // ta - n_b * 1000000 // tb) > 10000
             |    AS drift
             |FROM a, t ORDER BY bin""".stripMargin)),

    // ---- Incremental rollup maintenance (materialized-view delta
    // merge): the daily (event_type, day) rollup updated by aggregating
    // ONLY the newest day and merging algebraically (counts and sums
    // fold by +) — history is never rescanned. The query materializes
    // base (days < max) and delta (the max day) separately, merges, and
    // the oracle is the direct full rollup the merge must equal: the
    // equality IS the incremental-maintenance law. At 100 TB this is the
    // difference between an hourly refresh touching one hour and one
    // touching three years. ----
    Q("q190_incremental_rollup",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_type"), expr("CAST(ts AS LONG) DIV 86400").as("day"),
            round(col("value") * 100).cast("long").as("c"))
        val mx = ev.agg(max(col("day")).as("mx"))
        val tagged = ev.crossJoin(broadcast(mx))
        def rollup(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("event_type"), col("day"))
            .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"))
        val base = rollup(tagged.filter(col("day") < col("mx")))
        val delta = rollup(tagged.filter(col("day") === col("mx")))
        base.unionByName(delta)
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("n")).as("n"), sum(col("sum_c")).as("sum_c"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH e AS (SELECT event_type,
             |        CAST(epoch(ts) AS BIGINT) // 86400 AS day,
             |        CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events)
             |SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(c) AS BIGINT) AS sum_c
             |FROM e GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin)),

    // ---- Longest activity streaks (gaps-and-islands at day grain):
    // each user's maximum run of consecutive active days via the
    // day − row_number anchor trick — one distinct, one user-partitioned
    // window, two partial-aggregated groupBys; summarized as the streak
    // distribution. The engagement metric every activation dashboard
    // starts with, entirely in integers. ----
    Q("q191_activity_streaks",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val days = t(s, dir, "events")
          .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
          .distinct()
        val streaks = days
          .withColumn("anchor", col("day") - row_number().over(w))
          .groupBy(col("user_id"), col("anchor"))
          .agg(count(lit(1)).as("len"))
          .groupBy(col("user_id"))
          .agg(max(col("len")).as("max_streak"))
        streaks.groupBy(col("max_streak"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("max_streak"))
      },
      Some("""WITH d AS (SELECT DISTINCT user_id,
             |        CAST(epoch(ts) AS BIGINT) // 86400 AS day
             |      FROM events),
             |a AS (SELECT user_id, day,
             |        day - row_number() OVER (PARTITION BY user_id
             |          ORDER BY day) AS anchor
             |      FROM d),
             |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len
             |      FROM a GROUP BY user_id, anchor),
             |m AS (SELECT user_id, max(len) AS max_streak FROM s
             |      GROUP BY user_id)
             |SELECT max_streak, CAST(count(*) AS BIGINT) AS n_users
             |FROM m GROUP BY 1 ORDER BY max_streak""".stripMargin)),

    // ---- Time-weighted average (TWAP) per (hour, event_type): each
    // observation weighted by its holding time — dt = seconds until the
    // next same-type event, the last observation extending to the hour
    // end (lead over a type-partitioned window with the hour boundary as
    // the default). Emitted as the exact integer rational (Σc·dt, Σdt)
    // plus a 4-dp ride-along — the q164 candles' integral-valued sibling,
    // and the correct average when sampling is irregular. ----
    Q("q192_twap",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"), col("h"))
          .orderBy(col("ts"), col("event_id"))
        val ev = t(s, dir, "events")
          .select(col("event_type"), col("ts"), col("event_id"),
            date_trunc("hour", col("ts")).as("h"),
            round(col("value") * 100).cast("long").as("c"))
          .withColumn("t_us", expr("unix_micros(ts)"))
          .withColumn("next_us", lead(col("t_us"), 1, null).over(w))
          .withColumn("dt",
            coalesce(col("next_us"),
              expr("unix_micros(h)") + 3600000000L) - col("t_us"))
        ev.groupBy(col("h"), col("event_type"))
          .agg(sum(col("c") * col("dt")).as("twap_num"),
            sum(col("dt")).as("twap_den"))
          .withColumn("twap4",
            when(col("twap_den") === 0L, lit(null).cast("double"))
              .otherwise(round(col("twap_num").cast("double") /
                col("twap_den").cast("double"), 4)))
          .orderBy(col("h"), col("event_type"))
      },
      Some("""WITH e AS (SELECT event_type, ts, event_id,
             |        CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             |        CAST(round(value * 100) AS BIGINT) AS c,
             |        epoch_us(ts) AS t_us
             |      FROM events),
             |l AS (SELECT *, lead(t_us) OVER (PARTITION BY event_type, h
             |        ORDER BY ts, event_id) AS next_us
             |      FROM e),
             |d AS (SELECT h, event_type, c,
             |        coalesce(next_us, epoch_us(h) + 3600000000) - t_us
             |          AS dt
             |      FROM l)
             |SELECT h, event_type,
             |  CAST(sum(c * dt) AS BIGINT) AS twap_num,
             |  CAST(sum(dt) AS BIGINT) AS twap_den,
             |  CASE WHEN sum(dt) = 0 THEN NULL
             |    ELSE round(CAST(sum(c * dt) AS DOUBLE)
             |      / CAST(sum(dt) AS DOUBLE), 4) END AS twap4
             |FROM d GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin)),

    // ---- Conversion-latency quantiles: how long from first view to the
    // first subsequent purchase — the q113 funnel's conditional-min
    // stages composed with the q170 counting selection (shuffle ∝
    // distinct latencies, never a sort of users). Latency in integer
    // seconds; exact p50/p90/p99 over converting users. ----
    Q("q193_conversion_latency",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val p = e.join(v, "user_id")
          .filter(col("event_type") === "purchase" && col("ts") > col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"),
            min(col("t_view")).as("t_view2"))
        val lat = p.select((expr("unix_micros(t_purchase)") -
          expr("unix_micros(t_view2)")).as("lat_us"))
          .select(expr("lat_us DIV 1000000").as("lat_s"))
        graft.operators.Selection.exactQuantiles(lat, "lat_s", Seq(50, 90, 99))
          .orderBy(col("pct"))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
             |      WHERE event_type = 'view' GROUP BY 1),
             |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_p,
             |        min(epoch_us(v.t_view)) AS t_v
             |      FROM events e JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > v.t_view
             |      GROUP BY 1),
             |lt AS (SELECT (t_p - t_v) // 1000000 AS lat_s FROM p),
             |c AS (SELECT lat_s AS v, count(*) AS n FROM lt GROUP BY 1),
             |s AS (SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum
             |      FROM c),
             |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
             |q(pct) AS (VALUES (50), (90), (99)),
             |tg AS (SELECT pct, (tot * pct + 99) // 100 AS target FROM q, tt)
             |SELECT CAST(tg.pct AS INT) AS pct, min(s.v) AS value,
             |  CAST(tg.target AS BIGINT) AS target_rank
             |FROM tg JOIN s ON s.cum >= tg.target
             |GROUP BY tg.pct, tg.target ORDER BY pct""".stripMargin)),

    // ---- RFM segmentation: per user recency (days since last activity),
    // frequency (events), monetary (purchase cents) — each cut into
    // quartiles by equiFreqBins, composed into the classic three-digit
    // RFM code (recency quartile INVERTED so 4 = most recent = best).
    // Output: users per segment. The whole pipeline is integer
    // aggregates + three broadcast bound-joins; the marketing
    // segmentation every activation stack runs, reproducible to the
    // row. ----
    Q("q194_rfm",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("day"),
            col("event_type"), round(col("value") * 100).cast("long").as("c"))
        val mx = ev.agg(max(col("day")).as("mx"))
        val per = ev.crossJoin(broadcast(mx))
          .groupBy(col("user_id"))
          .agg(min(col("mx") - col("day")).as("recency"),
            count(lit(1)).as("frequency"),
            coalesce(sum(when(col("event_type") === "purchase", col("c"))),
              lit(0L)).as("monetary"))
          .withColumn("g", lit("all"))
        import graft.operators.Selection.equiFreqBins
        val r = equiFreqBins(per, "g", "recency", 4)
          .withColumnRenamed("bucket", "rb")
        val f = equiFreqBins(r, "g", "frequency", 4)
          .withColumnRenamed("bucket", "fb")
        val m = equiFreqBins(f, "g", "monetary", 4)
          .withColumnRenamed("bucket", "mb")
        m.select(col("user_id"),
          ((lit(5) - col("rb")) * 100 + col("fb") * 10 + col("mb"))
            .as("segment"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("segment"))
      },
      Some {
        def quartiles(metric: String, pfx: String) =
          s"""${pfx}g AS (SELECT $metric AS v, count(*) AS n FROM per
             |        GROUP BY 1),
             |${pfx}w AS (SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT)
             |          AS cum,
             |        CAST((SELECT sum(n) FROM ${pfx}g) AS BIGINT) AS tot
             |      FROM ${pfx}g),
             |${pfx}b AS (SELECT
             |        min(CASE WHEN cum >= (tot * 1 + 3) // 4 THEN v END) AS b1,
             |        min(CASE WHEN cum >= (tot * 2 + 3) // 4 THEN v END) AS b2,
             |        min(CASE WHEN cum >= (tot * 3 + 3) // 4 THEN v END) AS b3
             |      FROM ${pfx}w)""".stripMargin
        def bucket(metric: String, pfx: String) =
          s"1 + (CASE WHEN per.$metric > $pfx" + "b.b1 THEN 1 ELSE 0 END)" +
            s" + (CASE WHEN per.$metric > $pfx" + "b.b2 THEN 1 ELSE 0 END)" +
            s" + (CASE WHEN per.$metric > $pfx" + "b.b3 THEN 1 ELSE 0 END)"
        s"""WITH e AS (SELECT user_id,
           |        CAST(epoch(ts) AS BIGINT) // 86400 AS day, event_type,
           |        CAST(round(value * 100) AS BIGINT) AS c
           |      FROM events),
           |mx AS (SELECT max(day) AS mx FROM e),
           |per AS (SELECT user_id, min(mx - day) AS recency,
           |          CAST(count(*) AS BIGINT) AS frequency,
           |          CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
           |            THEN c END), 0) AS BIGINT) AS monetary
           |        FROM e, mx GROUP BY user_id),
           |${quartiles("recency", "r")},
           |${quartiles("frequency", "f")},
           |${quartiles("monetary", "m")},
           |seg AS (SELECT per.user_id,
           |          ${bucket("recency", "r")} AS rb,
           |          ${bucket("frequency", "f")} AS fb,
           |          ${bucket("monetary", "m")} AS mb
           |        FROM per, rb, fb, mb)
           |SELECT (5 - rb) * 100 + fb * 10 + mb AS segment,
           |  CAST(count(*) AS BIGINT) AS n_users
           |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- Time-bounded funnel: view → click within 1 h → purchase
    // within 24 h — the q113 ordered funnel with per-step deadlines,
    // which is what real conversion attribution means (a purchase a week
    // later is not this funnel's conversion). Same conditional-min
    // shape, windows enforced in exact microseconds; step counts and
    // ppm conversion rates in one summary row. ----
    Q("q202_windowed_funnel",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("tu"))
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("tu")).as("t_view"))
        val c = e.join(v, "user_id")
          .filter(col("event_type") === "click" &&
            col("tu") > col("t_view") &&
            col("tu") <= col("t_view") + 3600000000L)
          .groupBy(col("user_id")).agg(min(col("tu")).as("t_click"))
        val p = e.join(c, "user_id")
          .filter(col("event_type") === "purchase" &&
            col("tu") > col("t_click") &&
            col("tu") <= col("t_click") + 86400000000L)
          .groupBy(col("user_id")).agg(min(col("tu")).as("t_purchase"))
        val nv = v.agg(count(lit(1)).as("n_view"))
        val nc = c.agg(count(lit(1)).as("n_click"))
        val np = p.agg(count(lit(1)).as("n_purchase"))
        nv.crossJoin(nc).crossJoin(np)
          .select(col("n_view"), col("n_click"), col("n_purchase"),
            expr("n_click * 1000000 DIV n_view").as("view_to_click_ppm"),
            expr("n_purchase * 1000000 DIV n_click").as("click_to_buy_ppm"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu
             |      FROM events),
             |v AS (SELECT user_id, min(tu) AS t_view FROM e
             |      WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(e.tu) AS t_click
             |      FROM e JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'click' AND e.tu > v.t_view
             |        AND e.tu <= v.t_view + 3600000000
             |      GROUP BY 1),
             |p AS (SELECT e.user_id, min(e.tu) AS t_purchase
             |      FROM e JOIN c ON e.user_id = c.user_id
             |      WHERE e.event_type = 'purchase' AND e.tu > c.t_click
             |        AND e.tu <= c.t_click + 86400000000
             |      GROUP BY 1)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
             |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click,
             |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase,
             |  (SELECT count(*) FROM c) * 1000000
             |    // (SELECT count(*) FROM v) AS view_to_click_ppm,
             |  (SELECT count(*) FROM p) * 1000000
             |    // (SELECT count(*) FROM c) AS click_to_buy_ppm"""
        .stripMargin)),

    // ---- Cohort LTV curves: users grouped by first-activity week, each
    // cohort's CUMULATIVE purchase cents by week age — the growth chart
    // behind every retention deck. First-touch via per-user min, age
    // arithmetic in epoch weeks, cumulative sum over a cohort-partitioned
    // (cohort-count-bounded) window; per-user normalization as ppm of
    // cohort size. All integer. ----
    Q("q204_ltv_curve",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            expr("CAST(ts AS LONG) DIV 604800").as("wk"),
            round(col("value") * 100).cast("long").as("c"))
        val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
        val sized = first.groupBy(col("cohort"))
          .agg(count(lit(1)).as("cohort_users"))
        val weekly = ev.join(first, "user_id")
          .filter(col("event_type") === "purchase")
          .groupBy(col("cohort"), (col("wk") - col("cohort")).as("age"))
          .agg(sum(col("c")).as("rev"))
        val w = Window.partitionBy(col("cohort")).orderBy(col("age"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        weekly
          .withColumn("cum_rev", sum(col("rev")).over(w))
          .join(broadcast(sized), Seq("cohort"))
          .select(col("cohort"), col("age"), col("rev"), col("cum_rev"),
            col("cohort_users"),
            expr("cum_rev DIV cohort_users").as("cum_rev_per_user"))
          .orderBy(col("cohort"), col("age"))
      },
      Some("""WITH e AS (SELECT user_id, event_type,
             |        CAST(epoch(ts) AS BIGINT) // 604800 AS wk,
             |        CAST(round(value * 100) AS BIGINT) AS c
             |      FROM events),
             |f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1),
             |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
             |       FROM f GROUP BY 1),
             |wk AS (SELECT f.cohort, e.wk - f.cohort AS age,
             |         CAST(sum(e.c) AS BIGINT) AS rev
             |       FROM e JOIN f ON e.user_id = f.user_id
             |       WHERE e.event_type = 'purchase'
             |       GROUP BY 1, 2),
             |cm AS (SELECT cohort, age, rev,
             |         CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age)
             |           AS BIGINT) AS cum_rev
             |       FROM wk)
             |SELECT cm.cohort, cm.age, cm.rev, cm.cum_rev, sz.cohort_users,
             |  cm.cum_rev // sz.cohort_users AS cum_rev_per_user
             |FROM cm JOIN sz USING (cohort)
             |ORDER BY cm.cohort, cm.age""".stripMargin)),

    // ---- Deterministic mode (most-frequent value) per group: max_by
    // over the (count, −value) struct so the tie rule — highest count,
    // then SMALLEST value — is explicit and engine-portable, where a
    // bare mode() aggregate leaves ties undefined. Two partial-agg
    // shuffles (value counts, then the struct argmax), never a sort. ----
    Q("q205_mode",
      (s, dir) => {
        val counts = t(s, dir, "events")
          .groupBy(col("event_type"),
            round(col("value") * 100).cast("long").as("c"))
          .agg(count(lit(1)).as("n"))
        counts.groupBy(col("event_type"))
          .agg(
            max_by(col("c"), struct(col("n"), (-col("c")).as("negc")))
              .as("mode_cents"),
            max(col("n")).as("mode_n"),
            countDistinct(col("c")).as("n_distinct"))
          .orderBy(col("event_type"))
      },
      Some("""WITH c AS (SELECT event_type,
             |        CAST(round(value * 100) AS BIGINT) AS c,
             |        CAST(count(*) AS BIGINT) AS n
             |      FROM events GROUP BY 1, 2),
             |r AS (SELECT event_type, c, n, row_number() OVER (
             |        PARTITION BY event_type ORDER BY n DESC, c) AS rn
             |      FROM c),
             |d AS (SELECT event_type,
             |        CAST(count(*) AS BIGINT) AS n_distinct,
             |        max(n) AS mode_n
             |      FROM c GROUP BY 1)
             |SELECT r.event_type, r.c AS mode_cents, d.mode_n, d.n_distinct
             |FROM r JOIN d USING (event_type) WHERE r.rn = 1
             |ORDER BY r.event_type""".stripMargin)),

    // ---- Bounce rate over q23's sessionization: the share of 30-min-gap
    // sessions containing exactly one event, in ppm — the engagement KPI
    // computed on the same gaps-and-islands pass (two window sweeps, one
    // shuffle on user), summarized to a single integer row. ----
    Q("q207_bounce_rate",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gapUs = unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w)
        t(s, dir, "events")
          .withColumn("new_s",
            when(gapUs.isNull || gapUs > 1800000000L, 1).otherwise(0))
          .withColumn("sess", sum(col("new_s")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess"))
          .agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n") === 1L, 1L).otherwise(0L)).as("n_bounces"))
          .select(col("n_sessions"), col("n_bounces"),
            expr("n_bounces * 1000000 DIV n_sessions").as("bounce_ppm"))
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id
             |             ORDER BY ts, event_id) IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |             PARTITION BY user_id ORDER BY ts, event_id)
             |             > 1800000000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events),
             |y AS (SELECT user_id,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                     ROWS UNBOUNDED PRECEDING) AS sess
             |  FROM x),
             |g AS (SELECT user_id, sess, count(*) AS n FROM y
             |      GROUP BY 1, 2),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions,
             |        CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |          AS n_bounces
             |      FROM g)
             |SELECT n_sessions, n_bounces,
             |  n_bounces * 1000000 // n_sessions AS bounce_ppm
             |FROM a""".stripMargin))
  )
}
