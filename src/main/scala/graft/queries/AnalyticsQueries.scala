package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 continuation wing: weighted shortest paths, log template
  * mining, change-point detection, spatial grid joins, autocorrelation,
  * and collaborative-filtering recommendations — engine-surface breadth
  * past the reference inventory, each with a full DuckDB oracle.
  */
object AnalyticsQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** q233 oracle: the engine's frontier Bellman-Ford and a FULL
    * relaxation produce the same distance vector after each round (both
    * equal min-cost-over-paths-with-<=k-edges), and relaxation is
    * monotone — so a static unroll with any round count >= the true
    * convergence depth lands on the identical fixpoint (the q156/q162
    * unroll discipline). 16 rounds is an upper bound on the observed
    * weighted-hop depth at every sf (the engine converges in <= 8).
    */
  private def ssspOracleSql(rounds: Int): String = {
    val steps = (1 to rounds).map { k =>
      s"""d$k AS MATERIALIZED (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
         |    SELECT node, dist FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.v AS node, d${k - 1}.dist + e.w AS dist
         |    FROM d${k - 1} JOIN e ON e.u = d${k - 1}.node) t
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT CAST(o.o_custkey AS BIGINT) AS u,
       |    CAST(l.l_suppkey + 10000000 AS BIGINT) AS v,
       |    CAST(min(round(l.l_extendedprice * 100)) AS BIGINT) AS w
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS MATERIALIZED (SELECT u, v, CAST(min(w) AS BIGINT) AS w FROM
       |      (SELECT u, v, w FROM e0
       |       UNION ALL SELECT v AS u, u AS v, w FROM e0) t
       |      GROUP BY 1, 2),
       |d0 AS (SELECT CAST(s_suppkey + 10000000 AS BIGINT) AS node,
       |         CAST(0 AS BIGINT) AS dist
       |       FROM supplier WHERE s_suppkey % 7 = 0),
       |$steps
       |SELECT node, dist FROM d$rounds ORDER BY node""".stripMargin
  }

  def all: Seq[Q] = Seq(

    // ---- Weighted shortest paths (Graph.weightedHops): cheapest total
    // trade cost in integer cents from the seed suppliers across the
    // repeat-trade commerce graph — distributed Bellman-Ford, per-round
    // work proportional to the improved frontier's edges, min-fold
    // monotone so the fixpoint is engine-exact BIGINT. The oracle
    // statically unrolls 16 full relaxation rounds (a no-op past the
    // true depth) and must land on identical distances. ----
    Q("q233_weighted_sssp",
      (s, dir) => {
        val edges = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"))
          .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").cast("long").as("src"),
            (col("l_suppkey") + 10000000L).cast("long").as("dst"))
          .agg(count(lit(1)).as("n"),
            min(round(col("l_extendedprice") * 100)).cast("long").as("w"))
          .filter(col("n") >= 2)
          .select(col("src"), col("dst"), col("w"))
        val seeds = t(s, dir, "supplier").filter(col("s_suppkey") % 7 === 0)
          .select((col("s_suppkey") + 10000000L).as("node"))
        graft.operators.Graph.weightedHops(edges, "src", "dst", "w",
            seeds, "node", maxRounds = 16)
          .orderBy(col("node"))
      },
      Some(ssspOracleSql(16))),

    // ---- Log template mining (operators/LogTemplates): Drain-lite
    // template extraction over synthesized event log lines — lines group
    // by (token count, first token), slots stable at >= 600 permille keep
    // their literal, the rest wildcard to <*>. Pure relational algebra
    // (explode + two grouped counts + slot join + per-line regroup), so
    // the oracle replays every step; expected result: one template per
    // event type with the user/value slots wildcarded. ----
    Q("q234_log_templates",
      (s, dir) => {
        val logs = t(s, dir, "events").select(col("event_id"),
          concat(col("event_type"), lit(" user "),
            col("user_id").cast("long").cast("string"), lit(" took "),
            round(col("value") * 100).cast("long").cast("string"),
            lit(" ms")).as("line"))
        graft.operators.LogTemplates.mine(logs, "event_id", "line",
            minSharePermille = 600L)
          .orderBy(col("n_lines").desc, col("template"))
      },
      Some("""WITH lg AS (SELECT CAST(event_id AS BIGINT) AS id,
             |    event_type || ' user ' || CAST(CAST(user_id AS BIGINT) AS VARCHAR)
             |      || ' took ' || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
             |      || ' ms' AS line FROM events),
             |d AS (SELECT id, string_split(line, ' ') AS a FROM lg),
             |nd AS (SELECT CAST(len(a) AS BIGINT) AS l, a[1] AS t1,
             |         CAST(count(*) AS BIGINT) AS n
             |       FROM d GROUP BY 1, 2),
             |tk AS (SELECT id, CAST(len(a) AS BIGINT) AS l, a[1] AS t1,
             |         unnest(a) AS tok,
             |         CAST(unnest(range(1, len(a) + 1)) AS BIGINT) AS pos
             |       FROM d),
             |sl AS (SELECT l, t1, pos, tok, CAST(count(*) AS BIGINT) AS c
             |       FROM tk GROUP BY 1, 2, 3, 4),
             |j AS (SELECT tk.id, tk.pos,
             |        CASE WHEN sl.c * 1000 >= 600 * nd.n
             |          THEN tk.tok ELSE '<*>' END AS o
             |      FROM tk
             |      JOIN sl ON sl.l = tk.l AND sl.t1 = tk.t1
             |        AND sl.pos = tk.pos AND sl.tok = tk.tok
             |      JOIN nd ON nd.l = tk.l AND nd.t1 = tk.t1),
             |tpl AS (SELECT id, string_agg(o, ' ' ORDER BY pos) AS template
             |        FROM j GROUP BY id)
             |SELECT template, CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(min(id) AS BIGINT) AS example_id
             |FROM tpl GROUP BY 1
             |ORDER BY n_lines DESC, template""".stripMargin)),

    // ---- CUSUM change-point detection (TimeSeries.changePoint): the
    // day where each event type's cumulative daily volume deviates most
    // from a homogeneous rate, S_d = |D*cum_d - d*T| — the integer
    // cross-multiplied CUSUM statistic, argmax with the smallest-day tie
    // rule (q231's KS discipline applied to the TIME axis instead of the
    // value axis). Full oracle. ----
    Q("q235_change_point",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        graft.operators.TimeSeries.changePoint(daily, "event_type", "day", "cnt")
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |        CAST(count(*) AS BIGINT) AS v
             |      FROM events GROUP BY 1, 2),
             |d AS (SELECT event_type, day, v,
             |        CAST(row_number() OVER (PARTITION BY event_type
             |          ORDER BY day) AS BIGINT) AS idx,
             |        CAST(sum(v) OVER (PARTITION BY event_type
             |          ORDER BY day) AS BIGINT) AS cum
             |      FROM daily),
             |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             |        CAST(sum(v) AS BIGINT) AS total
             |      FROM daily GROUP BY 1),
             |s AS (SELECT d.event_type, d.day, t.n_days, t.total,
             |        abs(t.n_days * d.cum - d.idx * t.total) AS sd
             |      FROM d JOIN t USING (event_type)),
             |m AS (SELECT event_type, CAST(max(sd) AS BIGINT) AS s_max
             |      FROM s GROUP BY 1)
             |SELECT s.event_type, s.n_days, s.total,
             |  min(s.day) AS at_day, m.s_max
             |FROM s JOIN m ON m.event_type = s.event_type AND s.sd = m.s_max
             |GROUP BY 1, 2, 3, 5
             |ORDER BY 1""".stripMargin)),

    // ---- Exact integer autocorrelation (TimeSeries.acf): per-type daily
    // volumes at lags 1..7 — r_k = autocovariance(k)/autocovariance(0)
    // needs NO square root, so deviations multiplied through by D make
    // both sums exact BIGINTs and the rational (num, den) engine-exact;
    // the lag-7 spike is the weekly-seasonality detector. One explode +
    // one equi-join, never a self-join per lag. Full oracle. ----
    Q("q236_acf",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        graft.operators.TimeSeries.acf(daily, "event_type", "day", "cnt",
            maxLag = 7)
          .orderBy(col("event_type"), col("lag"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |        CAST(count(*) AS BIGINT) AS v
             |      FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(v) AS BIGINT) AS tt
             |      FROM daily GROUP BY 1),
             |d AS (SELECT daily.event_type, day, t.n * v - t.tt AS dev,
             |        CAST(row_number() OVER (PARTITION BY daily.event_type
             |          ORDER BY day) AS BIGINT) AS idx
             |      FROM daily JOIN t USING (event_type)),
             |den AS (SELECT event_type, CAST(sum(dev * dev) AS BIGINT) AS den
             |        FROM d GROUP BY 1),
             |lags AS (SELECT CAST(k AS BIGINT) AS lag
             |         FROM generate_series(1, 7) AS g(k)),
             |num AS (SELECT a.event_type, lags.lag,
             |          CAST(sum(a.dev * b.dev) AS BIGINT) AS num
             |        FROM d a
             |        CROSS JOIN lags
             |        JOIN d b ON b.event_type = a.event_type
             |          AND b.idx = a.idx + lags.lag
             |        GROUP BY 1, 2)
             |SELECT num.event_type, num.lag, num.num, den.den,
             |  CASE WHEN den.den = 0 THEN NULL
             |    ELSE round(CAST(num.num AS DOUBLE) / den.den, 6) END AS r6
             |FROM num JOIN den USING (event_type)
             |ORDER BY event_type, lag""".stripMargin)),

    // ---- Spatial radius join (SpatialJoin.radiusJoin): every
    // customer-supplier pair within Chebyshev distance 2048 on a
    // deterministic md5-derived 65536x65536 integer plane — grid-cell
    // equi-join with 3x3 neighbor replication of the smaller side, never
    // the cross join the naive inequality predicate plans to (PlanSpec
    // pins no-BNLJ). The oracle IS that cross join, fine at sf0.01 and
    // exactly the formulation the operator exists to avoid at scale. ----
    Q("q237_spatial_join",
      (s, dir) => {
        def ax(prefix: String, c: org.apache.spark.sql.Column) =
          conv(substring(md5(concat(lit(prefix), c.cast("string"))), 1, 8),
            16, 10).cast("long") % 65536L
        val cust = t(s, dir, "customer").select(col("c_custkey"),
          ax("x:", col("c_custkey")).as("x"), ax("y:", col("c_custkey")).as("y"))
        val supp = t(s, dir, "supplier").select(col("s_suppkey"),
          ax("x:", col("s_suppkey")).as("x"), ax("y:", col("s_suppkey")).as("y"))
        graft.operators.SpatialJoin.radiusJoin(
            cust, "c_custkey", "x", "y", supp, "s_suppkey", "x", "y", 2048L)
          .orderBy(col("c_custkey"), col("s_suppkey"))
      },
      Some("""WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |    CAST(concat('0x', substr(md5('x:' ||
             |      CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 65536 AS x,
             |    CAST(concat('0x', substr(md5('y:' ||
             |      CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 65536 AS y
             |  FROM customer),
             |s AS (SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
             |    CAST(concat('0x', substr(md5('x:' ||
             |      CAST(s_suppkey AS VARCHAR)), 1, 8)) AS BIGINT) % 65536 AS x,
             |    CAST(concat('0x', substr(md5('y:' ||
             |      CAST(s_suppkey AS VARCHAR)), 1, 8)) AS BIGINT) % 65536 AS y
             |  FROM supplier)
             |SELECT c.c_custkey, s.s_suppkey,
             |  greatest(abs(c.x - s.x), abs(c.y - s.y)) AS dist
             |FROM c, s
             |WHERE abs(c.x - s.x) <= 2048 AND abs(c.y - s.y) <= 2048
             |ORDER BY c_custkey, s_suppkey""".stripMargin)),

    // ---- User-based CF recommendations (operators/Cf): "customers like
    // you also bought" — item-blocked co-consumption pairs (stop items
    // with df > 64 cut up front, accidental co < 2 overlaps pruned),
    // squared-cosine integer-ppm neighbor ranking (monotone in cosine,
    // no sqrt), top-3 neighbors, unseen-item candidates scored by summed
    // neighbor similarity, top-5 per user. Deterministic ties (neighbor
    // id, then item id); the oracle replays every stage. Distinct from
    // q131's pair-lift ranking: this emits per-user RECOMMENDATIONS of
    // items the user has never bought. ----
    Q("q238_cf_recommend",
      (s, dir) => {
        val ui = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
        graft.operators.Cf.recommend(ui, "u", "i",
            maxDf = 64L, minCo = 2L, k = 3, topN = 5)
          .select(col("u"), col("item"), col("score"), col("n_nb"),
            col("rank").as("rec_rank"))
          .orderBy(col("u"), col("rec_rank"))
      },
      Some("""WITH ui AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS u,
             |        CAST(l_partkey AS BIGINT) AS i
             |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |idf AS (SELECT i, CAST(count(*) AS BIGINT) AS df
             |        FROM ui GROUP BY 1),
             |k AS (SELECT ui.u, ui.i FROM ui JOIN idf USING (i)
             |      WHERE idf.df <= 64),
             |nu AS (SELECT u, CAST(count(*) AS BIGINT) AS n FROM k GROUP BY 1),
             |co AS (SELECT a.u AS ua, b.u AS ub, CAST(count(*) AS BIGINT) AS co
             |       FROM k a JOIN k b ON a.i = b.i AND a.u <> b.u
             |       GROUP BY 1, 2 HAVING count(*) >= 2),
             |sim AS (SELECT co.ua, co.ub, co.co,
             |          (co.co * co.co * 1000000) // (na.n * nb.n) AS sim2_ppm
             |        FROM co JOIN nu na ON na.u = co.ua
             |        JOIN nu nb ON nb.u = co.ub),
             |nb3 AS (SELECT ua, ub, sim2_ppm FROM (
             |          SELECT ua, ub, sim2_ppm, row_number() OVER (
             |            PARTITION BY ua ORDER BY sim2_ppm DESC, ub) AS rn
             |          FROM sim) t
             |        WHERE rn <= 3),
             |cand AS (SELECT nb3.ua AS u, k.i,
             |           CAST(sum(nb3.sim2_ppm) AS BIGINT) AS score,
             |           CAST(count(*) AS BIGINT) AS n_nb
             |         FROM nb3 JOIN k ON k.u = nb3.ub
             |         WHERE NOT EXISTS (SELECT 1 FROM ui o
             |           WHERE o.u = nb3.ua AND o.i = k.i)
             |         GROUP BY 1, 2)
             |SELECT u, i AS item, score, n_nb,
             |  CAST(rec_rank AS BIGINT) AS rec_rank
             |FROM (SELECT u, i, score, n_nb, row_number() OVER (
             |        PARTITION BY u ORDER BY score DESC, i) AS rec_rank
             |      FROM cand) t
             |WHERE rec_rank <= 5
             |ORDER BY u, rec_rank""".stripMargin)),

    // ---- STREAMING change-point detection (streaming/StreamingCounts +
    // TimeSeries.changePoint): per-microbatch (event_type, day) count
    // shards written idempotently by batch id (the _SUCCESS discipline),
    // folded on read by plain SUM — the ADDITIVE member of the
    // streaming-shard family (HLL max / KMV bottom-k / GK union / MG
    // counter-merge). Counts are additive over any batch split, so the
    // drained stream's folded dailies EQUAL the batch aggregate and the
    // detector answers with q235's oracle verbatim. ----
    Q("q239_stream_change_point",
      (s, dir) => {
        import graft.streaming.{StreamingCounts, Streams}
        val tmp = java.nio.file.Files.createTempDirectory("graft_q239_").toString
        StreamingCounts.streamingDailyCounts(
          Streams.eventsStream(s, dir).select(col("event_type"), col("ts")),
          "event_type", "ts", s"$tmp/counts", s"$tmp/ckpt")
        val daily = StreamingCounts.readMergedDailyCounts(s, s"$tmp/counts",
          "event_type")
        graft.operators.TimeSeries.changePoint(daily, "event_type", "day", "cnt")
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |        CAST(count(*) AS BIGINT) AS v
             |      FROM events GROUP BY 1, 2),
             |d AS (SELECT event_type, day, v,
             |        CAST(row_number() OVER (PARTITION BY event_type
             |          ORDER BY day) AS BIGINT) AS idx,
             |        CAST(sum(v) OVER (PARTITION BY event_type
             |          ORDER BY day) AS BIGINT) AS cum
             |      FROM daily),
             |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             |        CAST(sum(v) AS BIGINT) AS total
             |      FROM daily GROUP BY 1),
             |s AS (SELECT d.event_type, d.day, t.n_days, t.total,
             |        abs(t.n_days * d.cum - d.idx * t.total) AS sd
             |      FROM d JOIN t USING (event_type)),
             |m AS (SELECT event_type, CAST(max(sd) AS BIGINT) AS s_max
             |      FROM s GROUP BY 1)
             |SELECT s.event_type, s.n_days, s.total,
             |  min(s.day) AS at_day, m.s_max
             |FROM s JOIN m ON m.event_type = s.event_type AND s.sd = m.s_max
             |GROUP BY 1, 2, 3, 5
             |ORDER BY 1""".stripMargin)),

    // ---- Group-wise Pearson correlation (Trend.groupCorr): does bigger
    // basket size track bigger spend per brand — r² from six
    // map-side-combinable sums, exact BIGINT components (cov, varx,
    // vary), NO square root anywhere (the q236 no-sqrt trade), one
    // identically-written double for the 6-dp r². y pre-scaled to whole
    // dollars for the documented n·Σy² < 2⁶³ budget. Full oracle. ----
    Q("q240_group_corr",
      (s, dir) => {
        val d = t(s, dir, "lineitem")
          .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"), col("l_quantity").cast("long").as("x"),
            floor(col("l_extendedprice")).cast("long").as("y"))
        graft.operators.Trend.groupCorr(d, Seq("p_brand"), "x", "y")
          .orderBy(col("p_brand"))
      },
      Some("""WITH d AS (SELECT p.p_brand, CAST(l_quantity AS BIGINT) AS x,
             |        CAST(floor(l_extendedprice) AS BIGINT) AS y
             |      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
             |a AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |        CAST(sum(x * y) AS BIGINT) AS sxy,
             |        CAST(sum(x * x) AS BIGINT) AS sxx,
             |        CAST(sum(y * y) AS BIGINT) AS syy
             |      FROM d GROUP BY 1)
             |SELECT p_brand, n,
             |  n * sxy - sx * sy AS cov_num,
             |  n * sxx - sx * sx AS varx_num,
             |  n * syy - sy * sy AS vary_num,
             |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
             |    THEN NULL
             |    ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
             |      * CAST(n * sxy - sx * sy AS DOUBLE)
             |      / (CAST(n * sxx - sx * sx AS DOUBLE)
             |         * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS r2_6
             |FROM a ORDER BY p_brand""".stripMargin)),

    // ---- l-diversity privacy report (Checks.lDiversity): k-anonymity's
    // companion for the release-review wing (q176 checks, q226 purge) —
    // each (segment, nation) quasi-identifier group must see >= 4
    // distinct account-balance bands, or the group leaks its members'
    // band by association. Two-level aggregate, one row per group, full
    // oracle. ----
    Q("q241_l_diversity",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_mktsegment"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          floor((col("c_acctbal") + 1000.0) / 2000.0).cast("long").as("band"))
        graft.operators.Checks.lDiversity(c,
            Seq("c_mktsegment", "c_nationkey"), "band", l = 4L)
          .orderBy(col("c_mktsegment"), col("c_nationkey"))
      },
      Some("""WITH b AS (SELECT c_mktsegment,
             |        CAST(c_nationkey AS BIGINT) AS c_nationkey,
             |        CAST(floor((c_acctbal + 1000.0) / 2000.0) AS BIGINT)
             |          AS band
             |      FROM customer),
             |g AS (SELECT c_mktsegment, c_nationkey, band,
             |        CAST(count(*) AS BIGINT) AS n
             |      FROM b GROUP BY 1, 2, 3)
             |SELECT c_mktsegment, c_nationkey,
             |  CAST(sum(n) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_sensitive,
             |  count(*) >= 4 AS diverse
             |FROM g GROUP BY 1, 2
             |ORDER BY c_mktsegment, c_nationkey""".stripMargin)),

    // ---- Weighted PageRank (Graph.weightedPageRank): importance on the
    // symmetric commerce graph with trade VOLUME as the edge weight —
    // each node's damped mass splits in proportion to lineitem counts,
    // (85*r*w) div (100*W_u), exact integer end to end; the symmetric
    // graph has no dangling nodes, so the oracle replays all ten
    // iterations as a plain recursive CTE (the q128 shape with the
    // weighted split). ----
    Q("q242_weighted_pagerank",
      (s, dir) => {
        val pairs = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").cast("long").as("cust"),
            (col("l_suppkey") + 10000000L).cast("long").as("supp"))
          .agg(count(lit(1)).as("w"))
        val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"),
            col("w"))
          .unionByName(pairs.select(col("supp").as("src"),
            col("cust").as("dst"), col("w")))
        graft.operators.Graph.weightedPageRank(edges, "src", "dst", "w",
            iters = 10)
          .orderBy(col("r").desc, col("node")).limit(20)
      },
      Some("""WITH RECURSIVE
             |pairs AS (SELECT o_custkey AS cust, l_suppkey + 10000000 AS supp,
             |            CAST(count(*) AS BIGINT) AS w
             |          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |          GROUP BY 1, 2),
             |edges AS (SELECT cust AS src, supp AS dst, w FROM pairs
             |          UNION ALL SELECT supp, cust, w FROM pairs),
             |nodes AS (SELECT DISTINCT src AS node FROM edges),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
             |wdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wd
             |         FROM edges GROUP BY src),
             |pr AS (
             |  SELECT 0 AS iter, node,
             |    CAST(CAST(1000000000 AS BIGINT) // nn.n AS BIGINT) AS r
             |  FROM nodes, nn
             |  UNION ALL
             |  SELECT p.iter + 1, e.dst AS node,
             |    CAST((SELECT ((15 * CAST(1000000000 AS BIGINT)) // 100) // n FROM nn)
             |      + sum((85 * p.r * e.w) // (100 * d.wd)) AS BIGINT) AS r
             |  FROM pr p JOIN edges e ON p.node = e.src JOIN wdeg d ON d.src = p.node
             |  WHERE p.iter < 10
             |  GROUP BY p.iter, e.dst
             |)
             |SELECT node, r FROM pr WHERE iter = 10
             |ORDER BY r DESC, node LIMIT 20""".stripMargin)),

    // ---- CF holdout evaluation (Cf.recommend + temporal split): train
    // the q238 recommender on the first 3/4 of the order-date span, then
    // measure hit rate BY RANK POSITION against the held-out quarter —
    // the model-evaluation wing's recommender member (next to AUC q120,
    // reliability q186, rank-eval q152). Hits are exact integer ppm; the
    // pivot date is derived inside both engines from min/max alone. ----
    Q("q243_cf_holdout_eval",
      (s, dir) => {
        val orders = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("od"))
        // min/max collected as STRINGS: decoding a DateType row via
        // head() needs the external-row date codec, which is absent when
        // Verify runs outside sbt's launcher — strings decode everywhere
        val b = orders
          .agg(min(col("od")).cast("string"), max(col("od")).cast("string"))
          .head()
        val d0 = java.time.LocalDate.parse(b.getString(0))
        val pivot = java.sql.Date.valueOf(
          d0.plusDays(java.time.temporal.ChronoUnit.DAYS.between(
            d0, java.time.LocalDate.parse(b.getString(1))) * 3 / 4))
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        def ui(f: org.apache.spark.sql.Column) = li
          .join(orders.filter(f), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").cast("long").as("u"),
            col("l_partkey").cast("long").as("i")).distinct()
        val train = ui(col("od") < lit(pivot))
        val test = ui(col("od") >= lit(pivot))
        val recs = graft.operators.Cf.recommend(train, "u", "i",
          maxDf = 64L, minCo = 2L, k = 3, topN = 5)
        recs.join(test.withColumn("__hit", lit(1L)),
            recs("u") === test("u") && recs("item") === test("i"), "left")
          .groupBy(col("rank").as("rec_rank"))
          .agg(count(lit(1)).as("n_recs"),
            coalesce(sum(col("__hit")), lit(0L)).as("n_hits"))
          .select(col("rec_rank"), col("n_recs"), col("n_hits"),
            expr("(n_hits * 1000000) div n_recs").as("hit_ppm"))
          .orderBy(col("rec_rank"))
      },
      Some("""WITH bounds AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0,
             |         max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
             |piv AS (SELECT d0 + CAST(((d1 - d0) * 3) // 4 AS INT) AS pd
             |        FROM bounds),
             |tr AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS u,
             |         CAST(l_partkey AS BIGINT) AS i
             |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey, piv
             |       WHERE CAST(o_orderdate AS DATE) < piv.pd),
             |te AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS u,
             |         CAST(l_partkey AS BIGINT) AS i
             |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey, piv
             |       WHERE CAST(o_orderdate AS DATE) >= piv.pd),
             |idf AS (SELECT i, CAST(count(*) AS BIGINT) AS df
             |        FROM tr GROUP BY 1),
             |k AS (SELECT tr.u, tr.i FROM tr JOIN idf USING (i)
             |      WHERE idf.df <= 64),
             |nu AS (SELECT u, CAST(count(*) AS BIGINT) AS n FROM k GROUP BY 1),
             |co AS (SELECT a.u AS ua, b.u AS ub, CAST(count(*) AS BIGINT) AS co
             |       FROM k a JOIN k b ON a.i = b.i AND a.u <> b.u
             |       GROUP BY 1, 2 HAVING count(*) >= 2),
             |sim AS (SELECT co.ua, co.ub, co.co,
             |          (co.co * co.co * 1000000) // (na.n * nb.n) AS sim2_ppm
             |        FROM co JOIN nu na ON na.u = co.ua
             |        JOIN nu nb ON nb.u = co.ub),
             |nb3 AS (SELECT ua, ub, sim2_ppm FROM (
             |          SELECT ua, ub, sim2_ppm, row_number() OVER (
             |            PARTITION BY ua ORDER BY sim2_ppm DESC, ub) AS rn
             |          FROM sim) t
             |        WHERE rn <= 3),
             |cand AS (SELECT nb3.ua AS u, k.i,
             |           CAST(sum(nb3.sim2_ppm) AS BIGINT) AS score,
             |           CAST(count(*) AS BIGINT) AS n_nb
             |         FROM nb3 JOIN k ON k.u = nb3.ub
             |         WHERE NOT EXISTS (SELECT 1 FROM tr o
             |           WHERE o.u = nb3.ua AND o.i = k.i)
             |         GROUP BY 1, 2),
             |top AS (SELECT u, i, CAST(rec_rank AS BIGINT) AS rec_rank
             |        FROM (SELECT u, i, row_number() OVER (
             |                PARTITION BY u ORDER BY score DESC, i) AS rec_rank
             |              FROM cand) t
             |        WHERE rec_rank <= 5)
             |SELECT top.rec_rank, CAST(count(*) AS BIGINT) AS n_recs,
             |  CAST(sum(CASE WHEN te.i IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_hits,
             |  (CAST(sum(CASE WHEN te.i IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS hit_ppm
             |FROM top LEFT JOIN te ON te.u = top.u AND te.i = top.i
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- HITS hubs & authorities (Graph.hits): the query-dependent
    // eigenvector pair over the directed commerce graph cust→supp —
    // customers that buy from many good suppliers are hubs, suppliers
    // bought by many good hubs are authorities. Exact fixed-point
    // integers: both vectors renormalized to sum `scale` by floored
    // division each half-iteration, so the oracle statically unrolls
    // all five iterations (the q233 discipline) and must land on
    // identical scores. ----
    Q("q244_hits",
      (s, dir) => {
        val edges = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").cast("long").as("src"),
            (col("l_suppkey") + 10000000L).cast("long").as("dst"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2)
          .select(col("src"), col("dst"))
        graft.operators.Graph.hits(edges, "src", "dst", iters = 5)
          .orderBy(col("auth").desc, col("node")).limit(20)
      },
      Some(hitsOracleSql(5, 1000000L))),

    // ---- Market-basket association rules (operators/Basket): exact
    // a-priori over item pairs within each order's distinct-part basket.
    // Directed rules with support >= 2, confidence and lift in integer
    // ppm; mega-baskets dropped up front by the maxBasketSize stop-cut
    // (part of the definition, replayed by the oracle). ----
    Q("q245_basket_rules",
      (s, dir) => {
        val items = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        graft.operators.Basket.rules(items, "l_orderkey", "l_partkey",
            minSupport = 2L, maxBasketSize = 8L)
          .orderBy(col("lift_ppm").desc, col("ante"), col("cons"))
          .limit(100)
      },
      Some("""WITH ui AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
             |    CAST(l_partkey AS BIGINT) AS i FROM lineitem),
             |sz AS (SELECT b, CAST(count(*) AS BIGINT) AS z
             |       FROM ui GROUP BY 1),
             |k AS (SELECT ui.b, ui.i FROM ui JOIN sz USING (b)
             |      WHERE sz.z <= 8),
             |nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM k),
             |sup AS (SELECT i, CAST(count(*) AS BIGINT) AS s
             |        FROM k GROUP BY 1),
             |p AS (SELECT x.i AS ia, y.i AS ib,
             |        CAST(count(*) AS BIGINT) AS sup_ab
             |      FROM k x JOIN k y ON x.b = y.b AND x.i < y.i
             |      GROUP BY 1, 2 HAVING count(*) >= 2),
             |dr AS (SELECT ia AS ante, ib AS cons, sup_ab FROM p
             |       UNION ALL SELECT ib, ia, sup_ab FROM p)
             |SELECT dr.ante, dr.cons, dr.sup_ab, sa.s AS sup_a,
             |  sb.s AS sup_b,
             |  (dr.sup_ab * 1000000) // sa.s AS conf_ppm,
             |  (dr.sup_ab * (SELECT n FROM nb) * 1000000)
             |    // (sa.s * sb.s) AS lift_ppm
             |FROM dr JOIN sup sa ON sa.i = dr.ante
             |JOIN sup sb ON sb.i = dr.cons
             |ORDER BY lift_ppm DESC, ante, cons LIMIT 100""".stripMargin)),

    // ---- First-order Markov transition matrix (Sequences.transitions):
    // per-user event streams ordered by (ts, event_id), successor via
    // ONE lead window — never a self-join per lag — transition counts,
    // exact ppm probabilities, and the per-state successor ranking. ----
    Q("q246_markov_transitions",
      (s, dir) => {
        graft.operators.Sequences.transitions(t(s, dir, "events"),
            "user_id", "ts", "event_id", "event_type")
          .orderBy(col("from_state"), col("rnk"))
      },
      Some("""WITH e AS (SELECT CAST(user_id AS BIGINT) AS u, ts,
             |    CAST(event_id AS BIGINT) AS eid, event_type AS st
             |  FROM events),
             |p AS (SELECT st AS from_state, lead(st) OVER (
             |        PARTITION BY u ORDER BY ts, eid) AS to_state
             |      FROM e),
             |c AS (SELECT from_state, to_state,
             |        CAST(count(*) AS BIGINT) AS n
             |      FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2),
             |w AS (SELECT from_state, to_state, n,
             |        CAST(sum(n) OVER (PARTITION BY from_state)
             |          AS BIGINT) AS row_n,
             |        CAST(row_number() OVER (PARTITION BY from_state
             |          ORDER BY n DESC, to_state) AS BIGINT) AS rnk
             |      FROM c)
             |SELECT from_state, to_state, n, row_n,
             |  (n * 1000000) // row_n AS p_ppm, rnk
             |FROM w ORDER BY from_state, rnk""".stripMargin)),

    // ---- Day-of-week seasonal residuals (TimeSeries.dowResiduals):
    // each day's volume vs its own weekday's mean — the detector that
    // does not flag every weekend dip. Integer basis points via the
    // cross-multiplied abs/sign split; threshold 2500 bp. Spark
    // dayofweek is 1=Sunday; DuckDB's is 0=Sunday, shifted in the
    // oracle. ----
    Q("q247_dow_residuals",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("v"))
        graft.operators.TimeSeries.dowResiduals(daily, "event_type",
            "day", "v", thresholdBp = 2500L)
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS v FROM events GROUP BY 1, 2),
             |d AS (SELECT event_type, day, v,
             |        CAST(dayofweek(day) + 1 AS BIGINT) AS dow
             |      FROM daily),
             |c AS (SELECT event_type, dow, CAST(count(*) AS BIGINT)
             |        AS n_days, CAST(sum(v) AS BIGINT) AS s
             |      FROM d GROUP BY 1, 2)
             |SELECT d.event_type, d.day, d.dow, d.v, c.n_days, c.s,
             |  (CASE WHEN d.v * c.n_days - c.s < 0 THEN -1
             |        WHEN d.v * c.n_days - c.s > 0 THEN 1 ELSE 0 END)
             |    * ((abs(d.v * c.n_days - c.s) * 10000) // c.s) AS dev_bp,
             |  (abs((CASE WHEN d.v * c.n_days - c.s < 0 THEN -1
             |        WHEN d.v * c.n_days - c.s > 0 THEN 1 ELSE 0 END)
             |    * ((abs(d.v * c.n_days - c.s) * 10000) // c.s)) >= 2500)
             |    AS is_anomaly
             |FROM d JOIN c USING (event_type, dow)
             |ORDER BY event_type, day""".stripMargin)),

    // ---- Holt linear forecast (Forecast.holtLinear): 7-day volume
    // forecast per event type by double-exponential smoothing in exact
    // micro-unit integers (alpha=2/10, beta=1/10), the recurrence run as
    // one codegen'd aggregate fold per key. The oracle replays every
    // smoothing step in a recursive CTE with the identical portable
    // sign-split division. ----
    Q("q248_holt_forecast",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("v"))
        graft.operators.Forecast.holtLinear(daily, "event_type", "day",
            "v", horizon = 7)
          .orderBy(col("event_type"), col("h"))
      },
      Some(holtOracleSql(7))),

    // ---- Frequent event trigrams (Sequences.frequentNgrams): the top
    // contiguous 3-step paths across user sessions — two leads over one
    // per-user window, counted once per (overlapping) occurrence,
    // support >= 10. The sequence-mining sibling of q210's skip-grams
    // (document axis) and q246's transitions (order 1). ----
    Q("q249_event_trigrams",
      (s, dir) => {
        graft.operators.Sequences.frequentNgrams(t(s, dir, "events"),
            "user_id", "ts", "event_id", "event_type", n = 3,
            minSupport = 10L)
          .orderBy(col("n_occ").desc, col("gram"))
      },
      Some("""WITH e AS (SELECT CAST(user_id AS BIGINT) AS u, ts,
             |    CAST(event_id AS BIGINT) AS eid, event_type AS st
             |  FROM events),
             |l AS (SELECT st AS s0,
             |        lead(st, 1) OVER (PARTITION BY u ORDER BY ts, eid)
             |          AS s1,
             |        lead(st, 2) OVER (PARTITION BY u ORDER BY ts, eid)
             |          AS s2
             |      FROM e)
             |SELECT s0 || '>' || s1 || '>' || s2 AS gram,
             |  CAST(count(*) AS BIGINT) AS n_occ
             |FROM l WHERE s1 IS NOT NULL AND s2 IS NOT NULL
             |GROUP BY 1 HAVING count(*) >= 10
             |ORDER BY n_occ DESC, gram""".stripMargin)),

    // ---- Co-purchase link prediction (Graph.nodeJaccard): similar
    // suppliers by shared-customer Jaccard in exact ppm — the union
    // denominator (Liben-Nowell/Kleinberg), distinct from q238's
    // squared-cosine CF. Src-blocked pair generation with the maxDeg
    // hub cut, top-5 per supplier. ----
    Q("q250_link_predict",
      (s, dir) => {
        val ui = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("u"), col("l_suppkey").as("v"))
        graft.operators.Graph.nodeJaccard(ui, "u", "v",
            maxDeg = 64L, minCo = 2L, k = 5)
          .orderBy(col("a"), col("jaccard_ppm").desc, col("b"))
      },
      Some("""WITH ui AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS u,
             |    CAST(l_suppkey AS BIGINT) AS v
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |dg AS (SELECT u, CAST(count(*) AS BIGINT) AS d
             |       FROM ui GROUP BY 1),
             |k AS (SELECT ui.u, ui.v FROM ui JOIN dg USING (u)
             |      WHERE dg.d <= 64),
             |nv AS (SELECT v, CAST(count(*) AS BIGINT) AS n
             |       FROM k GROUP BY 1),
             |co AS (SELECT x.v AS a, y.v AS b,
             |         CAST(count(*) AS BIGINT) AS co
             |       FROM k x JOIN k y ON x.u = y.u AND x.v <> y.v
             |       GROUP BY 1, 2 HAVING count(*) >= 2),
             |sim AS (SELECT co.a, co.b, co.co, na.n AS na, nb.n AS nb,
             |          (co.co * 1000000) // (na.n + nb.n - co.co)
             |            AS jaccard_ppm
             |        FROM co JOIN nv na ON na.v = co.a
             |        JOIN nv nb ON nb.v = co.b),
             |top AS (SELECT a, b, co, na, nb, jaccard_ppm,
             |          row_number() OVER (PARTITION BY a
             |            ORDER BY jaccard_ppm DESC, b) AS rn
             |        FROM sim)
             |SELECT a, b, co, na, nb, jaccard_ppm FROM top
             |WHERE rn <= 5
             |ORDER BY a, jaccard_ppm DESC, b""".stripMargin)),

    // ---- Markov removal-effect attribution (operators/Attribution):
    // journeys START -> touches -> CONV/NULL, transition matrix counted
    // distributed, conversion probability by 30 exact integer
    // value-iteration rounds, channel credit = the drop when that
    // channel is removed. The matrix is a bounded driver artifact (the
    // codebook discipline); the oracle replays journeys, matrix, all 30
    // rounds per removal, and the share normalization. ----
    Q("q251_markov_attribution",
      (s, dir) => {
        graft.operators.Attribution.markovRemoval(t(s, dir, "events"),
            "user_id", "ts", "event_id", "event_type", "purchase",
            iters = 30)
          .orderBy(col("channel"))
      },
      Some(markovOracleSql(30)),
      None),

    // ---- Kaplan-Meier survival to first purchase by entry channel
    // (operators/Survival): right-censored time-to-event — users who
    // never convert shrink the risk set instead of vanishing. Exact
    // floored ppm product, the sequential fold replayed row-for-row by
    // the oracle's recursive CTE. ----
    Q("q252_survival_km",
      (s, dir) => {
        val e = t(s, dir, "events").select(
          col("user_id").cast("long").as("u"), col("ts"),
          col("event_id").cast("long").as("eid"),
          col("event_type").as("st"))
        val wu = Window.partitionBy(col("u")).orderBy(col("ts"), col("eid"))
        val fe = e.withColumn("rn", row_number().over(wu))
          .filter(col("rn") === 1).select(col("u"), col("st").as("grp"))
        val agg0 = e.groupBy(col("u")).agg(min(col("ts")).as("t0"),
          max(col("ts")).as("tl"),
          min(when(col("st") === "purchase", col("ts"))).as("pt"))
        val spans = fe.join(agg0, "u").select(col("grp"),
          when(col("pt").isNotNull,
            datediff(to_date(col("pt")), to_date(col("t0"))))
            .otherwise(datediff(to_date(col("tl")), to_date(col("t0"))))
            .cast("long").as("dur"),
          when(col("pt").isNotNull, lit(1L)).otherwise(lit(0L)).as("ev"))
        graft.operators.Survival.kaplanMeier(spans, "grp", "dur", "ev")
          .orderBy(col("grp"), col("dur"))
      },
      Some("""WITH RECURSIVE
             |e AS MATERIALIZED (SELECT CAST(user_id AS BIGINT) AS u,
             |    ts, CAST(event_id AS BIGINT) AS eid, event_type AS st
             |  FROM events),
             |fe AS (SELECT u, st AS grp FROM (
             |    SELECT u, st, row_number() OVER (
             |      PARTITION BY u ORDER BY ts, eid) AS rn FROM e) t
             |  WHERE rn = 1),
             |ag AS (SELECT u, min(ts) AS t0, max(ts) AS tl,
             |    min(CASE WHEN st = 'purchase' THEN ts END) AS pt
             |  FROM e GROUP BY 1),
             |spans AS MATERIALIZED (SELECT fe.grp,
             |    CAST(CASE WHEN ag.pt IS NOT NULL
             |      THEN CAST(ag.pt AS DATE) - CAST(ag.t0 AS DATE)
             |      ELSE CAST(ag.tl AS DATE) - CAST(ag.t0 AS DATE) END
             |      AS BIGINT) AS dur,
             |    CAST(CASE WHEN ag.pt IS NOT NULL THEN 1 ELSE 0 END
             |      AS BIGINT) AS ev
             |  FROM fe JOIN ag USING (u)),
             |bd AS MATERIALIZED (SELECT grp, dur,
             |    CAST(sum(ev) AS BIGINT) AS d,
             |    CAST(sum(1 - ev) AS BIGINT) AS c
             |  FROM spans GROUP BY 1, 2),
             |rk AS MATERIALIZED (SELECT grp, dur, d, c,
             |    CAST(sum(d + c) OVER (PARTITION BY grp)
             |      - (sum(d + c) OVER (PARTITION BY grp ORDER BY dur
             |           ROWS UNBOUNDED PRECEDING) - d - c) AS BIGINT)
             |      AS n_risk,
             |    CAST(row_number() OVER (PARTITION BY grp ORDER BY dur)
             |      AS BIGINT) AS idx
             |  FROM bd),
             |s AS (SELECT grp, idx, dur, n_risk, d, c,
             |    CAST(CASE WHEN d > 0
             |      THEN (1000000 * (n_risk - d)) // n_risk
             |      ELSE 1000000 END AS BIGINT) AS s_ppm
             |  FROM rk WHERE idx = 1
             |  UNION ALL
             |  SELECT rk.grp, rk.idx, rk.dur, rk.n_risk, rk.d, rk.c,
             |    CAST(CASE WHEN rk.d > 0
             |      THEN (s.s_ppm * (rk.n_risk - rk.d)) // rk.n_risk
             |      ELSE s.s_ppm END AS BIGINT)
             |  FROM s JOIN rk ON rk.grp = s.grp AND rk.idx = s.idx + 1)
             |SELECT grp, dur, n_risk, d, c, s_ppm FROM s
             |ORDER BY grp, dur""".stripMargin)),

    // ---- Holt forecast backtest (Forecast + temporal holdout): train
    // on all days up to (global max day − 7), forecast the held-out
    // week, score per event type — MAE and signed bias in exact
    // micro-units (the q243 holdout discipline applied to the
    // forecaster). The pivot derives from max(day) inside both engines;
    // the oracle replays the truncated-series smoothing and the error
    // aggregation. ----
    Q("q253_holt_backtest",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("v"))
        val maxDay = java.time.LocalDate.parse(
          daily.agg(max(col("day")).cast("string")).head().getString(0))
        val pivot = java.sql.Date.valueOf(maxDay.minusDays(7))
        val fc = graft.operators.Forecast.holtLinear(
          daily.filter(col("day") <= lit(pivot)), "event_type", "day",
          "v", horizon = 7)
        fc.join(daily.select(col("event_type"),
              col("day").as("forecast_day"), col("v").as("actual")),
            Seq("event_type", "forecast_day"))
          .select(col("event_type"),
            (col("forecast_micro") - col("actual") * 1000000L).as("err"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_eval"),
            sum(abs(col("err"))).as("__sabs"), sum(col("err")).as("__serr"))
          .select(col("event_type"), col("n_eval"),
            expr("__sabs div n_eval").as("mae_micro"),
            (signum(col("__serr")).cast("long") *
              expr("abs(__serr) div n_eval")).as("bias_micro"))
          .orderBy(col("event_type"))
      },
      Some(holtBacktestOracleSql)),

    // ---- Simpson's-paradox screen (Trend.groupTrend at two
    // altitudes): per-brand quantity→price slope sign vs the aggregate
    // slope sign, in exact integer rationals — the subgroup-reversal
    // warning that should precede any "aggregate trend" claim. The
    // single-row aggregate side rides a broadcast cross join, no driver
    // constant. ----
    Q("q254_simpson_screen",
      (s, dir) => {
        val d = t(s, dir, "lineitem")
          .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"), col("l_quantity").cast("long").as("x"),
            floor(col("l_extendedprice")).cast("long").as("y"))
        val per = graft.operators.Trend.groupTrend(d, Seq("p_brand"), "x", "y")
          .select(col("p_brand"), col("n"), col("slope_num"), col("slope_den"))
        val agg = graft.operators.Trend.groupTrend(d, Seq.empty, "x", "y")
          .select(col("slope_num").as("agg_num"), col("slope_den").as("agg_den"))
        per.crossJoin(broadcast(agg))
          .withColumn("reversed",
            (col("slope_num") > 0 && col("agg_num") < 0) ||
              (col("slope_num") < 0 && col("agg_num") > 0))
          .orderBy(col("p_brand"))
      },
      Some("""WITH d AS MATERIALIZED (SELECT p_brand,
             |    CAST(l_quantity AS BIGINT) AS x,
             |    CAST(floor(l_extendedprice) AS BIGINT) AS y
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |per AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
             |      AS slope_num,
             |    CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
             |      AS slope_den
             |  FROM d GROUP BY 1),
             |ag AS (SELECT
             |    CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
             |      AS agg_num,
             |    CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
             |      AS agg_den
             |  FROM d)
             |SELECT per.p_brand, per.n, per.slope_num, per.slope_den,
             |  ag.agg_num, ag.agg_den,
             |  ((per.slope_num > 0 AND ag.agg_num < 0) OR
             |   (per.slope_num < 0 AND ag.agg_num > 0)) AS reversed
             |FROM per CROSS JOIN ag ORDER BY p_brand""".stripMargin)),

    // ---- STREAMING Holt forecast twin (StreamingCounts + Forecast):
    // per-microbatch additive daily-count shards (the q239/_SUCCESS
    // discipline) folded by sum — counts are additive, so the drained
    // stream's dailies EQUAL the batch aggregate and the forecaster
    // answers with q248's oracle verbatim. Extends the streaming-shard
    // family to the forecasting wing. ----
    Q("q255_stream_holt",
      (s, dir) => {
        import graft.streaming.{StreamingCounts, Streams}
        val tmp = java.nio.file.Files.createTempDirectory("graft_q255_").toString
        StreamingCounts.streamingDailyCounts(
          Streams.eventsStream(s, dir).select(col("event_type"), col("ts")),
          "event_type", "ts", s"$tmp/counts", s"$tmp/ckpt")
        val daily = StreamingCounts.readMergedDailyCounts(s, s"$tmp/counts",
            "event_type")
          .withColumnRenamed("cnt", "v")
        graft.operators.Forecast.holtLinear(daily, "event_type", "day",
            "v", horizon = 7)
          .orderBy(col("event_type"), col("h"))
      },
      Some(holtOracleSql(7))),

    // ---- One-pass correlation matrix (Trend.corrMatrix): all six
    // measure pairs (qty, price, discount, tax) per brand from ONE
    // corpus scan — p·(p+3)/2 sums in a single aggregate, pair rows
    // projected off the materialized group-sized result (per-pair
    // groupCorr calls would rescan the corpus six times). Exact integer
    // components, q240's overflow budget per measure. ----
    Q("q256_corr_matrix",
      (s, dir) => {
        val d = t(s, dir, "lineitem")
          .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"),
            col("l_quantity").cast("long").as("qty"),
            floor(col("l_extendedprice")).cast("long").as("price_usd"),
            floor(col("l_discount") * 100).cast("long").as("disc_pct"),
            floor(col("l_tax") * 100).cast("long").as("tax_pct"))
        graft.operators.Trend.corrMatrix(d, Seq("p_brand"),
            Seq("qty", "price_usd", "disc_pct", "tax_pct"))
          .orderBy(col("p_brand"), col("col_a"), col("col_b"))
      },
      Some(corrMatrixOracleSql)),

    // ---- GK quantile ROLLUP cube (Gk.rollupEstimate): price-cent
    // percentiles at (returnflag, linestatus), (returnflag, *) and
    // (*, *) from ONE register build — the quantile analog of the q163
    // HLL cube; every rollup level is a union of the same registers, so
    // the whole report costs one corpus scan. Deterministic compaction
    // means the oracle replays the build, the three-level union, and
    // every ceil-rank selection from scratch. ----
    Q("q257_gk_rollup",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_returnflag"), col("l_linestatus"),
          round(col("l_extendedprice") * 100).cast("long").as("c"),
          (col("l_orderkey").cast("long") * 10L +
            col("l_linenumber").cast("long")).as("id"))
        val regs = graft.operators.Gk.registers(li, "c", "id",
          Seq("l_returnflag", "l_linestatus"), k = 64, buckets = 8)
        graft.operators.Gk.rollupEstimate(regs,
            Seq("l_returnflag", "l_linestatus"),
            Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
          .withColumn("est", col("est").cast("long"))
          .orderBy(col("l_returnflag"), col("l_linestatus"), col("q"))
      },
      Some("""WITH e AS MATERIALIZED (SELECT l_returnflag AS rf,
             |    l_linestatus AS ls,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
             |    CAST(l_orderkey AS BIGINT) * 10
             |      + CAST(l_linenumber AS BIGINT) AS id
             |  FROM lineitem),
             |b AS (SELECT rf, ls, c, id,
             |    CAST(concat('0x', substr(md5(concat('b:', id)), 1, 8))
             |      AS BIGINT) % 8 AS bk FROM e),
             |r AS (SELECT rf, ls, bk, c, id,
             |    CAST(row_number() OVER (PARTITION BY rf, ls, bk
             |      ORDER BY c, id) AS BIGINT) AS rn,
             |    CAST(count(*) OVER (PARTITION BY rf, ls, bk)
             |      AS BIGINT) AS nb
             |  FROM b),
             |g AS MATERIALIZED (SELECT rf, ls, c,
             |    CASE WHEN rn % ((nb + 63) // 64) = 0
             |      THEN (nb + 63) // 64
             |      ELSE nb % ((nb + 63) // 64) END AS w
             |  FROM r WHERE rn % ((nb + 63) // 64) = 0 OR rn = nb),
             |lv AS (SELECT rf, ls, c, w FROM g
             |  UNION ALL SELECT rf, '*', c, w FROM g
             |  UNION ALL SELECT '*', '*', c, w FROM g),
             |d AS (SELECT rf, ls, c, CAST(sum(w) AS BIGINT) AS w
             |  FROM lv GROUP BY 1, 2, 3),
             |s AS MATERIALIZED (SELECT rf, ls, c,
             |    CAST(sum(w) OVER (PARTITION BY rf, ls ORDER BY c)
             |      AS BIGINT) AS cum,
             |    CAST(sum(w) OVER (PARTITION BY rf, ls) AS BIGINT) AS tot
             |  FROM d),
             |qq(q, num, den) AS (VALUES ('p50', 1, 2), ('p90', 9, 10),
             |    ('p99', 99, 100)),
             |tg AS (SELECT DISTINCT s.rf, s.ls, qq.q, s.tot,
             |    (s.tot * qq.num + qq.den - 1) // qq.den AS k_target
             |  FROM s, qq)
             |SELECT tg.rf AS l_returnflag, tg.ls AS l_linestatus, tg.q,
             |  CAST(tg.tot AS BIGINT) AS w_total,
             |  CAST(tg.k_target AS BIGINT) AS k_target,
             |  CAST(min(s.c) AS BIGINT) AS est
             |FROM tg JOIN s ON s.rf = tg.rf AND s.ls = tg.ls
             |  AND s.cum >= tg.k_target
             |GROUP BY 1, 2, 3, 4, 5
             |ORDER BY 1, 2, 3""".stripMargin)),

    // ---- STREAMING correlation matrix twin (StreamingMoments +
    // corrMatrixFromMoments): per-microbatch sufficient-moment shards
    // (n, Σxᵢ, Σxᵢxⱼ per brand) under the _SUCCESS discipline, folded
    // by SUM — the additive-sums member of the streaming-shard family
    // (counts/HLL/KMV/GK/MG, now moments). Sums of products are
    // additive, so the drained stream's matrix EQUALS the batch
    // operator's and answers with q256's oracle verbatim. The part
    // dimension rides a stream-static broadcast join. ----
    Q("q258_stream_corr_matrix",
      (s, dir) => {
        import graft.streaming.StreamingMoments
        val cols = Seq("qty", "price_usd", "disc_pct", "tax_pct")
        val schema = s.read.parquet(s"$dir/lineitem.parquet").schema
        val raw = s.readStream.schema(schema)
          .option("pathGlobFilter", "lineitem.parquet").parquet(dir)
        val part = broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand")))
        val li = raw.join(part, col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"),
            col("l_quantity").cast("long").as("qty"),
            floor(col("l_extendedprice")).cast("long").as("price_usd"),
            floor(col("l_discount") * 100).cast("long").as("disc_pct"),
            floor(col("l_tax") * 100).cast("long").as("tax_pct"))
        val tmp = java.nio.file.Files.createTempDirectory("graft_q258_").toString
        StreamingMoments.streamingMoments(li, "p_brand", cols,
          s"$tmp/moments", s"$tmp/ckpt")
        StreamingMoments.corrMatrixFromMoments(
            StreamingMoments.readMergedMoments(s, s"$tmp/moments",
              "p_brand", cols.size),
            "p_brand", cols)
          .orderBy(col("p_brand"), col("col_a"), col("col_b"))
      },
      // the batch q256 oracle verbatim: the fold law guarantees equality
      Some(corrMatrixOracleSql)),

    // ---- Theil-Sen robust daily-growth slope (Trend.theilSen): the
    // median of all pairwise day-to-day slopes per event type — one
    // outlier day can move the OLS slope (q172) arbitrarily but moves
    // at most half the pairwise slopes. Exact median by the documented
    // (floored micro-slope, num, den) total order, group-blocked pair
    // join, pairs bounded by the calendar span squared. Full oracle. ----
    Q("q259_theil_sen",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("v"))
          .select(col("event_type"),
            datediff(col("day"), lit("1970-01-01")).cast("long").as("x"),
            col("v"))
        graft.operators.Trend.theilSen(daily, Seq("event_type"), "x", "v")
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS v FROM events GROUP BY 1, 2),
             |d AS (SELECT event_type,
             |    CAST(day - DATE '1970-01-01' AS BIGINT) AS x, v
             |  FROM daily),
             |p AS (SELECT a.event_type, b.v - a.v AS num, b.x - a.x AS den
             |      FROM d a JOIN d b ON a.event_type = b.event_type
             |        AND a.x < b.x),
             |k AS (SELECT event_type, num, den,
             |    CAST((CASE WHEN num < 0 THEN -1 WHEN num > 0 THEN 1
             |      ELSE 0 END) * ((abs(num) * 1000000) // den) AS BIGINT)
             |      AS sk
             |  FROM p),
             |r AS (SELECT event_type, num, den, sk,
             |    CAST(row_number() OVER (PARTITION BY event_type
             |      ORDER BY sk, num, den) AS BIGINT) AS rn,
             |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
             |      AS n_pairs
             |  FROM k)
             |SELECT event_type, n_pairs, num AS med_num, den AS med_den,
             |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
             |    AS slope6
             |FROM r WHERE rn = (n_pairs + 1) // 2
             |ORDER BY event_type""".stripMargin)),

    // ---- Seasonally-adjusted Holt forecast (dow factors + Forecast
    // composed): divide each day by its weekday's mean-ratio factor
    // (integer ppm, the q247 cells), smooth the deseasonalized series
    // with q248's Holt fold, then re-apply the forecast day's own
    // weekday factor — the standard season-trend split, exact and
    // engine-replayable end-to-end (the small truncation to integer
    // adjusted counts is part of the contract and replays too). ----
    Q("q260_seasonal_forecast",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("v"))
          .withColumn("dow", dayofweek(col("day")).cast("long"))
        val cell = daily.groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n_dow"), sum(col("v")).as("s_dow"))
        val tot = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"), sum(col("v")).as("s_tot"))
        val factors = cell.join(tot, "event_type")
          .select(col("event_type"), col("dow"),
            expr("(s_dow * n_days * 1000000) div (n_dow * s_tot)")
              .as("factor_ppm"))
        val adj = daily.join(factors, Seq("event_type", "dow"))
          .select(col("event_type"), col("day"),
            expr("(v * 1000000) div factor_ppm").as("v_adj"))
        val fc = graft.operators.Forecast.holtLinear(adj, "event_type",
          "day", "v_adj", horizon = 7)
        fc.withColumn("dow", dayofweek(col("forecast_day")).cast("long"))
          .join(factors, Seq("event_type", "dow"))
          .select(col("event_type"), col("h"), col("forecast_day"),
            col("factor_ppm"), col("forecast_micro").as("f_adj_micro"),
            expr("(forecast_micro * factor_ppm) div 1000000")
              .as("f_micro"))
          .orderBy(col("event_type"), col("h"))
      },
      Some(seasonalForecastOracleSql)),

    // ---- Two-level binary segmentation (TimeSeries.binarySegment):
    // the q235 CUSUM argmax, then the best split WITHIN each half —
    // the classic multiple-change-point recursion unrolled to depth 2,
    // every level the same integer cross-multiplied statistic with the
    // smallest-day tie rule, so the whole tree replays in SQL. ----
    Q("q261_binary_segmentation",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        graft.operators.TimeSeries.binarySegment(daily, "event_type",
            "day", "cnt")
          .orderBy(col("event_type"), col("level"), col("side"))
      },
      Some("""WITH daily AS MATERIALIZED (SELECT event_type,
             |    CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS v
             |  FROM events GROUP BY 1, 2),
             |d1 AS (SELECT event_type, day, v,
             |    CAST(row_number() OVER (PARTITION BY event_type
             |      ORDER BY day) AS BIGINT) AS idx,
             |    CAST(sum(v) OVER (PARTITION BY event_type ORDER BY day)
             |      AS BIGINT) AS cum
             |  FROM daily),
             |t1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             |    CAST(sum(v) AS BIGINT) AS total FROM daily GROUP BY 1),
             |s1 AS (SELECT d1.event_type, d1.day, t1.n_days, t1.total,
             |    abs(t1.n_days * d1.cum - d1.idx * t1.total) AS sd
             |  FROM d1 JOIN t1 USING (event_type)),
             |m1 AS (SELECT event_type, CAST(max(sd) AS BIGINT) AS s_max
             |  FROM s1 GROUP BY 1),
             |l1 AS MATERIALIZED (SELECT s1.event_type, s1.n_days,
             |    s1.total, min(s1.day) AS at_day, m1.s_max
             |  FROM s1 JOIN m1 ON m1.event_type = s1.event_type
             |    AND s1.sd = m1.s_max
             |  GROUP BY 1, 2, 3, 5),
             |sided AS MATERIALIZED (SELECT daily.event_type, daily.day,
             |    daily.v,
             |    CASE WHEN daily.day <= l1.at_day THEN 0 ELSE 1 END AS side
             |  FROM daily JOIN l1 USING (event_type)),
             |d2 AS (SELECT event_type, side, day, v,
             |    CAST(row_number() OVER (PARTITION BY event_type, side
             |      ORDER BY day) AS BIGINT) AS idx,
             |    CAST(sum(v) OVER (PARTITION BY event_type, side
             |      ORDER BY day) AS BIGINT) AS cum
             |  FROM sided),
             |t2 AS (SELECT event_type, side, CAST(count(*) AS BIGINT)
             |    AS n_days, CAST(sum(v) AS BIGINT) AS total
             |  FROM sided GROUP BY 1, 2),
             |s2 AS (SELECT d2.event_type, d2.side, d2.day, t2.n_days,
             |    t2.total, abs(t2.n_days * d2.cum - d2.idx * t2.total) AS sd
             |  FROM d2 JOIN t2 USING (event_type, side)),
             |m2 AS (SELECT event_type, side, CAST(max(sd) AS BIGINT)
             |    AS s_max FROM s2 GROUP BY 1, 2),
             |l2 AS (SELECT s2.event_type, s2.side, s2.n_days, s2.total,
             |    min(s2.day) AS at_day, m2.s_max
             |  FROM s2 JOIN m2 ON m2.event_type = s2.event_type
             |    AND m2.side = s2.side AND s2.sd = m2.s_max
             |  GROUP BY 1, 2, 3, 4, 6)
             |SELECT event_type, CAST(1 AS BIGINT) AS level,
             |  CAST(-1 AS BIGINT) AS side, n_days, total, at_day, s_max
             |FROM l1
             |UNION ALL
             |SELECT event_type, CAST(2 AS BIGINT), CAST(side AS BIGINT),
             |  n_days, total, at_day, s_max
             |FROM l2
             |ORDER BY event_type, level, side""".stripMargin)),

    // ---- Cohort retention triangle: users grouped by first-active
    // epoch week, retention = share of the cohort active again at each
    // week age — the classic retention matrix in exact ppm (the q187
    // bitmap's reporting-table sibling, q204's LTV shape applied to
    // presence instead of revenue). Integer epoch weeks, two hash
    // aggregates and one join. ----
    Q("q262_retention_triangle",
      (s, dir) => {
        val uw = t(s, dir, "events")
          .select(col("user_id").cast("long").as("u"),
            expr("CAST(ts AS LONG) DIV 604800").as("wk"))
          .distinct()
        val first = uw.groupBy(col("u")).agg(min(col("wk")).as("cohort_wk"))
        val sizes = first.groupBy(col("cohort_wk"))
          .agg(count(lit(1)).as("n_cohort"))
        uw.join(first, "u")
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("age_wk"))
          .agg(count(lit(1)).as("n_active"))
          .join(sizes, "cohort_wk")
          .select(col("cohort_wk"), col("age_wk"), col("n_cohort"),
            col("n_active"),
            expr("(n_active * 1000000) div n_cohort").as("ret_ppm"))
          .orderBy(col("cohort_wk"), col("age_wk"))
      },
      Some("""WITH uw AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
             |    CAST(epoch(ts) AS BIGINT) // 604800 AS wk FROM events),
             |f AS (SELECT u, min(wk) AS cohort_wk FROM uw GROUP BY 1),
             |sz AS (SELECT cohort_wk, CAST(count(*) AS BIGINT)
             |    AS n_cohort FROM f GROUP BY 1),
             |act AS (SELECT f.cohort_wk, uw.wk - f.cohort_wk AS age_wk,
             |    CAST(count(*) AS BIGINT) AS n_active
             |  FROM uw JOIN f USING (u) GROUP BY 1, 2)
             |SELECT act.cohort_wk, act.age_wk, sz.n_cohort, act.n_active,
             |  (act.n_active * 1000000) // sz.n_cohort AS ret_ppm
             |FROM act JOIN sz USING (cohort_wk)
             |ORDER BY cohort_wk, age_wk""".stripMargin)),

    // ---- Laspeyres price index by ship month: monthly basket cost at
    // base-month quantities over the base-month cost, in exact ppm —
    // unit prices are integer cents div quantities (deterministic
    // floor), only items traded in BOTH months contribute (documented,
    // replayed). The price-level dashboard the q213 elasticity slope
    // complements. ----
    Q("q263_price_index",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("mon"),
            col("l_partkey").as("item"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
              .as("cents"),
            sum(col("l_quantity").cast("long")).as("qty"))
          .select(col("mon"), col("item"),
            expr("cents div qty").as("unit"), col("qty"))
        val baseMon = li.agg(min(col("mon")).as("base_mon"))
        val base = li.join(broadcast(baseMon),
            col("mon") === col("base_mon"))
          .select(col("item"), col("unit").as("unit_b"),
            col("qty").as("qty_b"))
        li.join(base, "item")
          .groupBy(col("mon"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("unit") * col("qty_b")).as("__num"),
            sum(col("unit_b") * col("qty_b")).as("__den"))
          .select(col("mon"), col("n_items"),
            expr("(__num * 1000000) div __den").as("index_ppm"))
          .orderBy(col("mon"))
      },
      Some("""WITH li AS (SELECT strftime(CAST(l_shipdate AS DATE),
             |      '%Y-%m') AS mon,
             |    CAST(l_partkey AS BIGINT) AS item,
             |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |      AS BIGINT) AS cents,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
             |  FROM lineitem GROUP BY 1, 2),
             |u AS (SELECT mon, item, cents // qty AS unit, qty FROM li),
             |bm AS (SELECT min(mon) AS base_mon FROM u),
             |b AS (SELECT item, unit AS unit_b, qty AS qty_b FROM u
             |      WHERE mon = (SELECT base_mon FROM bm)),
             |j AS (SELECT u.mon, CAST(count(*) AS BIGINT) AS n_items,
             |    CAST(sum(u.unit * b.qty_b) AS BIGINT) AS num,
             |    CAST(sum(b.unit_b * b.qty_b) AS BIGINT) AS den
             |  FROM u JOIN b USING (item) GROUP BY 1)
             |SELECT mon, n_items, (num * 1000000) // den AS index_ppm
             |FROM j ORDER BY mon""".stripMargin)),

    // ---- In-session co-occurrence rules (q23 sessionization composed
    // with Basket.rules): which event types co-occur within one 30-min
    // session beyond what their base rates predict — baskets are
    // (user, session) composites, items the distinct event types, type
    // ids assigned by the replayable sorted-order rank. ----
    Q("q264_session_cooccurrence",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gapUs = unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w)
        val sess = t(s, dir, "events")
          .withColumn("new_s",
            when(gapUs.isNull || gapUs > 1800000000L, 1).otherwise(0))
          .withColumn("sess", sum(col("new_s")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          // struct basket key — a numeric user*K+sess composite would
          // alias baskets across users past K sessions (and the oracle,
          // replicating it, couldn't catch the merge)
          .select(struct(col("user_id").cast("long").as("u"),
            col("sess").cast("long").as("s")).as("b"), col("event_type"))
        val tw = Window.orderBy(col("event_type"))
        val types = sess.select(col("event_type")).distinct()
          .withColumn("tid", row_number().over(tw).cast("long"))
        val items = sess.join(broadcast(types), "event_type")
          .select(col("b"), col("tid"))
        graft.operators.Basket.rules(items, "b", "tid",
            minSupport = 10L, maxBasketSize = 8L)
          .join(broadcast(types.select(col("tid").as("ante"),
            col("event_type").as("ante_type"))), "ante")
          .join(broadcast(types.select(col("tid").as("cons"),
            col("event_type").as("cons_type"))), "cons")
          .select(col("ante_type"), col("cons_type"), col("sup_ab"),
            col("sup_a"), col("sup_b"), col("conf_ppm"), col("lift_ppm"))
          .orderBy(col("ante_type"), col("cons_type"))
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts, event_type,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id
             |        ORDER BY ts, event_id) IS NULL
             |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |        PARTITION BY user_id ORDER BY ts, event_id)
             |        > 1800000000
             |      THEN 1 ELSE 0 END AS new_s
             |  FROM events),
             |y AS (SELECT user_id, event_type,
             |    CAST(sum(new_s) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS sess
             |  FROM x),
             |tp AS (SELECT event_type, CAST(row_number() OVER (
             |    ORDER BY event_type) AS BIGINT) AS tid
             |  FROM (SELECT DISTINCT event_type FROM y) t),
             |ui AS (SELECT DISTINCT CAST(y.user_id AS BIGINT) AS bu,
             |    y.sess AS bs, tp.tid AS i
             |  FROM y JOIN tp USING (event_type)),
             |sz AS (SELECT bu, bs, CAST(count(*) AS BIGINT) AS z
             |  FROM ui GROUP BY 1, 2),
             |k AS (SELECT ui.bu, ui.bs, ui.i FROM ui JOIN sz USING (bu, bs)
             |      WHERE sz.z <= 8),
             |nb AS (SELECT CAST(count(*) AS BIGINT) AS n
             |       FROM (SELECT DISTINCT bu, bs FROM k) kb),
             |sup AS (SELECT i, CAST(count(*) AS BIGINT) AS s
             |        FROM k GROUP BY 1),
             |p AS (SELECT a.i AS ia, b2.i AS ib,
             |        CAST(count(*) AS BIGINT) AS sup_ab
             |      FROM k a JOIN k b2 ON a.bu = b2.bu AND a.bs = b2.bs
             |        AND a.i < b2.i
             |      GROUP BY 1, 2 HAVING count(*) >= 10),
             |dr AS (SELECT ia AS ante, ib AS cons, sup_ab FROM p
             |       UNION ALL SELECT ib, ia, sup_ab FROM p)
             |SELECT ta.event_type AS ante_type, tc.event_type AS cons_type,
             |  dr.sup_ab, sa.s AS sup_a, sb.s AS sup_b,
             |  (dr.sup_ab * 1000000) // sa.s AS conf_ppm,
             |  (dr.sup_ab * (SELECT n FROM nb) * 1000000)
             |    // (sa.s * sb.s) AS lift_ppm
             |FROM dr JOIN sup sa ON sa.i = dr.ante
             |JOIN sup sb ON sb.i = dr.cons
             |JOIN tp ta ON ta.tid = dr.ante
             |JOIN tp tc ON tc.tid = dr.cons
             |ORDER BY ante_type, cons_type""".stripMargin)),

    // ---- RAKE keyword extraction (operators/Keywords): top-3 phrases
    // per English document — candidate phrases are stopword-free token
    // runs, word score deg·10⁶ div freq, phrase score the sum. The
    // whole pipeline (tokenize, segment window, phrase regroup, word
    // stats, scoring, per-doc ranking) is relational and replays in the
    // oracle; only segment ORDER matters, so the engines' different
    // token positions cancel. ----
    Q("q265_rake_keywords",
      (s, dir) => {
        graft.operators.Keywords.rake(
            t(s, dir, "documents").filter(col("lang") === "en"),
            "doc_id", "text")
          .orderBy(col("doc_id"), col("rnk"))
      },
      Some("""WITH d AS MATERIALIZED (SELECT doc_id AS id,
             |    lower(text) AS t FROM documents WHERE lang = 'en'),
             |tk0 AS (SELECT id,
             |    unnest(regexp_split_to_array(t, '[^a-z0-9]+')) AS tok,
             |    CAST(unnest(range(1,
             |      len(regexp_split_to_array(t, '[^a-z0-9]+')) + 1))
             |      AS BIGINT) AS pos
             |  FROM d),
             |tk AS (SELECT id, tok, pos,
             |    CASE WHEN tok IN ('the','a','an','of','to','in','and',
             |      'or','is','are','was','were','for','on','with','as',
             |      'by','at','be','this','that','it','from','their','its')
             |      THEN 1 ELSE 0 END AS is_stop
             |  FROM tk0 WHERE tok <> ''),
             |sg AS (SELECT id, tok, pos, is_stop,
             |    CAST(sum(is_stop) OVER (PARTITION BY id ORDER BY pos
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
             |  FROM tk),
             |ph AS MATERIALIZED (SELECT id, seg,
             |    string_agg(tok, ' ' ORDER BY pos) AS phrase,
             |    CAST(count(*) AS BIGINT) AS plen
             |  FROM sg WHERE is_stop = 0 GROUP BY 1, 2
             |  HAVING count(*) <= 4),
             |wd AS MATERIALIZED (SELECT id, seg, plen,
             |    unnest(string_split(phrase, ' ')) AS word FROM ph),
             |ws AS (SELECT word, CAST(count(*) AS BIGINT) AS freq,
             |    CAST(sum(plen) AS BIGINT) AS deg FROM wd GROUP BY 1),
             |sc AS (SELECT wd.id, wd.seg,
             |    CAST(sum((ws.deg * 1000000) // ws.freq) AS BIGINT)
             |      AS score_ppm
             |  FROM wd JOIN ws USING (word) GROUP BY 1, 2),
             |pp AS (SELECT ph.id, ph.phrase,
             |    CAST(count(*) AS BIGINT) AS n_occ,
             |    CAST(max(sc.score_ppm) AS BIGINT) AS score_ppm
             |  FROM ph JOIN sc ON sc.id = ph.id AND sc.seg = ph.seg
             |  GROUP BY 1, 2),
             |tr AS (SELECT id, phrase, n_occ, score_ppm,
             |    CAST(row_number() OVER (PARTITION BY id
             |      ORDER BY score_ppm DESC, phrase) AS BIGINT) AS rnk
             |  FROM pp)
             |SELECT id AS doc_id, phrase, n_occ, score_ppm, rnk
             |FROM tr WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    // ---- Behavioral diversity (Gini-Simpson index) per user: 1 − Σp²
    // in exact ppm — the diversity measure that needs NO logarithm (an
    // entropy would drag in transcendentals no two engines round
    // alike). 10⁶ − (Σnᵢ²·10⁶ div N²): 0 = single-behavior user,
    // → 10⁶·(k−1)/k for a uniform k-type user. Two hash aggregates. ----
    Q("q266_behavior_diversity",
      (s, dir) => {
        val byType = t(s, dir, "events")
          .groupBy(col("user_id").cast("long").as("u"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        byType.groupBy(col("u"))
          .agg(sum(col("n")).as("n_events"),
            count(lit(1)).as("n_types"),
            sum(col("n") * col("n")).as("__ss"))
          .select(col("u"), col("n_events"), col("n_types"),
            (lit(1000000L) -
              expr("(__ss * 1000000) div (n_events * n_events)"))
              .as("simpson_ppm"))
          .orderBy(col("u"))
      },
      Some("""WITH bt AS (SELECT CAST(user_id AS BIGINT) AS u, event_type,
             |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
             |ag AS (SELECT u, CAST(sum(n) AS BIGINT) AS n_events,
             |    CAST(count(*) AS BIGINT) AS n_types,
             |    CAST(sum(n * n) AS BIGINT) AS ss
             |  FROM bt GROUP BY 1)
             |SELECT u, n_events, n_types,
             |  1000000 - (ss * 1000000) // (n_events * n_events)
             |    AS simpson_ppm
             |FROM ag ORDER BY u""".stripMargin)),

    // ---- Burstiness (Fano factor) of daily volume per event type:
    // variance-to-mean in exact integer rationals —
    // (n·Σv²−(Σv)²)·10⁶ div (n·Σv), 10⁶ = Poisson-like, higher =
    // bursty, lower = regular. One aggregate over the daily series;
    // the dispersion diagnostic next to the q235 change point and the
    // q236 ACF. ----
    Q("q267_fano_burstiness",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("v"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"), sum(col("v")).as("total"),
            sum(col("v") * col("v")).as("__ss"))
          .select(col("event_type"), col("n_days"), col("total"),
            (col("n_days") * col("__ss") - col("total") * col("total"))
              .as("var_num"),
            expr("((n_days * __ss - total * total) * 1000000) " +
              "div (n_days * total)").as("fano_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS v FROM events GROUP BY 1, 2),
             |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             |    CAST(sum(v) AS BIGINT) AS total,
             |    CAST(sum(v * v) AS BIGINT) AS ss
             |  FROM daily GROUP BY 1)
             |SELECT event_type, n_days, total,
             |  n_days * ss - total * total AS var_num,
             |  ((n_days * ss - total * total) * 1000000)
             |    // (n_days * total) AS fano_ppm
             |FROM ag ORDER BY event_type""".stripMargin)),

    // ---- Bowley quartile skewness of order totals per priority:
    // (Q1 + Q3 − 2·Q2)·10⁶ div (Q3 − Q1) from EXACT counting-selection
    // quartiles (the q170 ceil-rank discipline, one windowed pass for
    // all three) — the robust skew measure no moment estimator matches
    // under heavy tails; sign-split division for portability, null when
    // the IQR is zero. ----
    Q("q268_bowley_skew",
      (s, dir) => {
        val counts = t(s, dir, "orders")
          .groupBy(col("o_orderpriority"),
            round(col("o_totalprice") * 100).cast("long").as("__v"))
          .agg(count(lit(1)).as("__n"))
        val wOrd = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("o_orderpriority"))
        val q = counts
          .withColumn("__cum", sum(col("__n")).over(wOrd))
          .withColumn("__tot", sum(col("__n")).over(wAll))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("__n")).as("n"),
            min(when(col("__cum") >= expr("(__tot * 25 + 99) DIV 100"),
              col("__v"))).as("q1"),
            min(when(col("__cum") >= expr("(__tot * 50 + 99) DIV 100"),
              col("__v"))).as("q2"),
            min(when(col("__cum") >= expr("(__tot * 75 + 99) DIV 100"),
              col("__v"))).as("q3"))
        q.select(col("o_orderpriority"), col("n"), col("q1"), col("q2"),
            col("q3"),
            when(col("q3") === col("q1"), lit(null).cast("long"))
              .otherwise(
                signum(col("q1") + col("q3") - lit(2L) * col("q2")).cast("long") *
                  expr("(abs(q1 + q3 - 2 * q2) * 1000000) div (q3 - q1)"))
              .as("bowley_ppm"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH c AS (SELECT o_orderpriority,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM orders GROUP BY 1, 2),
             |s AS (SELECT o_orderpriority, v,
             |    CAST(sum(n) OVER (PARTITION BY o_orderpriority
             |      ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             |    CAST(sum(n) OVER (PARTITION BY o_orderpriority)
             |      AS BIGINT) AS tot
             |  FROM c),
             |q AS (SELECT o_orderpriority, CAST(min(tot) AS BIGINT) AS n,
             |    CAST(min(CASE WHEN cum >= (tot * 25 + 99) // 100
             |      THEN v END) AS BIGINT) AS q1,
             |    CAST(min(CASE WHEN cum >= (tot * 50 + 99) // 100
             |      THEN v END) AS BIGINT) AS q2,
             |    CAST(min(CASE WHEN cum >= (tot * 75 + 99) // 100
             |      THEN v END) AS BIGINT) AS q3
             |  FROM s GROUP BY 1)
             |SELECT o_orderpriority, n, q1, q2, q3,
             |  CASE WHEN q3 = q1 THEN NULL
             |    ELSE (CASE WHEN q1 + q3 - 2 * q2 < 0 THEN -1
             |      WHEN q1 + q3 - 2 * q2 > 0 THEN 1 ELSE 0 END)
             |      * ((abs(q1 + q3 - 2 * q2) * 1000000) // (q3 - q1))
             |  END AS bowley_ppm
             |FROM q ORDER BY o_orderpriority""".stripMargin)),

    // ---- Weekday concentration (Herfindahl over day-of-week shares)
    // per event type: Σ T_dow²·10⁶ div T² — exact-integer seasonality
    // concentration (uniform 7-day spread → 142857 ppm, single-day
    // spikes → 10⁶), the forecastability screen feeding the q260
    // seasonal adjustment. ----
    Q("q269_weekday_concentration",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(col("event_type"),
            dayofweek(to_date(col("ts"))).cast("long").as("dow"))
          .agg(count(lit(1)).as("t_dow"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_dows"), sum(col("t_dow")).as("total"),
            sum(col("t_dow") * col("t_dow")).as("__ss"))
          .select(col("event_type"), col("n_dows"), col("total"),
            expr("(__ss * 1000000) div (total * total)").as("hhi_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH dw AS (SELECT event_type,
             |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow,
             |    CAST(count(*) AS BIGINT) AS t_dow
             |  FROM events GROUP BY 1, 2),
             |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_dows,
             |    CAST(sum(t_dow) AS BIGINT) AS total,
             |    CAST(sum(t_dow * t_dow) AS BIGINT) AS ss
             |  FROM dw GROUP BY 1)
             |SELECT event_type, n_dows, total,
             |  (ss * 1000000) // (total * total) AS hhi_ppm
             |FROM ag ORDER BY event_type""".stripMargin)),

    // ---- Sliding-window heavy hitters (Mg.slidingSupport): "trending
    // this week" — per-day MG summaries built once, each day's trailing
    // 7-day summaries merged by the multiway counter law, survivors
    // exactly recounted. The MG guarantee makes the screen complete
    // above W div (k+1) + 1, so the output EQUALS the direct exact
    // window computation and the oracle is sketch-free (the q189/q219
    // discipline, now sliding — the counter-family member next to
    // q161's sliding KMV and q229's sliding GK). ----
    Q("q270_trending_support",
      (s, dir) => {
        graft.operators.Mg.slidingSupport(
            t(s, dir, "events").select(col("ts"), col("event_type")),
            "event_type", "ts", windowDays = 7, k = 8)
          .orderBy(col("day"), col("value"))
      },
      Some("""WITH e AS (SELECT CAST(ts AS DATE) AS day,
             |    event_type AS value FROM events),
             |days AS (SELECT DISTINCT day FROM e),
             |vc AS (SELECT day, value, CAST(count(*) AS BIGINT) AS n
             |  FROM e GROUP BY 1, 2),
             |dt AS (SELECT day, CAST(count(*) AS BIGINT) AS nd
             |  FROM e GROUP BY 1),
             |wt AS (SELECT t.day, CAST(sum(dt.nd) AS BIGINT) AS w_total
             |  FROM days t JOIN dt ON dt.day > t.day - 7
             |    AND dt.day <= t.day
             |  GROUP BY 1),
             |wc AS (SELECT t.day, vc.value, CAST(sum(vc.n) AS BIGINT)
             |    AS wcount
             |  FROM days t JOIN vc ON vc.day > t.day - 7
             |    AND vc.day <= t.day
             |  GROUP BY 1, 2)
             |SELECT wc.day, wc.value, wc.wcount, wt.w_total,
             |  wt.w_total // 9 + 1 AS threshold
             |FROM wc JOIN wt USING (day)
             |WHERE wc.wcount >= wt.w_total // 9 + 1
             |ORDER BY day, value""".stripMargin)),

    // ---- INCREMENTAL AGGREGATE STORE (AggStore.buildAggStore +
    // mergeIntoAggStore): exact per-key (count, sum) state maintained as
    // a GenStore snapshot table — the incremental-view-maintenance member
    // of the increment discipline. Base lineitems (l_orderkey % 3 != 0)
    // build generation 1; the day's rows merge in as generation 2,
    // rewriting ONLY the buckets holding incremented suppkeys (their
    // untouched keys carry along — PlanSpec pins untouched buckets
    // byte-identical). Counts and sums are a commutative integer monoid,
    // so the oracle is the FULL recompute groupBy — the hash proves
    // increment-merge == recompute-from-scratch, bit-for-bit. ----
    Q("q298_agg_store_incremental",
      (s, dir) => {
        import graft.operators.AggStore
        val li = t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"),
            col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q298_").toString + "/aggs"
        AggStore.buildAggStore(li.filter(col("l_orderkey") % 3 =!= 0),
          tmp, "l_suppkey", "qty")
        AggStore.mergeIntoAggStore(li.filter(col("l_orderkey") % 3 === 0),
          tmp, "l_suppkey", "qty")
        AggStore.readAggStore(s, tmp).orderBy(col("key"))
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- Manifest-pruned aggregate-store diff (AggStore.diffAggStore):
    // the q298 lifecycle's two snapshots audited against each other —
    // which suppkeys the day's load added and which counts/sums it
    // changed — reading only entry-differing buckets (the q297 GenStore
    // machinery on a second store type). Oracle: both groupBys
    // recomputed from scratch and full-outer-diffed. ----
    Q("q299_agg_store_diff",
      (s, dir) => {
        import graft.operators.AggStore
        val li = t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"),
            col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q299_").toString + "/aggs"
        AggStore.buildAggStore(li.filter(col("l_orderkey") % 3 =!= 0),
          tmp, "l_suppkey", "qty")
        AggStore.mergeIntoAggStore(li.filter(col("l_orderkey") % 3 === 0),
          tmp, "l_suppkey", "qty")
        AggStore.diffAggStore(s, tmp, 1L, 2L).orderBy(col("key"))
      },
      Some("""WITH b AS (SELECT l_suppkey AS key, count(*) AS cnt,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |  FROM lineitem WHERE l_orderkey % 3 <> 0 GROUP BY 1),
             |f AS (SELECT l_suppkey AS key, count(*) AS cnt,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |  FROM lineitem GROUP BY 1)
             |SELECT coalesce(b.key, f.key) AS key,
             |  b.cnt AS cnt_a, b.total AS total_a,
             |  f.cnt AS cnt_b, f.total AS total_b,
             |  CASE WHEN b.key IS NULL THEN 'added'
             |       WHEN f.key IS NULL THEN 'removed'
             |       ELSE 'changed' END AS change
             |FROM b FULL OUTER JOIN f ON b.key = f.key
             |WHERE b.key IS NULL OR f.key IS NULL
             |   OR b.cnt <> f.cnt OR b.total <> f.total
             |ORDER BY key""".stripMargin)),

    // ---- STREAMING aggregate-store maintenance (StreamingAggStore
    // .aggStoreSink): the q298 rows fed as a stream, each microbatch
    // folding its per-key counts/sums into the store — exactly-once by
    // the APPLIED LEDGER, because unlike the cluster store's quotient
    // merge an aggregate increment is NOT idempotent (a replayed batch
    // would double-count): the batch id is the merge's appliedId, the
    // ledger entry commits atomically with the merged state in the one
    // manifest rename, and a replay is a detected no-op
    // (StreamingSpec-pinned). Final state hash-equals the full groupBy
    // recompute. ----
    Q("q300_stream_agg_store",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"),
            col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q300_").toString
        val input = MemoryStream[(Long, Long)]
        val q = graft.streaming.StreamingAggStore.aggStoreSink(
          input.toDF().toDF("l_suppkey", "qty"),
          s"$tmp/aggs", s"$tmp/ckpt", keyCol = "l_suppkey", valCol = "qty")
        try {
          for (r <- 0 to 2) {
            input.addData(li.filter(col("l_orderkey") % 3 === r)
              .select(col("l_suppkey"), col("qty"))
              .as[(Long, Long)].collect().toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        graft.operators.AggStore.readAggStore(s, s"$tmp/aggs")
          .orderBy(col("key"))
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- Pointer-only ROLLBACK (AggStore.rollbackAggStore): the q298
    // store takes a BAD day-1 load (every quantity inflated by 7),
    // rollback reverts to generation 1 — zero data copies, the bad state
    // stays archived and diffable — and the CORRECT day-1 load then
    // merges. The ledger reverted with the state, so the re-feed applies
    // instead of being refused. Oracle is q298's full recompute: the
    // hash proves the bad load left NO residue (which a state-only
    // rollback with a stale ledger, or a partial revert, could not
    // satisfy). ----
    Q("q301_agg_store_rollback",
      (s, dir) => {
        import graft.operators.AggStore
        val li = t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"),
            col("l_quantity").cast("long").as("qty"))
        val inc = li.filter(col("l_orderkey") % 3 === 0)
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q301_").toString + "/aggs"
        AggStore.buildAggStore(li.filter(col("l_orderkey") % 3 =!= 0),
          tmp, "l_suppkey", "qty")                                   // gen 1
        AggStore.mergeIntoAggStore(                                  // gen 2: BAD
          inc.withColumn("qty", col("qty") + lit(7L)),
          tmp, "l_suppkey", "qty", appliedId = Some("day-1"))
        AggStore.rollbackAggStore(s, tmp, 1L)                        // gen 3
        AggStore.mergeIntoAggStore(inc,                              // gen 4: good
          tmp, "l_suppkey", "qty", appliedId = Some("day-1"))
        AggStore.readAggStore(s, tmp).orderBy(col("key"))
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- COMPLIANCE PURGE of the aggregate store (AggStore
    // .purgeAggStoreKeys): build on the full table, then erase every
    // suppkey ≡ 0 (mod 7) — the rows are physically gone from every file
    // under the store (live state AND time-travel history: the purge
    // truncates the archive and surgically deletes the remapped-away
    // bucket dirs, because a resolvable pre-purge snapshot is exactly
    // what compliance forbids — PlanSpec pins the full-file sweep). Only
    // the purged keys' buckets are rewritten; the oracle is the groupBy
    // over the surviving keys. ----
    Q("q303_agg_store_purge",
      (s, dir) => {
        import graft.operators.AggStore
        val li = t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q303_").toString + "/aggs"
        AggStore.buildAggStore(li, tmp, "l_suppkey", "qty")
        AggStore.purgeAggStoreKeys(
          li.filter(col("l_suppkey") % 7 === 0)
            .select(col("l_suppkey")).distinct(),
          tmp, "l_suppkey")
        AggStore.readAggStore(s, tmp).orderBy(col("key"))
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem WHERE l_suppkey % 7 <> 0
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- INCREMENTAL MATERIALIZED JOIN VIEW (ViewStore.buildJoinView +
    // mergeIntoJoinView): `SELECT o_custkey, count(*), sum(qty) FROM
    // orders JOIN lineitem USING (orderkey) GROUP BY 1` maintained as a
    // three-substore GenStore table under insert-only increments to
    // BOTH sides in the same batch. The delta rule is factored per join
    // key — ΔV = Σ na_new·nb_new − na_old·nb_old over touched keys,
    // algebraically the textbook ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB but ONE join
    // instead of three — and reads only the side buckets holding
    // incremented keys. Exact integer monoid, so the oracle is the FULL
    // recompute join: the hash proves increment-merge == recompute,
    // bit-for-bit, including the cross term (both splits interleave:
    // build gets ⅔ of orders and ½ of lineitems, the increment the
    // rest). ----
    Q("q312_join_view_incremental",
      (s, dir) => {
        import graft.operators.ViewStore
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q312_").toString + "/jv"
        ViewStore.buildJoinView(
          o.filter(col("o_orderkey") % 3 =!= 0),
          l.filter(col("l_orderkey") % 2 =!= 0),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "qty")
        ViewStore.mergeIntoJoinView(
          o.filter(col("o_orderkey") % 3 === 0),
          l.filter(col("l_orderkey") % 2 === 0),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "qty",
          appliedId = Some("day-1"))
        ViewStore.readJoinView(s, tmp).orderBy(col("key"))
      },
      Some("""SELECT o_custkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- STREAMING join-view maintenance (StreamingJoinView
    // .joinViewSink): the q312 sides arrive as ONE tagged change feed
    // (side ∈ a|b — the union'd CDC shape), each microbatch folding a
    // two-sided increment through the same delta rule — exactly-once by
    // the THREE-ledger discipline (view → a → b, batch id as appliedId
    // in each; a replayed batch skips fully-applied legs and resumes
    // half-applied sequences mid-order). Final view hash-equals the
    // full join recompute. ----
    Q("q313_stream_join_view",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import s.implicits._
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q313_").toString
        val input = MemoryStream[(String, Long, Long, Long)]
        val q = graft.streaming.StreamingJoinView.joinViewSink(
          input.toDF().toDF("side", "key", "grp", "v"),
          s"$tmp/jv", s"$tmp/ckpt")
        try {
          for (r <- 0 to 2) {
            val aRows = o.filter(col("o_orderkey") % 3 === r)
              .select(lit("a"), col("o_orderkey"), col("o_custkey"), lit(0L))
            val bRows = l.filter(col("l_orderkey") % 3 === r)
              .select(lit("b"), col("l_orderkey"), lit(0L), col("qty"))
            input.addData(aRows.unionAll(bRows)
              .as[(String, Long, Long, Long)].collect().toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        graft.operators.ViewStore.readJoinView(s, s"$tmp/jv")
          .orderBy(col("key"))
      },
      Some("""SELECT o_custkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- COMPLIANCE PURGE on the join view (ViewStore
    // .purgeJoinViewGroups — the eighth persisted store shape to carry
    // the purge verb): erasing a customer erases their view row, their
    // a-rows, and the b-rows of join keys left with NO surviving a-row
    // (their lineitems existed only as the subject's data), from live
    // state AND history; suppression lists land first so replayed
    // committed batches cannot re-ingest the subject (ViewStoreSpec
    // replays a re-send after the purge). Oracle: the join recomputed
    // WITHOUT the subjects — the hash proves zero residue reaches the
    // served view. ----
    Q("q314_join_view_purge",
      (s, dir) => {
        import graft.operators.ViewStore
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q314_").toString + "/jv"
        ViewStore.buildJoinView(o, l, tmp,
          "o_orderkey", "o_custkey", "l_orderkey", "qty")
        ViewStore.purgeJoinViewGroups(
          o.filter(col("o_custkey") % 10 === 3)
            .select(col("o_custkey").as("key")).distinct(), tmp)
        ViewStore.readJoinView(s, tmp).orderBy(col("key"))
      },
      Some("""SELECT o_custkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_custkey % 10 <> 3
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- Pointer-only ROLLBACK on the join view (ViewStore
    // .rollbackJoinView — the q301 verb on the three-substore shape,
    // addressed in BATCHES because absolute generations drift across a
    // purge): the q312 store takes a BAD day-1 load (every quantity
    // inflated by 100), rollback reverts all three substores one batch
    // — zero data copies — and the CORRECT day-1 load re-feeds under
    // the SAME applied id (the ledgers reverted with the state). Oracle
    // is the full recompute: the hash proves the bad load left no
    // residue in the view OR the side states the re-feed folded
    // against. ----
    Q("q318_join_view_rollback",
      (s, dir) => {
        import graft.operators.ViewStore
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        val (oInc, lInc) =
          (o.filter(col("o_orderkey") % 3 === 0),
            l.filter(col("l_orderkey") % 2 === 0))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q318_").toString + "/jv"
        ViewStore.buildJoinView(
          o.filter(col("o_orderkey") % 3 =!= 0),
          l.filter(col("l_orderkey") % 2 =!= 0),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "qty")
        ViewStore.mergeIntoJoinView(oInc,                      // BAD load
          lInc.withColumn("qty", col("qty") + lit(100L)),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "qty",
          appliedId = Some("day-1"))
        ViewStore.rollbackJoinView(s, tmp, batchesBack = 1)
        ViewStore.mergeIntoJoinView(oInc, lInc,                // corrected
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "qty",
          appliedId = Some("day-1"))
        ViewStore.readJoinView(s, tmp).orderBy(col("key"))
      },
      Some("""SELECT o_custkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- MATERIALIZED-VIEW REWRITE (plans/AggStoreRewrite, a real
    // Rule[LogicalPlan] via spark.experimental / GraftExtensions): the
    // q298 store's optimizer-side payoff — a query that groups the
    // registered base table by the registered key with count/sum is
    // REWRITTEN to scan the store (store-size I/O, not corpus-size),
    // output attribute ids preserved so operators above resolve
    // unchanged. The rewrite fires during the eager checkpoint inside
    // the try block (MvRewriteSpec pins that inputFiles move to the
    // store and that non-matching shapes are left alone); the rule and
    // registration are restored/cleared before returning so the shared
    // session is untouched. Oracle: the plain groupBy — the hash
    // proves the SERVED store state equals the direct aggregation. ----
    Q("q322_mv_rewrite",
      (s, dir) => {
        import graft.operators.AggStore
        import graft.plans.{AggStoreRewrite, MvCatalog}
        val li = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q322_").toString + "/store"
        AggStore.buildAggStore(
          li.select(col("l_suppkey"), col("l_quantity")),
          tmp, "l_suppkey", "l_quantity")
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ AggStoreRewrite(s)
        try {
          MvCatalog.registerAggView(li, "l_suppkey", "l_quantity", tmp)
          li.groupBy(col("l_suppkey"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("l_suppkey", "key")
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          MvCatalog.clear()
        }
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- JOIN-VIEW REWRITE (plans/JoinViewRewrite): the q322 idea one
    // operator up — the orders ⋈ lineitem per-customer aggregate over
    // REGISTERED bases rewrites to scan the maintained ViewStore,
    // skipping the corpus-size join AND aggregation. The matcher
    // additionally accepts the optimizer's inferred IsNotNull(joinKey)
    // guards (semantically no-ops under an inner equi-join) and
    // nothing else; MvRewriteSpec pins the outer-join and
    // filtered-base refusals. Oracle: the full join recompute through
    // the live rewrite (eager checkpoint). ----
    Q("q323_join_view_rewrite",
      (s, dir) => {
        import graft.operators.ViewStore
        import graft.plans.{JoinViewCatalog, JoinViewRewrite}
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q323_").toString + "/jv"
        ViewStore.buildJoinView(
          o.select(col("o_orderkey"), col("o_custkey")),
          l.select(col("l_orderkey"), col("l_quantity")),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "l_quantity")
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ JoinViewRewrite(s)
        try {
          JoinViewCatalog.registerJoinView(o, l,
            "o_orderkey", "o_custkey", "l_orderkey", "l_quantity", tmp)
          o.join(l, o("o_orderkey") === l("l_orderkey"))
            .groupBy(col("o_custkey"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("o_custkey", "key")
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          JoinViewCatalog.clear()
        }
      },
      Some("""SELECT o_custkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- TIME-TRAVEL read on the join view (ViewStore
    // .readJoinViewAsOf): generation 1 is the build-time view — the
    // oracle recomputes the join over ONLY the build subsets (both
    // sides partial), so the hash proves the archived snapshot replays
    // bit-exact after the two-sided increment landed on top of it. ----
    Q("q326_join_view_time_travel",
      (s, dir) => {
        import graft.operators.ViewStore
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q326_").toString + "/jv"
        ViewStore.buildJoinView(
          o.filter(col("o_orderkey") % 3 =!= 0),
          l.filter(col("l_orderkey") % 2 =!= 0),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "qty")
        ViewStore.mergeIntoJoinView(
          o.filter(col("o_orderkey") % 3 === 0),
          l.filter(col("l_orderkey") % 2 === 0),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "qty",
          appliedId = Some("day-1"))
        ViewStore.readJoinViewAsOf(s, tmp, 1L).orderBy(col("key"))
      },
      Some("""SELECT o_custkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderkey % 3 <> 0 AND l_orderkey % 2 <> 0
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- EXTREMA JOIN VIEW through the REWRITE (ViewStore extrema +
    // plans/JoinViewRewrite min/max outputs): q334's insert-only
    // min/max monoid argument pushed through a join — a group's
    // min over A⋈B is the min over its join keys of the b-side per-key
    // min (multiplicity never moves an extremum), maintained at BOTH
    // levels by least/greatest LSM folds (GenStore.FoldMin/FoldMax).
    // Build from subsets + a two-sided increment, so the served
    // extrema fold across real delta segments; then a PLAIN
    // `groupBy(cust).agg(count, sum, min, max)` over the registered
    // bases serves from the store. MvRewriteSpec pins that min/max
    // REFUSE on a plain (non-extrema) view. Oracle: the full join
    // recompute. ----
    Q("q343_join_view_extrema",
      (s, dir) => {
        import graft.operators.ViewStore
        import graft.plans.{JoinViewCatalog, JoinViewRewrite}
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q343_").toString + "/jv"
        ViewStore.buildJoinView(
          o.select(col("o_orderkey"), col("o_custkey"))
            .filter(col("o_orderkey") % 3 =!= 0),
          l.select(col("l_orderkey"), col("l_quantity"))
            .filter(col("l_orderkey") % 2 =!= 0),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "l_quantity",
          extrema = true)
        ViewStore.mergeIntoJoinView(
          o.select(col("o_orderkey"), col("o_custkey"))
            .filter(col("o_orderkey") % 3 === 0),
          l.select(col("l_orderkey"), col("l_quantity"))
            .filter(col("l_orderkey") % 2 === 0),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "l_quantity",
          appliedId = Some("day-1"))
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ JoinViewRewrite(s)
        try {
          JoinViewCatalog.registerJoinView(o, l,
            "o_orderkey", "o_custkey", "l_orderkey", "l_quantity", tmp)
          o.join(l, o("o_orderkey") === l("l_orderkey"))
            .groupBy(col("o_custkey"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"),
              min(col("l_quantity").cast("long")).as("vmin"),
              max(col("l_quantity").cast("long")).as("vmax"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("o_custkey", "key")
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          JoinViewCatalog.clear()
        }
      },
      Some("""SELECT o_custkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total,
             |  min(CAST(l_quantity AS BIGINT)) AS vmin,
             |  max(CAST(l_quantity AS BIGINT)) AS vmax
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- UNIFIED TABLE SERVICES (operators/Maintenance.sweep): the
    // engine's cadence verbs — LSM compaction, retention vacuum, layout
    // recluster — behind ONE call that inspects each registered store's
    // manifests (segment histogram, generation depth, drift ppm; all
    // metadata-only) and runs exactly what the numbers demand. Here a
    // join view over orders ⋈ lineitem degrades through four daily
    // two-sided merges (LSM segments pile up, history deepens), ONE
    // sweep compacts + vacuums it, and the served view hash-matches the
    // one-shot join oracle — maintenance is serving-invariant by
    // construction (MaintenanceSpec pins the multi-family fixture and
    // the all-none second sweep). ----
    Q("q344_maintenance_sweep",
      (s, dir) => {
        import graft.operators.{Maintenance, ViewStore}
        import graft.operators.Maintenance.{JoinViewT, Policy}
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q344_").toString + "/jv"
        ViewStore.buildJoinView(
          o.filter(col("o_orderkey") % 5 === 0),
          l.filter(col("l_orderkey") % 5 === 0),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "l_quantity")
        (1L to 4L).foreach(i => ViewStore.mergeIntoJoinView(
          o.filter(col("o_orderkey") % 5 === i),
          l.filter(col("l_orderkey") % 5 === i),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "l_quantity",
          appliedId = Some(s"day-$i")))
        val actions = Maintenance.sweep(s, Seq(JoinViewT(tmp)),
          Policy(maxSegments = 2, keepGens = 2))
        require(actions.exists(_.verb == "compact") &&
          actions.exists(_.verb == "vacuum"),
          s"the degraded view must trip compact+vacuum, got $actions")
        ViewStore.readJoinView(s, tmp).orderBy(col("key"))
      },
      Some("""SELECT o_custkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- POINT LOOKUP on the aggregate store (AggStore
    // .lookupAggStoreKeys / GenStore.lookupKeys): "these suppliers'
    // aggregates" reads ONLY the buckets the keys hash to — the
    // manifest IS the index (≤ |keys| bucket dirs of I/O and listing,
    // never the store; ViewStoreSpec pins the strict-subset inputFiles
    // on the view twin). Semi-join re-applies exactness: hash buckets
    // admit co-resident keys, never lose one. Oracle: the filtered
    // groupBy recompute. ----
    Q("q327_agg_store_lookup",
      (s, dir) => {
        import graft.operators.AggStore
        val li = t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q327_").toString + "/aggs"
        AggStore.buildAggStore(li, tmp, "l_suppkey", "qty")
        AggStore.lookupAggStoreKeys(
          li.filter(col("l_suppkey") % 11 === 0)
            .select(col("l_suppkey")).distinct(),
          tmp, "l_suppkey").orderBy(col("key"))
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem WHERE l_suppkey % 11 = 0
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- MV-REWRITE FRESHNESS GUARD (operators/BaseFiles +
    // AggStoreRewrite.freshOrLog): every store build/merge records its
    // source's landed-file fingerprint; the rewrite REFUSES when the
    // scan's inputFiles have moved past it — closing the one window
    // where a stale registration could silently serve stale
    // aggregates. Here half of lineitem builds the store, the other
    // half lands in the base WITHOUT a merge, and the query (rule
    // live, eager checkpoint) must answer the FULL corpus from the
    // base: the full-corpus oracle hash-proves the stale store did not
    // serve. MvRewriteSpec additionally pins that merging the landed
    // files restores the rewrite. ----
    Q("q328_mv_rewrite_freshness",
      (s, dir) => {
        import graft.operators.AggStore
        import graft.plans.{AggStoreRewrite, MvCatalog}
        val li = t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q328_").toString
        li.filter(col("l_suppkey") % 2 === 1).write.parquet(s"$tmp/base")
        AggStore.buildAggStore(s.read.parquet(s"$tmp/base"),
          s"$tmp/store", "l_suppkey", "qty")
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ AggStoreRewrite(s)
        try {
          MvCatalog.registerAggView(s.read.parquet(s"$tmp/base"),
            "l_suppkey", "qty", s"$tmp/store")
          // the day's load lands in the base WITHOUT a store merge
          li.filter(col("l_suppkey") % 2 === 0)
            .write.mode("append").parquet(s"$tmp/base")
          s.read.parquet(s"$tmp/base")
            .groupBy(col("l_suppkey"))
            .agg(count(lit(1)).as("cnt"), sum(col("qty")).as("total"))
            .localCheckpoint(true) // the rule runs HERE — and refuses
            .withColumnRenamed("l_suppkey", "key")
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          MvCatalog.clear()
        }
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- MV rewrite, AVG shape (AggStoreRewrite OutCol.Mean): avg(v)
    // is served as total/cnt from the store's own columns — exact for
    // integral inputs because Spark's own Average is double(sum)/
    // double(count) and integer partial sums are exact in double. The
    // rounding happens ABOVE the served aggregate (after the
    // checkpoint), so the rewrite fires on the plain avg shape. ----
    Q("q330_mv_rewrite_avg",
      (s, dir) => {
        import graft.operators.AggStore
        import graft.plans.{AggStoreRewrite, MvCatalog}
        val li = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q330_").toString + "/store"
        AggStore.buildAggStore(
          li.select(col("l_suppkey"), col("l_quantity")),
          tmp, "l_suppkey", "l_quantity")
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ AggStoreRewrite(s)
        try {
          MvCatalog.registerAggView(li, "l_suppkey", "l_quantity", tmp)
          li.groupBy(col("l_suppkey"))
            .agg(count(lit(1)).as("cnt"),
              avg(col("l_quantity").cast("long")).as("avg_qty"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("l_suppkey", "key")
            .select(col("key"), col("cnt"),
              round(col("avg_qty"), 6).as("avg_qty"))
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          MvCatalog.clear()
        }
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  round(avg(CAST(l_quantity AS BIGINT)), 6) AS avg_qty
             |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- MV rewrite, POINT-LOOKUP shape (AggStoreRewrite keyLiteralPred
    // + AggStore.lookupAggStoreKeys): a `WHERE key IN (lits)` above the
    // matched aggregate — pushed below it by the optimizer — rewrites
    // to the manifest-pruned bucket lookup (q327's read), so "these
    // suppliers' aggregates" costs ≤ |keys| bucket dirs instead of even
    // a store scan; MvRewriteSpec pins the strict-subset inputFiles.
    // Oracle: the filtered groupBy recompute. ----
    Q("q331_mv_rewrite_lookup",
      (s, dir) => {
        import graft.operators.AggStore
        import graft.plans.{AggStoreRewrite, MvCatalog}
        val li = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q331_").toString + "/store"
        AggStore.buildAggStore(
          li.select(col("l_suppkey"), col("l_quantity")),
          tmp, "l_suppkey", "l_quantity")
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ AggStoreRewrite(s)
        try {
          MvCatalog.registerAggView(li, "l_suppkey", "l_quantity", tmp)
          li.filter(col("l_suppkey").isin(11L, 22L, 33L, 44L))
            .groupBy(col("l_suppkey"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("l_suppkey", "key")
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          MvCatalog.clear()
        }
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem WHERE l_suppkey IN (11, 22, 33, 44)
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- MV rewrite, MULTI-KEY shape (struct-keyed store): the store
    // is built over struct(l_suppkey, l_returnflag) and a query grouping
    // by exactly those columns, in order, serves with each group column
    // projected back out of the struct (GetStructField, attribute ids
    // preserved); MvRewriteSpec pins the wrong-order refusal. Oracle:
    // the two-column groupBy recompute. ----
    Q("q332_mv_rewrite_multikey",
      (s, dir) => {
        import graft.operators.AggStore
        import graft.plans.{AggStoreRewrite, MvCatalog}
        val li = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q332_").toString + "/store"
        AggStore.buildAggStore(
          li.select(struct(col("l_suppkey"), col("l_returnflag")).as("kk"),
            col("l_quantity")),
          tmp, "kk", "l_quantity")
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ AggStoreRewrite(s)
        try {
          MvCatalog.registerAggView(li, Seq("l_suppkey", "l_returnflag"),
            "l_quantity", tmp)
          li.groupBy(col("l_suppkey"), col("l_returnflag"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("l_suppkey", "key")
            .orderBy(col("key"), col("l_returnflag"))
        } finally {
          s.experimental.extraOptimizations = prev
          MvCatalog.clear()
        }
      },
      Some("""SELECT l_suppkey AS key, l_returnflag, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- LSM lifecycle on the join view (GenStore.mergeAdditive's
    // delta-segment tier + ViewStore.compactJoinView + vacuum): a build
    // and FOUR two-sided increments land as per-batch segments — each
    // merge writes the increment, never the touched buckets' volume
    // (ViewStoreSpec pins the written-bytes law) — then compaction
    // folds every multi-segment bucket to one and vacuum reclaims the
    // superseded segment dirs. The exact long monoid makes
    // fold-at-read == eager-merge in any order, so the oracle is the
    // one full recompute and the hash proves the whole
    // land-fold-compact-reclaim cycle is lossless. ----
    Q("q333_view_lsm_compaction",
      (s, dir) => {
        import graft.operators.ViewStore
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q333_").toString + "/jv"
        ViewStore.buildJoinView(
          o.filter(col("o_orderkey") % 5 === 0),
          l.filter(col("l_orderkey") % 5 === 0),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "qty")
        for (r <- 1 to 4)
          ViewStore.mergeIntoJoinView(
            o.filter(col("o_orderkey") % 5 === r),
            l.filter(col("l_orderkey") % 5 === r),
            tmp, "o_orderkey", "o_custkey", "l_orderkey", "qty",
            appliedId = Some(s"day-$r"))
        ViewStore.compactJoinView(s, tmp)
        ViewStore.vacuumJoinView(s, tmp)
        ViewStore.readJoinView(s, tmp).orderBy(col("key"))
      },
      Some("""SELECT o_custkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- MV rewrite, MIN/MAX shape over an EXTREMA store (AggStore
    // extrema = true: per-key vmin/vmax ride the same buckets — min/max
    // over exact longs are a commutative monoid UNDER INSERT-ONLY
    // increments, exactly this store's contract since keys never leave
    // and deletes are a rebuild; merges fold by least/greatest). The
    // rule serves min/max only when the registered store carries the
    // columns (MvRewriteSpec pins the plain-store refusal) and never
    // through the 3-column point lookup. Oracle: the direct four-agg
    // recompute. ----
    Q("q334_mv_rewrite_minmax",
      (s, dir) => {
        import graft.operators.AggStore
        import graft.plans.{AggStoreRewrite, MvCatalog}
        val li = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q334_").toString + "/store"
        AggStore.buildAggStore(
          li.select(col("l_suppkey"), col("l_quantity")),
          tmp, "l_suppkey", "l_quantity", extrema = true)
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ AggStoreRewrite(s)
        try {
          MvCatalog.registerAggView(li, "l_suppkey", "l_quantity", tmp)
          li.groupBy(col("l_suppkey"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"),
              min(col("l_quantity").cast("long")).as("qmin"),
              max(col("l_quantity").cast("long")).as("qmax"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("l_suppkey", "key")
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          MvCatalog.clear()
        }
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total,
             |  min(CAST(l_quantity AS BIGINT)) AS qmin,
             |  max(CAST(l_quantity AS BIGINT)) AS qmax
             |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- JOIN-VIEW POINT-LOOKUP REWRITE (JoinViewRewrite + ViewStore
    // .lookupJoinViewGroups): "these customers' joined totals" — a
    // `WHERE o_custkey IN (lits)` above the join-aggregate, pushed by
    // the optimizer below the aggregate AND below the join onto the
    // a-side, rewrites to the manifest-pruned view lookup: ≤ |groups|
    // view bucket dirs instead of the corpus join, the corpus
    // aggregation, or even the view scan (MvRewriteSpec pins the
    // strict-subset inputFiles and the value-filter refusal). Oracle:
    // the filtered join recompute. ----
    Q("q335_join_view_lookup_rewrite",
      (s, dir) => {
        import graft.operators.ViewStore
        import graft.plans.{JoinViewCatalog, JoinViewRewrite}
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q335_").toString + "/jv"
        ViewStore.buildJoinView(
          o.select(col("o_orderkey"), col("o_custkey")),
          l.select(col("l_orderkey"), col("l_quantity")),
          tmp, "o_orderkey", "o_custkey", "l_orderkey", "l_quantity")
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ JoinViewRewrite(s)
        try {
          JoinViewCatalog.registerJoinView(o, l,
            "o_orderkey", "o_custkey", "l_orderkey", "l_quantity", tmp)
          o.join(l, o("o_orderkey") === l("l_orderkey"))
            .filter(col("o_custkey").isin(7L, 77L, 777L))
            .groupBy(col("o_custkey"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("o_custkey", "key")
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          JoinViewCatalog.clear()
        }
      },
      Some("""SELECT o_custkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_custkey IN (7, 77, 777)
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- EXTREMA store under INCREMENTS (AggStore extrema = true +
    // mergeIntoAggStore): vmin/vmax fold by least/greatest across an
    // insert-only increment — one-sided keys take the present side —
    // and the MV rewrite serves the post-merge min/max. Oracle: the
    // full-corpus four-aggregate recompute, hash-proving the folded
    // extrema equal the one-shot build's. ----
    Q("q336_agg_store_extrema_incremental",
      (s, dir) => {
        import graft.operators.AggStore
        import graft.plans.{AggStoreRewrite, MvCatalog}
        val li = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q336_").toString + "/store"
        AggStore.buildAggStore(
          li.filter(col("l_orderkey") % 2 === 1)
            .select(col("l_suppkey"), col("l_quantity")),
          tmp, "l_suppkey", "l_quantity", extrema = true)
        AggStore.mergeIntoAggStore(
          li.filter(col("l_orderkey") % 2 === 0)
            .select(col("l_suppkey"), col("l_quantity")),
          tmp, "l_suppkey", "l_quantity", appliedId = Some("day-1"))
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ AggStoreRewrite(s)
        try {
          MvCatalog.registerAggView(li, "l_suppkey", "l_quantity", tmp)
          li.groupBy(col("l_suppkey"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"),
              min(col("l_quantity").cast("long")).as("qmin"),
              max(col("l_quantity").cast("long")).as("qmax"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("l_suppkey", "key")
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          MvCatalog.clear()
        }
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total,
             |  min(CAST(l_quantity AS BIGINT)) AS qmin,
             |  max(CAST(l_quantity AS BIGINT)) AS qmax
             |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- STREAMING extrema-store maintenance (StreamingAggStore
    // .aggStoreSink(extrema = true)): a stream is insert-only BY
    // CONSTRUCTION — exactly the contract the vmin/vmax monoid needs —
    // so per-key min/max maintain under microbatch folds with the same
    // batch-id ledger exactly-once as the counts and sums. The drained
    // store's full five-column state hash-matches the one-shot batch
    // aggregate. ----
    Q("q338_stream_agg_store_extrema",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"),
            col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q338_").toString
        val input = MemoryStream[(Long, Long)]
        val q = graft.streaming.StreamingAggStore.aggStoreSink(
          input.toDF().toDF("l_suppkey", "qty"),
          s"$tmp/aggs", s"$tmp/ckpt", keyCol = "l_suppkey", valCol = "qty",
          extrema = true)
        try {
          for (r <- 0 to 2) {
            input.addData(li.filter(col("l_orderkey") % 3 === r)
              .select(col("l_suppkey"), col("qty"))
              .as[(Long, Long)].collect().toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        graft.operators.AggStore.readAggStoreExtrema(s, s"$tmp/aggs")
          .orderBy(col("key"))
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total,
             |  min(CAST(l_quantity AS BIGINT)) AS vmin,
             |  max(CAST(l_quantity AS BIGINT)) AS vmax
             |FROM lineitem GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- STREAMING extrema join view (StreamingJoinView.joinViewSink
    // (extrema = true)): the q343 store maintained from the tagged
    // change feed — a stream is insert-only BY CONSTRUCTION, exactly
    // the least/greatest contract the extrema columns need, so the
    // twin carries per-group vmin/vmax at NO protocol change (the flag
    // only shapes the first-batch build; merges self-detect the store's
    // marker). The drained extrema view hash-matches the full join
    // recompute. ----
    Q("q345_stream_join_view_extrema",
      (s, dir) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import s.implicits._
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q345_").toString
        val input = MemoryStream[(String, Long, Long, Long)]
        val q = graft.streaming.StreamingJoinView.joinViewSink(
          input.toDF().toDF("side", "key", "grp", "v"),
          s"$tmp/jv", s"$tmp/ckpt", extrema = true)
        try {
          for (r <- 0 to 2) {
            val aRows = o.filter(col("o_orderkey") % 3 === r)
              .select(lit("a"), col("o_orderkey"), col("o_custkey"), lit(0L))
            val bRows = l.filter(col("l_orderkey") % 3 === r)
              .select(lit("b"), col("l_orderkey"), lit(0L), col("qty"))
            input.addData(aRows.unionAll(bRows)
              .as[(String, Long, Long, Long)].collect().toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
        graft.operators.ViewStore.readJoinViewExtrema(s, s"$tmp/jv")
          .orderBy(col("key"))
      },
      Some("""SELECT o_custkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total,
             |  min(CAST(l_quantity AS BIGINT)) AS vmin,
             |  max(CAST(l_quantity AS BIGINT)) AS vmax
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- EXTREMA POINT LOOKUP through the MV rewrite (AggStore
    // .lookupAggStoreKeysExtrema + the widened AggStoreRewrite gate):
    // min/max serving composed with q327's bucket-pruned point lookup —
    // a `key IN (lits)` groupBy with count/sum/min/max over the
    // registered base serves from ≤ |keys| bucket dirs of the extrema
    // store, closing the r16 refusal (min/max previously served only by
    // full store scans). MvRewriteSpec pins the values through the
    // lookup path and the plain-store refusal. Oracle: the filtered
    // groupBy recompute. ----
    Q("q346_mv_extrema_lookup",
      (s, dir) => {
        import graft.operators.AggStore
        import graft.plans.{AggStoreRewrite, MvCatalog}
        val li = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q346_").toString + "/store"
        AggStore.buildAggStore(
          li.select(col("l_suppkey"), col("l_quantity")),
          tmp, "l_suppkey", "l_quantity", extrema = true)
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ AggStoreRewrite(s)
        try {
          MvCatalog.registerAggView(li, "l_suppkey", "l_quantity", tmp)
          li.filter(col("l_suppkey").isin(3, 7, 9))
            .groupBy(col("l_suppkey"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"),
              min(col("l_quantity").cast("long")).as("vmin"),
              max(col("l_quantity").cast("long")).as("vmax"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("l_suppkey", "key")
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          MvCatalog.clear()
        }
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total,
             |  min(CAST(l_quantity AS BIGINT)) AS vmin,
             |  max(CAST(l_quantity AS BIGINT)) AS vmax
             |FROM lineitem WHERE l_suppkey IN (3, 7, 9)
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- STRING-keyed point lookup through the MV rewrite
    // (AggStoreRewrite.lookupable + CatalystTypeConverters): the
    // key-literal lookup widened past integral keys to what warehouses
    // actually key on — strings, dates, timestamps — by bridging the
    // literal's INTERNAL value (UTF8String, epoch days, micros) back
    // to the DataFrame surface, a lossless round trip. `l_returnflag
    // IN ('A', 'N')` reads ≤ 2 bucket dirs of the store. MvRewriteSpec
    // pins string and date keys plus the strict-subset inputFiles.
    // Oracle: the filtered groupBy recompute. ----
    Q("q348_mv_string_lookup",
      (s, dir) => {
        import graft.operators.AggStore
        import graft.plans.{AggStoreRewrite, MvCatalog}
        val li = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q348_").toString + "/store"
        AggStore.buildAggStore(
          li.select(col("l_returnflag"), col("l_quantity")),
          tmp, "l_returnflag", "l_quantity")
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ AggStoreRewrite(s)
        try {
          MvCatalog.registerAggView(li, "l_returnflag", "l_quantity", tmp)
          li.filter(col("l_returnflag").isin("A", "N"))
            .groupBy(col("l_returnflag"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("l_returnflag", "key")
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          MvCatalog.clear()
        }
      },
      Some("""SELECT l_returnflag AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem WHERE l_returnflag IN ('A', 'N')
             |GROUP BY 1 ORDER BY key""".stripMargin)),

    // ---- MULTI-KEY point lookup through the MV rewrite
    // (AggStoreRewrite's MultiKey predicate): q332's struct-keyed
    // serving composed with q331's bucket-pruned lookup — a
    // conjunction of per-column equalities covering the registered
    // (l_suppkey, l_returnflag) key exactly once becomes ONE
    // struct-key row and ONE bucket dir of I/O; "this (supplier,
    // flag)'s aggregate" never scans even the store. A PARTIAL key
    // filter (one equality of two) refuses and answers from the base —
    // MvRewriteSpec pins both. Oracle: the filtered groupBy recompute.
    // ----
    Q("q351_mv_multikey_lookup",
      (s, dir) => {
        import graft.operators.AggStore
        import graft.plans.{AggStoreRewrite, MvCatalog}
        val li = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q351_").toString + "/store"
        AggStore.buildAggStore(
          li.select(struct(col("l_suppkey"), col("l_returnflag")).as("kk"),
            col("l_quantity")),
          tmp, "kk", "l_quantity")
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ AggStoreRewrite(s)
        try {
          MvCatalog.registerAggView(li, Seq("l_suppkey", "l_returnflag"),
            "l_quantity", tmp)
          li.filter(col("l_suppkey") === 7 && col("l_returnflag") === "A")
            .groupBy(col("l_suppkey"), col("l_returnflag"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"))
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("l_suppkey", "key")
            .orderBy(col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          MvCatalog.clear()
        }
      },
      Some("""SELECT l_suppkey AS key, l_returnflag, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem WHERE l_suppkey = 7 AND l_returnflag = 'A'
             |GROUP BY 1, 2 ORDER BY key""".stripMargin)),

    // ---- TOP-K SERVING through the MV rewrite: the dashboard shape —
    // `ORDER BY <stored agg> DESC LIMIT k` — serves from the
    // maintained store with the Sort+Limit planned ABOVE the rewritten
    // aggregate (store-size sort input instead of corpus-size scan;
    // the store read is already bucket-wide, so this is plan
    // composition, not new I/O). MvRewriteSpec pins the DataFrame and
    // both SQL spellings (sort key in and NOT in the select) plus the
    // refusal when the sort key is an agg the store does not carry
    // (max) — correct from the base, never wrong from the store.
    // Oracle: the direct top-k recompute, deterministic tiebreak on
    // the key. ----
    Q("q357_mv_topk",
      (s, dir) => {
        import graft.operators.AggStore
        import graft.plans.{AggStoreRewrite, MvCatalog}
        val li = t(s, dir, "lineitem")
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_q357_").toString + "/store"
        AggStore.buildAggStore(
          li.select(col("l_suppkey"), col("l_quantity")),
          tmp, "l_suppkey", "l_quantity")
        val prev = s.experimental.extraOptimizations
        s.experimental.extraOptimizations = prev :+ AggStoreRewrite(s)
        try {
          MvCatalog.registerAggView(li, "l_suppkey", "l_quantity", tmp)
          li.groupBy(col("l_suppkey"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast("long")).as("total"))
            .orderBy(col("total").desc, col("l_suppkey"))
            .limit(5)
            .localCheckpoint(true) // rewrite fires HERE, rule still live
            .withColumnRenamed("l_suppkey", "key")
            .orderBy(col("total").desc, col("key"))
        } finally {
          s.experimental.extraOptimizations = prev
          MvCatalog.clear()
        }
      },
      Some("""SELECT l_suppkey AS key, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
             |FROM lineitem GROUP BY 1
             |ORDER BY total DESC, key LIMIT 5""".stripMargin))
  )

  /** q260 oracle: weekday factors, the integer deseasonalization, the
    * q248 recursive smoothing replay over the ADJUSTED series, and the
    * re-seasonalized forecasts — end-to-end. DuckDB dayofweek is
    * 0=Sunday (Spark's is 1), shifted at both uses.
    */
  private def seasonalForecastOracleSql: String = {
    def idiv(x: String, d: Int): String =
      s"(CASE WHEN ($x) < 0 THEN -((-($x)) // $d) ELSE ($x) // $d END)"
    val lNext = idiv("2 * d.y + 8 * (s.l + s.bb)", 10)
    s"""WITH RECURSIVE
       |daily AS MATERIALIZED (SELECT event_type,
       |    CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS v,
       |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow
       |  FROM events GROUP BY 1, 2),
       |cell AS (SELECT event_type, dow, CAST(count(*) AS BIGINT)
       |    AS n_dow, CAST(sum(v) AS BIGINT) AS s_dow
       |  FROM daily GROUP BY 1, 2),
       |tt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |    CAST(sum(v) AS BIGINT) AS s_tot
       |  FROM daily GROUP BY 1),
       |fac AS MATERIALIZED (SELECT cell.event_type, cell.dow,
       |    CAST((cell.s_dow * tt.n_days * 1000000)
       |      // (cell.n_dow * tt.s_tot) AS BIGINT) AS factor_ppm
       |  FROM cell JOIN tt USING (event_type)),
       |dd AS MATERIALIZED (SELECT daily.event_type AS k, daily.day,
       |    ((daily.v * 1000000) // fac.factor_ppm) * 1000000 AS y
       |  FROM daily JOIN fac ON fac.event_type = daily.event_type
       |    AND fac.dow = daily.dow),
       |ix AS MATERIALIZED (SELECT k, day, y, CAST(row_number() OVER (
       |    PARTITION BY k ORDER BY day) AS BIGINT) AS i FROM dd),
       |nn AS (SELECT k, CAST(count(*) AS BIGINT) AS n_days,
       |    max(day) AS last_day FROM dd GROUP BY 1),
       |s AS (
       |  SELECT a.k, CAST(2 AS BIGINT) AS t, b.y AS l, b.y - a.y AS bb
       |  FROM ix a JOIN ix b ON a.k = b.k AND a.i = 1 AND b.i = 2
       |  UNION ALL
       |  SELECT s.k, s.t + 1, $lNext,
       |    ${idiv(s"1 * ($lNext - s.l) + 9 * s.bb", 10)}
       |  FROM s JOIN ix d ON d.k = s.k AND d.i = s.t + 1
       |),
       |fin AS (SELECT s.k, s.l, s.bb FROM s
       |        JOIN nn ON nn.k = s.k AND s.t = nn.n_days),
       |hz AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS h),
       |fc AS (SELECT fin.k AS event_type, hz.h,
       |    nn.last_day + CAST(hz.h AS INT) AS forecast_day,
       |    fin.l + hz.h * fin.bb AS f_adj_micro
       |  FROM fin JOIN nn USING (k) CROSS JOIN hz)
       |SELECT fc.event_type, fc.h, fc.forecast_day, fac.factor_ppm,
       |  fc.f_adj_micro,
       |  CAST((CASE WHEN fc.f_adj_micro < 0
       |    THEN -((-(fc.f_adj_micro * fac.factor_ppm)) // 1000000)
       |    ELSE (fc.f_adj_micro * fac.factor_ppm) // 1000000 END)
       |    AS BIGINT) AS f_micro
       |FROM fc JOIN fac ON fac.event_type = fc.event_type
       |  AND fac.dow = CAST(dayofweek(fc.forecast_day) + 1 AS BIGINT)
       |ORDER BY fc.event_type, fc.h""".stripMargin
  }

  /** Shared by q256 (batch) and q258 (streaming twin): the one-pass
    * correlation-matrix replay — single aggregate of all sums, six pair
    * projections, identical double rounding.
    */
  private val corrMatrixOracleSql: String =
    """WITH d AS MATERIALIZED (SELECT p_brand,
             |    CAST(l_quantity AS BIGINT) AS q,
             |    CAST(floor(l_extendedprice) AS BIGINT) AS p,
             |    CAST(floor(l_discount * 100) AS BIGINT) AS dc,
             |    CAST(floor(l_tax * 100) AS BIGINT) AS tx
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |a AS MATERIALIZED (SELECT p_brand,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
             |    CAST(sum(dc) AS BIGINT) AS sdc,
             |    CAST(sum(tx) AS BIGINT) AS stx,
             |    CAST(sum(q*q) AS BIGINT) AS mqq,
             |    CAST(sum(q*p) AS BIGINT) AS mqp,
             |    CAST(sum(q*dc) AS BIGINT) AS mqdc,
             |    CAST(sum(q*tx) AS BIGINT) AS mqtx,
             |    CAST(sum(p*p) AS BIGINT) AS mpp,
             |    CAST(sum(p*dc) AS BIGINT) AS mpdc,
             |    CAST(sum(p*tx) AS BIGINT) AS mptx,
             |    CAST(sum(dc*dc) AS BIGINT) AS mdcdc,
             |    CAST(sum(dc*tx) AS BIGINT) AS mdctx,
             |    CAST(sum(tx*tx) AS BIGINT) AS mtxtx
             |  FROM d GROUP BY 1),
             |u AS (
             |  SELECT p_brand, 'qty' AS col_a, 'price_usd' AS col_b, n,
             |    n*mqp - sq*sp AS cov_num, n*mqq - sq*sq AS varx_num,
             |    n*mpp - sp*sp AS vary_num FROM a
             |  UNION ALL
             |  SELECT p_brand, 'qty', 'disc_pct', n,
             |    n*mqdc - sq*sdc, n*mqq - sq*sq, n*mdcdc - sdc*sdc FROM a
             |  UNION ALL
             |  SELECT p_brand, 'qty', 'tax_pct', n,
             |    n*mqtx - sq*stx, n*mqq - sq*sq, n*mtxtx - stx*stx FROM a
             |  UNION ALL
             |  SELECT p_brand, 'price_usd', 'disc_pct', n,
             |    n*mpdc - sp*sdc, n*mpp - sp*sp, n*mdcdc - sdc*sdc FROM a
             |  UNION ALL
             |  SELECT p_brand, 'price_usd', 'tax_pct', n,
             |    n*mptx - sp*stx, n*mpp - sp*sp, n*mtxtx - stx*stx FROM a
             |  UNION ALL
             |  SELECT p_brand, 'disc_pct', 'tax_pct', n,
             |    n*mdctx - sdc*stx, n*mdcdc - sdc*sdc, n*mtxtx - stx*stx
             |  FROM a)
             |SELECT p_brand, col_a, col_b, n,
             |  CAST(cov_num AS BIGINT) AS cov_num,
             |  CAST(varx_num AS BIGINT) AS varx_num,
             |  CAST(vary_num AS BIGINT) AS vary_num,
             |  CASE WHEN varx_num = 0 OR vary_num = 0 THEN NULL
             |    ELSE round(CAST(cov_num AS DOUBLE) * CAST(cov_num AS DOUBLE)
             |      / (CAST(varx_num AS DOUBLE) * CAST(vary_num AS DOUBLE)), 6)
             |  END AS r2_6
             |FROM u ORDER BY p_brand, col_a, col_b""".stripMargin

  /** q253 oracle: the q248 recursive smoothing replay over the
    * TRUNCATED series (days ≤ max(day) − 7), joined against held-out
    * actuals, MAE/bias in micro-units with the sign-split mean.
    */
  private def holtBacktestOracleSql: String = {
    def idiv(x: String, d: Int): String =
      s"(CASE WHEN ($x) < 0 THEN -((-($x)) // $d) ELSE ($x) // $d END)"
    val lNext = idiv("2 * d.y + 8 * (s.l + s.bb)", 10)
    s"""WITH RECURSIVE
       |alld AS MATERIALIZED (SELECT event_type AS k,
       |    CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS v
       |  FROM events GROUP BY 1, 2),
       |piv AS (SELECT max(day) - 7 AS pd FROM alld),
       |dd AS MATERIALIZED (SELECT k, day, v * 1000000 AS y FROM alld
       |  WHERE day <= (SELECT pd FROM piv)),
       |ix AS MATERIALIZED (SELECT k, day, y, CAST(row_number() OVER (
       |    PARTITION BY k ORDER BY day) AS BIGINT) AS i FROM dd),
       |nn AS (SELECT k, CAST(count(*) AS BIGINT) AS n_days,
       |    max(day) AS last_day FROM dd GROUP BY 1),
       |s AS (
       |  SELECT a.k, CAST(2 AS BIGINT) AS t, b.y AS l, b.y - a.y AS bb
       |  FROM ix a JOIN ix b ON a.k = b.k AND a.i = 1 AND b.i = 2
       |  UNION ALL
       |  SELECT s.k, s.t + 1, $lNext,
       |    ${idiv(s"1 * ($lNext - s.l) + 9 * s.bb", 10)}
       |  FROM s JOIN ix d ON d.k = s.k AND d.i = s.t + 1
       |),
       |fin AS (SELECT s.k, s.l, s.bb FROM s
       |        JOIN nn ON nn.k = s.k AND s.t = nn.n_days),
       |hz AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS h),
       |fc AS (SELECT fin.k, nn.last_day + CAST(hz.h AS INT) AS fday,
       |    fin.l + hz.h * fin.bb AS fm
       |  FROM fin JOIN nn USING (k) CROSS JOIN hz),
       |er AS (SELECT fc.k, fc.fm - alld.v * 1000000 AS err
       |  FROM fc JOIN alld ON alld.k = fc.k AND alld.day = fc.fday),
       |agg AS (SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_eval,
       |    CAST(sum(abs(err)) AS BIGINT) AS sabs,
       |    CAST(sum(err) AS BIGINT) AS serr
       |  FROM er GROUP BY 1)
       |SELECT event_type, n_eval, sabs // n_eval AS mae_micro,
       |  CAST((CASE WHEN serr < 0 THEN -1 WHEN serr > 0 THEN 1 ELSE 0 END)
       |    * (abs(serr) // n_eval) AS BIGINT) AS bias_micro
       |FROM agg ORDER BY event_type""".stripMargin
  }

  /** q244 oracle: every HITS half-iteration replayed — contribution sum,
    * zero-fill from the node list, exact scalar total, floored
    * renormalization — as a static CTE unroll. All scores are
    * non-negative, so DuckDB's `//` and Spark's `div` agree without a
    * sign split.
    */
  private def hitsOracleSql(iters: Int, scale: Long): String = {
    val steps = (1 to iters).map { k =>
      s"""af$k AS MATERIALIZED (SELECT n.node, COALESCE(a.a, 0) AS a
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.v AS node, CAST(sum(h.h) AS BIGINT) AS a
         |    FROM e JOIN h${k - 1} h ON e.u = h.node GROUP BY 1
         |  ) a USING (node)),
         |a$k AS MATERIALIZED (SELECT node,
         |  (a * $scale) // (SELECT CAST(sum(a) AS BIGINT) FROM af$k) AS a
         |  FROM af$k),
         |hf$k AS MATERIALIZED (SELECT n.node, COALESCE(h.h, 0) AS h
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.u AS node, CAST(sum(a.a) AS BIGINT) AS h
         |    FROM e JOIN a$k a ON e.v = a.node GROUP BY 1
         |  ) h USING (node)),
         |h$k AS MATERIALIZED (SELECT node,
         |  (h * $scale) // (SELECT CAST(sum(h) AS BIGINT) FROM hf$k) AS h
         |  FROM hf$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT CAST(o_custkey AS BIGINT) AS u,
       |    CAST(l_suppkey + 10000000 AS BIGINT) AS v
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |nodes AS MATERIALIZED (SELECT u AS node FROM e
       |  UNION SELECT v FROM e),
       |h0 AS (SELECT node, CAST(1 AS BIGINT) AS h FROM nodes),
       |$steps
       |SELECT n.node, h$iters.h AS hub, a$iters.a AS auth
       |FROM nodes n JOIN h$iters USING (node) JOIN a$iters USING (node)
       |ORDER BY auth DESC, n.node LIMIT 20""".stripMargin
  }

  /** q251 oracle: the ENTIRE Markov attribution replayed — journey
    * windows, first-conversion cut, START/CONV/NULL transitions, matrix
    * with absorbing self-loops, `iters` value-iteration rounds per
    * removal variant in ONE recursive CTE (removals iterate in
    * parallel as a cross-joined dimension), clamped removal effects and
    * the share normalization. All quantities non-negative, so `//`
    * matches Spark's `div`.
    */
  private def markovOracleSql(iters: Int): String =
    s"""WITH RECURSIVE
       |e AS MATERIALIZED (SELECT CAST(user_id AS BIGINT) AS u, ts,
       |    CAST(event_id AS BIGINT) AS eid, event_type AS st
       |  FROM events),
       |r AS MATERIALIZED (SELECT u, st, CAST(row_number() OVER (
       |    PARTITION BY u ORDER BY ts, eid) AS BIGINT) AS rn FROM e),
       |fp AS (SELECT u, min(rn) AS fprn FROM r
       |       WHERE st = 'purchase' GROUP BY 1),
       |k AS MATERIALIZED (SELECT r.u,
       |    CASE WHEN r.st = 'purchase' THEN 'CONV' ELSE r.st END AS st,
       |    r.rn
       |  FROM r LEFT JOIN fp USING (u)
       |  WHERE fp.fprn IS NULL OR r.rn <= fp.fprn),
       |tr AS (SELECT i, j FROM (
       |    SELECT st AS i, lead(st) OVER (PARTITION BY u ORDER BY rn)
       |      AS j FROM k) t WHERE j IS NOT NULL
       |  UNION ALL
       |  SELECT 'START' AS i, st AS j FROM (
       |    SELECT st, row_number() OVER (PARTITION BY u ORDER BY rn)
       |      AS rr FROM k) t WHERE rr = 1
       |  UNION ALL
       |  SELECT st AS i, 'NULL' AS j FROM (
       |    SELECT st, row_number() OVER (PARTITION BY u ORDER BY rn DESC)
       |      AS rr FROM k) t WHERE rr = 1 AND st <> 'CONV'),
       |m AS MATERIALIZED (SELECT i, j, CAST(count(*) AS BIGINT) AS n
       |  FROM tr GROUP BY 1, 2),
       |rowtot AS (SELECT i, CAST(sum(n) AS BIGINT) AS rt
       |  FROM m GROUP BY 1),
       |mm AS MATERIALIZED (
       |  SELECT m.i, m.j, m.n, rowtot.rt FROM m JOIN rowtot USING (i)
       |  UNION ALL SELECT 'CONV', 'CONV', CAST(1 AS BIGINT),
       |    CAST(1 AS BIGINT)
       |  UNION ALL SELECT 'NULL', 'NULL', CAST(1 AS BIGINT),
       |    CAST(1 AS BIGINT)),
       |states AS MATERIALIZED (SELECT DISTINCT s FROM (
       |  SELECT i AS s FROM mm UNION ALL SELECT j FROM mm) t),
       |rm AS MATERIALIZED (SELECT 'NONE' AS r
       |  UNION ALL SELECT DISTINCT i FROM m WHERE i <> 'START'),
       |pv AS (
       |  SELECT rm.r, CAST(0 AS BIGINT) AS it, states.s,
       |    CAST(CASE WHEN states.s = 'CONV' THEN 1000000 ELSE 0 END
       |      AS BIGINT) AS p
       |  FROM states CROSS JOIN rm
       |  UNION ALL
       |  SELECT pv.r, pv.it + 1, mm.i AS s,
       |    CAST(CASE WHEN mm.i = pv.r THEN 0
       |      ELSE sum(mm.n * (CASE WHEN pv.s = pv.r THEN 0
       |        ELSE pv.p END)) // max(mm.rt) END AS BIGINT) AS p
       |  FROM pv JOIN mm ON mm.j = pv.s
       |  WHERE pv.it < $iters
       |  GROUP BY pv.r, pv.it, mm.i),
       |pf AS MATERIALIZED (SELECT r, s, p FROM pv WHERE it = $iters),
       |fullp AS (SELECT p FROM pf WHERE r = 'NONE' AND s = 'START'),
       |effs AS MATERIALIZED (SELECT ch.channel,
       |    (SELECT p FROM fullp) AS p_full_ppm,
       |    pf.p AS p_removed_ppm,
       |    greatest((SELECT p FROM fullp) - pf.p, 0) AS removal_ppm
       |  FROM (SELECT DISTINCT i AS channel FROM m
       |        WHERE i <> 'START') ch
       |  JOIN pf ON pf.r = ch.channel AND pf.s = 'START'),
       |tot AS (SELECT CAST(sum(removal_ppm) AS BIGINT) AS t FROM effs)
       |SELECT channel, p_full_ppm, p_removed_ppm, removal_ppm,
       |  CAST(CASE WHEN (SELECT t FROM tot) > 0
       |    THEN (removal_ppm * 1000000) // (SELECT t FROM tot)
       |    ELSE 0 END AS BIGINT) AS share_ppm
       |FROM effs ORDER BY channel""".stripMargin

  /** q248 oracle: the Holt recurrence replayed step-for-step in a
    * recursive CTE — init l₂=y₂, b₂=y₂−y₁, then the level/trend updates
    * with the SAME explicit sign-split floored division the operator
    * writes out (the level expression appears twice inside the trend,
    * exactly as in the Spark fold).
    */
  private def holtOracleSql(horizon: Int): String = {
    def idiv(x: String, d: Int): String =
      s"(CASE WHEN ($x) < 0 THEN -((-($x)) // $d) ELSE ($x) // $d END)"
    val lNext = idiv("2 * d.y + 8 * (s.l + s.bb)", 10)
    s"""WITH RECURSIVE
       |dd AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) * 1000000 AS y
       |  FROM events GROUP BY 1, 2),
       |ix AS (SELECT k, day, y, CAST(row_number() OVER (
       |    PARTITION BY k ORDER BY day) AS BIGINT) AS i FROM dd),
       |nn AS (SELECT k, CAST(count(*) AS BIGINT) AS n_days,
       |    max(day) AS last_day FROM dd GROUP BY 1),
       |s AS (
       |  SELECT a.k, CAST(2 AS BIGINT) AS t, b.y AS l, b.y - a.y AS bb
       |  FROM ix a JOIN ix b ON a.k = b.k AND a.i = 1 AND b.i = 2
       |  UNION ALL
       |  SELECT s.k, s.t + 1, $lNext,
       |    ${idiv(s"1 * ($lNext - s.l) + 9 * s.bb", 10)}
       |  FROM s JOIN ix d ON d.k = s.k AND d.i = s.t + 1
       |),
       |fin AS (SELECT s.k, s.l, s.bb FROM s
       |        JOIN nn ON nn.k = s.k AND s.t = nn.n_days),
       |hz AS (SELECT CAST(unnest(range(1, ${horizon + 1})) AS BIGINT) AS h)
       |SELECT fin.k AS event_type, nn.n_days, nn.last_day,
       |  fin.l AS level_micro, fin.bb AS trend_micro, hz.h,
       |  nn.last_day + CAST(hz.h AS INT) AS forecast_day,
       |  fin.l + hz.h * fin.bb AS forecast_micro
       |FROM fin JOIN nn USING (k) CROSS JOIN hz
       |ORDER BY event_type, hz.h""".stripMargin
  }
}
