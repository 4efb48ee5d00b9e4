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
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
