package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.UnscaledValue
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, DecimalType, StringType, TimestampType}

/** ZONE MAP — the file-level min/max statistics index that turns a
  * [[ZOrder]] layout into actual file skipping: a tiny metadata table
  * with ONE row per data file recording each filter column's min/max
  * (and row count), consulted before the scan so a range predicate
  * reads only the files whose `[min, max]` span intersects it. This is
  * the lakehouse scan primitive (Iceberg/Delta file stats, Parquet
  * footer row-group stats, one level up): on 100 TB laid out
  * z-contiguously, a 2-D range predicate touches a handful of grid
  * cells, so the pruned read lists and opens ~the selectivity's worth
  * of files instead of all of them — the scan cost becomes proportional
  * to the ANSWER, not the corpus.
  *
  * Scale shape, piece by piece:
  *  - BUILD is one columnar pass over ONLY the stat columns (parquet
  *    column pruning makes that a narrow scan, not a row read) grouped
  *    by `input_file_name()` — the shuffle is one row per file. On a
  *    real lakehouse the same stats come free from parquet footers at
  *    write time; materializing them as a table is the engine-portable
  *    form, amortized across every subsequent pruned read. The map is
  *    data, so it rebuilds with the layout (stats describe immutable
  *    files; rewriting files invalidates their rows — pair the build
  *    with [[ZOrder.layout]]'s write, as [[writeZOrdered]] does).
  *  - PRUNE filters the zone map (tiny: |files| rows) and collects the
  *    surviving file NAMES — the same driver-side file list every
  *    parquet scan's planning already materializes, now shorter.
  *  - READ opens exactly the survivors and re-applies the predicates as
  *    residuals (file-level stats admit false positives — a file whose
  *    span intersects the range can still hold no matching row — but
  *    never false negatives, which is the correctness law
  *    `ZoneMapSpec` pins and q311's oracle hash-proves).
  *
  * NULL soundness: parquet-style min/max ignore nulls, so an all-null
  * file carries null stats and the intersection test (null-safe SQL
  * comparison → not true → dropped) skips it — CORRECT for range
  * predicates, because `v BETWEEN lo AND hi` is never true for null
  * `v` either. Stat columns are anything with an exact integer image:
  * ints/longs as-is, DATE as epoch DAYS (`unix_date` — the same int
  * Catalyst stores date literals as), TIMESTAMP as epoch MICROS
  * (`unix_micros` — ditto); route doubles through micro-units, the
  * house integer-exact convention. STRING columns carry raw min/max
  * under the default binary collation (UTF-8 byte order — parquet's
  * own string-stat order) as PRUNE-ONLY stats: equality and range
  * filters on them file-skip through [[pruneFilesTyped]] and the
  * planner rule, but they cannot be z-order cluster dimensions or
  * drift inputs (both need the integer image, and refuse loudly).
  *
  * PLAN-TIME METADATA ([[ZoneMapMeta]]): every mutation also commits a
  * one-file `_ZMMETA` manifest inside the zone directory — generation
  * counter, the zone parquet's own file signature, and the per-file
  * stats — so freshness checks, pruning decisions, and the drift
  * statistic are ONE cached driver-side metadata read instead of
  * repeated zone-TABLE parquet scans per planned query (the
  * BaseFiles/Snapshot listing-manifest pattern applied to the planner
  * hot path; at 1M described files those scans were real planning
  * latency). The signature ties the manifest to the exact parquet
  * footprint it describes, so a crash between the two writes can only
  * produce a DETECTED-stale manifest (ignored, scan fallback), never a
  * silently wrong prune.
  *
  * Ref: the reference filters its article corpus by numeric thresholds
  * before the expensive per-article work (airflow/dags/
  * zara_hybrid_etl.py:151-210, collect+filter); re-expressed as the
  * layout + stats + pruned-scan contract that survives 100 TB.
  */
object ZoneMap {

  /** The column's exact integer image, the unit every stat, literal,
    * and residual agree on: DATE → epoch days (the very int Catalyst
    * stores date literals as), TIMESTAMP → epoch micros (ditto),
    * DECIMAL(p ≤ 18, s) → the UNSCALED long (the very compact value
    * Catalyst stores — `123.45` at scale 2 is `12345`; min/max/sum of
    * unscaled values ARE the unscaled min/max/sum at one fixed scale,
    * so the manifest's decimal slots are exact, unlike the truncating
    * `cast(long)` a naive image would take), integrals → cast(long).
    * Wider decimals refuse LOUDLY: their unscaled value exceeds a
    * long, and a silently truncated image would serve wrong stats —
    * route p > 18 money through narrower types or integer micro-units
    * (house style). Shared with [[ZOrder.assign]] so a layout
    * clustered on a date column and its zone map speak the same unit.
    */
  private[graft] def statExpr(dt: DataType, c: Column): Column = dt match {
    case DateType => unix_date(c).cast("long")
    case TimestampType => unix_micros(c)
    case d: DecimalType =>
      require(d.precision <= 18,
        s"decimal stat columns carry their exact UNSCALED long image, " +
          s"which $d exceeds (precision > 18) — a truncated image would " +
          "serve wrong min/max/sum from metadata; use precision <= 18 " +
          "or integer micro-units for wider money")
      GraftShim.column(UnscaledValue(GraftShim.expression(c)))
    case _ => c.cast("long")
  }

  /** One row per data file under `dataPath`: `file`, `n`, and
    * `<c>_min`/`<c>_max`/`<c>_cnt` per stat column — min/max LONG in
    * the [[statExpr]] unit for integer-image columns, the RAW string
    * for StringType ones (min/max under Spark's default binary
    * collation = UTF-8 byte order, the same order parquet's own string
    * stats use; string stat columns are PRUNE-ONLY — they cannot be
    * z-order cluster dimensions, whose bit-interleave needs the
    * integer image, and the drift statistic refuses them loudly), and
    * `<c>_cnt` the NON-NULL count (parquet-footer-style null
    * accounting — what lets the planner answer a fully-covered file's
    * `count(*)` from metadata: all non-null values pass the range,
    * null ones fail it, so the matching rows are exactly `<c>_cnt`).
    * Columnar: reads only `statCols`. The output is metadata-sized
    * (|files| rows) and is written as a single file so the prune's
    * read never fans out.
    */
  /** Which stat columns also carry a PER-FILE EXACT SUM (`<c>_sum`) —
    * the zmmeta v5/v6 slot the metadata-SUM/AVG planner arm serves
    * from. INTEGRAL types, and (v6) DECIMAL(p ≤ 18, s): a decimal's
    * sum at fixed scale is the sum of its unscaled longs — exact, no
    * order-dependence (unlike floats there is no excuse to refuse:
    * `sum(l_extendedprice)`, the revenue aggregate of every warehouse
    * dashboard, is exactly this shape). DATE/TIMESTAMP sums are
    * meaningless SQL (Spark refuses them), strings have none, and
    * FLOAT/DOUBLE are deliberately refused everywhere in the sum path:
    * their sum is addition-order-dependent, so a manifest sum could
    * disagree with a scan's partial-aggregation order — an engine
    * answering from metadata must never serve a value a recompute
    * could legitimately contradict.
    */
  private[graft] def summable(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  private def statsFrame(data: DataFrame, statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "zone map needs at least one stat column")
    val aggs = statCols.flatMap { c =>
      val e =
        if (data.schema(c).dataType == StringType) col(c)
        else statExpr(data.schema(c).dataType, col(c))
      Seq(min(e).as(s"${c}_min"), max(e).as(s"${c}_max"),
        count(col(c)).as(s"${c}_cnt")) ++
        // try_sum over the STAT IMAGE (the long itself for integrals,
        // the unscaled long for v6 decimals — sums of unscaled values
        // at one fixed scale are exact): a file whose long sum
        // genuinely overflows records UNKNOWN (null → "-" in the
        // manifest, consumer boundary-scans) instead of failing the
        // build under ANSI or wrapping under legacy — a served sum is
        // therefore always the exact integer
        (if (summable(data.schema(c).dataType))
          Seq(try_sum(statExpr(data.schema(c).dataType, col(c)))
            .as(s"${c}_sum"))
        else Seq.empty)
    } :+ count(lit(1)).as("n")
    data.select(input_file_name().as("file") +: statCols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Per-file bloom words for `bloomCols` — one aggregation for every
    * column: `(file, column, position)` distinct (each row explodes to
    * its |cols|·k [[Bloom.pos]] positions; null values yield null
    * positions, dropped after the explode), then packed to WORDS
    * executor-side — `bit_or` of the per-position single-bit longs,
    * grouped by `(file, column, position >> 6)` — so what reaches the
    * driver is the NON-ZERO words only: ≤ |files| · |cols| · m/64
    * longs, the manifest's own magnitude (collecting raw positions
    * would be 64× that in rows, each with per-Row overhead — at
    * q350-scale m (2^20) × hundreds of files, a driver OOM). A file
    * present for one column but all-null in another gets all-zero
    * words for the latter (zero values set zero bits — correctly
    * dropping every equality).
    */
  private def bloomsOf(data: DataFrame, bloomCols: Seq[String],
                       m: Int, k: Int)
      : Map[String, Map[String, Array[Long]]] = {
    require(m > 0 && m % 64 == 0,
      s"bloom m must be a positive multiple of 64, got $m")
    require(k >= 1, s"bloom k must be positive, got $k")
    // TIMESTAMP bloom columns hash cast(ts as string) = SESSION-ZONE
    // text, and the planner's driver-side probe ([[graft.plans
    // .ZoneMapRender.timestampUtc]]) renders UTC — a non-UTC build
    // would set positions the probe can never reproduce, and the
    // mismatch would wrongly DROP files. Refuse at build (both the
    // build and the append route through here), so build and probe
    // agree by construction; DATE columns render timezone-free.
    bloomCols.filter(c =>
        data.schema(c).dataType == TimestampType).foreach(c =>
      require(data.sparkSession.sessionState.conf
          .sessionLocalTimeZone == "UTC",
        s"bloom column $c is TIMESTAMP: its hash is session-zone text " +
          "but the planner probes in UTC — build under " +
          "spark.sql.session.timeZone=UTC or drop it from bloomCols"))
    // ONE pass for every bloom column — never a scan per column; the
    // distinct and the bit_or both partial-aggregate map-side. The
    // variable-distance shiftleft goes through the SQL function (the
    // Scala helper only takes a literal Int distance).
    val pairs = bloomCols.flatMap(c => (0 until k).map(i =>
      struct(lit(c).as("c"), Bloom.pos(i, col(c), m).as("pos"))))
    val rows = data
      .select(input_file_name().as("file"),
        explode(array(pairs: _*)).as("p"))
      .select(col("file"), col("p.c").as("c"), col("p.pos").as("pos"))
      .where(col("pos").isNotNull)
      .distinct()
      .groupBy(col("file"), col("c"), shiftright(col("pos"), 6).as("w"))
      .agg(call_function("bit_or",
        call_function("shiftleft", lit(1L),
          pmod(col("pos"), lit(64)).cast("int"))).as("word"))
      .collect()
    val grouped = rows.groupBy(r => (r.getString(0), r.getString(1)))
      .map { case ((f, c), rs) =>
        val words = new Array[Long](m / 64)
        rs.foreach(r => words(r.getLong(2).toInt) |= r.getLong(3))
        (f, c) -> words
      }
    grouped.keys.map(_._1).toSeq.distinct.map { f =>
      f -> bloomCols.map(c =>
        c -> grouped.getOrElse((f, c), new Array[Long](m / 64))).toMap
    }.toMap
  }

  def buildZoneMap(spark: SparkSession, dataPath: String,
                   statCols: Seq[String], zonePath: String,
                   bloomCols: Seq[String] = Seq.empty,
                   bloomM: Int = 4096, bloomK: Int = 3): Unit = {
    // gen captured first: the overwrite deletes the superseded manifest
    val prevGen = ZoneMapMeta.currentGen(spark, zonePath)
    val data = spark.read.parquet(dataPath)
    statsFrame(data, statCols)
      .coalesce(1)
      .write.mode("overwrite").parquet(zonePath)
    val blooms =
      if (bloomCols.isEmpty) None
      else Some(ZoneMapMeta.BloomStats(bloomCols, bloomM, bloomK,
        bloomsOf(data, bloomCols, bloomM, bloomK)))
    ZoneMapMeta.write(spark, zonePath, statCols, prevGen, blooms)
  }

  /** INCREMENTAL maintenance: append `df` as new data files and extend
    * the zone map with ONLY their stats — existing files are immutable,
    * so their rows are already correct and are carried verbatim. The
    * new files are identified by a before/after directory listing
    * (metadata-only), read back explicitly, and their stats union into
    * the map — cost ∝ the increment, never the corpus (the same
    * increment discipline as every store here). A BLOOM map's per-file
    * words follow the same rule: prior files' words carry verbatim
    * from the manifest, only the fresh files aggregate, and the spec
    * (columns, m, k) is fixed at build time — an append that would
    * change it, or that asks for blooms the map/manifest cannot
    * support, refuses loudly BEFORE any data lands. Single maintenance
    * writer, as everywhere.
    */
  def appendWithStats(df: DataFrame, dataPath: String,
                      statCols: Seq[String], zonePath: String,
                      bloomCols: Seq[String] = Seq.empty,
                      bloomM: Int = 4096, bloomK: Int = 3): Unit = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dataPath)
    val fs = p.getFileSystem(conf)
    // SINGLE-WRITER GUARD (the [[GenStore.commitGen]] staging-guard
    // idea for a listing-diff append): two interleaved appenders would
    // each attribute the OTHER's files to themselves and the zone map
    // would gain duplicate rows — so the append takes an EXCLUSIVE
    // claim file first (create-no-overwrite is atomic on HDFS and the
    // local FS) and a concurrent violation fails LOUDLY here instead
    // of mis-attributing. A crash leaves the claim behind; the next
    // append's failure message says exactly what to check before
    // removing it — stale-lock hygiene, the caller's maintenance
    // window discipline as everywhere.
    if (!fs.exists(p)) fs.mkdirs(p)
    val claim = new org.apache.hadoop.fs.Path(s"$dataPath/_zm_append.lock")
    val out =
      try fs.create(claim, false)
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"zone-map append claim already held at $claim — a concurrent " +
            "append is running (one maintenance writer at a time), or a " +
            "crashed one left its claim: verify no appender is live, " +
            "then remove the file", e)
      }
    out.close()
    try {
      def files(): Set[String] =
        fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
          .filter(_.endsWith(".parquet")).toSet
      val zp = new org.apache.hadoop.fs.Path(zonePath)
      val zmExists = zp.getFileSystem(conf).exists(zp)
      // BLOOM CONTINUITY — resolved BEFORE any data lands (a spec
      // mismatch must refuse with nothing written) and before the zone
      // overwrite moves the directory signature: an existing bloom
      // map's spec comes from its (still-valid) manifest, whose
      // per-file words carry forward verbatim; only the FRESH files
      // aggregate. The spec cannot be changed or introduced by an
      // append (old files' blooms are only recomputable from a full
      // data scan — that is a rebuild), and a crash-degraded manifest
      // on a bloom map refuses loudly rather than silently dropping
      // the filters.
      val prior = ZoneMapMeta.load(spark, zonePath)
      val bloomSpec: Option[(Seq[String], Int, Int)] =
        if (!zmExists) {
          if (bloomCols.isEmpty) None else Some((bloomCols, bloomM, bloomK))
        } else prior match {
          case Some(pm) if pm.bloomCols.nonEmpty =>
            require(bloomCols.isEmpty || (bloomCols == pm.bloomCols &&
              bloomM == pm.bloomM && bloomK == pm.bloomK),
              s"zone map at $zonePath carries blooms " +
                s"(${pm.bloomCols.mkString(",")}, m=${pm.bloomM}, " +
                s"k=${pm.bloomK}) — an append cannot change the spec; " +
                "rebuild the map to re-spec")
            Some((pm.bloomCols, pm.bloomM, pm.bloomK))
          case Some(_) =>
            require(bloomCols.isEmpty,
              s"zone map at $zonePath has no blooms — an append cannot " +
                "add them (old files' words need a full data scan); " +
                "rebuild with bloomCols to introduce them")
            None
          case None =>
            // the manifest does not VALIDATE, but if it still PARSES
            // and names blooms, the map provably had them — appending
            // would commit a fresh valid manifest WITHOUT them, a
            // permanent silent loss. (An unparseable-or-deleted
            // manifest on a bloom map is the residual undetectable
            // window — then this degrades to a bloom-less append.)
            require(ZoneMapMeta.rawBloomCols(spark, zonePath).isEmpty,
              s"zone map at $zonePath carried blooms but its _ZMMETA " +
                "no longer validates (crash between the zone write and " +
                "the manifest commit) — rebuild the map; appending would " +
                "silently drop the filters")
            require(bloomCols.isEmpty,
              s"zone map at $zonePath has no valid _ZMMETA manifest but " +
                "bloom columns were requested — a crash between the zone " +
                "write and the manifest commit loses the per-file words; " +
                "rebuild the map to restore blooms")
            None
        }
      val before = files()
      df.write.mode("append").parquet(dataPath)
      val fresh = (files() -- before).toSeq.sorted.map(n => s"$dataPath/$n")
      if (fresh.isEmpty) return // empty increment: nothing to describe
      val newStats = statsFrame(spark.read.parquet(fresh: _*), statCols)
      if (zmExists) {
        // defense in depth behind the claim: a file the map already
        // describes can only mean an interleaved appender slipped the
        // lock (manual removal) — duplicate stats rows would make the
        // pruned read open it twice, duplicating result rows
        val freshNames = fresh.map(_.split('/').last)
        val clash = spark.read.parquet(zonePath)
          .where(element_at(split(col("file"), "/"), -1)
            .isin(freshNames: _*)).count()
        require(clash == 0L,
          s"zone map at $zonePath already describes $clash of the " +
            "appended files — appends interleaved despite the claim " +
            "(one maintenance writer at a time)")
      }
      val mergedBlooms = bloomSpec.map { case (cols, m, k) =>
        // prior files carry verbatim — a file with a missing (`-`)
        // column slot keeps the gap (never drops), NOT zero words
        // (which would wrongly drop it)
        val priorPerFile = prior.map(_.files
            .map(f => f.file -> f.blooms).toMap)
          .getOrElse(Map.empty)
        ZoneMapMeta.BloomStats(cols, m, k,
          priorPerFile ++
            bloomsOf(spark.read.parquet(fresh: _*), cols, m, k))
      }
      val merged =
        // allowMissingColumns: a pre-`<c>_cnt` zone table (built before
        // non-null counts existed) appends cleanly — its old files get
        // null counts (UNKNOWN, so the metadata-count planner arm
        // boundary-scans them, never guesses), the fresh files get real
        // ones
        (if (zmExists) spark.read.parquet(zonePath)
          .unionByName(newStats, allowMissingColumns = true)
        else newStats)
          .localCheckpoint(true) // materialize BEFORE overwriting the source
      val prevGen = ZoneMapMeta.currentGen(spark, zonePath)
      try merged.coalesce(1).write.mode("overwrite").parquet(zonePath)
      finally GenStore.freeLocal(merged)
      ZoneMapMeta.write(spark, zonePath, statCols, prevGen, mergedBlooms)
    } finally fs.delete(claim, false)
  }

  /** The skipping decision, made once on the metadata: data files whose
    * `[min, max]` intersects EVERY predicate's `[lo, hi]`, plus the
    * total file count. Served from the cached [[ZoneMapMeta]] manifest
    * when one validates (zero Spark jobs — plan-time cost is one
    * metadata read, amortized across re-plans), falling back to the
    * zone-table scan for pre-manifest maps. The survivor list is the
    * bounded driver artifact any parquet scan's planner holds anyway.
    */
  def pruneFiles(spark: SparkSession, zonePath: String,
                 preds: Seq[(String, Long, Long)]): (Seq[String], Long) =
    pruneFilesTyped(spark, zonePath, preds, Seq.empty)

  /** Typed form: long-image predicates plus STRING ranges (each side
    * optional — strings have no greatest element to stand in for
    * "unbounded") over string stat columns. Both paths compare strings
    * in the SAME order — the manifest by explicit UTF-8 byte
    * comparison ([[ZoneMapMeta.cmpUtf8]]), the zone-table fallback by
    * Spark's own string comparison (default binary collation = UTF-8
    * byte order, the order the stats were aggregated under) — so the
    * decision is identical wherever it is made.
    */
  def pruneFilesTyped(spark: SparkSession, zonePath: String,
                      preds: Seq[(String, Long, Long)],
                      strPreds: Seq[(String, Option[String], Option[String])],
                      bloomPreds: Seq[(String, Seq[String])] = Seq.empty)
      : (Seq[String], Long) = {
    require(preds.nonEmpty || strPreds.nonEmpty || bloomPreds.nonEmpty,
      "pruned read needs at least one predicate")
    require(strPreds.forall(p => p._2.isDefined || p._3.isDefined),
      "a string predicate needs at least one bound")
    ZoneMapMeta.load(spark, zonePath) match {
      case Some(meta) => ZoneMapMeta.pruneTyped(meta, preds, strPreds,
        bloomPreds)
      case None =>
        // blooms live ONLY in the manifest: without a valid one they
        // cannot drop anything — WIDENING-only degradation (a bloom is
        // pure selectivity, min/max stays authoritative in the table),
        // so a crash-degraded map scans more, never wrong. With no
        // other bounds, every file survives.
        val zm = spark.read.parquet(zonePath)
        val total = zm.count()
        val boundPreds = preds.map { case (c, lo, hi) =>
          col(s"${c}_min") <= lit(hi) && col(s"${c}_max") >= lit(lo)
        } ++ strPreds.map { case (c, lo, hi) =>
          (hi.map(h => col(s"${c}_min") <= lit(h)) ++
            lo.map(l => col(s"${c}_max") >= lit(l)))
            .reduce(_ && _)
        }
        val pruned = if (boundPreds.isEmpty) zm
          else zm.where(boundPreds.reduce(_ && _))
        val survivors = pruned.select(col("file"))
          .collect().map(_.getString(0)).toSeq.sorted
        (survivors, total)
    }
  }

  /** Scan `dataPath` THROUGH the zone map: open only the files whose
    * stats intersect every `(col, lo, hi)` predicate, then re-apply the
    * predicates as residual filters (stats admit false positives, never
    * false negatives). Zero survivors short-circuits to an empty frame
    * with the data schema (`limit(0)` folds to an empty relation — no
    * data read). Equality with the full-scan filter is the q311 oracle.
    */
  def prunedRead(spark: SparkSession, dataPath: String, zonePath: String,
                 preds: Seq[(String, Long, Long)]): DataFrame = {
    val (files, _) = pruneFiles(spark, zonePath, preds)
    val base =
      if (files.isEmpty) spark.read.parquet(dataPath)
      else spark.read.parquet(files: _*)
    // residual in the same [[statExpr]] unit the stats were built in
    // (epoch days for dates, micros for timestamps, cast(long) else)
    val residual = preds.map { case (c, lo, hi) =>
      statExpr(base.schema(c).dataType, col(c)).between(lit(lo), lit(hi))
    }.reduce(_ && _)
    if (files.isEmpty) base.where(residual).limit(0)
    else base.where(residual)
  }

  /** The paired write: z-order `df` on the two stat columns, land the
    * z-contiguous files, and build their zone map in one call — the
    * `OPTIMIZE ZORDER BY` + stats-refresh unit. Narrow per-file spans
    * on BOTH columns (the [[ZOrder.layoutStats]] contract) are exactly
    * what makes the map selective.
    */
  def writeZOrdered(df: DataFrame, dataPath: String, zonePath: String,
                    colA: String, colB: String, bits: Int = 8,
                    partitions: Int = 32): Unit = {
    ZOrder.layout(df, colA, colB, bits, partitions)
      .drop("__z")
      .write.mode("overwrite").parquet(dataPath)
    buildZoneMap(df.sparkSession, dataPath, Seq(colA, colB), zonePath)
  }

  /** LAYOUT DRIFT, measured from the zone map alone (|files| rows of
    * metadata, zero data read): the mean over files of the product of
    * per-dimension NORMALIZED spans — `Π_c (span_c / global_c)` in
    * exact ppm. A z-clustered file covers a narrow cell of the value
    * grid (tiny product); an appended unclustered file spans ~the whole
    * range on both dimensions (product → 1), so the mean rises toward
    * the unclustered files' share of the layout. This is the skipping
    * analog of the IVF-PQ residual-drift statistic (q285): the number
    * that says when append cost has eaten the layout's selectivity.
    * Degenerate global ranges (a constant column) count as fully
    * spanned; all-null stat files count as fully spanned. EVERY step
    * runs in BigInt on the driver over the (metadata-sized, same
    * magnitude as the survivor list) per-file stats — a per-file span
    * product of two wide-range columns (dates in days × amounts in
    * micro-units easily pass 1e12 each) overflows Long, and a wrapped
    * product would silently defeat or falsely trip the recluster
    * policy. Returns `(driftPpm, nFiles)`.
    */
  def layoutDrift(spark: SparkSession, zonePath: String,
                  colA: String, colB: String): (Long, Long) = {
    val stats: Seq[(Option[(Long, Long)], Option[(Long, Long)])] =
      ZoneMapMeta.load(spark, zonePath) match {
        case Some(meta) =>
          // parity with the zone-table path, which fails to resolve
          // `<c>_min` for an undescribed column — never a silent
          // treat-as-fully-spanned
          Seq(colA, colB).foreach(c => require(meta.statCols.contains(c),
            s"zone map at $zonePath describes ${meta.statCols.mkString(",")}" +
              s", not $c"))
          // string stats are prune-only: they have no span arithmetic,
          // so a silent treat-as-fully-spanned would mask a mis-config
          Seq(colA, colB).foreach(c => require(!meta.strCols.contains(c),
            s"drift needs integer-image stats, but $c is a string stat " +
              "column (prune-only)"))
          meta.files.map(f =>
            (f.stats.getOrElse(colA, None), f.stats.getOrElse(colB, None)))
        case None =>
          spark.read.parquet(zonePath)
            .select(col(s"${colA}_min"), col(s"${colA}_max"),
              col(s"${colB}_min"), col(s"${colB}_max"))
            .collect().toSeq.map { r =>
              def p(i: Int) =
                if (r.isNullAt(i) || r.isNullAt(i + 1)) None
                else Some((r.getLong(i), r.getLong(i + 1)))
              (p(0), p(2))
            }
      }
    val n = stats.size
    require(n > 0, s"zone map at $zonePath is empty")
    def global(side: Seq[(Long, Long)]): BigInt =
      if (side.isEmpty) BigInt(1) // all-null column: degenerate range
      else BigInt(side.map(_._2).max) - BigInt(side.map(_._1).min) + 1
    val (ga, gb) = (global(stats.flatMap(_._1)), global(stats.flatMap(_._2)))
    val total = stats.map { case (a, b) =>
      val sa = a.map(t => BigInt(t._2) - BigInt(t._1) + 1).getOrElse(ga)
      val sb = b.map(t => BigInt(t._2) - BigInt(t._1) + 1).getOrElse(gb)
      sa * sb
    }.sum
    ((total * 1000000 / (ga * gb * n)).toLong, n.toLong)
  }

  /** RECLUSTER POLICY — the layout twin of the IVF-PQ
    * `rebuildIfDrifted` cadence verb (q290): appends keep pruned reads
    * CORRECT but erode SKIPPING (appended files are not z-clustered);
    * when [[layoutDrift]] crosses `maxDriftPpm`, the whole layout
    * re-z-orders and the map rebuilds — one decision point a scheduler
    * can call after every append window, paying the full rewrite only
    * when the metadata says the selectivity is gone. The rewrite runs
    * under the same single-maintenance-writer contract as every
    * mutation here (readers mid-scan of the old files race a full
    * overwrite — schedule it like any `OPTIMIZE`). Returns the drift
    * that was measured and whether a recluster ran.
    */
  def reclusterIfDegraded(spark: SparkSession, dataPath: String,
                          zonePath: String, colA: String, colB: String,
                          maxDriftPpm: Long = 250000L, bits: Int = 8,
                          partitions: Int = 32): (Long, Boolean) = {
    val (drift, _) = layoutDrift(spark, zonePath, colA, colB)
    if (drift <= maxDriftPpm) return (drift, false)
    // the rebuild must preserve the map's FULL spec — stat columns
    // beyond the cluster pair, and the bloom spec — or an automated
    // sweep would silently narrow what the planner can prune on (and a
    // later query bounding a dropped column would fail at plan time
    // inside pruneTyped's described-columns guard). Stat columns come
    // from the manifest, falling back to the zone table's own schema
    // (authoritative; `<c>_min` fields in build order). The bloom spec
    // exists only in the manifest — and a STALE-but-parseable one
    // (crash between the zone write and the manifest commit) still
    // names the spec, which is safe to carry because the full rebuild
    // recomputes every per-file word from the data anyway; dropping it
    // here would be the silent permanent bloom loss the append path
    // refuses loudly. Only an unparseable-or-deleted manifest (the
    // append path's residual undetectable window) loses the spec, and
    // the rebuild restores a valid (bloom-less) manifest either way.
    val meta = ZoneMapMeta.load(spark, zonePath)
    val statCols = meta.map(_.statCols).getOrElse(
      spark.read.parquet(zonePath).schema.fieldNames.toSeq
        .filter(_.endsWith("_min")).map(_.stripSuffix("_min")))
    require(Seq(colA, colB).forall(statCols.contains),
      s"zone map at $zonePath describes ${statCols.mkString(",")} — " +
        s"cluster pair ($colA, $colB) must be among them")
    val (bCols, bM, bK) = meta.filter(_.bloomCols.nonEmpty)
      .map(m => (m.bloomCols, m.bloomM, m.bloomK))
      .orElse(ZoneMapMeta.rawBloomSpec(spark, zonePath))
      .getOrElse((Seq.empty[String], 4096, 3))
    // materialize BEFORE overwriting the source being read
    val cur = spark.read.parquet(dataPath).localCheckpoint(true)
    try {
      ZOrder.layout(cur, colA, colB, bits, partitions)
        .drop("__z")
        .write.mode("overwrite").parquet(dataPath)
      buildZoneMap(spark, dataPath, statCols, zonePath, bCols, bM, bK)
    } finally GenStore.freeLocal(cur)
    (drift, true)
  }
}
