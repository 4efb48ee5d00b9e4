package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

/** PLAN-TIME METADATA MANIFEST for a [[ZoneMap]] — the
  * BaseFiles/Snapshot listing-manifest pattern applied to the planner
  * hot path. Before this, every `Filter` the [[graft.plans.ZoneMapPrune]]
  * rule matched cost THREE zone-table parquet scans at plan time (the
  * freshness `collect`, the `count()`, the survivors `collect`); at 1M
  * described files that is real per-query planning latency. Now every
  * zone-map mutation also commits `_ZMMETA`, a one-file text manifest
  * inside the zone directory holding the generation counter, the zone
  * parquet's own FILE SIGNATURE, and the per-file stats — so freshness,
  * pruning, and the drift statistic are ONE driver-side metadata read,
  * cached by signature and amortized to ZERO Spark jobs on re-plan.
  *
  * CRASH SAFETY — why the signature, not just the gen counter: the
  * manifest is written strictly AFTER the zone parquet it describes
  * (both in [[ZoneMap.buildZoneMap]] and [[ZoneMap.appendWithStats]]).
  * A crash between the two writes leaves a manifest whose recorded
  * signature no longer matches the zone directory's actual parquet
  * footprint; [[load]] detects the mismatch and returns None, and every
  * consumer falls back to scanning the zone TABLE itself (correct,
  * just not amortized). A torn manifest write is impossible —
  * [[Snapshot.writeLines]] commits by atomic rename — and a torn PARSE
  * (schema drift, manual edit) also degrades to None. The manifest can
  * therefore only ever be detected-stale, never silently wrong: the
  * stats served from it are bit-identical to the zone table's because
  * they were collected from that exact table under the signature that
  * still matches.
  *
  * FORMATS: `zmmeta v1` carries long-image stats only (`lo:hi` decimal
  * slots) — every manifest written before string stats existed, still
  * parsed verbatim. A map with any STRING stat column commits
  * `zmmeta v2`, which adds a `strs=` header line naming the string
  * subset and hex-encodes those columns' min/max (UTF-8 bytes → hex:
  * tab/colon/newline-proof for arbitrary values, lossless both ways).
  * A map built with BLOOM columns commits `zmmeta v3`, which adds
  * `bloomcols=`/`bloomm=`/`bloomk=` header lines and per-file
  * hex-packed filter words ([[BloomStats]]) — the equality/IN skipping
  * leg that min/max structurally cannot express (a value absent from a
  * file whose span covers it). `zmmeta v4` made slots `min:max:cnt`
  * (`-:cnt` for all-null columns), where `cnt` is the column's
  * NON-NULL row count — what lets the planner answer a fully-covered
  * file's `count(*)` from metadata. Every NEW manifest commits
  * `zmmeta v5`, which appends the column's EXACT integer sum:
  * `min:max:cnt:sum` (`-:cnt:sum` for all-null columns) — what lets
  * the planner answer a fully-covered file's `sum`/`avg` from
  * metadata; the sum token is `-` (UNKNOWN) for non-summable columns
  * (strings, date/timestamp, anything float — see
  * [[ZoneMap.summable]]), for files carried from pre-sum zone tables,
  * and for a file whose sum genuinely overflows a long (`try_sum` at
  * build). `-` counts/sums make the consumer boundary-scan, never
  * guess; v1–v4 stay fully readable, their missing tokens unknown.
  * `zmmeta v6` is a SEMANTIC bump with the identical line format:
  * DECIMAL(p ≤ 18) stat columns now carry their EXACT unscaled-long
  * image ([[ZoneMap.statExpr]]) in the min/max/sum slots — a manifest
  * written by a pre-v6 build took the TRUNCATING `cast(long)` image
  * for decimals, so decimal-serving consumers (the metadata-aggregate
  * planner arms) gate on [[Meta.ver]] ≥ 6 and treat a carried v1–v5
  * manifest's decimal slots as unanswerable (boundary-scan, never a
  * wrong answer from a lossy image); non-decimal columns are
  * bit-identical across v5/v6 and keep serving.
  * Blooms live ONLY in the manifest: the
  * zone TABLE stays the min/max authority, so a detected-stale
  * manifest degrades bloom skipping to nothing (wider file set, never
  * wrong) while min/max pruning falls back to the table as always.
  * String comparisons everywhere use UTF-8 BYTE order ([[cmpUtf8]]) —
  * the same order Spark's default binary collation gives its min/max
  * aggregates and its string comparisons, so the manifest's decision
  * is bit-identical to the zone-table SQL path's; `java.lang.String
  * .compareTo` (UTF-16 code units) would disagree on supplementary
  * characters and is deliberately NOT used.
  *
  * CACHE: a process-wide map keyed by normalized zone path, validated
  * on every [[load]] against the CURRENT directory signature (one FS
  * listing — pure namenode metadata, no Spark job, no file open). A
  * rebuilt or appended zone map changes the parquet footprint, the
  * signature moves, the stale cache entry misses, and the new manifest
  * is read once. Single maintenance writer per store, as everywhere.
  *
  * At 100 TB: the manifest is |files| lines of text — the same
  * magnitude as the driver-side file list any parquet scan's planning
  * already holds; reading it once per (zonePath, generation) replaces
  * per-query metadata-table jobs with a hashmap lookup.
  */
private[graft] object ZoneMapMeta {

  /** One described data file: name, row count, and per stat column the
    * `[min, max]` image — `stats` in the [[ZoneMap.statExpr]] long unit
    * for integer-image columns, `sstats` as raw strings for StringType
    * ones. None for a file whose column is all-null (parquet-style
    * stats ignore nulls), which every consumer treats exactly as the
    * zone TABLE's null stats: dropped by range intersection,
    * fully-spanned by drift.
    */
  case class FileStat(file: String, n: Long,
                      stats: Map[String, Option[(Long, Long)]],
                      sstats: Map[String, Option[(String, String)]] =
                        Map.empty,
                      blooms: Map[String, Array[Long]] = Map.empty,
                      cnts: Map[String, Option[Long]] = Map.empty,
                      sums: Map[String, Option[Long]] = Map.empty)

  /** `ver` is the manifest's format/semantics version (the magic
    * line's digit): consumers that reconstruct DECIMAL values from the
    * long slots must see ≥ 6 — earlier builds wrote a truncated
    * decimal image (see the class doc). */
  case class Meta(gen: Long, sig: String, statCols: Seq[String],
                  files: Seq[FileStat], strCols: Set[String] = Set.empty,
                  bloomCols: Seq[String] = Seq.empty, bloomM: Int = 0,
                  bloomK: Int = 0, ver: Int = 6)

  /** Per-file bloom filters for equality/IN skipping ([[ZoneMap
    * .buildZoneMap]]'s `bloomCols`): the [[Bloom]] md5 family packed to
    * `m/64` words per (file, column) — an all-null file carries
    * all-zero words (correctly dropping every equality), and a file
    * with NO entry (pre-bloom manifests, `-` slots) never drops.
    * Manifest cost: m/4 hex chars per file per column — size m to the
    * layout's file count (the |files| listing-magnitude note in the
    * class doc; blooms are opt-in per column for exactly this trade).
    */
  case class BloomStats(cols: Seq[String], m: Int, k: Int,
                        perFile: Map[String, Map[String, Array[Long]]])

  /** UTF-8 byte order — Spark's default binary collation, the order the
    * zone table's min/max were aggregated under. */
  private[graft] def cmpUtf8(a: String, b: String): Int = {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def hex(s: String): String =
    s.getBytes("UTF-8").map("%02x".format(_)).mkString

  private def unhex(h: String): String = {
    require(h.length % 2 == 0, s"torn hex: $h")
    new String(h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
      "UTF-8")
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Meta]()

  private def key(zonePath: String): String =
    zonePath.replaceFirst("^file:/+", "/").stripSuffix("/")

  private def manifestFile(zonePath: String): String = s"$zonePath/_ZMMETA"

  /** The zone directory's parquet footprint, hashed: sorted
    * `name:length` pairs of the data files only (`_ZMMETA`, `_SUCCESS`
    * and friends excluded). Listing-only — no file is opened.
    */
  private def signature(spark: SparkSession, zonePath: String): String = {
    val p = new org.apache.hadoop.fs.Path(zonePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return "absent"
    val parts = fs.listStatus(p).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => s"${s.getPath.getName}:${s.getLen}")
      .sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(s => md.update(s.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** The superseded manifest's generation (0 when none) — callers
    * capture this BEFORE mutating the zone parquet, because the
    * overwrite deletes the whole zone directory, old manifest included.
    */
  def currentGen(spark: SparkSession, zonePath: String): Long =
    rawRead(spark, zonePath).map(_.gen).getOrElse(0L)

  /** Commit the manifest describing the zone parquet that was JUST
    * written at `zonePath` — called strictly after every zone-map
    * mutation, with the generation captured by [[currentGen]] before
    * it. One metadata-sized read of the fresh zone table, one atomic
    * manifest rename, cache primed. The string/long split per column
    * is read off the zone table's own schema — the authority on what
    * the build aggregated.
    */
  def write(spark: SparkSession, zonePath: String,
            statCols: Seq[String], prevGen: Long,
            blooms: Option[BloomStats] = None): Unit = {
    val zm = spark.read.parquet(zonePath)
    val strCols = statCols.filter(c =>
      zm.schema(s"${c}_min").dataType == StringType).toSet
    // `<c>_cnt` (non-null count) may be ABSENT from a zone table built
    // before counts existed and carried through an append, and
    // `<c>_sum` from one built before sums (or for a non-summable
    // column, which never has one) — select null placeholders so the
    // manifest records UNKNOWN (the metadata-aggregate consumer
    // boundary-scans such files, never guesses)
    def orNull(name: String): org.apache.spark.sql.Column =
      (if (zm.columns.contains(name)) col(name)
      else org.apache.spark.sql.functions.lit(null).cast("long")).as(name)
    val cols = col("file") +: col("n") +:
      statCols.flatMap(c => Seq(col(s"${c}_min"), col(s"${c}_max"),
        orNull(s"${c}_cnt"), orNull(s"${c}_sum")))
    val rows = zm.select(cols: _*).collect()
    val files = rows.map { r =>
      def slot[T](c: String, i: Int, get: Int => T): Option[(T, T)] = {
        val (mi, ma) = (2 + 4 * i, 3 + 4 * i)
        if (r.isNullAt(mi) || r.isNullAt(ma)) None
        else Some((get(mi), get(ma)))
      }
      def longAt(j: Int): Option[Long] =
        if (r.isNullAt(j)) None else Some(r.getLong(j))
      val stats = statCols.zipWithIndex
        .filterNot { case (c, _) => strCols.contains(c) }
        .map { case (c, i) => c -> slot(c, i, r.getLong) }.toMap
      val sstats = statCols.zipWithIndex
        .filter { case (c, _) => strCols.contains(c) }
        .map { case (c, i) => c -> slot(c, i, r.getString) }.toMap
      val cnts = statCols.zipWithIndex.map { case (c, i) =>
        c -> longAt(4 + 4 * i)
      }.toMap
      val sums = statCols.zipWithIndex.map { case (c, i) =>
        c -> longAt(5 + 4 * i)
      }.toMap
      val file = r.getString(0)
      // a described file ABSENT from perFile had no non-null values at
      // all — all-zero words per column, correctly dropping every
      // equality. A file PRESENT with a missing column keeps the gap
      // (written as `-`, never drops): that is an append carrying a
      // pre-bloom file forward, where zeros would wrongly drop it.
      val bl = blooms.map { b =>
        b.perFile.get(file) match {
          case Some(per) => b.cols.flatMap(c => per.get(c).map(c -> _)).toMap
          case None =>
            b.cols.map(c => c -> new Array[Long](b.m / 64)).toMap
        }
      }.getOrElse(Map.empty)
      FileStat(file, r.getLong(1), stats, sstats, bl, cnts, sums)
    }.toSeq.sortBy(_.file)
    // gen continues from the superseded manifest (captured before the
    // mutation) regardless of its signature validity — it is a mutation
    // counter, not the cache key
    val gen = prevGen + 1
    val sig = signature(spark, zonePath)
    // every NEW manifest commits v6 (v5's min:max:cnt:sum line format,
    // with decimal stat columns now guaranteed to carry their EXACT
    // unscaled-long image — the semantic gate decimal consumers read);
    // v1–v5 stay fully READABLE, their files simply carrying unknown
    // counts/sums and ver-gated (lossy) decimal slots
    val header =
      Seq("zmmeta v6", s"gen=$gen", s"sig=$sig",
        s"cols=${statCols.mkString(",")}",
        s"strs=${statCols.filter(strCols.contains).mkString(",")}") ++
        blooms.toSeq.flatMap(b => Seq(s"bloomcols=${b.cols.mkString(",")}",
          s"bloomm=${b.m}", s"bloomk=${b.k}"))
    val body = files.map { f =>
      val ss = statCols.map { c =>
        val cnt = f.cnts.getOrElse(c, None).map(_.toString).getOrElse("-")
        val sm = f.sums.getOrElse(c, None).map(_.toString).getOrElse("-")
        if (strCols.contains(c)) f.sstats(c) match {
          case Some((lo, hi)) => s"${hex(lo)}:${hex(hi)}:$cnt:$sm"
          case None => s"-:$cnt:$sm"
        } else f.stats(c) match {
          case Some((lo, hi)) => s"$lo:$hi:$cnt:$sm"
          case None => s"-:$cnt:$sm"
        }
      }
      val bs = blooms.toSeq.flatMap(b => b.cols.map(c =>
        f.blooms.get(c).map(_.map(w => f"$w%016x").mkString)
          .getOrElse("-")))
      (f.n.toString +: (ss ++ bs) :+ f.file).mkString("\t")
    }
    Snapshot.writeLines(spark, manifestFile(zonePath), header ++ body)
    cache.put(key(zonePath), Meta(gen, sig, statCols, files, strCols,
      blooms.map(_.cols).getOrElse(Seq.empty),
      blooms.map(_.m).getOrElse(0), blooms.map(_.k).getOrElse(0)))
  }

  /** The manifest, IF it provably describes the zone parquet currently
    * on disk: cache hit validated against the live directory signature,
    * else one manifest read, else None (pre-manifest map, crash between
    * the two writes, or unparseable) — consumers fall back to the zone
    * TABLE, which is always authoritative.
    */
  def load(spark: SparkSession, zonePath: String): Option[Meta] = {
    val sig = signature(spark, zonePath)
    val k = key(zonePath)
    Option(cache.get(k)).filter(_.sig == sig).orElse {
      rawRead(spark, zonePath).filter(_.sig == sig).map { m =>
        cache.put(k, m); m
      }
    }
  }

  /** The (possibly STALE) manifest's bloom columns, signature UNCHECKED
    * — the append path's loss probe: a manifest that no longer
    * validates but still parses and names blooms proves the map had
    * them, so an append that would commit a bloom-less replacement can
    * refuse loudly instead of losing the filters silently. Empty when
    * the manifest is absent or unparseable (the residual undetectable
    * window).
    */
  private[operators] def rawBloomCols(spark: SparkSession,
                                      zonePath: String): Seq[String] =
    rawRead(spark, zonePath).map(_.bloomCols).getOrElse(Seq.empty)

  /** The (possibly STALE) manifest's full bloom spec, signature
    * UNCHECKED — the REBUILD path's recovery twin of [[rawBloomCols]]:
    * a full rebuild recomputes every per-file word from the data
    * anyway, so carrying the spec out of a stale-but-parseable manifest
    * is always safe, and NOT carrying it would let an automated sweep
    * hitting a crash-degraded bloom map silently and permanently drop
    * bloom skipping (the loss the append path refuses loudly). None
    * when the manifest is absent, unparseable, or bloom-less.
    */
  private[operators] def rawBloomSpec(spark: SparkSession, zonePath: String)
      : Option[(Seq[String], Int, Int)] =
    rawRead(spark, zonePath).filter(_.bloomCols.nonEmpty)
      .map(m => (m.bloomCols, m.bloomM, m.bloomK))

  /** Parse the manifest without signature validation (gen continuity
    * needs the superseded one). Any malformation — torn content, stale
    * checksum sidecar, unreadable file — → None, loudly never: the zone
    * TABLE is authoritative and every consumer falls back to it.
    */
  private def rawRead(spark: SparkSession, zonePath: String): Option[Meta] =
    try rawReadInner(spark, zonePath)
    catch { case scala.util.control.NonFatal(_) => None }

  private def rawReadInner(spark: SparkSession,
                           zonePath: String): Option[Meta] =
    Snapshot.readLines(spark, manifestFile(zonePath)).flatMap { lines =>
      try {
        val magic = lines.head
        require(magic.startsWith("zmmeta v"), s"unknown manifest: $magic")
        val ver = magic.stripPrefix("zmmeta v").toInt
        require(ver >= 1 && ver <= 6, s"unknown manifest format: $magic")
        // v4 introduced the cnt token; v5 appends the sum token; v6 is
        // v5's line format with exact decimal images (a semantic gate
        // read off Meta.ver, not a parse change)
        val v5 = ver >= 5
        val v4 = ver >= 4
        val v3 = ver == 3
        val v2 = ver >= 2
        val Seq(genL, sigL, colsL) = lines.slice(1, 4)
        val gen = genL.stripPrefix("gen=").toLong
        val sig = sigL.stripPrefix("sig=")
        val statCols = colsL.stripPrefix("cols=").split(',').toSeq
          .filter(_.nonEmpty)
        val strCols: Set[String] =
          if (!v2) Set.empty
          else {
            val l = lines(4)
            require(l.startsWith("strs="), s"v2 manifest missing strs: $l")
            l.stripPrefix("strs=").split(',').toSet.filter(_.nonEmpty)
          }
        // v3 carries blooms always; v4 carries them OPTIONALLY (the
        // header names them when present)
        val hasBlooms = (v3 || (v4 && lines.length > 5 &&
          lines(5).startsWith("bloomcols=")))
        val (bloomCols, bloomM, bloomK) =
          if (!hasBlooms) (Seq.empty[String], 0, 0)
          else {
            val Seq(bc, bm, bk) = lines.slice(5, 8)
            require(bc.startsWith("bloomcols=") && bm.startsWith("bloomm=") &&
              bk.startsWith("bloomk="), s"v3 manifest missing bloom header")
            (bc.stripPrefix("bloomcols=").split(',').toSeq.filter(_.nonEmpty),
              bm.stripPrefix("bloomm=").toInt, bk.stripPrefix("bloomk=").toInt)
          }
        val headerLen = if (hasBlooms) 8 else if (v2) 5 else 4
        val files = lines.drop(headerLen).filter(_.nonEmpty).map { ln =>
          val parts = ln.split('\t')
          require(parts.length == statCols.length + bloomCols.length + 2,
            s"torn line: $ln")
          val n = parts(0).toLong
          // v1–v3 slot: "lo:hi" | "-"; v4 slot: "lo:hi:cnt" | "-:cnt";
          // v5 slot: "lo:hi:cnt:sum" | "-:cnt:sum" (cnt/sum "-" =
          // unknown — carried from a pre-count/pre-sum zone table, or
          // a non-summable column which never has a sum).
          // limit -1 keeps EMPTY tokens: a string slot whose min and
          // max are both the empty string serializes as "::cnt:sum"
          // (hex of "" is ""), and the default split drops trailing
          // empties — the whole manifest would parse as torn, silently
          // and PERMANENTLY losing its blooms (and blinding the append
          // path's bloom-loss probe, which reads this same parse)
          def cntOf(s: String): Option[Long] =
            if (s == "-") None else Some(s.toLong)
          // each slot parsed ONCE per line (stats, sstats, cnts, and
          // sums all read the same triple — re-splitting per consumer
          // would 4x the string work on exactly the 100 TB-scale
          // manifests this subsystem targets)
          val slots: IndexedSeq[(Option[(String, String)], Option[Long],
              Option[Long])] =
            statCols.indices.map { i =>
              parts(1 + i) match {
                case "-" if !v4 => (None, None, None)
                case s =>
                  val ts = s.split(":", -1)
                  val want = if (v5) 4 else if (v4) 3 else 2
                  if (v4) {
                    require(ts.length == want ||
                      (ts.length == want - 1 && ts(0) == "-"),
                      s"torn slot: $s")
                    val sm = if (v5) cntOf(ts(ts.length - 1)) else None
                    val ct =
                      cntOf(ts(if (v5) ts.length - 2 else ts.length - 1))
                    if (ts.length == want) (Some((ts(0), ts(1))), ct, sm)
                    else (None, ct, sm)
                  } else {
                    require(ts.length == 2, s"torn slot: $s")
                    (Some((ts(0), ts(1))), None, None)
                  }
              }
            }
          def slot(i: Int)
              : (Option[(String, String)], Option[Long], Option[Long]) =
            slots(i)
          def pair(i: Int): Option[(String, String)] = slot(i)._1
          val stats = statCols.zipWithIndex
            .filterNot { case (c, _) => strCols.contains(c) }
            .map { case (c, i) =>
              c -> pair(i).map { case (lo, hi) => (lo.toLong, hi.toLong) }
            }.toMap
          val sstats = statCols.zipWithIndex
            .filter { case (c, _) => strCols.contains(c) }
            .map { case (c, i) =>
              c -> pair(i).map { case (lo, hi) => (unhex(lo), unhex(hi)) }
            }.toMap
          val cnts = statCols.zipWithIndex.map { case (c, i) =>
            c -> slot(i)._2
          }.toMap
          val sums = statCols.zipWithIndex.map { case (c, i) =>
            c -> slot(i)._3
          }.toMap
          val blooms = bloomCols.zipWithIndex.flatMap { case (c, i) =>
            parts(1 + statCols.length + i) match {
              case "-" => None // pre-bloom slot: never drops
              case h =>
                require(h.length == bloomM / 64 * 16, s"torn bloom: $ln")
                Some(c -> h.grouped(16)
                  .map(java.lang.Long.parseUnsignedLong(_, 16)).toArray)
            }
          }.toMap
          FileStat(parts.last, n, stats, sstats, blooms, cnts, sums)
        }
        Some(Meta(gen, sig, statCols, files, strCols, bloomCols, bloomM,
          bloomK, ver))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** The skipping decision on the CACHED stats — pure driver compute,
    * zero Spark jobs. Same algebra as the zone-table SQL path: a file
    * survives when every predicate's `[lo, hi]` intersects its
    * `[min, max]`; null stats (all-null file) never intersect, exactly
    * as the null-safe SQL comparison drops them. A predicate on a
    * column the manifest does not describe is the same contract error
    * the SQL path surfaces as an unresolved `<c>_min` — loud, not a
    * silent full-scan.
    */
  def prune(meta: Meta, preds: Seq[(String, Long, Long)])
      : (Seq[String], Long) =
    pruneTyped(meta, preds, Seq.empty)

  /** Typed form: long-image predicates plus STRING ranges over string
    * stat columns — each side OPTIONAL, because unlike the long unit
    * (whose Long.Min/MaxValue sentinels are real values) strings have
    * no greatest element to stand in for "unbounded". Comparisons run
    * in UTF-8 byte order ([[cmpUtf8]] — identical to the binary
    * collation the stats were aggregated under, so the manifest's
    * decision matches the zone-table SQL path bit for bit).
    */
  def pruneTyped(meta: Meta, preds: Seq[(String, Long, Long)],
                 strPreds: Seq[(String, Option[String], Option[String])],
                 bloomPreds: Seq[(String, Seq[String])] = Seq.empty)
      : (Seq[String], Long) = {
    val askedStr = strPreds.map(_._1)
    val missing = (preds.map(_._1) ++ askedStr)
      .filterNot(meta.statCols.contains)
    require(missing.isEmpty,
      s"zone map describes ${meta.statCols.mkString(",")} but was asked " +
        s"to prune on ${missing.mkString(",")}")
    val mistyped = preds.map(_._1).filter(meta.strCols.contains) ++
      askedStr.filterNot(meta.strCols.contains)
    require(mistyped.isEmpty,
      s"predicate type does not match the stat column type for " +
        s"${mistyped.mkString(",")} (string stats take string bounds)")
    val noBloom = bloomPreds.map(_._1).filterNot(meta.bloomCols.contains)
    require(noBloom.isEmpty,
      s"zone map carries blooms for ${meta.bloomCols.mkString(",")} but " +
        s"was asked to bloom-prune on ${noBloom.mkString(",")}")
    require(bloomPreds.forall(_._2.nonEmpty),
      "a bloom predicate needs at least one candidate value")
    val survivors = meta.files.filter { f =>
      preds.forall { case (c, lo, hi) =>
        f.stats.getOrElse(c, None) match {
          case Some((mn, mx)) => mn <= hi && mx >= lo
          case None => false
        }
      } && strPreds.forall { case (c, lo, hi) =>
        f.sstats.getOrElse(c, None) match {
          case Some((mn, mx)) =>
            hi.forall(h => cmpUtf8(mn, h) <= 0) &&
              lo.forall(l => cmpUtf8(mx, l) >= 0)
          case None => false
        }
      } && bloomPreds.forall { case (c, vals) =>
        // an equality/IN survives when ANY candidate might be present;
        // a file without the bloom (pre-bloom `-` slot) never drops
        f.blooms.get(c) match {
          case Some(words) => vals.exists(v =>
            Bloom.mightContainLocal(words, v, meta.bloomM, meta.bloomK))
          case None => true
        }
      }
    }.map(_.file).sorted
    (survivors, meta.files.size.toLong)
  }

  /** Test seam + maintenance hygiene: drop the process-wide cache. */
  private[graft] def invalidate(): Unit = cache.clear()
}
