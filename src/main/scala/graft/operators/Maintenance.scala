package graft.operators

import org.apache.spark.sql.SparkSession

/** UNIFIED TABLE SERVICES — the one cadence verb over every store
  * family's ad-hoc maintenance: LSM compaction ([[GenStore
  * .compactAdditive]] via each store's wrapper), retention vacuum
  * ([[GenStore.vacuum]] ditto), layout re-clustering
  * ([[ZoneMap.reclusterIfDegraded]]), and the ANN index's
  * tombstone-compaction + catalog/version retention
  * ([[Similarity.compactIvfPqIndex]] / `vacuumIvfPq*`). A scheduler calls
  * [[Maintenance.sweep]] with the deployment's registered targets and
  * ONE policy; the sweep INSPECTS each store's manifests first —
  * segment-count histogram, archived-generation depth, drift ppm, all
  * metadata-only reads — and runs exactly the verbs the numbers call
  * for, reporting per target what it did and why (or that it was
  * healthy). This is the OPTIMIZE/VACUUM/ANALYZE janitor loop every
  * lakehouse grows, factored once.
  *
  * SERVING IS UNCHANGED BY CONSTRUCTION: every verb the sweep runs is
  * one of the stores' own committed mutations, each of which is
  * hash-proven elsewhere to preserve the served state (compaction folds
  * by each column's own monoid — `MaintenanceSpec` re-pins the
  * composite: a degraded multi-store fixture driven to healthy by ONE
  * call, with every serving read bit-identical before/after).
  *
  * CONCURRENCY: the sweep IS a maintenance writer — the
  * [[Snapshot]] single-maintenance-writer contract applies per store;
  * schedule it in the same window as any other mutation. Inspection
  * reads are manifest-only, so a sweep over a thousand stores costs a
  * thousand small file reads plus whatever verbs actually fire.
  *
  * At 100 TB: cadence verbs that fire only when the metadata says so
  * are the difference between background maintenance proportional to
  * CHURN and a nightly full rewrite of every store; inspection is
  * O(manifest) per store, and each fired verb is already bounded by
  * the store's own increment discipline (fold only over-threshold
  * buckets, delete only unreferenced dirs, re-layout only a drifted
  * layout).
  */
object Maintenance {

  /** One policy for the whole sweep: compact a substore when any bucket
    * holds more than `maxSegments` LSM segments; vacuum a store when it
    * retains more than `keepGens` resolvable generations (CURRENT
    * included); re-z-order a layout when its measured drift passes
    * `maxDriftPpm` (re-layout knobs `bits`/`partitions` as in
    * [[ZoneMap.writeZOrdered]]). For the ANN family: compact the index
    * when the live tombstone log holds more than `maxTombstones` rows
    * (default 0 — any logical delete is made physical at the next
    * sweep), and retire rebuilt versions past `keepVersions`
    * ([[Similarity.vacuumIvfPqVersions]]'s retention window; 2 keeps
    * one pre-rebuild version for in-flight readers).
    */
  case class Policy(maxSegments: Int = 8, keepGens: Int = 3,
                    maxDriftPpm: Long = 250000L, bits: Int = 8,
                    partitions: Int = 32, maxTombstones: Long = 0L,
                    keepVersions: Int = 2)

  /** A maintainable store. `AggStoreT` (one [[GenStore]] at the root —
    * the aggregate store, the dedup cluster store, any single-manifest
    * snapshot store: its merges rewrite whole buckets, so only
    * retention applies); `JoinViewT` ([[ViewStore]]'s three substores);
    * `TextIndexT` ([[TextIndex]]'s three or four legs); `ZoneMapT` (a
    * z-ordered layout + its stats map + the two cluster columns the
    * drift statistic needs).
    */
  sealed trait Target { def label: String }
  case class AggStoreT(path: String) extends Target {
    def label: String = s"aggstore:$path"
  }
  case class JoinViewT(path: String) extends Target {
    def label: String = s"joinview:$path"
  }
  case class TextIndexT(path: String) extends Target {
    def label: String = s"textindex:$path"
  }
  case class ZoneMapT(dataPath: String, zonePath: String,
                      colA: String, colB: String) extends Target {
    def label: String = s"zonemap:$dataPath"
  }
  /** The versioned IVF-PQ index ([[Similarity]]): live-tombstone
    * compaction, catalog-generation retention, version retention — all
    * decided from [[Similarity.ivfPqMaintenanceStats]]'s store-metadata
    * read. The corpus-driven DRIFT rebuild deliberately stays outside
    * the sweep (it needs the live corpus, which a metadata-only janitor
    * does not have). `cId` is the index's id column as at build time —
    * a FALLBACK only: when a live tombstone log exists, its own schema
    * names the column authoritatively
    * ([[Similarity.ivfPqTombstoneIdCol]]) and overrides this, so
    * detect()-built targets compact correctly whatever the build used.
    */
  case class IvfPqT(path: String, cId: String = "nid") extends Target {
    def label: String = s"ivfpq:$path"
  }

  /** What the sweep did to one target: `verb` ∈ compact | vacuum |
    * recluster | none | skip | error, with the inspection numbers that
    * justified it (`error` carries the exception — the target was
    * skipped, the sweep CONTINUED).
    */
  case class Action(target: String, verb: String, detail: String)

  /** Detect the store family at `root` from its own layout — the
    * manifest files ARE the registry: `view/a/b` manifests → join view;
    * `postings/dl/stats` → text index; a `CURRENT` naming a `v<N>`
    * version, or a `CODESMAP` codes catalog → IVF-PQ index (checked
    * BEFORE the GenStore probe: both families share the `CURRENT` file
    * name, disambiguated by its first line — `v<N>` vs `gen=`; the
    * peek is deliberately non-throwing here because detection
    * CLASSIFIES, while the verbs that then run stay loud on anything
    * actually corrupt); a root `gen=` `CURRENT` → single GenStore.
    * Zone-map layouts need their cluster columns and are registered
    * explicitly (or via the planner catalog —
    * [[graft.plans.ZoneMapCatalog.zoneTargetsFromCatalog]]). None when
    * nothing manifested lives there.
    */
  def detect(spark: SparkSession, root: String): Option[Target] = {
    def head(p: String): Option[String] =
      Snapshot.readLines(spark, s"$p/CURRENT").flatMap(_.headOption)
    def isStore(p: String) = head(p).exists(_.startsWith("gen="))
    if (Seq("view", "a", "b").forall(s => isStore(s"$root/$s")))
      Some(JoinViewT(root))
    else if (Seq("postings", "dl", "stats").forall(s => isStore(s"$root/$s")))
      Some(TextIndexT(root))
    else if (head(root).exists(_.trim.matches("v\\d+")) ||
      Snapshot.readLines(spark, s"$root/CODESMAP").isDefined)
      Some(IvfPqT(root))
    else if (isStore(root)) Some(AggStoreT(root))
    else None
  }

  /** Detection-first sweep: classify each root, then [[sweep]]. Roots
    * holding no manifested store report `verb = skip`. */
  def sweepRoots(spark: SparkSession, roots: Seq[String],
                 policy: Policy = Policy()): Seq[Action] = {
    val (found, unknown) = roots.map(r => r -> detect(spark, r))
      .partition(_._2.isDefined)
    unknown.map { case (r, _) =>
      Action(r, "skip", "no manifested store detected")
    } ++ sweep(spark, found.flatMap(_._2), policy)
  }

  /** THE verb: inspect every target, run exactly what its numbers call
    * for, report everything (healthy targets report `none`). PER-TARGET
    * error isolation: a corrupt manifest, a vanished directory, or a
    * mis-registered target reports `verb = error` and the sweep moves
    * on — one bad store must never leave the rest of the fleet
    * unmaintained (each verb is itself crash-safe, so an error here
    * never leaves ITS store half-mutated either; it re-heals on the
    * next sweep after the operator fixes the cause).
    */
  def sweep(spark: SparkSession, targets: Seq[Target],
            policy: Policy = Policy()): Seq[Action] =
    targets.flatMap { t =>
      try sweepOne(spark, t, policy)
      catch {
        case scala.util.control.NonFatal(e) =>
          Seq(Action(t.label, "error",
            s"${e.getClass.getSimpleName}: ${e.getMessage} — target " +
              "skipped, sweep continued"))
      }
    }

  private def sweepOne(spark: SparkSession, target: Target,
                       policy: Policy): Seq[Action] =
    Seq(target).flatMap {
      case t @ AggStoreT(path) =>
        vacuumIfDeep(spark, t.label, Seq("" -> path), policy)
      case t @ JoinViewT(path) =>
        val subs = Seq("view", "a", "b").map(s => s -> s"$path/$s")
        compactIfSegmented(spark, t.label, subs, policy,
          () => ViewStore.compactJoinView(spark, path, policy.maxSegments)) ++
          vacuumIfDeep(spark, t.label, subs, policy)
      case t @ TextIndexT(path) =>
        val subs = Seq("postings", "dl", "stats", "pos")
          .map(s => s -> s"$path/$s")
          .filter(s => GenStore.read(spark, s._2).isDefined)
        compactIfSegmented(spark, t.label, subs, policy,
          () => TextIndex.compactTextIndex(spark, path, policy.maxSegments)) ++
          vacuumIfDeep(spark, t.label, subs, policy)
      case t @ IvfPqT(path, cId) =>
        val (tombs, _, _) = Similarity.ivfPqMaintenanceStats(spark, path)
        // the live log's OWN id column (one parquet footer) overrides
        // the target's default: a detect()-built target cannot know the
        // build-time cId, and compacting against the wrong column name
        // would fail mid-sweep
        val cIdEff = Similarity.ivfPqTombstoneIdCol(spark, path)
          .getOrElse(cId)
        val compactAct =
          if (tombs > policy.maxTombstones) {
            Similarity.compactIvfPqIndex(spark, path, cIdEff)
            Action(t.label, "compact",
              s"$tombs live tombstone rows > ${policy.maxTombstones}: " +
                "rewrote their cells physically and archived the log")
          } else Action(t.label, "none",
            s"$tombs live tombstone rows <= ${policy.maxTombstones}")
        // re-inspect AFTER a possible compaction: it advances the
        // catalog generation, which is exactly what retention counts
        val (_, catGens, versions) =
          Similarity.ivfPqMaintenanceStats(spark, path)
        val dataAct =
          if (catGens > policy.keepGens) {
            val deleted = Similarity.vacuumIvfPqData(spark, path,
              policy.keepGens)
            Action(t.label, "vacuum",
              s"$catGens catalog generations > ${policy.keepGens}: " +
                s"reclaimed ${deleted.size} dirs/catalogs/logs")
          } else Action(t.label, "none",
            s"$catGens catalog generations <= ${policy.keepGens}")
        val verAct =
          if (versions > policy.keepVersions) {
            val deleted = Similarity.vacuumIvfPqVersions(spark, path,
              policy.keepVersions)
            Action(t.label, "vacuum",
              s"$versions resolvable versions > ${policy.keepVersions}: " +
                s"reclaimed ${deleted.mkString(",")}")
          } else Action(t.label, "none",
            s"$versions resolvable versions <= ${policy.keepVersions}")
        Seq(compactAct, dataAct, verAct)
      case t @ ZoneMapT(dataPath, zonePath, colA, colB) =>
        val (drift, ran) = ZoneMap.reclusterIfDegraded(spark, dataPath,
          zonePath, colA, colB, policy.maxDriftPpm, policy.bits,
          policy.partitions)
        Seq(
          if (ran) Action(t.label, "recluster",
            s"drift ${drift}ppm > ${policy.maxDriftPpm}ppm: re-z-ordered " +
              s"on ($colA, $colB) and rebuilt the stats map")
          else Action(t.label, "none",
            s"drift ${drift}ppm <= ${policy.maxDriftPpm}ppm"))
    }

  /** The worst bucket's segment count across `subs` (manifest-only). */
  private def maxSegs(spark: SparkSession,
                      subs: Seq[(String, String)]): Int =
    subs.flatMap { case (_, p) =>
      GenStore.read(spark, p).toSeq.flatMap(
        _.entries.groupBy(_._1).map(_._2.size))
    }.foldLeft(0)(math.max)

  private def compactIfSegmented(spark: SparkSession, label: String,
                                 subs: Seq[(String, String)], policy: Policy,
                                 run: () => Seq[(String, Int)]): Seq[Action] = {
    val worst = maxSegs(spark, subs)
    if (worst <= policy.maxSegments)
      Seq(Action(label, "none",
        s"max $worst segments/bucket <= ${policy.maxSegments}"))
    else {
      val compacted = run()
      Seq(Action(label, "compact",
        s"max $worst segments/bucket > ${policy.maxSegments}: folded " +
          compacted.map { case (s, n) => s"$s:$n" }.mkString(",") +
          " buckets"))
    }
  }

  /** Vacuum when any sub retains more than `keepGens` resolvable
    * generations (CURRENT + archived manifests). Substores vacuum
    * together — they share the batch cadence, so depth is aligned. */
  private def vacuumIfDeep(spark: SparkSession, label: String,
                           subs: Seq[(String, String)],
                           policy: Policy): Seq[Action] = {
    val depth = subs.map { case (_, p) =>
      GenStore.read(spark, p).map(m =>
        GenStore.listHistoryGens(spark, p).count(_ < m.gen) + 1)
        .getOrElse(0)
    }.foldLeft(0)(math.max)
    if (depth <= policy.keepGens)
      Seq(Action(label, "none",
        s"$depth resolvable generations <= ${policy.keepGens}"))
    else {
      val deleted = subs.flatMap { case (s, p) =>
        GenStore.vacuum(spark, p, policy.keepGens)
          .map(n => if (s.isEmpty) n else s"$s/$n")
      }
      Seq(Action(label, "vacuum",
        s"$depth resolvable generations > ${policy.keepGens}: reclaimed " +
          s"${deleted.size} dirs/manifests"))
    }
  }
}
