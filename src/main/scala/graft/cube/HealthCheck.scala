package graft.cube

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cube health checks (reference: server-base KylinHealthCheckJob.java
  * — checkCubeHoles, checkTooManySegments, checkSegmentHDFSPath,
  * checkDataExpansionRate, run as the operator's scheduled audit).
  * Each finding names the condition and the remedy; none of these are
  * errors the query path would throw cleanly — a missing cuboid dir
  * fails queries only when a query routes to it, a segment hole
  * silently pushes range queries to fallback, segment sprawl taxes
  * every scan's file listing — which is exactly why a standing audit
  * beats discovering them one incident at a time. */
object HealthCheck {

  sealed trait Severity
  case object Warn extends Severity
  case object Error extends Severity

  final case class Finding(severity: Severity, code: String,
                           message: String)

  /** segments > this advise a merge (reference
    * kylin.tool.health-check.max-segments posture; graft's autoMerge
    * is the remedy) */
  val MaxSegments = 20
  /** total cuboid rows / base cuboid rows beyond this flags an
    * over-materialized lattice (checkDataExpansionRate analogue —
    * the reference compares cube bytes to source bytes) */
  val MaxExpansionRate = 10.0

  /** Audit one committed cube. Returns findings, empty = healthy.
    * Refuses (throws) when the meta itself does not load — that is
    * CubeMeta's contract violation, not a warnable condition. */
  def check(spark: SparkSession, cube: CubeDef, root: String,
            maxSegments: Int = MaxSegments,
            maxExpansion: Double = MaxExpansionRate): Seq[Finding] = {
    val inst = CubeMeta.load(spark, cube, root).getOrElse(
      throw new IllegalStateException(
        s"health check refused: no loadable meta for ${cube.name} " +
          s"under $root")).inst
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = Seq.newBuilder[Finding]

    // every ROUTED realization is audited: the primary instance and —
    // when committed — the all-segments-merged realization the hybrid
    // path serves (a hole in either fails real queries)
    def auditRealization(r: CubeInstance, label: String): Unit = {
      // ── segment holes (checkCubeHoles): a gap between consecutive
      // committed ranges silently degrades spanning queries to
      // fallback
      val segs = r.cube.segments.sortBy(_.start)
      segs.sliding(2).foreach {
        case Seq(a, b) if a.end != b.start =>
          out += Finding(Warn, "segment_hole",
            s"gap [${a.end}, ${b.start}) between segments ${a.name} " +
              s"and ${b.name}$label: spanning queries fall back to " +
              s"the source scan; build the missing range")
        case _ =>
      }

      // ── segment sprawl (checkTooManySegments): merge advice
      if (segs.length > maxSegments)
        out += Finding(Warn, "too_many_segments",
          s"${segs.length} segments$label (> $maxSegments): every " +
            s"routed scan lists files per segment — run the " +
            s"auto-merge policy")

      // ── layout completeness (checkSegmentHDFSPath): EVERY routed
      // cuboid dir per segment, not just the base spot-check load
      // does — a missing non-base cuboid fails exactly the queries
      // routed to it. Probed with ONE listStatus per segment dir and
      // a name-set compare — O(segments) FS calls, not
      // O(segments × cuboids) exists probes: at audit-worthy segment
      // counts against an object store the per-cuboid probe IS the
      // audit's runtime.
      val ids = r.cube.cuboids.map(r.cube.cuboidId)
      for (s <- segs) {
        val segDir = new Path(r.cuboidPath(s.name, ids.head)).getParent
        // a truly missing segment dir means every cuboid is missing
        // (a real finding); any OTHER listing failure is the TOOL
        // failing (store throttling, auth) and must abort — reporting
        // it as universal layout loss would page operators (exit 2)
        // for a healthy cube
        val present: Set[Long] =
          (try fs.listStatus(segDir).toSeq
           catch {
             case _: java.io.FileNotFoundException => Seq.empty
             case e: java.io.IOException =>
               throw new IllegalStateException(
                 s"health check could not list $segDir — transient " +
                   "store failure? aborting rather than reporting " +
                   "universal layout loss", e)
           })
            .iterator.map(_.getPath.getName)
            .filter(_.startsWith("cuboid="))
            .flatMap(n =>
              scala.util.Try(n.stripPrefix("cuboid=").toLong).toOption)
            .toSet
        for (id <- ids) {
          if (!present(id))
            out += Finding(Error, "missing_cuboid",
              s"segment ${s.name}$label lacks cuboid=$id under " +
                s"$segDir: queries routed to that cuboid will fail — " +
                s"refresh the segment")
          else if (!r.rows.contains((s.name, id)))
            out += Finding(Warn, "missing_row_stats",
              s"no persisted row count for (${s.name}$label, " +
                s"cuboid=$id): the router's cost estimates treat it " +
                s"as unknown — recommit the meta from a build")
        }
      }
    }
    auditRealization(inst, "")
    CubeMeta.load(spark, cube, root, CubeMeta.MergedFile)
      .foreach(m => auditRealization(m.inst, " (merged realization)"))

    // ── derived-dim snapshots present (the load spot-checks these
    // too, but per-lookup detail belongs in the audit)
    inst.cube.derived.map(_.lookup).distinct.foreach { l =>
      if (!fs.exists(new Path(Snapshot.path(root, l))))
        out += Finding(Error, "missing_snapshot",
          s"derived-dim lookup snapshot '$l' missing under $root: " +
            s"derived filters/group-bys cannot be answered")
    }

    // ── dim-range coverage: segments without collected ranges never
    // prune on non-time filters (pre-feature builds) — answers stay
    // correct, scans stay wide; the backfill is one metadata-sized op
    val rangeCovered = inst.dimRanges.keySet.map(_._1)
    val rangeless = inst.cube.segments
      .filterNot(s => rangeCovered(s.name)).map(_.name)
    if (rangeless.nonEmpty && rangeless.size < inst.cube.segments.size)
      out += Finding(Warn, "missing_dim_ranges",
        s"segment(s) ${rangeless.mkString(", ")} carry no dim-range " +
          s"metadata while others do: non-time filters scan them " +
          s"unconditionally — run 'GraftTool ranges' to backfill")

    // ── expansion rate (checkDataExpansionRate): materialized rows
    // across the lattice vs base rows
    val baseId = inst.cube.cuboidId(inst.cube.dims.toSet)
    val baseRows = inst.cube.segments
      .map(s => inst.rows.getOrElse((s.name, baseId), 0L)).sum
    val allRows = inst.rows.values.sum
    if (baseRows > 0 && allRows.toDouble / baseRows > maxExpansion)
      out += Finding(Warn, "expansion_rate",
        f"lattice holds ${allRows} rows vs $baseRows base rows " +
          f"(${allRows.toDouble / baseRows}%.1f×, > $maxExpansion): " +
          f"prune rarely-hit cuboids (CuboidPlanner.recommend)")

    // ── reclaimable garbage (StorageCleanupJob linkage): surface the
    // dry-run count so operators schedule the sweep
    val sweep = scala.util.Try(
      StorageCleaner.clean(spark, cube, root, delete = false)).toOption
    sweep.map(_.removed).filter(_.nonEmpty).foreach { g =>
      out += Finding(Warn, "reclaimable_storage",
        s"${g.size} unreferenced path(s) under $root (e.g. " +
          s"${g.head}): run StorageCleaner")
    }
    // young unreferenced paths are usually an in-flight build's
    // staging (the cleaner's grace window protects them on purpose) —
    // informational, with the right remedy: wait, then re-audit
    sweep.map(_.inGrace).filter(_.nonEmpty).foreach { g =>
      out += Finding(Warn, "inflight_storage",
        s"${g.size} unreferenced young path(s) under $root (e.g. " +
          s"${g.head}): likely an in-flight build — no action unless " +
          s"it crashed; re-audit after the grace window")
    }

    // ── reclaimable auxiliary metadata (MetadataCleanupJob linkage):
    // superseded dictionary versions and over-retained backups from
    // MetaCleanup's dry run. Snapshot findings are deliberately NOT
    // surfaced here — this audit sees ONE cube's def, and a snapshot
    // another cube's derived dims pin would read as a false positive;
    // run MetaCleanup with every def at the root for that sweep.
    val aux = scala.util.Try(
      MetaCleanup.clean(spark, root, Nil, delete = false)).toOption
    aux.foreach { a =>
      val n = a.dictRemoved.size + a.backupsRemoved.size
      if (n > 0)
        out += Finding(Warn, "reclaimable_metadata",
          s"${a.dictRemoved.size} superseded dictionary version(s) " +
            s"and ${a.backupsRemoved.size} over-retained backup(s) " +
            s"under $root: run MetaCleanup")
    }

    out.result()
  }
}
