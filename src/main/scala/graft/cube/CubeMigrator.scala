package graft.cube

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Cross-root cube migration (reference: `tool/src/main/java/org/
  * apache/kylin/tool/CubeMigrationCLI.java` moves a cube's metadata +
  * segment data + dictionaries + snapshots between deployments, with
  * `doOverwrite` gating replacement and `CubeMigrationCheckCLI.java`
  * verifying the result; operators run the pair for staging → prod
  * promotion).
  *
  * graft's equivalent copies, in this order: segment cuboid parquet
  * (incl. the merged realization's data), the cube's derived-dim
  * snapshots, the shared dict trees — and ONLY THEN the meta commits,
  * merged first, primary `meta.json` last. Routing at the destination
  * discovers a cube exclusively through its primary meta, so a crash
  * anywhere mid-migration leaves data that is invisible to queries and
  * is exactly what [[StorageCleaner]] reclaims after its grace window —
  * the same commit-last discipline as the builder. The meta files are
  * byte-copies, not re-saves: the merged realization records the base
  * buildId it was merged from, and a re-save of the primary would mint
  * a new buildId that falsely invalidates the merged realization at
  * the destination. A byte-copied buildId is still a fresh commit as
  * far as the destination fleet's [[MetaStamp]] checks are concerned.
  *
  * Scale: every file copies independently (stream copy over the
  * Hadoop FileSystem API, so file://, hdfs:// and s3a:// roots all
  * work); a 100 TB migration parallelizes per-file exactly like
  * distcp — the sequential loop here is the single-node stand-in,
  * correctness-identical.
  *
  * Multi-cube destination roots: `dict/` and `snapshots/` are SHARED
  * per root (the layout MetaBackup supports), so those trees copy
  * ADDITIVELY — copy-if-absent per snapshot and per dict column, full
  * replacement only on an overwrite into a root with no other
  * committed cube, and a hard pre-copy refusal when a dict column
  * would collide with one other committed cubes may decode through
  * (independently assigned id spaces cannot merge). A crash therefore
  * never leaves another committed, routable cube half-replaced. */
object CubeMigrator {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** stream-copy one file, tmp-then-rename at the destination (the
    * same torn-read protection as CubeMeta.save) */
  private def copyFile(srcFs: FileSystem, dstFs: FileSystem,
                       from: Path, to: Path): Unit = {
    dstFs.mkdirs(to.getParent)
    // dot-prefixed tmp: Spark's parquet reader skips hidden files, so
    // a crash mid-copy can never leave a half-file a later overwrite
    // retry would try to read as data
    val tmp = new Path(to.getParent, s".${to.getName}.inflight")
    val in = srcFs.open(from)
    val out = dstFs.create(tmp, true)
    try {
      val chunk = new Array[Byte](1 << 16)
      Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
        .foreach(n => out.write(chunk, 0, n))
    } finally { in.close(); out.close() }
    if (dstFs.exists(to)) dstFs.delete(to, false)
    if (!dstFs.rename(tmp, to))
      throw new java.io.IOException(s"migration copy failed: $from -> $to")
  }

  private def readBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](1 << 16)
      Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
        .foreach(n => buf.write(chunk, 0, n))
      buf.toByteArray
    } finally in.close()
  }

  private def writeBytes(fs: FileSystem, to: Path,
                         bytes: Array[Byte]): Unit = {
    fs.mkdirs(to.getParent)
    val tmp = new Path(to.getParent, s".${to.getName}.inflight")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (fs.exists(to)) fs.delete(to, false)
    if (!fs.rename(tmp, to))
      throw new java.io.IOException(s"migration commit failed: $to")
  }

  /** delete-then-copy a directory: an overwrite must never MERGE new
    * part files into a dir still holding the previous deployment's
    * (two generations of parquet in one snapshot/cuboid dir would
    * double every row) — safe because the destination is uncommitted
    * (meta deleted or never present) while data moves */
  private def replaceTree(srcFs: FileSystem, dstFs: FileSystem,
                          from: Path, to: Path,
                          skip: String => Boolean = _ => false): Unit = {
    if (dstFs.exists(to)) dstFs.delete(to, true)
    copyTree(srcFs, dstFs, from, to, skip)
  }

  /** recursive dir copy; checksum sidecars (.crc) travel with their
    * files automatically because they are plain directory entries */
  private def copyTree(srcFs: FileSystem, dstFs: FileSystem,
                       from: Path, to: Path,
                       skip: String => Boolean = _ => false): Unit =
    srcFs.listStatus(from).foreach { s =>
      val t = new Path(to, s.getPath.getName)
      if (s.isDirectory) copyTree(srcFs, dstFs, s.getPath, t, skip)
      else if (!skip(s.getPath.getName)) copyFile(srcFs, dstFs, s.getPath, t)
    }

  /** Append-stable COMPATIBILITY of two dictionary lineages for one
    * column: every shared VALUE maps to the same id and every shared
    * ID to the same value — true exactly when one side's newest map
    * is a sub-map of the other's, i.e. the same lineage at different
    * append points. File-size signatures cannot decide this (two
    * foreign one-value dicts are byte-length-identical while mapping
    * different values to id 1), so the MAPPINGS are joined directly —
    * dictionaries are metadata-sized next to a migration's data copy. */
  private def dictCompatible(spark: SparkSession, srcRoot: String,
                             dstRoot: String, column: String): Boolean = {
    // NO treeSignature fast path on purpose: two foreign one-value
    // dictionaries are byte-LENGTH-identical while mapping different
    // values to id 1 — the signature would bless exactly the merge
    // this check refuses. Dictionaries are metadata-sized next to a
    // migration's data copy; the joins are the price of soundness.
    (Dictionary.load(spark, srcRoot, column),
      Dictionary.load(spark, dstRoot, column)) match {
      case (Some(a), Some(b)) =>
        import org.apache.spark.sql.functions.col
        val x = a.select(col(column).as("v"), col("dict_id").as("ia"))
        val y = b.select(col(column).as("v"), col("dict_id").as("ib"))
        val valueClash = x.join(y, "v")
          .filter(col("ia") =!= col("ib")).limit(1).count() > 0
        val xi = a.select(col("dict_id").as("id"), col(column).as("va"))
        val yi = b.select(col("dict_id").as("id"), col(column).as("vb"))
        val idClash = xi.join(yi, "id")
          .filter(col("va") =!= col("vb")).limit(1).count() > 0
        // the destination must already RESOLVE every id the migrated
        // states may reference: src ⊆ dst. A source that appended
        // since the sibling migrated would need version dirs copied
        // INTO a live column — a crash/divergence minefield (a torn
        // copy-in corrupts cubes already serving through the tree) —
        // so the ahead case refuses instead: re-migrate after
        // aligning, never patch a live dictionary in place.
        val srcAhead = x.join(y, Seq("v"), "left_anti")
          .limit(1).count() > 0
        !valueClash && !idClash && !srcAhead
      case _ => false // a torn/absent lineage: refuse, never merge
    }
  }

  /** Cheap content signature of a tree: the sorted multiset of
    * (relative dir, file length) over non-hidden files — enough to
    * tell "the same write-once snapshot freeze" from a different one
    * without reading data (two parquet writes of the same rows in the
    * same order produce byte-identical part files; different rows
    * virtually never collide on every per-file byte length).
    * BASENAMES are deliberately excluded: every Spark write mints a
    * fresh writer uuid into the part-file name, so names differ even
    * between two writes of identical content. */
  private def treeSignature(fs: FileSystem,
                            root: Path): Seq[(String, Long)] = {
    def walk(p: Path, prefix: String): Seq[(String, Long)] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith(".") || name.startsWith("_")) Nil
        else if (st.isDirectory) walk(st.getPath, s"$prefix$name/")
        else Seq((prefix, st.getLen))
      }
    walk(root, "").sorted
  }

  private def isMetaFile(name: String): Boolean =
    name == CubeMeta.MetaFile || name == CubeMeta.MergedFile ||
      name == s".${CubeMeta.MetaFile}.crc" ||
      name == s".${CubeMeta.MergedFile}.crc" ||
      name.startsWith(s"${CubeMeta.MetaFile}.tmp") ||
      name.startsWith(s"${CubeMeta.MergedFile}.tmp") ||
      // a build lease is process-local state, never data: carrying a
      // live source lease to the destination would make the first dst
      // builder wait out a crash-expiry for a build that isn't there
      name == "_building" || name == "_building.tick" ||
      // build-attempt state (BuildJob): jobIds are per-root attempts;
      // carried to the destination they are inert at best — and a
      // copied refresh-attempt file could resurrect a stale attempt id
      // at the destination (ADVICE r16)
      name == BuildJob.JobFile || name == BuildJob.MergeJobFile ||
      name == BuildJob.RefreshJobFile ||
      name.startsWith("_phase.")

  /** Migrate `cube` from `srcRoot` to `dstRoot`. Refuses when the
    * source has no loadable meta, or when the destination already has
    * one and `overwrite` is false (the reference's doOverwrite gate).
    * Returns the destination instance, freshly loaded from the
    * committed copy — i.e. what the destination fleet will route. */
  def migrate(spark: SparkSession, cube: CubeDef, srcRoot: String,
              dstRoot: String, overwrite: Boolean = false): CubeInstance = {
    require(srcRoot != dstRoot, "migration source and destination are equal")
    val srcP = new Path(srcRoot); val dstP = new Path(dstRoot)
    val srcFs = fsOf(spark, srcP); val dstFs = fsOf(spark, dstP)

    val dstCubeDir = new Path(dstP, cube.name)
    // the gate is on PRESENCE, not loadability: a torn or def-drifted
    // destination meta is exactly the deployment an operator must look
    // at before it is clobbered (the reference's doOverwrite posture)
    val dstMetaPresent = Seq(CubeMeta.MetaFile, CubeMeta.MergedFile)
      .exists(f => dstFs.exists(new Path(dstCubeDir, f)))
    if (!overwrite && dstMetaPresent)
      throw new IllegalStateException(
        s"migration refused: ${cube.name} already present under " +
          s"$dstRoot (pass overwrite=true to replace)")
    // snapshot the meta BYTES now, before any data copies: a source
    // build committing mid-migration must not hand the destination a
    // meta referencing segments this run never planned to copy (the
    // segment list below comes from the same snapshot)
    val srcCubeDirP = new Path(srcP, cube.name)
    val metaBytes: Seq[(String, Array[Byte])] =
      Seq(CubeMeta.MergedFile, CubeMeta.MetaFile).flatMap { f =>
        val from = new Path(srcCubeDirP, f)
        if (srcFs.exists(from)) Some(f -> readBytes(srcFs, from)) else None
      }
    // the loads below (primary + merged) happen INSIDE the bracket
    // closed by the byte-equality re-check after them
    val srcLoaded = CubeMeta.load(spark, cube, srcRoot).getOrElse(
      throw new IllegalStateException(
        s"migration refused: no loadable meta for ${cube.name} " +
          s"under $srcRoot"))
    val src = srcLoaded.inst
    // ── shared-tree safety (multi-cube destination roots), checked
    // BEFORE the uncommit below: a refusal must leave the destination
    // fully routable — refusing after the meta deletion would turn a
    // "safe" refusal into an outage (the destination cube decommitted
    // with nothing copied). dict/ and snapshots/ are shared PER ROOT,
    // so replacing them wholesale would destroy dict versions other
    // committed cubes' segments were encoded against (silently wrong
    // bitmap decodes) and swap snapshot rows under cubes that are
    // still committed and routable. Policy: additive copy-if-absent;
    // full replacement only when the destination has NO other
    // committed cube AND the operator passed overwrite. Hard pre-copy
    // refusals: a dict COLUMN that already exists at a multi-cube
    // destination (two independently-assigned id spaces cannot merge —
    // including this cube's OWN prior deployment's: decommission it or
    // migrate to a fresh root), and an existing snapshot for a lookup
    // THIS cube's derived dims read whose content differs from the
    // source freeze (the migrated segments were built against the
    // source's rows; silently answering derived queries from a
    // different freeze would be wrong, the same unmergeable-state
    // reason as the dict case — identical freezes pass and skip the
    // copy).
    val otherCommitted: Seq[String] =
      (if (dstFs.exists(dstP)) dstFs.listStatus(dstP).toSeq else Nil)
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(n => n != cube.name && n != "dict" &&
          n != "snapshots" && n != "_backups")
        .filter(n => Seq(CubeMeta.MetaFile, CubeMeta.MergedFile)
          .exists(f => dstFs.exists(new Path(s"$dstRoot/$n/$f"))))
    val mayReplaceShared = overwrite && otherCommitted.isEmpty
    val srcDictDir = new Path(srcP, "dict")
    if (srcFs.exists(srcDictDir) && !mayReplaceShared) {
      // COMPATIBLE lineages pass: a shared-root (rootScope) hybrid
      // migrates member by member, and the second member's dict tree
      // IS the one the first member's migration already carried — one
      // shared append-stable dictionary, not two independent id
      // spaces. Compatibility is checked on the MAPPINGS (every
      // shared value → the same id, every shared id → the same
      // value), not on file-size signatures: two foreign one-value
      // dicts can have byte-identical sizes while mapping different
      // values to id 1 — merging them is exactly the corruption this
      // refusal exists for.
      val conflicts = srcFs.listStatus(srcDictDir).toSeq
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(c => dstFs.exists(new Path(dstP, s"dict/$c")) &&
          !dictCompatible(spark, srcRoot, dstRoot, c))
      if (conflicts.nonEmpty)
        throw new IllegalStateException(
          s"migration refused: dictionary column(s) " +
            s"${conflicts.mkString(", ")} already exist under $dstRoot " +
            "with an id mapping the destination cannot serve — either " +
            "INCOMPATIBLE (independently assigned id spaces cannot " +
            "merge, including a prior deployment of the same cube) or " +
            "BEHIND a source that appended since (patching a live " +
            "dictionary in place is never attempted); migrate to a " +
            "fresh root, rebuild at the destination, or re-migrate " +
            "the sibling that carried the tree first (a destination " +
            "already resolving every source id — e.g. a just-migrated " +
            "rootScope sibling's shared dictionary — passes)")
    }
    if (!mayReplaceShared) {
      src.cube.derived.map(_.lookup).distinct.foreach { l =>
        val from = new Path(Snapshot.path(srcRoot, l))
        val to = new Path(Snapshot.path(dstRoot, l))
        if (srcFs.exists(from) && dstFs.exists(to) &&
            treeSignature(srcFs, from) != treeSignature(dstFs, to))
          throw new IllegalStateException(
            s"migration refused: destination snapshot '$l' under " +
              s"$dstRoot differs from the source freeze this cube was " +
              "built against — derived-dim answers would silently " +
              "diverge; refresh the destination's snapshot consumers " +
              "or migrate to a fresh root")
      }
    }

    // ── data first, and ONLY data the committed meta references: the
    // primary instance's segment dirs plus the merged realization's
    // (extraCuboids live inside segment dirs, so they travel too).
    // Unreferenced leftovers at the source — crashed-refresh staging,
    // retention orphans, auto-merge remnants — deliberately STAY
    // BEHIND: they are the source StorageCleaner's job, and blindly
    // migrating garbage at 100 TB scale would copy unbounded junk
    // (the reference CLI likewise walks the cube's resource list, not
    // the raw directory).
    // a merged realization whose baseBuildId chain to the CURRENT
    // primary is broken (the base was re-committed since the merge) is
    // garbage the source's ensureMerged would re-merge, not data —
    // shipping it would hand the destination an unreferenced segment
    // dir plus a dead meta file (exactly what its storage audit then
    // flags). Chain-filter like StorageCleaner does.
    val mergedInst = CubeMeta.load(spark, cube, srcRoot,
      CubeMeta.MergedFile)
      .filter(_.baseBuildId.contains(srcLoaded.buildId))
      .map(_.inst)
    // the segment plan (src + mergedInst) was loaded ADJACENT to the
    // byte snapshot, not from it — re-read and require byte equality,
    // so a source build committing inside the planning window refuses
    // instead of committing a meta whose segments were never copied
    val metaBytes2 = Seq(CubeMeta.MergedFile, CubeMeta.MetaFile)
      .flatMap { f =>
        val from = new Path(srcCubeDirP, f)
        if (srcFs.exists(from)) Some(f -> readBytes(srcFs, from)) else None
      }
    val stable = metaBytes.map(_._1) == metaBytes2.map(_._1) &&
      metaBytes.zip(metaBytes2).forall { case ((_, a), (_, b)) =>
        java.util.Arrays.equals(a, b) }
    if (!stable)
      throw new IllegalStateException(
        s"migration refused: ${cube.name} meta changed under $srcRoot " +
          "while planning (concurrent build?) — retry when quiet")

    // overwrite = replace: UNCOMMIT the destination (delete its meta)
    // so the window serves no meta — never a mix of old and new
    // parquet under a still-committed meta — and a crash anywhere
    // mid-copy leaves data invisible to routing, same as a fresh
    // destination. The destination fleet's stamp checks see the
    // uncommit and stop routing this cube until the new meta lands.
    // This is deliberately the LAST step before data copies: every
    // refusal above (shared-tree conflicts, source planning
    // instability) reads source/destination state only and leaves the
    // destination fully routable.
    if (overwrite && dstMetaPresent)
      Seq(CubeMeta.MetaFile, CubeMeta.MergedFile).foreach { f =>
        val p0 = new Path(dstCubeDir, f)
        if (dstFs.exists(p0)) dstFs.delete(p0, false)
      }

    val segDirs = (src.cube.segments.map(_.name) ++
      mergedInst.toSeq.flatMap(_.cube.segments.map(_.name))).distinct
    segDirs.foreach { s =>
      val from = new Path(srcCubeDirP, s)
      if (srcFs.exists(from))
        replaceTree(srcFs, dstFs, from, new Path(dstCubeDir, s),
          skip = isMetaFile)
    }

    // ── the cube's derived-dim snapshots (shared per root, needed to
    // answer derived filters/group-bys at the destination). ADDITIVE:
    // an existing destination snapshot is write-once state other
    // committed cubes may be serving from — kept unless this is a
    // whole-root overwrite with no other committed cube
    src.cube.derived.map(_.lookup).distinct.foreach { l =>
      val from = new Path(Snapshot.path(srcRoot, l))
      val to = new Path(Snapshot.path(dstRoot, l))
      if (srcFs.exists(from)) {
        if (!dstFs.exists(to)) copyTree(srcFs, dstFs, from, to)
        else if (mayReplaceShared) replaceTree(srcFs, dstFs, from, to)
        // else: keep the destination's frozen rows (shared tree)
      }
    }

    // ── dictionary trees (dict-encoded measures decode at query
    // time; versions are directory entries, so the tree copy keeps
    // them all). The whole root-level tree travels: dict usage lives
    // inside measure closures, not CubeDef, so the columns THIS cube
    // needs are not introspectable. Per-COLUMN additive: absent
    // columns copy, existing ones replace only under the whole-root
    // overwrite; the conflicting case refused above, before any copy
    if (srcFs.exists(srcDictDir)) {
      srcFs.listStatus(srcDictDir).filter(_.isDirectory).foreach { c =>
        val to = new Path(dstP, s"dict/${c.getPath.getName}")
        if (!dstFs.exists(to)) copyTree(srcFs, dstFs, c.getPath, to)
        else if (mayReplaceShared) replaceTree(srcFs, dstFs, c.getPath, to)
        // else: the compatibility refusal above guaranteed the
        // destination already resolves every source id (src ⊆ dst) —
        // nothing to copy, and patching version dirs into a LIVE
        // column other committed cubes decode through is a
        // crash-window the migrator deliberately never opens
      }
    }

    // ── meta LAST, merged before primary: queries discover the cube
    // through the primary commit only
    metaBytes
      .filter { case (f, _) =>
        f != CubeMeta.MergedFile || mergedInst.isDefined }
      .foreach { case (f, bytes) =>
        writeBytes(dstFs, new Path(dstCubeDir, f), bytes)
      }

    CubeMeta.load(spark, cube, dstRoot).getOrElse(
      throw new IllegalStateException(
        s"migration committed but the destination meta does not load " +
          s"— $dstRoot/${cube.name}")).inst
  }
}
