package graft.cube

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.json4s.DefaultFormats
import org.json4s.jackson.Serialization

/** Persisted cube-instance metadata (reference: core-cube/.../
  * CubeManager.java:143 — `CachedCrudAssist<CubeInstance>` backed by the
  * ResourceStore persists segments/statuses/sizes so a query server can
  * load and route on startup without rebuilding). graft's version: one
  * small `meta.json` per cube root, written as the LAST step of a
  * build/append (the metadata commit — cuboid parquet is unreachable
  * until the meta lands, so a crashed build never publishes a partial
  * cube), loaded by `CubeManager.ensure*` before any build fires.
  *
  * The `fingerprint` pins everything that shapes the on-disk layout
  * (dims order, materialized cuboid ids, measure state columns, shard,
  * derived/extended declarations): a CubeDef edit invalidates the
  * stored instance and forces a rebuild instead of routing queries
  * against stale parquet. `buildId` chains dependent artifacts — the
  * merged realization records the base build it was merged FROM and is
  * ignored (re-merged) when the base has been rebuilt since.
  */
object CubeMeta {

  /** the primary (multi-segment) realization */
  val MetaFile = "meta.json"
  /** the all-segments-merged realization kept alongside the primary
    * (a production swap would promote it to MetaFile; this harness
    * keeps both realizations queryable) */
  val MergedFile = "meta-merged.json"

  final case class Loaded(inst: CubeInstance, buildId: String,
                          baseBuildId: Option[String])

  private final case class SegJson(name: String, start: String, end: String)
  private final case class RowJson(segment: String, cuboid: Long, rows: Long)
  private final case class MetaJson(cube: String, fingerprint: String,
      buildId: String, baseBuildId: Option[String],
      segments: Seq[SegJson], rows: Seq[RowJson],
      /** post-build lattice evolution (optimizeCuboids): dim-name
        * lists of the added cuboids, OUTSIDE the fingerprint — a
        * metadata fact, not part of the declared CubeDef */
      extraCuboids: Option[Seq[Seq[String]]] = None,
      /** per-(segment, dim) observed value ranges for query-time
        * segment pruning (reference: CubeSegment's dimension_range_
        * info_map, DimensionRangeInfo.java). Outside the fingerprint
        * like extraCuboids — observed data facts, not declaration;
        * absent on metas written before the feature (⇒ no pruning) */
      dimRanges: Option[Seq[DimRangeJson]] = None)

  private final case class DimRangeJson(segment: String, dim: String,
      dt: String, min: Option[String], max: Option[String])

  private implicit val fmts: DefaultFormats = DefaultFormats

  /** canonical descriptor of the layout-shaping parts of a CubeDef —
    * human-readable on purpose (a mismatch names the drifted part).
    * Each measure pins its DEFINING aggregate expression too: editing a
    * measure's algebra without renaming it must invalidate the stored
    * states, or routed answers would silently diverge from the
    * fallback view. */
  def fingerprint(cube: CubeDef): String = {
    def algebra(m: Measure): String =
      scala.util.Try(org.apache.spark.sql.graftbridge.ColumnBridge
        .expressionTree(m.fromRaw).sql).getOrElse(m.fromRaw.toString)
    val ms = cube.measures.map(m =>
      s"${m.name}:${m.answers.getOrElse("")}:${m.topnShape.getOrElse("")}:" +
        algebra(m))
    Seq(
      s"dims=${cube.dims.mkString(",")}",
      s"cuboids=${cube.cuboids.map(cube.cuboidId).sorted.mkString(",")}",
      s"measures=${ms.mkString(";")}",
      s"segCol=${cube.segmentCol}",
      s"timeDim=${cube.timeDim.map(_.name).getOrElse("")}",
      s"shard=${cube.shardBy.getOrElse("")}",
      s"derived=${cube.derived.mkString(";")}",
      s"extended=${cube.extended.mkString(";")}",
      s"notNull=${cube.notNull.toSeq.sorted.mkString(",")}").mkString("|")
  }

  private def metaPath(root: String, cube: String, file: String): Path =
    new Path(s"$root/$cube/$file")

  /** Persist `inst` under its root. Returns the buildId written. */
  def save(spark: SparkSession, inst: CubeInstance,
           file: String = MetaFile,
           baseBuildId: Option[String] = None): String = {
    val buildId = java.util.UUID.randomUUID().toString
    // fingerprint the DECLARED def: cuboids added by optimizeCuboids
    // live in extraCuboids and must not read as def drift on load
    val declared = inst.cube.copy(cuboids =
      inst.cube.cuboids.filterNot(inst.extraCuboids.toSet))
    val meta = MetaJson(inst.cube.name, fingerprint(declared), buildId,
      baseBuildId,
      inst.cube.segments.map(s => SegJson(s.name, s.start, s.end)),
      inst.rows.toSeq.sortBy(r => (r._1._1, r._1._2))
        .map { case ((seg, id), n) => RowJson(seg, id, n) },
      extraCuboids =
        if (inst.extraCuboids.isEmpty) None
        else Some(inst.extraCuboids.map(_.toSeq.sorted)),
      dimRanges =
        if (inst.dimRanges.isEmpty) None
        else Some(inst.dimRanges.toSeq
          .sortBy { case ((s, d), _) => (s, d) }
          .map { case ((s, d), r) =>
            DimRangeJson(s, d, r.dt, r.min, r.max) }))
    val p = metaPath(inst.root, inst.cube.name, file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // write-then-rename: readers never observe a torn meta file
    val tmp = new Path(p.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(Serialization.write(meta).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // rename OVER the destination where the FS supports it (HDFS/local
    // via FileContext are atomic) — delete-then-rename would open a
    // window where a concurrent reader sees no meta and triggers a
    // spurious rebuild (ADVICE r8). The fallback keeps the .tmp until
    // the destination is replaced, and `load` reads the .tmp when the
    // primary is missing, so even a crash inside the fallback never
    // presents an empty meta.
    try {
      val ctx = org.apache.hadoop.fs.FileContext.getFileContext(
        p.toUri, spark.sparkContext.hadoopConfiguration)
      ctx.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: Exception =>
        if (fs.exists(p)) fs.delete(p, false)
        fs.rename(tmp, p)
    }
    buildId
  }

  /** Load a persisted instance for `cube` from `root`, or None when
    * the meta is absent/torn, the fingerprint doesn't match the code's
    * CubeDef, or the on-disk layout is missing pieces (base cuboid per
    * segment, snapshots for declared derived dims) — any miss means
    * the caller rebuilds, never routes against stale parquet. The
    * returned instance carries the PERSISTED segment list (appends and
    * merges evolve it past the def's declared seed segments). */
  def load(spark: SparkSession, cube: CubeDef, root: String,
           file: String = MetaFile): Option[Loaded] =
    scala.util.Try {
      val primary = metaPath(root, cube.name, file)
      val fs = primary.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // tolerate the in-flight .tmp as a fallback read: on stores where
      // the overwrite-rename isn't atomic, a reader landing between
      // delete and rename must not conclude the cube needs a rebuild.
      // Only a FRESH .tmp qualifies — save's write→rename window is
      // milliseconds, so a .tmp older than a minute is an orphan from
      // a crashed save, and trusting it would resurrect stale metadata
      // as current (e.g. after the primary was deleted to force a
      // rebuild). Age-gating instead of delete-after-read keeps
      // readers from racing a concurrent save's freshly-written .tmp.
      // CONTRACT (ADVICE r10): the freshness compare mixes the reader's
      // wall clock with the STORE's mtime, so it assumes the two agree
      // within the 60s gate — true for a local FS and any NTP-synced
      // cluster. Under larger skew the failure is bounded: positive
      // skew refuses a genuinely in-flight .tmp (a spurious rebuild,
      // never staleness); negative skew can admit an orphan, but the
      // fingerprint + layout-completeness checks below still hold it
      // to the current CubeDef and existing parquet, so the worst case
      // is re-serving the last committed layout, not a torn one. A
      // store with unbounded skew should disable the fallback by
      // deleting orphaned .tmp files in its deployment hygiene.
      val tmpP = new Path(primary.toString + ".tmp")
      def tmpFresh: Boolean = scala.util.Try {
        System.currentTimeMillis() -
          fs.getFileStatus(tmpP).getModificationTime < 60000L
      }.getOrElse(false)
      val p =
        if (fs.exists(primary)) primary
        else if (tmpFresh) tmpP
        else primary
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val bytes =
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](8192)
            Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
              .foreach(n => buf.write(chunk, 0, n))
            buf.toString(StandardCharsets.UTF_8.name())
          } finally in.close()
        val meta = Serialization.read[MetaJson](bytes)
        if (meta.cube != cube.name || meta.fingerprint != fingerprint(cube)
            || meta.segments.isEmpty) None
        else {
          val segs = meta.segments.map(s => Segment(s.name, s.start, s.end))
          // re-attach the evolved lattice: cuboids optimizeCuboids
          // materialized after the declared build (metadata-only — the
          // fingerprint above compared the DECLARED def)
          val extras = meta.extraCuboids.getOrElse(Nil).map(_.toSet)
            .filter(c => c.nonEmpty && c.subsetOf(cube.dims.toSet) &&
              !cube.cuboids.contains(c))
          val inst = CubeInstance(
            cube.copy(segments = segs, cuboids = cube.cuboids ++ extras),
            root,
            meta.rows.map(r => (r.segment, r.cuboid) -> r.rows).toMap,
            extras,
            // ranges for segments no longer in the meta are dropped;
            // segments without persisted ranges simply never prune
            meta.dimRanges.getOrElse(Nil)
              .filter(r => segs.exists(_.name == r.segment))
              .map(r => (r.segment, r.dim) ->
                DimRanges.DimRange(r.dt, r.min, r.max)).toMap)
          // spot-check the layout the meta points at: the base cuboid
          // of every segment plus one snapshot per derived-dim lookup
          // (O(n) metadata calls, once per process)
          val baseId = cube.cuboidId(cube.dims.toSet)
          val complete =
            segs.forall(s =>
              fs.exists(new Path(inst.cuboidPath(s.name, baseId)))) &&
              inst.cube.derived.map(_.lookup).distinct.forall(l =>
                fs.exists(new Path(Snapshot.path(root, l))))
          if (complete) Some(Loaded(inst, meta.buildId, meta.baseBuildId))
          else None
        }
      }
    }.toOption.flatten
}
