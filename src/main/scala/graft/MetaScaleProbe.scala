package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cube._

/** METADATA-scale probe (VERDICT r16 item 3): the dim-range pruning +
  * stamp machinery's per-segment costs were only ever measured at 31
  * segments; a 100 TB cube has thousands. This main synthesizes cube
  * METADATA — no parquet data anywhere — at 125 → 2000 segments × 10
  * dims and measures what actually scales:
  *
  *  - `QueryRouter.plan` wall cost with dim-range pruning ON (every
  *    (segment, dim) carries a persisted range) vs OFF (no ranges) —
  *    the marginal cost per added segment must be flat across the
  *    doubling ladder, or pruning has a super-linear planner tax;
  *  - the plan-path memo population (DimRanges parse/cast/ddl memos,
  *    clear-on-overflow caps, DimRanges.MemoCap): a single plan whose working
  *    set exceeded a cap would clear-and-rebuild every plan — the
  *    probe reports live entry counts against the caps at the full
  *    2000×10 cardinality;
  *  - the per-process METADATA I/O at 2000 segments: `CubeMeta.save`
  *    (the meta commit), `CubeMeta.load` (one exists() per segment —
  *    the spot-check a serving process pays once), `MetaStamp.of`
  *    (what every stamp-aware reload pays), and the `HealthCheck`
  *    audit (one listStatus per segment dir).
  *
  * Times are steady-state medians over many reps after a JIT warmup;
  * plan() is driver-side metadata work, so no Spark job runs in the
  * timed paths (the session exists for the FS-backed meta section).
  */
object MetaScaleProbe {

  private val NDims = 10
  private val SegLadder = Seq(125, 250, 500, 1000, 2000)

  private def dims: Seq[String] = (1 to NDims).map(i => s"d$i")

  /** a synthetic instance: daily segments, one count measure, one
    * (base-only) cuboid, per-(segment, dim) BIGINT ranges laid out
    * disjointly so a window filter hits exactly 2 segments */
  private def mkInst(nSegs: Int, withRanges: Boolean,
                     root: String): CubeInstance = {
    val ds = dims
    val start = java.time.LocalDate.parse("2018-01-01")
    val segs = (0 until nSegs).map(i => Segment(f"s$i%04d",
      start.plusDays(i.toLong).toString,
      start.plusDays(i + 1L).toString))
    val cube = CubeDef(s"meta$nSegs", ds,
      Seq(Measure("n", fromRaw = count(lit(1)),
        fromState = s => sum(col(s)))),
      "ts", segs, Seq(ds.toSet))
    val baseId = cube.cuboidId(ds.toSet)
    val rows = segs.map(s => (s.name, baseId) -> 1000L).toMap
    // per-dim offsets make every (segment, dim) bound string DISTINCT
    // (d1 stays at offset 0 so the probe query's window math holds):
    // the parse memo then sees the full segments × dims × 2 working
    // set, the honest cardinality the cap headroom claim is about
    val ranges: Map[(String, String), DimRanges.DimRange] =
      if (!withRanges) Map.empty
      else (for {
        (s, i) <- segs.zipWithIndex
        (d, di) <- ds.zipWithIndex
      } yield (s.name, d) -> DimRanges.DimRange("BIGINT",
        Some((di * 100000000L + i * 1000L).toString),
        Some((di * 100000000L + i * 1000L + 999L).toString))
      ).toMap
    CubeInstance(cube, root, rows, Nil, ranges)
  }

  /** an id-window filter landing in exactly 2 segments mid-ladder */
  private def query(nSegs: Int): CubeQuery = {
    val mid = (nSegs / 2) * 1000L
    CubeQuery(Seq("d2"), Seq("n" -> "n"),
      filter = Some(col("d1") >= lit(mid) && col("d1") <= lit(mid + 1500L)),
      filterDims = Set("d1"))
  }

  private def timePlanUs(inst: CubeInstance, q: CubeQuery,
                         reps: Int): Double = {
    val t0 = System.nanoTime()
    var i = 0
    while (i < reps) {
      val p = QueryRouter.plan(inst, q)
      require(p.nonEmpty, "the synthetic plan must route")
      i += 1
    }
    (System.nanoTime() - t0) / 1e3 / reps
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JIT warmup on the smallest shape, both modes
    val warm = mkInst(SegLadder.head, withRanges = true, root = "/nowhere")
    val warmB = mkInst(SegLadder.head, withRanges = false, root = "/nowhere")
    (1 to 50).foreach { _ =>
      QueryRouter.plan(warm, query(SegLadder.head))
      QueryRouter.plan(warmB, query(SegLadder.head)): Unit
    }

    // ── the plan-cost ladder
    val ladder = SegLadder.map { n =>
      val pruned = mkInst(n, withRanges = true, root = "/nowhere")
      val blind = mkInst(n, withRanges = false, root = "/nowhere")
      val q = query(n)
      // sanity: pruning actually prunes to 2 segments; blind scans all
      val pPlan = QueryRouter.plan(pruned, q).get
      val bPlan = QueryRouter.plan(blind, q).get
      require(pPlan.overlapping.size == 2,
        s"expected 2 pruned segments at $n, got ${pPlan.overlapping.size}")
      require(bPlan.overlapping.size == n,
        s"blind plan must keep all $n segments")
      val reps = math.max(50, 20000 / n)
      // first timed call per instance is already memo-warm for THIS
      // instance's bound strings only after one pass — run one
      // untimed pass so the ladder times the steady state
      timePlanUs(pruned, q, 3): Unit
      timePlanUs(blind, q, 3): Unit
      val tp = timePlanUs(pruned, q, reps)
      val tb = timePlanUs(blind, q, reps)
      (n, tp, tb)
    }
    // marginal per-segment cost between ladder rungs (flatness check)
    val marginal = ladder.sliding(2).map {
      case Seq((n1, tp1, _), (n2, tp2, _)) =>
        f"""{"from":$n1,"to":$n2,""" +
          f""""marginal_us_per_seg":${(tp2 - tp1) / (n2 - n1)}%.4f}"""
      case _ => ""
    }.filter(_.nonEmpty).mkString("[", ",", "]")
    val ladderJson = ladder.map { case (n, tp, tb) =>
      f"""{"segments":$n,"plan_pruned_us":$tp%.1f,""" +
        f""""plan_blind_us":$tb%.1f,""" +
        f""""pruned_us_per_seg":${tp / n}%.4f,""" +
        f""""blind_us_per_seg":${tb / n}%.4f}"""
    }.mkString("[", ",", "]")

    // ── memo population at the full cardinality: plan once per dim so
    // every dim's 2000 bound-pairs enter the parse memo — the worst
    // realistic working set of one cube's plans
    val full = mkInst(SegLadder.max, withRanges = true, root = "/nowhere")
    dims.zipWithIndex.foreach { case (d, di) =>
      val off = di * 100000000L
      val q = CubeQuery(Seq("d2"), Seq("n" -> "n"),
        filter = Some(col(d) >= lit(off) && col(d) <= lit(off + 1500L)),
        filterDims = Set(d))
      QueryRouter.plan(full, q): Unit
    }
    val memoSizes = DimRanges.memoSizes
    val memoJson = memoSizes.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    // headroom = zero clear-on-overflow EVENTS, not small end-state
    // sizes (a cleared memo reads small again by report time)
    val memoHeadroom = memoSizes("clears") == 0 &&
      memoSizes.removed("clears").values.forall(_ < DimRanges.MemoCap)

    // ── thrash boundary: a 10-dim conjunction filter at 4000 segments
    // has a per-plan memo working set of 2 × 4000 × 10 = 80k bound
    // strings — ABOVE a 65,536 cap that would clear-and-rebuild on
    // every plan. The caps are sized for this (see DimRanges.memo);
    // the probe proves zero clears and a steady per-plan cost at the
    // worst realistic shape.
    val big = mkInst(4000, withRanges = true, root = "/nowhere")
    val allDimFilter = dims.zipWithIndex.map { case (dd, di) =>
      val off = di * 100000000L
      col(dd) >= lit(off) && col(dd) <= lit(off + 1500L)
    }.reduce(_ && _)
    val bigQ = CubeQuery(Seq("d2"), Seq("n" -> "n"),
      filter = Some(allDimFilter), filterDims = dims.toSet)
    val clearsBefore = DimRanges.memoSizes("clears")
    timePlanUs(big, bigQ, 3): Unit // populate
    val tBig = timePlanUs(big, bigQ, 20)
    val clearsAfter = DimRanges.memoSizes("clears")
    val thrashJson =
      f"""{"segments":4000,"filtered_dims":$NDims,""" +
        f""""working_set":${2 * 4000 * NDims},""" +
        f""""plan_us":$tBig%.1f,""" +
        s""""clears_during":${clearsAfter - clearsBefore}}"""

    // ── FS-backed metadata ops at 2000 segments (meta.json + the
    // segment dirs the load/audit probe — still zero parquet)
    val root = java.nio.file.Files
      .createTempDirectory("graft-meta-scale").toString
    val inst2k = mkInst(SegLadder.max, withRanges = true, root = root)
    val baseId = inst2k.cube.cuboidId(inst2k.cube.dims.toSet)
    val tSave0 = System.nanoTime()
    CubeMeta.save(spark, inst2k)
    val saveMs = (System.nanoTime() - tSave0) / 1e6
    inst2k.cube.segments.foreach(s => java.nio.file.Files
      .createDirectories(java.nio.file.Paths.get(
        inst2k.cuboidPath(s.name, baseId))): Unit)
    val tLoad0 = System.nanoTime()
    val loaded = CubeMeta.load(spark, inst2k.cube, root)
    val loadMs = (System.nanoTime() - tLoad0) / 1e6
    require(loaded.nonEmpty, "the 2000-segment meta must load")
    require(loaded.get.inst.dimRanges.size == SegLadder.max * NDims,
      "every persisted (segment, dim) range must round-trip")
    val tStamp0 = System.nanoTime()
    val stamp = MetaStamp.of(spark, root, inst2k.cube.name)
    val stampMs = (System.nanoTime() - tStamp0) / 1e6
    val tAudit0 = System.nanoTime()
    val findings = HealthCheck.check(spark, inst2k.cube, root)
    val auditMs = (System.nanoTime() - tAudit0) / 1e6

    val json =
      s"""{"metric":"meta_scale","dims":$NDims,""" +
        s""""ladder":$ladderJson,"marginal":$marginal,""" +
        s""""memo_entries":$memoJson,"memo_cap":${DimRanges.MemoCap},""" +
        s""""memo_headroom":$memoHeadroom,"thrash_probe":$thrashJson,""" +
        f""""meta2000":{"segments":${SegLadder.max},""" +
        f""""save_ms":$saveMs%.1f,"load_ms":$loadMs%.1f,""" +
        f""""stamp_ms":$stampMs%.1f,"audit_ms":$auditMs%.1f,""" +
        s""""audit_findings":${findings.size},""" +
        s""""stamp_nonempty":${stamp.toString.nonEmpty}}}"""
    println(json)
    try {
      val tmp = java.nio.file.Paths.get("target/meta_scale.json.tmp")
      java.nio.file.Files.write(tmp,
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp,
        java.nio.file.Paths.get("target/meta_scale.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    } catch { case _: java.io.IOException => () }
    spark.stop()
  }
}
