package graft.cube

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._
import graft.Exact._
import graft.functions.Measures

/** Owns the default test cube (the TPC-H-ish star model of SURVEY §4)
  * and memoizes one built instance per sf dir per JVM — queries route
  * against the built parquet, mirroring Kylin's build-once/query-many
  * lifecycle. The build is the "offline" phase; Bench times it
  * separately from query latencies.
  */
object CubeManager {

  def cubeRoot: String =
    sys.env.getOrElse("GRAFT_CUBE_ROOT", "/root/repo/target/graft-cubes")

  /** Flat table = materialized star join (reference:
    * CreateFlatTable.scala:1-241): fact lineitem ⋈ orders ⋈ customer ⋈
    * nation ⋈ region ⋈ supplier ⋈ part, plus derived dim columns and
    * pre-computed measure input columns. Only the BOUNDED lookups
    * (nation/region — fixed cardinality at any SF) are hint-broadcast;
    * the fact-scaled ones (customer/supplier/part/orders) ride
    * size-based auto-broadcast/AQE and degrade to shuffle joins at
    * scale (r19 100× fix, pinned by CubeSpec).
    */
  def flatTable(s: SparkSession, d: String): DataFrame =
    flatTableFrom(lineitem(s, d), orders(s, d), customer(s, d),
      nation(s, d), region(s, d), supplier(s, d), part(s, d))

  /** flat table over a WIDENED fact scan (guide §2.5, no-op at scale) —
    * opt-IN per consumer, exactly like Tables.widened: the r22 probe
    * showed every flat-table consumer paying a 0.35–1.44 s serial
    * 3-task join stage on the single-row-group fact scan, but the r22
    * bench A/B of widening flatTable ITSELF split the consumers two
    * ways: heavy per-row aggregates (the pushdown fallback's decimal
    * sum, the percentile exact sides' value→count maps) win 1.1–2×,
    * while light/distinct-shaped ones (cube_sql_fallback's min/count,
    * the hll/approx exact sides whose distinct shuffle already
    * parallelizes after its first exchange) consistently LOSE 1.3–1.7×
    * to the extra round-robin exchange (two gated runs,
    * BENCH_local_r22_before vs the widen-all mid runs). The shared
    * `flatTable` — which also backs the GraftSql pushdown view, where
    * query weight is unknowable — therefore stays UNWIDENED. */
  def flatTableWidened(s: SparkSession, d: String): DataFrame =
    flatTableFrom(graft.Tables.widened(s, d, "lineitem"), orders(s, d),
      customer(s, d), nation(s, d), region(s, d), supplier(s, d),
      part(s, d))

  /** flat table over explicit inputs — the build path passes
    * snapshot-backed lookup tables (reference DFSnapshotBuilder) so a
    * segment rebuild joins the same dimension rows the cube was built
    * with even if the live tables changed since */
  def flatTableFrom(lineitem: DataFrame, orders: DataFrame,
                    customer: DataFrame, nation: DataFrame,
                    region: DataFrame, supplier: DataFrame,
                    part: DataFrame): DataFrame =
    // joins come from the MODEL (each edge's declared inner/left type),
    // so the built flat table and the SQL matcher can never disagree.
    // Only the BOUNDED lookups are broadcast-hinted: nation/region
    // have fixed real-world cardinality (25/5 rows at any SF), but
    // supplier and part GROW with the fact table — the cube-path 100×
    // probe caught the old unconditional hint turning the flat write
    // super-linear (a 2M-row forced broadcast; at 100 TB it would be
    // billions of rows and an OOM). Size-based auto-broadcast + AQE
    // still broadcast them whenever they are actually small, so the
    // plan is unchanged at bench scale and correct at every scale.
    starModel.flatten(Map(
      "lineitem" -> lineitem, "orders" -> orders, "customer" -> customer,
      "nation" -> broadcast(nation), "region" -> broadcast(region),
      "supplier" -> supplier, "part" -> part))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("r_name"), col("n_name"), col("c_mktsegment"),
        col("o_orderstatus"), col("o_orderpriority"),
        col("l_returnflag"), col("p_brand"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"),
        col("o_orderdate"),
        col("l_quantity"), col("o_custkey"), col("l_extendedprice"),
        // the raw discount rides along so user SQL can spell out the
        // revenue algebra literally (SUM(l_extendedprice*(1-l_discount)))
        // and still match the pre-computed measure
        col("l_discount"),
        discPrice(col("l_extendedprice"), col("l_discount")).as("disc_price"),
        (discPrice(col("l_extendedprice"), col("l_discount")) * 10000)
          .cast(LongType).as("disc_price_micros"),
        when(col("l_quantity") >= 49.5, col("l_extendedprice"))
          .as("raw_hi_price"),
        col("c_name"))

  /** The star model behind the default cube (reference: core-metadata
    * DataModelDesc): lineitem fact, each lookup joined through its
    * PK-FK edge. User SQL written as these explicit joins — with each
    * join TYPED as declared — routes to the cube via ModelMatcher. The
    * part edge is declared LEFT (the common production choice,
    * JoinDesc.java:35-40): fact rows keep flowing even if a part row
    * is missing, and only user-written LEFT JOIN part queries match. */
  def starModel: ModelDef = ModelDef("lineitem", Seq(
    ModelEdge("orders", "lineitem", "o_orderkey", "l_orderkey"),
    ModelEdge("customer", "orders", "c_custkey", "o_custkey"),
    ModelEdge("nation", "customer", "n_nationkey", "c_nationkey"),
    ModelEdge("region", "nation", "r_regionkey", "n_regionkey"),
    ModelEdge("supplier", "lineitem", "s_suppkey", "l_suppkey"),
    ModelEdge("part", "lineitem", "p_partkey", "l_partkey",
      joinType = "left")))

  /** The default cube: 7 dims, 8 measures covering every reference
    * measure family, 2-year segments over o_orderdate, and a 7-cuboid
    * materialized lattice subset (agg-group-pruned, like the
    * reference's aggregation groups). */
  def defaultCube: CubeDef = {
    // o_month LEADS the dim (rowkey) order: writeCuboid sorts rows by
    // this sequence, so the time dim first makes row-group min/max
    // stats on it disjoint ordered slices — residual month filters
    // (partially-overlapped segments) prune row groups at the scan.
    // Matches the reference's rowkey-design guidance of placing the
    // partition date column at the head of the rowkey
    // (RowKeyColDesc order in core-cube; Repartitioner.java:156-161
    // sorts by that order on write).
    val dims = Seq("o_month", "r_name", "n_name", "c_mktsegment",
                   "o_orderstatus", "l_returnflag", "p_brand")
    val measures = Seq(
      Measure("revenue",
        fromRaw = sum(col("disc_price")),
        fromState = s => sum(col(s)),
        present = _.cast(DoubleType),
        answers = Some(SqlAgg.SumOf("disc_price")),
        // the literal TPC-H algebra also answers from this measure
        // (FunctionDesc parameter matching, canonicalized-tree equality)
        answersSumOf =
          Some(discPrice(col("l_extendedprice"), col("l_discount")))),
      Measure("qty",
        fromRaw = sum(dec(col("l_quantity"))),
        fromState = s => sum(col(s)),
        present = _.cast(DoubleType),
        answers = Some(SqlAgg.SumOf("l_quantity"))),
      Measure("nrows",
        fromRaw = count(lit(1)),
        fromState = s => sum(col(s)),
        answers = Some(SqlAgg.CountAll)),
      // basic min/max family (reference measure/basic): states merge
      // losslessly through layered re-agg; exact on doubles (no sums)
      Measure("qty_min",
        fromRaw = min(col("l_quantity")),
        fromState = s => min(col(s)),
        answers = Some(SqlAgg.MinOf("l_quantity"))),
      Measure("price_max",
        fromRaw = max(col("l_extendedprice")),
        fromState = s => max(col(s)),
        answers = Some(SqlAgg.MaxOf("l_extendedprice"))),
      // DimCountDistinct family (reference measure/dim/
      // DimCountDistinctMeasureType): exact distinct via the value SET
      // itself — for low-cardinality columns with no dictionary/bitmap;
      // the reference guards cardinality the same way
      Measure("prio_set",
        fromRaw = collect_set(col("o_orderpriority")),
        fromState = s => array_distinct(flatten(collect_list(col(s)))),
        present = c => size(c).cast(LongType),
        answers = Some(SqlAgg.CountDistinctOf("o_orderpriority"))),
      // extended-column value measure: o_year is functionally
      // determined by o_month, so max() IS the value
      // (ExtendedColumnMeasureType — keeps o_year out of cuboid dims)
      Measure("o_year_ext",
        fromRaw = max(col("o_year")),
        fromState = s => max(col(s))),
      Measure("cust_bitmap",
        fromRaw = Measures.bitmapAgg(col("o_custkey")),
        fromState = s => Measures.bitmapUnion(col(s)),
        present = Measures.bitmapCount(_),
        answers = Some(SqlAgg.CountDistinctOf("o_custkey"))),
      Measure("cust_hll",
        fromRaw = Measures.hllAgg(col("o_custkey")),
        fromState = s => Measures.hllUnion(col(s)),
        present = Measures.hllEstimate(_),
        answers = Some(SqlAgg.ApproxDistinctOf("o_custkey")),
        heavyState = true),
      Measure("brand_topn",
        fromRaw = Measures.topnAgg(col("p_brand"), col("disc_price_micros")),
        fromState = s => Measures.topnUnion(col(s)),
        topnShape = Some(TopNShape(Seq("p_brand"), "disc_price", 10000L))),
      // multi-column TopN (reference TopNMeasureType.java:129-148 groups
      // by multiple literal columns): sketch keyed on (p_brand,
      // c_mktsegment), same SpaceSaving state
      Measure("brandseg_topn",
        fromRaw = Measures.topnAggMulti(Seq(col("p_brand"),
          col("c_mktsegment")), col("disc_price_micros")),
        fromState = s => Measures.topnUnion(col(s)),
        topnShape = Some(TopNShape(Seq("p_brand", "c_mktsegment"),
          "disc_price", 10000L))),
      Measure("qty_kll",
        fromRaw = Measures.kllAgg(col("l_quantity")),
        fromState = s => Measures.kllUnion(col(s)),
        present = Measures.kllQuantile(_, lit(0.5)),
        answers = Some(SqlAgg.PercentileOf("l_quantity"))),
      Measure("raw_hi",
        fromRaw = collect_list(col("raw_hi_price")),
        fromState = s => flatten(collect_list(col(s)))),
      // bitmap over a STRING column via the global dictionary the build
      // phase attaches (c_name_id) — reference DFDictionaryBuilder path
      Measure("cname_bitmap",
        fromRaw = Measures.bitmapAgg(col("c_name_id")),
        fromState = s => Measures.bitmapUnion(col(s)),
        present = Measures.bitmapCount(_)))
    val segs = Seq(
      Segment("s1995", "1995-01-01", "1997-01-01"),
      Segment("s1997", "1997-01-01", "1999-01-01"),
      Segment("s1999", "1999-01-01", "2001-01-01"),
      Segment("s2001", "2001-01-01", "2003-01-01"))
    val all = dims.toSet
    val cuboids = Seq(
      all,
      Set("r_name", "n_name", "o_orderstatus", "l_returnflag", "o_month"),
      Set("o_orderstatus", "l_returnflag", "p_brand"),
      Set("o_orderstatus", "l_returnflag"),
      Set("r_name", "n_name"),
      Set("c_mktsegment", "o_month"),
      Set("o_month"))
    CubeDef("star", dims, measures, "o_orderdate", segs, cuboids,
      timeDim = Some(TimeDim.month("o_month")),
      shardBy = Some("r_name"),
      // nation attributes not materialized in any cuboid, answered by
      // joining the nation snapshot on n_name (CubeDesc derivedToHostMap)
      derived = Seq(DerivedDim("n_nationkey", "n_name", "nation"),
                    DerivedDim("n_regionkey", "n_name", "nation")),
      // TPC-H NOT NULL contract — gates the AVG → SUM/COUNT(*) rewrite
      // (and its expression form, which checks the INPUT columns)
      notNull = Set("disc_price", "l_quantity", "l_extendedprice",
        "l_discount"),
      extended = Seq(ExtendedColumn("o_year", "o_month", "o_year_ext")),
      // TPC-H order dates are calendar days stored at midnight — the
      // partition-column day contract holds, so BETWEEN/<=/= day
      // predicates convert to exact [day, day) segment ranges
      segDayGranular = true,
      // the build dictionary-encodes c_name (→ c_name_id, feeding
      // cname_bitmap) through this root's append-stable tree
      dictColumns = Set("c_name"))
  }

  // ── a second cube over the events stream table: the engine is
  // multi-cube generic (Kylin projects hold many cubes); day-granular
  // segments + residual pruning on ev_day
  def eventsFlat(s: SparkSession, d: String): DataFrame =
    events(s, d).select(col("ts"),
      date_format(col("ts"), "yyyy-MM-dd").as("ev_day"),
      col("event_type"), col("user_id"), col("value"))

  def eventsCube: CubeDef = {
    val measures = Seq(
      Measure("n_events",
        fromRaw = count(lit(1)),
        fromState = s => sum(col(s)),
        answers = Some(SqlAgg.CountAll)),
      Measure("value_sum",
        fromRaw = sum(dec(col("value"))),
        fromState = s => sum(col(s)),
        present = _.cast(DoubleType),
        answers = Some(SqlAgg.SumOf("value"))),
      Measure("user_bitmap",
        fromRaw = Measures.bitmapAgg(col("user_id")),
        fromState = s => Measures.bitmapUnion(col(s)),
        present = Measures.bitmapCount(_),
        answers = Some(SqlAgg.CountDistinctOf("user_id"))))
    val dims = Seq("ev_day", "event_type")
    CubeDef("events", dims, measures, "ts",
      Seq(Segment("s2024m1", "2024-01-01", "2024-02-01")),
      Seq(dims.toSet, Set("ev_day"), Set("event_type")),
      // day boundaries are always expressible on ev_day
      timeDim = Some(TimeDim("ev_day", d => Some(d.substring(0, 10)))),
      notNull = Set("value"))
  }

  /** a memoized instance plus the buildId stamp(s) it was loaded or
    * built under — [[MetaStamp]] revalidates the stamp on every
    * ensure* call (one getFileStatus steady-state), so a long-running
    * serving JVM reloads metadata another PROCESS committed (segment
    * append/refresh/merge) instead of routing stale segments until
    * restart. Reference: core-metadata CachedCrudAssist.java
    * reload-on-access + server-base CacheService/Broadcaster — graft
    * replaces the push broadcast with a cheap pull stamp, which a
    * shared store makes race-free (the meta commit is the publish). */
  private val built = TrieMap.empty[String, (CubeInstance, String)]
  private val evBuilt = TrieMap.empty[String, (CubeInstance, String)]
  /** JSON-declared cubes ([[CubeJson]]), keyed `<cube name>|<sfDir>` —
    * one registry holds every runtime declaration */
  private val declaredBuilt = TrieMap.empty[String, (CubeInstance, String)]
  /** merged realization: chained to BOTH its own meta-merged.json
    * stamp and the base build it merged from */
  private val mergedCache =
    TrieMap.empty[String, (CubeInstance, String, String)]
  private val lock = new Object

  /** PER-(root, cube) build locks for [[ensureFresh]] — the in-JVM
    * mirror of the cross-process `_building` lease granularity
    * (root/<cube>/_building): one JVM deploying several cubes must
    * build them CONCURRENTLY (two members of a shared root overlap
    * everything but their dict phases — DictLeaseContentionSpec),
    * which a single global build lock silently forbade. Same-cube
    * callers still serialize (one build per miss); the rare
    * lifecycle ops that guard their own memos (retain / ensureMerged
    * / ensureHybrid) keep the coarse `lock` and only ever take a
    * build lock NESTED INSIDE it, so lock ordering is global → key
    * and cannot deadlock. */
  private val buildLocks = TrieMap.empty[String, Object]
  private def buildLock(root: String, cubeName: String): Object =
    buildLocks.getOrElseUpdate(s"$root/$cubeName", new Object)

  /** drop the per-JVM memo (simulated process restart in specs): the
    * next ensure* must come back through CubeMeta.load, not a rebuild.
    * The SQL result cache keys on these instances' stamps, so it must
    * reset with them (ADVICE r10). */
  private[graft] def resetMemos(): Unit = {
    built.clear(); evBuilt.clear(); mergedCache.clear(); hybridBuilt.clear()
    declaredBuilt.clear(); fleetEnum.clear()
    // buildLocks deliberately NOT cleared: minting a fresh lock object
    // while a build holds the old one would let a same-cube build run
    // concurrently (the ioLocks/clearPending hazard); the map is
    // bounded at one Object per (root, cube) ever touched
    GraftSql.clearResultCache()
  }

  /** every instance this process has built or loaded for `sfDir` so
    * far — NO build forced (cache-invalidation stamps read this: a
    * cube never touched in this process can't have produced a cached
    * result either, so its absence from the stamp set is consistent
    * with routing's own view of the world; its first touch changes
    * the set and thus the key) */
  private[graft] def loadedInstances(sfDir: String): Seq[CubeInstance] =
    built.get(sfDir).map(_._1).toSeq ++ evBuilt.get(sfDir).map(_._1).toSeq ++
      mergedCache.get(sfDir).map(_._1).toSeq ++
      hybridBuilt.get(sfDir).toSeq.flatMap(_._1.slices.map(_.inst)) ++
      declaredBuilt.collect {
        case (k, (inst, _)) if k.endsWith(s"|$sfDir") => inst
      }

  private def sfName(sfDir: String): String =
    sfDir.replaceAll("/+$", "").split('/').last

  /** The storage root a DECLARED cube lives under — computable without
    * touching the store, for read-only tools that must not trigger a
    * first-touch build. CONTRACT: the root embeds the sf dir's
    * BASENAME only, so two dataset dirs sharing a basename (/a/sf1 and
    * /b/sf1) would share every declared root and cross-serve each
    * other's data — deployments must give dataset dirs distinct
    * basenames (true of every driver sf dir; a fleet pointing many
    * same-named warehouses at one cube root has bigger problems). */
  def declaredRoot(sfDir: String, cubeName: String): String =
    s"$cubeRoot/${sfName(sfDir)}-$cubeName"

  /** the storage root of a DECLARED document, honoring its optional
    * `rootScope` (several declarations — e.g. a hybrid's members —
    * share one multi-cube root so the root-level dictionary is one
    * append-stable id space; see CubeJson.JsonCube.rootScope) */
  def declaredRootOf(sfDir: String, spec: CubeJson.JsonCube): String =
    declaredRoot(sfDir, spec.rootScope.getOrElse(spec.name))

  /** The realization stamp set read straight FROM THE SHARED STORE —
    * one (meta path, cube, committed buildId) triple per committed
    * realization meta under this sf's cube roots, enumerated by
    * LISTING the store rather than by any per-process registry. Two
    * processes (or one process before/after a restart) therefore
    * compute the SAME set for the same on-disk state — the property
    * the fleet-cache key needs, which per-JVM `loadedInstances`-based
    * stamps cannot give (a fresh memo is empty) and an in-memory
    * declared-cube registry cannot either (the other process never saw
    * the registration). Every commit anywhere in the fleet (build,
    * append, merge, a new declared cube's first build, a GC'd meta)
    * changes the set. Cost: two listStatus levels + one getFileStatus
    * per committed meta (MetaStamp memoizes inside the optional
    * recheck window for object-store QPS). */
  /** the enumeration half of [[fleetStamps]] (the two listStatus
    * levels) memoized per sf for a short window: it names WHICH meta
    * files exist — a set that changes only when a brand-new cube root
    * or realization file first appears, so a ≤window-stale listing can
    * at worst delay a NEW realization's entry into the key (one benign
    * extra recompute window), never hide a data change — data changes
    * land in EXISTING metas, whose stamps are read fresh below on
    * every call. Without this memo, every L1-hit query at fleet-tier
    * QPS would pay the listing round-trips the cache exists to avoid. */
  private val fleetEnum =
    TrieMap.empty[String, (Long, Seq[(String, String, String)])]
  private[graft] val FleetEnumWindowMs = 5000L

  private def fleetEnumerate(spark: SparkSession,
      sf: String): Seq[(String, String, String)] = {
    val base = new org.apache.hadoop.fs.Path(cubeRoot)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val roots = scala.util.Try(fs.listStatus(base).toSeq).getOrElse(Nil)
      .filter(st => st.isDirectory && {
        val n = st.getPath.getName
        n == sf || n.startsWith(s"$sf-")
      })
    for {
      r <- roots
      c <- scala.util.Try(fs.listStatus(r.getPath).toSeq).getOrElse(Nil)
      if c.isDirectory
      file <- Seq(CubeMeta.MetaFile, CubeMeta.MergedFile)
      if fs.exists(new org.apache.hadoop.fs.Path(c.getPath, file))
    } yield (r.getPath.toString, c.getPath.getName, file)
  }

  private[graft] def fleetStamps(spark: SparkSession,
      sfDir: String): Seq[(String, String, String)] = {
    val sf = sfName(sfDir)
    val now = System.currentTimeMillis()
    val cands = fleetEnum.get(sf) match {
      case Some((at, c)) if now - at < FleetEnumWindowMs => c
      case _ =>
        val c = fleetEnumerate(spark, sf)
        fleetEnum.put(sf, (now, c))
        c
    }
    // stamps are read FRESH per call (MetaStamp memoizes under its own
    // optional recheck window): a commit to any enumerated meta flips
    // the key immediately; a meta deleted since enumeration stamps
    // Absent and drops out
    cands.flatMap { case (root, cube, file) =>
      val id = MetaStamp.of(spark, root, cube, file)
      if (id == MetaStamp.Absent) None
      else Some((s"$root/$cube/$file", cube, id))
    }.sortBy(_._1)
  }

  /** a memoized id keeps serving when the fresh stamp matches it — or
    * when the stamp read failed transiently ([[MetaStamp.Unavailable]]):
    * a store hiccup on the query hot path must degrade to serving the
    * memo, never to a spurious reload or rebuild */
  private def stampServes(fresh: String, memoized: String): Boolean =
    fresh == memoized || fresh == MetaStamp.Unavailable

  /** generic stamp-aware memo step: serve the memoized instance while
    * its on-disk buildId is unchanged (one getFileStatus); on drift —
    * another process committed a build/append/refresh — reload via the
    * given loader, and only when the loader misses (no meta,
    * fingerprint drift, incomplete layout) pay the build */
  private def ensureFresh(memo: TrieMap[String, (CubeInstance, String)],
      spark: SparkSession, key: String, root: String, cube: CubeDef)(
      build: => CubeInstance): CubeInstance = {
    def stamp() = MetaStamp.of(spark, root, cube.name)
    memo.get(key) match {
      case Some((inst, id)) if stampServes(stamp(), id) => inst
      case _ => buildLock(root, cube.name).synchronized {
        // double-check under the lock (another thread may have
        // refreshed while we waited)
        memo.get(key).filter { case (_, id) => stampServes(stamp(), id) }
          .map(_._1).getOrElse {
            // memoize the buildId READ WITH the instance (Loaded pairs
            // them from one file read) — stamping after the load would
            // blind the detector to a foreign commit landing in
            // between: stamp() would return the NEWER id, pair it with
            // the OLDER instance, and every later call would see
            // "no drift" while routing stale segments
            val (inst, id) = CubeMeta.load(spark, cube, root)
              .map(l => (l.inst, l.buildId))
              .getOrElse {
                // the build runs under the cross-process lease: a
                // second builder racing this root waits and loads the
                // winner's committed meta instead of rebuilding. After
                // OUR build, re-load for the same atomic (inst, id)
                // pairing — if a foreign commit already superseded our
                // meta, the re-load returns THEIR newer state
                BuildLease.withLease(spark, root, cube.name)(
                  CubeMeta.load(spark, cube, root)
                    .map(l => (l.inst, l.buildId))) {
                  val b = build
                  CubeMeta.load(spark, cube, root)
                    .map(l => (l.inst, l.buildId))
                    .getOrElse((b, stamp()))
                }
              }
            memo.put(key, (inst, id))
            inst
          }
      }
    }
  }

  /** Load-or-build (once per JVM per sf dir) and return the instance.
    * A fresh process finds the metadata a previous build committed
    * (CubeMeta — reference CubeManager.java:143 loads CubeInstance from
    * the ResourceStore) and routes immediately; only a miss — no meta,
    * fingerprint drift, incomplete layout — pays the build. The memo is
    * STAMP-AWARE: a buildId drift (another process appended/refreshed)
    * reloads the committed meta without a restart. */
  def ensureBuilt(spark: SparkSession, sfDir: String): CubeInstance = {
    val root = s"$cubeRoot/${sfName(sfDir)}"
    ensureFresh(built, spark, sfDir, root, defaultCube)(
      buildStar(spark, sfDir, root))
  }

  /** The full star build pipeline at an explicit root — the closure
    * [[ensureBuilt]] runs under its lease, factored out so
    * BuildResumeSpec can drive a crash + resume against its own root.
    * STEP-RESUMABLE (VERDICT r15 item 1): every phase is markered
    * under the attempt's [[BuildJob]] id — snapshots are write-once
    * already, the dictionary column and materialized flat table skip
    * when their markers match the attempt, and the cuboid layers
    * resume per-dir inside [[CubeBuilder.build]]. The meta still
    * commits once, at the very end. */
  private[graft] def buildStar(spark: SparkSession, sfDir: String,
                               root: String): CubeInstance = {
    val job = BuildJob.begin(spark, defaultCube, root)
    // lookup tables are snapshotted under the cube root (write-once,
    // _SUCCESS-gated) so rebuilds join frozen dimension rows —
    // DFSnapshotBuilder
    val snap = (n: String) =>
      Snapshot.ensure(spark, tbl(spark, sfDir, n), root, n)
    val flatPath = s"$root/flat"
    if (!BuildJob.dirDone(spark, job, flatPath)) {
      val flat = CubeBuilder.timed("snapshots", "star") {
        // fact scan widened (guide §2.5; no-op at scale): the 6-way
        // join + dictionary distinct + encoded flat WRITE otherwise
        // serialize on the single-row-group test scan, and the flat
        // parquet then lands as 1-3 single-row-group files that
        // re-serialize every segment's BASE cuboid aggregate (the
        // heaviest build stage — 8 measure states incl. bitmap/HLL).
        flatTableFrom(
          graft.Tables.widened(spark, sfDir, "lineitem"),
          orders(spark, sfDir), snap("customer"),
          snap("nation"), snap("region"), snap("supplier"), snap("part"))
      }
      // dictionary-encode string bitmap inputs before the build
      // (reference DFTableEncoder: encode once on the flat table).
      // buildOrAppend persists the dictionary under the cube root
      // and keeps ids append-stable across incremental builds — and
      // that append form IS the resume semantics: a "skip the scan"
      // marker would freeze the dictionary at crash time against a
      // flat derived from sources that may have changed since, and
      // unseen values would encode to null ids (bitmap undercounts).
      // Re-running is idempotent and appends only what's new; the
      // resume's savings live in the flat/cuboid phases.
      val dict = CubeBuilder.timed("dictionary", "c_name") {
        Dictionary.buildOrAppend(spark, flat, "c_name", root)
      }
      // Materialize the encoded flat table once (reference
      // CreateFlatTable writes it to storage before the cuboid
      // build): the four concurrent segment builds then read a
      // pruned, predicate-pushed parquet scan instead of each
      // recomputing the star join. The marker lands INSIDE the dir
      // (the overwrite of a retry clears it with the partial data),
      // after the write returned.
      CubeBuilder.timed("flat-write", "star") {
        Dictionary.encode(flat, dict, "c_name")
          .write.mode("overwrite").parquet(flatPath)
      }
      BuildJob.markDir(spark, job, flatPath)
    }
    CubeBuilder.build(spark, spark.read.parquet(flatPath),
      defaultCube, root)
  }

  /** Load-or-build (once per JVM per sf dir) the events cube;
    * stamp-aware like [[ensureBuilt]]. */
  def ensureEventsBuilt(spark: SparkSession, sfDir: String): CubeInstance = {
    val root = s"$cubeRoot/${sfName(sfDir)}-events"
    ensureFresh(evBuilt, spark, sfDir, root, eventsCube)(
      CubeBuilder.build(spark, eventsFlat(spark, sfDir), eventsCube, root))
  }

  /** Dictionary-encode `flat0` through the root's trees — ALWAYS
    * under the root-level `dict` lease: a shared root (rootScope)
    * hosts several cubes whose builds hold DIFFERENT member leases,
    * and unserialized buildOrAppend races could both mint the same
    * next version — one side's new ids would vanish (encode-to-null,
    * silently undercounted bitmaps). The lease is unconditional
    * because scope-ness is a property of the DOCUMENT, not the root:
    * an unscoped declaration whose name equals another document's
    * rootScope lands on the same root, and a forked guard (leased for
    * one, not the other) would reintroduce the exact race. Cost on a
    * private root: one lease acquire per dictionary-bearing build —
    * milliseconds against the build. ONE spelling for the declared
    * build, the CLI append/refresh, and stream promotion — the race
    * guard must not fork. */
  private[cube] def dictEncode(spark: SparkSession,
      spec: CubeJson.JsonCube, flat0: DataFrame,
      root: String): DataFrame =
    if (spec.dictColumns.isEmpty) flat0
    else BuildLease.withLease(spark, root, "dict")(
      Option.empty[DataFrame]) {
      // timed INSIDE the lease: the phase interval is the dictionary
      // work itself, so the contention spec/probe can separate lease
      // WAIT (before this interval) from dict cost (the interval) —
      // and declared builds report a `dictionary` build phase like
      // the compiled star build does
      CubeBuilder.timed("dictionary", spec.name) {
        spec.dictColumns.foldLeft(flat0)((f, c) =>
          Dictionary.encode(f,
            Dictionary.buildOrAppend(spark, f, c, root), c))
      }
    }

  /** Load-or-build a JSON-declared cube ([[CubeJson]]) — the runtime
    * half of declarative deployment: the spec constructs the CubeDef
    * (closures included) on every call, the stamp-aware memo serves
    * the committed instance, and only a metadata miss pays the build
    * (flat table from the declared model, dictionary-encoding the
    * declared columns, snapshotting derived-dim lookups). Roots
    * default per-declaration (`<cubeRoot>/<sf>-<name>`); a declared
    * `rootScope` deliberately CO-ROOTS several declarations on one
    * multi-cube root (shared dict/snapshot trees — see
    * CubeJson.JsonCube.rootScope), which is why the dictionary and
    * snapshot phases serialize under root-level leases rather than
    * assuming the cube lease owns the root. */
  def ensureDeclared(spark: SparkSession, sfDir: String,
                     spec: CubeJson.JsonCube): CubeInstance = {
    val cube = CubeJson.toCubeDef(spec)
    val root = declaredRootOf(sfDir, spec)
    ensureFresh(declaredBuilt, spark, s"${cube.name}|$sfDir", root, cube) {
      // the DECLARED segment span is the cube's data universe at
      // deploy time: rows beyond it are future appends, not drops —
      // scope the build input exactly like the compiled hybrid
      // members scope theirs. Holes/overlaps INSIDE the span are
      // refused by CubeJson.validate at deploy time (ADVICE r15), so
      // the span filter is exact.
      val lo = cube.segments.map(_.start).min
      val hi = cube.segments.map(_.end).max
      val flat0 = CubeJson.flatBuilder(spec, Some(root))(spark, sfDir)
        .filter(col(cube.segmentCol) >= lit(lo).cast("timestamp") &&
          col(cube.segmentCol) < lit(hi).cast("timestamp"))
      // dictionaries always go through buildOrAppend — append-stable
      // and idempotent, so re-running on a resume is both CORRECT
      // (values that arrived between crash and resume still get ids;
      // a skip-marker would freeze the dictionary and encode them to
      // null, undercounting bitmaps) and cheap relative to the
      // flat/cuboid phases the resume actually skips
      val flat = dictEncode(spark, spec, flat0, root)
      val built = CubeBuilder.build(spark, flat, cube, root)
      // day-zero lattice under a budget (cube planner phase 1,
      // VERDICT r15 item 5): the document's cuboid space is the
      // candidate set; one estimation pass + benefit-per-row greedy
      // picks the materialized subset, built onto the live base via
      // optimizeCuboids so it rides extraCuboids metadata (outside
      // the fingerprint — a reload attaches it, never reads drift).
      // A crash between the two commits leaves a correct base-only
      // cube; the planner loop (optimizeCuboids from the query log)
      // widens it later.
      spec.initialLattice match {
        case Some(il) =>
          // estimate candidate rows from the JUST-BUILT base cuboid,
          // not the un-materialized flat: the base holds one row per
          // distinct dim tuple, so approx_count_distinct over any
          // candidate's dims gives the same estimates while scanning
          // tiny pre-aggregated parquet instead of re-executing the
          // whole model join once per estimation chunk. One frame PER
          // SEGMENT: cuboids materialize per segment, so the budget's
          // planned-rows unit is the per-segment sum
          val baseId = cube.cuboidId(cube.dims.toSet)
          val baseSegs = built.cube.segments.map(s =>
            spark.read.parquet(built.cuboidPath(s.name, baseId)))
          // the rate form resolves against the base rows the build
          // just OBSERVED (reference expansion-threshold semantics):
          // an absolute budget can't be guessed for 100 TB, a rate
          // relative to the measured base holds at any scale
          val baseObserved = built.cube.segments.map(s =>
            built.rows.getOrElse((s.name, baseId), 0L)).sum
          val budget = CubeJson.resolveBudget(il.rowBudget,
            il.expansionRate, baseObserved, "initialLattice")
          val picked = CuboidPlanner.recommendFromStats(baseSegs,
            cube.dims.toSet, CubeJson.candidateCuboids(spec),
            budget, baseRows = Some(baseObserved))
          CubeBuilder.optimizeCuboids(spark, built,
            picked.filterNot(_ == cube.dims.toSet))
        case None => built
      }
    }
  }

  // ── hybrid realization members (VERDICT r8 item 2) ────────────────

  /** the schema-evolution cutover the hybrid splices at: the "old"
    * design serves history before this day, the "new" design from it
    * forward (HybridInstance.java's dateRange partition) */
  val HybridCutover = "1999-01-01"

  /** a NARROW member design (3 dims incl. the month time-dim, the
    * basic sum/count measures): hybrid members model the retired/
    * redesigned cube pair, and keeping them small keeps the extra
    * build a fraction of the star build's cost. The time dim lets a
    * query range that cuts INTO a slice route with a per-slice
    * residual month filter instead of falling back. */
  private def hybridMember(name: String, segs: Seq[Segment]): CubeDef = {
    val wide = defaultCube
    // time dim leads for the same sorted-layout reason as defaultCube
    val dims = Seq("o_month", "o_orderstatus", "n_name")
    // members declare the SKETCH family too (hll/kll/bitmap/topn):
    // after a real evolution there is no wide fallback cube, so the
    // hybrid must serve every measure type its members carry —
    // HybridStorageQuery unions tuple iterators for ALL member
    // measures, not just plain sums (VERDICT r9 item 4)
    wide.copy(name = name, dims = dims,
      measures = wide.measures.filter(m =>
        Set("revenue", "qty", "nrows",
          "cust_hll", "qty_kll", "cust_bitmap", "brand_topn")
          .contains(m.name)),
      segments = segs,
      cuboids = Seq(dims.toSet, Set("o_orderstatus", "o_month")),
      timeDim = Some(TimeDim.month("o_month")),
      shardBy = None, derived = Nil, extended = Nil,
      // the dict-encoded cname_bitmap is NOT carried: dictionary id
      // spaces are per-root and cannot merge across the splice
      dictColumns = Set.empty)
  }

  /** hybrid memo carries one buildId stamp per member root */
  private val hybridBuilt =
    TrieMap.empty[String, (HybridInstance, Seq[String])]

  /** Load-or-build the two hybrid member cubes and wrap them as one
    * spliced realization: the old cube over [data start, cutover), the
    * new one from the cutover on. Each member builds from the flat
    * rows of ITS OWN era — exactly the state a real evolution leaves
    * behind (the retired cube was never built past its cutover).
    * Stamp-aware per member, like [[ensureBuilt]]. */
  def ensureHybrid(spark: SparkSession, sfDir: String): HybridInstance = {
    def memberRoot(name: String) = declaredRoot(sfDir, name)
    def stamps() = Seq("star-old", "star-new").map(n =>
      MetaStamp.of(spark, memberRoot(n), n))
    def fresh(): Option[HybridInstance] =
      hybridBuilt.get(sfDir).filter { case (_, ids) =>
        stamps().zip(ids).forall { case (f, m) => stampServes(f, m) }
      }.map(_._1)
    fresh().getOrElse(lock.synchronized {
      fresh().getOrElse {
        // each member memoizes the buildId READ WITH its instance —
        // never a post-hoc stamp, which a foreign commit in between
        // would blind (same pairing rule as ensureFresh)
        def member(name: String,
                   segs: Seq[Segment]): (CubeInstance, String) = {
          val root = memberRoot(name)
          val cube = hybridMember(name, segs)
          def loaded = CubeMeta.load(spark, cube, root)
            .map(l => (l.inst, l.buildId))
          loaded.getOrElse {
            BuildLease.withLease(spark, root, cube.name)(loaded) {
              val flat = flatTable(spark, sfDir).filter(
                col("o_orderdate") >=
                  lit(segs.head.start).cast("timestamp") &&
                col("o_orderdate") < lit(segs.last.end).cast("timestamp"))
              val b = CubeBuilder.build(spark, flat, cube, root)
              loaded.getOrElse((b, MetaStamp.of(spark, root, cube.name)))
            }
          }
        }
        val (old, oldId) = member("star-old", Seq(
          Segment("s1995", "1995-01-01", "1997-01-01"),
          Segment("s1997", "1997-01-01", HybridCutover)))
        val (nu, nuId) = member("star-new", Seq(
          Segment("s1999", HybridCutover, "2001-01-01"),
          Segment("s2001", "2001-01-01", "2003-01-01")))
        val h = HybridInstance("star-hybrid", Seq(
          HybridSlice(old, QueryRouter.MinDay, HybridCutover),
          HybridSlice(nu, HybridCutover, QueryRouter.MaxDay)))
        hybridBuilt.put(sfDir, (h, Seq(oldId, nuId)))
        h
      }
    })
  }

  /** Retention over the MEMOIZED default instance: applies the policy
    * and swaps the memo in one step, so this process's own readers see
    * the shrunken instance immediately — a stale memo would route to
    * the deleted dirs. The merged-realization memo drops too (it may
    * contain aged-out rows; its meta chain to the new buildId is
    * broken, so the next ensureMerged re-merges). */
  def retain(spark: SparkSession, sfDir: String,
             cutoff: String): CubeInstance = lock.synchronized {
   // nested build lock (global → key order): retention swaps the same
   // `built` memo entry ensureFresh writes, and without this a
   // concurrent first-touch load could publish a pre-retention
   // instance routing to just-deleted dirs until the stamp heals it
   buildLock(s"$cubeRoot/${sfName(sfDir)}", defaultCube.name)
       .synchronized {
    val next =
      CubeBuilder.applyRetention(spark, ensureBuilt(spark, sfDir), cutoff)
    // pair the memoized (instance, stamp) from ONE meta read — the
    // rule ensureFresh documents. A post-hoc MetaStamp.of here would
    // let a foreign commit landing between applyRetention's save and
    // the stamp pair the NEWER foreign buildId with the local
    // post-retention instance, blinding drift detection until yet
    // another commit. The re-load returns the newest committed state
    // either way: ours, or the foreign commit that superseded it.
    val (inst, id) = CubeMeta.load(spark, defaultCube, next.root)
      .map(l => (l.inst, l.buildId))
      .getOrElse((next, MetaStamp.of(spark, next.root, next.cube.name)))
    built.put(sfDir, (inst, id))
    mergedCache.remove(sfDir)
    inst
  }}

  /** All segments merged into one (cube_segment_merge path). The merged
    * realization persists alongside the primary (meta-merged.json) and
    * is chained to the base build it merged FROM — a rebuilt base
    * invalidates it, so a restart never routes against a merge of
    * parquet that no longer exists. */
  def ensureMerged(spark: SparkSession, sfDir: String): CubeInstance = {
    val root = s"$cubeRoot/${sfName(sfDir)}"
    // fast path: BOTH stamps unchanged — the merged realization's own
    // commit AND the base build it chained to (a rebuilt/appended base
    // invalidates the merge even if meta-merged.json is untouched)
    def stamps() = (
      MetaStamp.of(spark, root, defaultCube.name, CubeMeta.MergedFile),
      MetaStamp.of(spark, root, defaultCube.name))
    def fresh(): Option[CubeInstance] =
      mergedCache.get(sfDir).filter { case (_, mId, bId) =>
        val (fm, fb) = stamps()
        stampServes(fm, mId) && stampServes(fb, bId)
      }.map(_._1)
    fresh().getOrElse(lock.synchronized {
      fresh().getOrElse {
        val base = ensureBuilt(spark, sfDir)
        val baseId = CubeMeta.load(spark, defaultCube, base.root).map(_.buildId)
        // the merged id is paired at load/save time (Loaded.buildId /
        // save's return), never stamped after the fact; the merge runs
        // under its OWN lease file so two processes missing the chain
        // don't both pay the merge (and a concurrent BASE build, which
        // holds _building, is coordinated separately)
        def loadedMerge = CubeMeta.load(spark, defaultCube, base.root,
            CubeMeta.MergedFile)
          .filter(l => baseId.isDefined && l.baseBuildId == baseId)
          .map(l => (l.inst, l.buildId))
        val (inst, mId) = loadedMerge.getOrElse {
          BuildLease.withLease(spark, root, defaultCube.name,
              "_building-merged")(loadedMerge) {
            // pass the baseId this path already loaded: the merge
            // attempt chains to it without a second full meta load
            val m = CubeBuilder.mergeSegments(spark, base, "merged",
              base.cube.segments, baseId)
            val id = CubeMeta.save(spark, m, CubeMeta.MergedFile,
              baseBuildId = baseId)
            (m, id)
          }
        }
        mergedCache.put(sfDir,
          (inst, mId, baseId.getOrElse(MetaStamp.Absent)))
        inst
      }
    })
  }
}
