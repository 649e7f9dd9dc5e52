package graft.queries

import org.apache.spark.sql.functions.col

import graft.Tables._
import graft.pipeline.Dedup

/** SURVEY.md §2.4 near-dup suite (#42–44). Each oracle computes the
  * GROUND-TRUTH pair set in DuckDB (exact Jaccard / exact hamming over
  * every qualifying pair, via shingle-inverted-index joins — no LSH),
  * so a pass proves the Spark side's bucketed candidate generation
  * missed nothing at the threshold:
  *  - simhash chunk-banding is lossless by pigeonhole (hamming ≤ 9
  *    with 10 chunks ⇒ some chunk equal), so equality is guaranteed;
  *  - minhash banding at J ≥ 0.8 has miss probability ≈ 4e-8 per pair
  *    and is deterministic given the md5-derived hash family, so the
  *    gate is stable run-to-run.
  */
object DedupQueries extends QueryGroup {

  /** stable within one JVM (bench pass 2 reuses pass 1's store),
    * unique across JVMs (no cross-process store races) */
  private val ProcessTag =
    java.lang.ProcessHandle.current().pid().toString

  /** signature-store dirs this process has already persisted */
  private val storesBuilt =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** shared ground-truth CTE prefix: normalized words → distinct
    * 3-word shingles (shl), exploded shingles (shx) */
  private val shingleCte =
    """WITH w AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
      |  FROM documents),
      |shl AS (
      |  SELECT doc_id,
      |    list_distinct([ws[i]||' '||ws[i+1]||' '||ws[i+2]
      |                   for i in range(1, len(ws)-1)]) AS sh
      |  FROM w WHERE len(ws) >= 3),
      |shx AS (SELECT doc_id, unnest(sh) AS s FROM shl)""".stripMargin

  private def jaccardSql(threshold: String): String =
    s"""$shingleCte,
       |sizes AS (SELECT doc_id, len(sh) AS n FROM shl),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS x
       |  FROM shx a JOIN shx b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  ROUND(CAST(x AS DOUBLE) / (sa.n + sb.n - x), 4) AS jaccard
       |FROM inter
       |JOIN sizes sa ON id_a = sa.doc_id
       |JOIN sizes sb ON id_b = sb.doc_id
       |WHERE ROUND(CAST(x AS DOUBLE) / (sa.n + sb.n - x), 4) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  val queries: Seq[Q] = Seq(

    // 42 ──────────────── MinHash + LSH banding (b=16, r=4, md5-derived
    //     hash family), bucket equi-join, exact-Jaccard verify ≥ 0.8
    Q("doc_minhash_lsh",
      (s, d) => {
        implicit val spark = s
        Dedup.cachedMinhashDupPairs(documents(s, d), 0.8)
          .orderBy("id_a", "id_b")
      },
      Some(jaccardSql("0.8"))),

    // 42d ─────────────── incremental ingest dedup: the new batch
    //     (doc_id % 10 = 0) against the persisted corpus signature
    //     store — batch buckets BROADCAST onto the store's bucket
    //     table, candidates exact-verified by shingle intersection.
    //     Corpus text is never re-read/re-hashed; wall cost scales
    //     with the batch. The daily-ingest shape of #42 at 100 TB.
    Q("doc_incremental_dedup",
      (s, d) => {
        implicit val spark = s
        val docs = documents(s, d)
        // per-process store dir: reused across the bench's two passes,
        // but never shared with a concurrent JVM (a second process
        // overwriting buckets mid-read would corrupt this oracle key)
        // key on the FULL dataset path (hashed for a filesystem-safe
        // name), not just its basename: two dirs named alike must not
        // share a store, or the second dataset's probes would join
        // against the first's signatures (ADVICE r11)
        val dNorm = d.replaceAll("/+$", "")
        val store = "target/graft-sigstore/" +
          dNorm.split('/').last + "-" +
          Integer.toHexString(
            scala.util.hashing.MurmurHash3.stringHash(dNorm)) +
          "-" + ProcessTag
        // the store persists ONCE per (dataset, process) — in
        // production it is built by yesterday's pipeline run, so
        // rebuilding it per query would both misrepresent the key's
        // cost (VERDICT r10 item 3: the key measures the broadcast
        // ingest join) and rewrite parquet under a concurrent reader
        storesBuilt.getOrElseUpdate(store, {
          Dedup.persistSignatureStore(
            docs.filter(col("doc_id") % 10 =!= 0), store)
          ()
        })
        Dedup.incrementalDupPairs(
          docs.filter(col("doc_id") % 10 === 0), store, 0.8)
          .orderBy("id_a", "id_b")
      },
      Some(s"""$shingleCte,
             |sizes AS (SELECT doc_id, len(sh) AS n FROM shl),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS x
             |  FROM shx a JOIN shx b ON a.s = b.s
             |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b,
             |  ROUND(CAST(x AS DOUBLE) / (sa.n + sb.n - x), 4) AS jaccard
             |FROM inter
             |JOIN sizes sa ON id_a = sa.doc_id
             |JOIN sizes sb ON id_b = sb.doc_id
             |WHERE ROUND(CAST(x AS DOUBLE) / (sa.n + sb.n - x), 4) >= 0.8
             |ORDER BY id_a, id_b""".stripMargin)),

    // 43 ──────────────── SimHash 60-bit, 10×6-bit chunk buckets,
    //     hamming ≤ 9 (banding provably lossless at this threshold)
    Q("doc_simhash",
      (s, d) => {
        implicit val spark = s
        Dedup.simhashDupPairs(documents(s, d), 9).orderBy("id_a", "id_b")
      },
      Some(s"""$shingleCte,
             |h AS (SELECT doc_id,
             |        CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS hv
             |      FROM shx),
             |bits AS (
             |  SELECT doc_id, r.range AS j,
             |    CASE WHEN SUM(CASE WHEN (hv >> CAST(r.range AS INT)) & 1 = 1
             |                       THEN 1 ELSE -1 END) >= 0
             |         THEN 1 ELSE 0 END AS b
             |  FROM h, range(60) r GROUP BY 1, 2),
             |sig AS (
             |  SELECT doc_id,
             |    CAST(SUM(b * (CAST(1 AS BIGINT) << CAST(j AS INT))) AS BIGINT) AS s64
             |  FROM bits GROUP BY 1)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(bit_count(xor(a.s64, b.s64)) AS INT) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.s64, b.s64)) <= 9
             |ORDER BY id_a, id_b""".stripMargin)),

    // 44 ──────────────── exact n-gram Jaccard via inverted-index join
    //     (pairs sharing ≥1 shingle), threshold 0.5
    Q("doc_ngram_jaccard",
      (s, d) => {
        implicit val spark = s
        Dedup.ngramJaccardPairs(documents(s, d), 0.5).orderBy("id_a", "id_b")
      },
      Some(jaccardSql("0.5"))),

    // 44b ─────────────── benchmark contamination: per eval doc, the
    //     fraction of its 3-word shingles found anywhere in the
    //     training corpus (GPT-3-style train/test overlap audit);
    //     deterministic eval split (doc_id % 20)
    Q("doc_contamination",
      (s, d) => {
        implicit val spark = s
        val docs = documents(s, d)
        Dedup.contamination(
          docs.filter(org.apache.spark.sql.functions.col("doc_id") % 20 =!= 0),
          docs.filter(org.apache.spark.sql.functions.col("doc_id") % 20 === 0))
          .orderBy("doc_id")
      },
      Some(s"""$shingleCte,
             |ev AS (SELECT doc_id, sh FROM shl WHERE doc_id % 20 = 0),
             |evx AS (SELECT doc_id, unnest(sh) AS s FROM ev),
             |corpus_s AS (
             |  SELECT DISTINCT s FROM shx WHERE doc_id % 20 <> 0),
             |hits AS (
             |  SELECT evx.doc_id, count(*) AS n_hit
             |  FROM evx JOIN corpus_s USING (s) GROUP BY 1)
             |SELECT ev.doc_id, CAST(len(ev.sh) AS BIGINT) AS n_shingles,
             |  CAST(COALESCE(hits.n_hit, 0) AS BIGINT) AS n_hit,
             |  ROUND(CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / len(ev.sh), 4)
             |    AS contamination
             |FROM ev LEFT JOIN hits ON ev.doc_id = hits.doc_id
             |ORDER BY ev.doc_id""".stripMargin)),

    // 42b ─────────────── transitive dup clusters: near-dup is not
    //     transitive, so the training-pipeline keep-one semantics need
    //     connected components over the pair graph — every member
    //     labeled with its component's min doc_id. Oracle recomputes
    //     the closure with a recursive CTE over the exact-Jaccard
    //     ground-truth pairs.
    Q("doc_dup_clusters",
      (s, d) => {
        implicit val spark = s
        val pairs = Dedup.cachedMinhashDupPairs(documents(s, d), 0.8)
          .select("id_a", "id_b")
        Dedup.dupClusters(pairs).orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${shingleCte.stripPrefix("WITH ")},
             |sizes AS (SELECT doc_id, len(sh) AS n FROM shl),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS x
             |  FROM shx a JOIN shx b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON id_a = sa.doc_id
             |  JOIN sizes sb ON id_b = sb.doc_id
             |  WHERE ROUND(CAST(x AS DOUBLE) / (sa.n + sb.n - x), 4) >= 0.8),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION ALL SELECT id_b, id_a FROM pairs),
             |reach AS (
             |  SELECT DISTINCT src AS id, src AS r FROM edges
             |  UNION
             |  SELECT reach.id, e.dst AS r
             |  FROM reach JOIN edges e ON e.src = reach.r)
             |SELECT id AS doc_id, MIN(r) AS cluster_id
             |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin)),

    // 42c ─────────────── the deduped corpus: one representative per
    //     cluster survives, uniques pass through — the actual output a
    //     training pipeline feeds downstream
    Q("doc_dedup_keep",
      (s, d) => {
        implicit val spark = s
        val docs = documents(s, d)
        val pairs = Dedup.cachedMinhashDupPairs(docs, 0.8)
          .select("id_a", "id_b")
        Dedup.dedupKeepOne(docs, pairs).select("doc_id").orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${shingleCte.stripPrefix("WITH ")},
             |sizes AS (SELECT doc_id, len(sh) AS n FROM shl),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS x
             |  FROM shx a JOIN shx b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON id_a = sa.doc_id
             |  JOIN sizes sb ON id_b = sb.doc_id
             |  WHERE ROUND(CAST(x AS DOUBLE) / (sa.n + sb.n - x), 4) >= 0.8),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION ALL SELECT id_b, id_a FROM pairs),
             |reach AS (
             |  SELECT DISTINCT src AS id, src AS r FROM edges
             |  UNION
             |  SELECT reach.id, e.dst AS r
             |  FROM reach JOIN edges e ON e.src = reach.r),
             |drop_ids AS (
             |  SELECT id FROM reach GROUP BY id HAVING id <> MIN(r))
             |SELECT doc_id FROM documents
             |WHERE doc_id NOT IN (SELECT id FROM drop_ids)
             |ORDER BY doc_id""".stripMargin)),

    // 42e ─────────────── leak-proof train/valid/test split: assign by
    //     the deterministic hash of each doc's dup-CLUSTER
    //     representative, so a near-dup cluster never straddles train
    //     and eval (contamination prevented by construction — the
    //     split-time counterpart of doc_contamination's audit).
    //     80/10/10 buckets, md5-derived, engine-reproducible.
    Q("doc_split_leakproof",
      (s, d) => {
        implicit val spark = s
        val docs = documents(s, d)
        val pairs = Dedup.cachedMinhashDupPairs(docs, 0.8)
          .select("id_a", "id_b")
        Dedup.leakproofSplit(docs, pairs, trainPct = 80, validPct = 10)
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${shingleCte.stripPrefix("WITH ")},
             |sizes AS (SELECT doc_id, len(sh) AS n FROM shl),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS x
             |  FROM shx a JOIN shx b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT id_a, id_b FROM inter
             |  JOIN sizes sa ON id_a = sa.doc_id
             |  JOIN sizes sb ON id_b = sb.doc_id
             |  WHERE ROUND(CAST(x AS DOUBLE) / (sa.n + sb.n - x), 4) >= 0.8),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION ALL SELECT id_b, id_a FROM pairs),
             |reach AS (
             |  SELECT DISTINCT src AS id, src AS r FROM edges
             |  UNION
             |  SELECT reach.id, e.dst AS r
             |  FROM reach JOIN edges e ON e.src = reach.r),
             |clusters AS (
             |  SELECT id AS doc_id, MIN(r) AS cluster_id
             |  FROM reach GROUP BY id),
             |keyed AS (
             |  SELECT d.doc_id,
             |    COALESCE(c.cluster_id, d.doc_id) AS split_key
             |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id),
             |b AS (
             |  SELECT doc_id, split_key,
             |    CAST(concat('0x', substr(
             |      md5('split:' || CAST(split_key AS VARCHAR)), 1, 15))
             |      AS BIGINT) % 100 AS bucket
             |  FROM keyed)
             |SELECT doc_id, split_key, bucket,
             |  CASE WHEN bucket < 80 THEN 'train'
             |       WHEN bucket < 90 THEN 'valid'
             |       ELSE 'test' END AS split
             |FROM b ORDER BY doc_id""".stripMargin)),

    // 42g ─────────────── repeated-passage removal (exact-substring
    //     dedup at passage granularity, Lee et al. 2022): every
    //     8-word passage keeps only its FIRST corpus occurrence —
    //     boilerplate shared by otherwise-distinct docs is stripped,
    //     which doc-level dedup cannot do. One passage-keyed shuffle,
    //     linear at 100 TB (no pair generation anywhere).
    Q("doc_passage_dedup",
      (s, d) => Dedup.passageDedup(documents(s, d), words = 8)
        .orderBy("doc_id"),
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS ws
             |  FROM documents),
             |ch AS (
             |  SELECT doc_id, unnest([
             |      {'idx': i, 'chunk': array_to_string(ws[(i*8+1):(i*8+8)], ' ')}
             |      for i in range(0, CAST(ceil(len(ws) / 8.0) AS INT))]) AS c
             |  FROM w),
             |ch2 AS (SELECT doc_id, c.idx AS idx, c.chunk AS chunk FROM ch),
             |surv AS (
             |  SELECT doc_id, idx, chunk FROM (
             |    SELECT doc_id, idx, chunk,
             |      ROW_NUMBER() OVER (PARTITION BY chunk
             |        ORDER BY doc_id, idx) AS rn
             |    FROM ch2) WHERE rn = 1)
             |SELECT d.doc_id AS doc_id,
             |  COALESCE(string_agg(s.chunk, ' ' ORDER BY s.idx), '') AS text
             |FROM documents d LEFT JOIN surv s ON d.doc_id = s.doc_id
             |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin))
  )
}
