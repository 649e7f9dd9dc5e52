package graft.queries

import org.apache.spark.sql.functions.col

import graft.Tables._
import graft.pipeline.{Dedup, EmbeddingSearch}

/** SURVEY.md §2.4 embedding-similarity ops (#45–47). The oracle SQL
  * replays the exact same quantized-integer cosine (see
  * EmbeddingSearch's determinism note), so thresholds, ranks, and tie
  * breaks replay bit-for-bit in DuckDB — including the LSH variant,
  * whose md5-derived hyperplanes are reproducible in SQL. */
object EmbQueries extends QueryGroup {

  /** quantized vectors + squared norms (CTE prefix shared by all) */
  private val qvCte =
    """WITH qv AS (
      |  SELECT vec_id,
      |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)
      |     for i in range(1, len(embedding) + 1)] AS q
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, q,
      |    CAST(list_sum([q[i] * q[i] for i in range(1, 65)]) AS BIGINT) AS n2
      |  FROM qv)""".stripMargin

  /** pair cosine between aliases a and b (rounded to 6 dp) */
  private val cosAB =
    """ROUND(CAST(list_sum([a.q[i] * b.q[i] for i in range(1, 65)]) AS DOUBLE)
      |  / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)), 6)""".stripMargin

  private val rankSelect =
    """SELECT q_id, rank, n_id, cosine FROM (
      |  SELECT q_id, n_id, cosine,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY cosine DESC, n_id) AS BIGINT) AS rank
      |  FROM scored)
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** LSH bucket CTEs (hp → dots → bk): md5-derived hyperplanes, one
    * 8-bit sign bucket per (vector, table) — the SQL replay of
    * EmbeddingSearch.withBuckets. 8 bits is `lshBitsFor(n)`'s FLOOR
    * value, which every oracle scale (≤ 6144 vectors) resolves to —
    * the Scala side grows bits with log₂(n) beyond that (scale path,
    * exercised by the 10×/100× probe, outside the oracle's range). */
  private val lshBkCte =
    """hp AS (
      |  SELECT t.range AS t, j.range AS j, i.range AS i,
      |    (CAST(concat('0x', substr(md5(
      |       CAST(t.range AS VARCHAR) || '_' ||
      |       CAST(j.range AS VARCHAR) || '_' ||
      |       CAST(i.range AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000 AS hv
      |  FROM range(4) t, range(8) j, range(64) i),
      |dots AS (
      |  SELECT n.vec_id, hp.t, hp.j,
      |    SUM(n.q[CAST(hp.i AS INT) + 1] * hp.hv) AS dp
      |  FROM n, hp GROUP BY 1, 2, 3),
      |bk AS (
      |  SELECT vec_id, t,
      |    CAST(SUM(CASE WHEN dp >= 0 THEN (1 << CAST(j AS INT)) ELSE 0 END) AS INT) AS bkt
      |  FROM dots GROUP BY 1, 2)""".stripMargin

  val queries: Seq[Q] = Seq(

    // 45c ─────────────── scale-safe semantic dedup (the PRODUCTION
    //     path): LSH bucket candidates (shuffle equi-join, never
    //     O(n²)) → exact-cosine verify → transitive clusters →
    //     keep the min-id representative. Same output contract as
    //     emb_semantic_dedup; the exact kernel above stays as the
    //     oracle baseline for recall comparison.
    Q("emb_semantic_dedup_lsh",
      (s, d) => {
        implicit val spark = s
        Dedup.semanticDedupLsh(embeddings(s, d), 0.4).orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE ${qvCte.stripPrefix("WITH ")},
             |$lshBkCte,
             |cand AS (
             |  SELECT DISTINCT qa.vec_id AS id_a, qb.vec_id AS id_b
             |  FROM bk qa JOIN bk qb
             |    ON qa.t = qb.t AND qa.bkt = qb.bkt
             |   AND qa.vec_id < qb.vec_id),
             |pairs AS (
             |  SELECT cand.id_a, cand.id_b
             |  FROM cand
             |  JOIN n a ON a.vec_id = cand.id_a
             |  JOIN n b ON b.vec_id = cand.id_b
             |  WHERE $cosAB >= 0.4),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION ALL SELECT id_b, id_a FROM pairs),
             |reach AS (
             |  SELECT DISTINCT src AS id, src AS r FROM edges
             |  UNION
             |  SELECT reach.id, e.dst AS r
             |  FROM reach JOIN edges e ON e.src = reach.r),
             |comp AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id)
             |SELECT e.vec_id FROM embeddings e
             |LEFT JOIN comp ON e.vec_id = comp.id
             |WHERE comp.id IS NULL OR comp.cl = e.vec_id
             |ORDER BY vec_id""".stripMargin)),

    // 45b ─────────────── semantic dedup: cosine near-dup pairs →
    //     transitive clusters → keep the min-id representative per
    //     cluster (the embedding-space analog of doc_dedup_keep —
    //     what an embedding-based corpus dedup actually emits).
    //     Composes the triangular-block pair kernel with the
    //     pointer-doubling cluster loop; the anti-join is sized by
    //     duplicates, not the corpus.
    Q("emb_semantic_dedup",
      (s, d) => {
        implicit val spark = s
        val embs = embeddings(s, d)
        val pairs = EmbeddingSearch.cachedCosineDupPairs(embs, 0.4)
          .select("id_a", "id_b")
        Dedup.dedupKeepOne(
            embs.select(col("vec_id").as("doc_id")), pairs)
          .select(col("doc_id").as("vec_id"))
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE ${qvCte.stripPrefix("WITH ")},
             |pairs AS (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
             |  FROM n a JOIN n b ON a.vec_id < b.vec_id
             |  WHERE $cosAB >= 0.4),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION ALL SELECT id_b, id_a FROM pairs),
             |reach AS (
             |  SELECT DISTINCT src AS id, src AS r FROM edges
             |  UNION
             |  SELECT reach.id, e.dst AS r
             |  FROM reach JOIN edges e ON e.src = reach.r),
             |comp AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id)
             |SELECT e.vec_id FROM embeddings e
             |LEFT JOIN comp ON e.vec_id = comp.id
             |WHERE comp.id IS NULL OR comp.cl = e.vec_id
             |ORDER BY vec_id""".stripMargin)),

    // 45 ──────────────── exact cosine threshold pairs (the O(n²)
    //     baseline; LSH below is the scale path)
    Q("emb_cosine_dup",
      (s, d) => {
        implicit val spark = s
        EmbeddingSearch.cachedCosineDupPairs(embeddings(s, d), 0.4)
          .orderBy("id_a", "id_b")
      },
      Some(s"""$qvCte
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cosAB AS cosine
             |FROM n a JOIN n b ON a.vec_id < b.vec_id
             |WHERE $cosAB >= 0.4
             |ORDER BY id_a, id_b""".stripMargin)),

    // 46 ──────────────── brute-force top-5 for the first 8 query
    //     vectors: broadcast queries × one linear corpus scan
    Q("emb_topk_bruteforce",
      (s, d) => EmbeddingSearch.bruteForceTopK(embeddings(s, d), 8, 5)
        .orderBy("q_id", "rank"),
      Some(s"""$qvCte,
             |scored AS (
             |  SELECT a.vec_id AS q_id, b.vec_id AS n_id, $cosAB AS cosine
             |  FROM n a JOIN n b ON a.vec_id < 8 AND b.vec_id != a.vec_id)
             |$rankSelect""".stripMargin)),

    // 47b ─────────────── corpus-scale LSH top-3: EVERY vector is a
    //     query; candidates from a bucket-keyed shuffle self-join (no
    //     broadcast of either side — the 100 TB corpus-vs-corpus plan)
    Q("emb_topk_corpus",
      (s, d) => EmbeddingSearch.lshTopKCorpus(embeddings(s, d), 3)
        .orderBy("q_id", "rank"),
      Some(s"""$qvCte,
             |hp AS (
             |  SELECT t.range AS t, j.range AS j, i.range AS i,
             |    (CAST(concat('0x', substr(md5(
             |       CAST(t.range AS VARCHAR) || '_' ||
             |       CAST(j.range AS VARCHAR) || '_' ||
             |       CAST(i.range AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000 AS hv
             |  FROM range(4) t, range(8) j, range(64) i),
             |dots AS (
             |  SELECT n.vec_id, hp.t, hp.j,
             |    SUM(n.q[CAST(hp.i AS INT) + 1] * hp.hv) AS dp
             |  FROM n, hp GROUP BY 1, 2, 3),
             |bk AS (
             |  SELECT vec_id, t,
             |    CAST(SUM(CASE WHEN dp >= 0 THEN (1 << CAST(j AS INT)) ELSE 0 END) AS INT) AS bkt
             |  FROM dots GROUP BY 1, 2),
             |cand AS (
             |  SELECT DISTINCT qa.vec_id AS q_id, qb.vec_id AS n_id
             |  FROM bk qa JOIN bk qb
             |    ON qa.t = qb.t AND qa.bkt = qb.bkt
             |   AND qb.vec_id != qa.vec_id),
             |scored AS (
             |  SELECT cand.q_id, cand.n_id, $cosAB AS cosine
             |  FROM cand
             |  JOIN n a ON a.vec_id = cand.q_id
             |  JOIN n b ON b.vec_id = cand.n_id)
             |SELECT q_id, rank, n_id, cosine FROM (
             |  SELECT q_id, n_id, cosine,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
             |      ORDER BY cosine DESC, n_id) AS BIGINT) AS rank
             |  FROM scored)
             |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)),

    // 47c ─────────────── IVF top-5: deterministic coarse quantizer
    //     (16 sampled centroids), one linear assignment pass against
    //     the broadcast codebook, queries probe their 4 nearest cells,
    //     exact cosine on cell candidates only (FAISS IVF-Flat layout;
    //     the second scale path next to LSH)
    Q("emb_topk_ivf",
      (s, d) => EmbeddingSearch.ivfTopK(embeddings(s, d), 8, 5)
        .orderBy("q_id", "rank"),
      Some(s"""$qvCte,
             |cents AS (SELECT vec_id AS c_id, q, n2 FROM n WHERE vec_id < 16),
             |cellrank AS (
             |  SELECT v.vec_id, c.c_id,
             |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
             |      ROUND(CAST(list_sum([v.q[i] * c.q[i] for i in range(1, 65)]) AS DOUBLE)
             |        / sqrt(CAST(v.n2 AS DOUBLE) * CAST(c.n2 AS DOUBLE)), 6) DESC,
             |      c.c_id) AS rn
             |  FROM n v, cents c),
             |asn AS (
             |  SELECT vec_id AS n_id, c_id AS cell FROM cellrank WHERE rn = 1),
             |probes AS (
             |  SELECT vec_id AS q_id, c_id AS cell FROM cellrank
             |  WHERE rn <= 4 AND vec_id < 8),
             |cand AS (
             |  SELECT DISTINCT p.q_id, a.n_id
             |  FROM probes p JOIN asn a ON a.cell = p.cell
             |  WHERE a.n_id != p.q_id),
             |scored AS (
             |  SELECT cand.q_id, cand.n_id, $cosAB AS cosine
             |  FROM cand
             |  JOIN n a ON a.vec_id = cand.q_id
             |  JOIN n b ON b.vec_id = cand.n_id)
             |$rankSelect""".stripMargin)),

    // 47e ─────────────── IVF-PQ top-5: the production FAISS
    //     composition — coarse cells prune WHICH rows are touched,
    //     PQ codes shrink HOW MANY BYTES per touched row, exact
    //     re-rank on the overfetch. The billion-vector default
    //     layout, assembled from the two audited stages.
    Q("emb_topk_ivfpq",
      (s, d) => EmbeddingSearch.ivfPqTopK(embeddings(s, d), 8, 5)
        .orderBy("q_id", "rank"),
      Some(s"""$qvCte,
             |icents AS (SELECT vec_id AS c_id, q, n2 FROM n WHERE vec_id < 16),
             |cellrank AS (
             |  SELECT v.vec_id, c.c_id,
             |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
             |      ROUND(CAST(list_sum([v.q[i] * c.q[i] for i in range(1, 65)]) AS DOUBLE)
             |        / sqrt(CAST(v.n2 AS DOUBLE) * CAST(c.n2 AS DOUBLE)), 6) DESC,
             |      c.c_id) AS rn
             |  FROM n v, icents c),
             |asn AS (
             |  SELECT vec_id AS n_id, c_id AS cell FROM cellrank WHERE rn = 1),
             |probes AS (
             |  SELECT vec_id AS q_id, c_id AS cell FROM cellrank
             |  WHERE rn <= 4 AND vec_id < 8),
             |ccand AS (
             |  SELECT DISTINCT p.q_id, a.n_id
             |  FROM probes p JOIN asn a ON a.cell = p.cell
             |  WHERE a.n_id != p.q_id),
             |cents AS (SELECT vec_id AS c_id, q FROM n WHERE vec_id < 16),
             |codes AS (
             |  SELECT n_id, m, code FROM (
             |    SELECT v.vec_id AS n_id, s.range AS m, c.c_id AS code,
             |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, s.range ORDER BY
             |        list_sum([(v.q[CAST(s.range AS INT)*16 + i]
             |                    - c.q[CAST(s.range AS INT)*16 + i])
             |                  * (v.q[CAST(s.range AS INT)*16 + i]
             |                    - c.q[CAST(s.range AS INT)*16 + i])
             |                  for i in range(1, 17)]) ASC, c.c_id) AS rn
             |    FROM n v, range(4) s, cents c) WHERE rn = 1),
             |tbl AS (
             |  SELECT qr.vec_id AS q_id, s.range AS m, c.c_id AS code,
             |    CAST(list_sum([qr.q[CAST(s.range AS INT)*16 + i]
             |                   * c.q[CAST(s.range AS INT)*16 + i]
             |                   for i in range(1, 17)]) AS BIGINT) AS ip
             |  FROM n qr, range(4) s, cents c WHERE qr.vec_id < 8),
             |aip AS (
             |  SELECT t.q_id, codes.n_id, SUM(t.ip) AS aip
             |  FROM ccand
             |  JOIN codes ON codes.n_id = ccand.n_id
             |  JOIN tbl t ON t.q_id = ccand.q_id
             |    AND t.m = codes.m AND t.code = codes.code
             |  GROUP BY 1, 2),
             |cand AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
             |      ORDER BY aip DESC, n_id) AS rn
             |    FROM aip) WHERE rn <= 20),
             |scored AS (
             |  SELECT cand.q_id, cand.n_id, $cosAB AS cosine
             |  FROM cand
             |  JOIN n a ON a.vec_id = cand.q_id
             |  JOIN n b ON b.vec_id = cand.n_id)
             |$rankSelect""".stripMargin)),

    // 47d ─────────────── PQ-ADC top-5 (FAISS product quantization):
    //     corpus encoded as 4 sub-centroid codes against sampled
    //     sub-codebooks; queries precompute per-(subspace, centroid)
    //     inner-product tables; approximate score = Σ table lookups
    //     over the CODES (the vectors never enter the candidate scan),
    //     top-20 overfetch re-ranked by exact cosine — the
    //     compressed-domain scale path next to LSH and IVF
    Q("emb_topk_pq",
      (s, d) => EmbeddingSearch.pqTopK(embeddings(s, d), 8, 5)
        .orderBy("q_id", "rank"),
      Some(s"""$qvCte,
             |cents AS (SELECT vec_id AS c_id, q FROM n WHERE vec_id < 16),
             |codes AS (
             |  SELECT n_id, m, code FROM (
             |    SELECT v.vec_id AS n_id, s.range AS m, c.c_id AS code,
             |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, s.range ORDER BY
             |        list_sum([(v.q[CAST(s.range AS INT)*16 + i]
             |                    - c.q[CAST(s.range AS INT)*16 + i])
             |                  * (v.q[CAST(s.range AS INT)*16 + i]
             |                    - c.q[CAST(s.range AS INT)*16 + i])
             |                  for i in range(1, 17)]) ASC, c.c_id) AS rn
             |    FROM n v, range(4) s, cents c) WHERE rn = 1),
             |tbl AS (
             |  SELECT qr.vec_id AS q_id, s.range AS m, c.c_id AS code,
             |    CAST(list_sum([qr.q[CAST(s.range AS INT)*16 + i]
             |                   * c.q[CAST(s.range AS INT)*16 + i]
             |                   for i in range(1, 17)]) AS BIGINT) AS ip
             |  FROM n qr, range(4) s, cents c WHERE qr.vec_id < 8),
             |aip AS (
             |  SELECT t.q_id, codes.n_id, SUM(t.ip) AS aip
             |  FROM codes JOIN tbl t ON t.m = codes.m AND t.code = codes.code
             |  WHERE codes.n_id != t.q_id GROUP BY 1, 2),
             |cand AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
             |      ORDER BY aip DESC, n_id) AS rn
             |    FROM aip) WHERE rn <= 20),
             |scored AS (
             |  SELECT cand.q_id, cand.n_id, $cosAB AS cosine
             |  FROM cand
             |  JOIN n a ON a.vec_id = cand.q_id
             |  JOIN n b ON b.vec_id = cand.n_id)
             |$rankSelect""".stripMargin)),

    // 47 ──────────────── random-hyperplane LSH top-5: candidates from
    //     4 tables × 8-bit sign buckets (equi-join per table), exact
    //     cosine on candidates only
    Q("emb_topk_lsh",
      (s, d) => EmbeddingSearch.lshTopK(embeddings(s, d), 8, 5)
        .orderBy("q_id", "rank"),
      Some(s"""$qvCte,
             |hp AS (
             |  SELECT t.range AS t, j.range AS j, i.range AS i,
             |    (CAST(concat('0x', substr(md5(
             |       CAST(t.range AS VARCHAR) || '_' ||
             |       CAST(j.range AS VARCHAR) || '_' ||
             |       CAST(i.range AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000 AS hv
             |  FROM range(4) t, range(8) j, range(64) i),
             |dots AS (
             |  SELECT n.vec_id, hp.t, hp.j,
             |    SUM(n.q[CAST(hp.i AS INT) + 1] * hp.hv) AS dp
             |  FROM n, hp GROUP BY 1, 2, 3),
             |bk AS (
             |  SELECT vec_id, t,
             |    CAST(SUM(CASE WHEN dp >= 0 THEN (1 << CAST(j AS INT)) ELSE 0 END) AS INT) AS bkt
             |  FROM dots GROUP BY 1, 2),
             |cand AS (
             |  SELECT DISTINCT qa.vec_id AS q_id, qb.vec_id AS n_id
             |  FROM bk qa JOIN bk qb
             |    ON qa.t = qb.t AND qa.bkt = qb.bkt
             |   AND qa.vec_id < 8 AND qb.vec_id != qa.vec_id),
             |scored AS (
             |  SELECT cand.q_id, cand.n_id, $cosAB AS cosine
             |  FROM cand
             |  JOIN n a ON a.vec_id = cand.q_id
             |  JOIN n b ON b.vec_id = cand.n_id)
             |$rankSelect""".stripMargin))
  )
}
