package graft.queries

import graft.Tables._
import graft.pipeline.Multimodal

/** SURVEY.md §2.4 #52 — multimodal binary-column plumbing with a
  * stubbed decode. The oracle recomputes the stub's deterministic
  * feature arithmetic in SQL (the documents are ASCII, so byte values
  * equal codepoints and the checksum is SQL-expressible). */
object MultimodalQueries extends QueryGroup {

  val queries: Seq[Q] = Seq(
    Q("mm_extract",
      (s, d) => {
        implicit val spark = s
        Multimodal.extractFeatures(Multimodal.asMedia(documents(s, d)))
          .toDF()
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_frames,
             |  CAST(64 + octet_length(encode(text)) % 640 AS INT) AS width,
             |  CAST(64 + (octet_length(encode(text)) * 7) % 480 AS INT) AS height,
             |  CAST(list_sum([unicode(text[i])
             |                 for i in range(1, least(length(text), 64) + 1)]) AS BIGINT) AS checksum
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // 52b ─────────────── frame sampling: each media object explodes
    //     into at most 4 evenly-strided frame rows, so per-frame work
    //     parallelizes past the per-doc boundary (a long video stops
    //     pinning one task). Deterministic stub decode (256-byte
    //     chunks, unsigned-byte-sum digests) replayed by the oracle.
    Q("mm_frame_sample",
      (s, d) => {
        implicit val spark = s
        Multimodal.sampleFrames(Multimodal.asMedia(documents(s, d)))
          .toDF()
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, text,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS n
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, text, n,
             |    CAST(ceil(n / 256.0) AS BIGINT) AS frames,
             |    GREATEST(1, CAST(ceil(ceil(n / 256.0) / 4.0) AS BIGINT))
             |      AS stride
             |  FROM m),
             |x AS (
             |  SELECT doc_id, text, n,
             |    unnest(range(0, frames, stride)) AS frame_idx
             |  FROM f)
             |SELECT doc_id, frame_idx,
             |  frame_idx * 256 AS frame_off,
             |  LEAST(256, n - frame_idx * 256) AS frame_len,
             |  CAST(list_sum([unicode(text[j])
             |    for j in range(CAST(frame_idx * 256 + 1 AS BIGINT),
             |      LEAST(n, frame_idx * 256 + 256) + 1)]) AS BIGINT)
             |    AS checksum
             |FROM x ORDER BY doc_id, frame_idx""".stripMargin))
  )
}
