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
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
