package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis primitives for the LLM-data-pipeline surface (SURVEY
  * §2.4 #41, #48–51). Everything here is a pure Catalyst column
  * expression — codegen'd, no UDFs, no driver round-trips — and every
  * function is deliberately expressible in ANSI SQL so the DuckDB
  * oracle can replay it bit-for-bit: at 100 TB these run inside the
  * parquet scan's WholeStageCodegen span.
  */
object TextAnalysis {

  /** whitespace-collapsed, trimmed, lower-cased view of a text column */
  def normText(t: Column): Column =
    regexp_replace(lower(trim(t)), "\\s+", " ")

  /** alphanumeric-only normalization for fingerprinting: lower, strip
    * non [a-z0-9 ], collapse runs of spaces */
  def normAlnum(t: Column): Column =
    regexp_replace(regexp_replace(lower(trim(t)), "[^a-z0-9 ]", ""), " +", " ")

  /** whitespace tokenization (split on runs, trimmed → no empty edge
    * tokens for non-empty text) */
  def words(t: Column): Column = split(trim(t), "\\s+")

  /** BPE-ish subword tokens: letter runs, digit runs, single symbols */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokens(t: Column): Column =
    regexp_extract_all(lower(t), lit(TokenPattern), lit(0))

  /** tiny per-language stopword lists for the lang-id heuristic */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "las", "es", "y", "un"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"))

  /** count of tokens that are stopwords of `lang` (total, not distinct) */
  def stopHits(ws: Column, lang: String): Column = {
    val stops = Stopwords.toMap.apply(lang)
    size(filter(ws, w => stops.map(lit(_) === w).reduce(_ || _)))
  }

  /** 64-bit fingerprint of the normalized text: first 15 hex chars of
    * md5 (60 bits, always non-negative in a long) — a content hash
    * both engines compute identically; native Md5Long60 expression
    * (same value, no hex round trip) */
  def fingerprint64(t: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Md5Long60(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(normAlnum(t))))

  /** total 3-word windows of the normalized text (distinct or not):
    * `max(words - 2, 0)` — the denominator of the repetition ratio */
  def shingleWindows(t: Column): Column =
    greatest(size(split(normText(t), " ")).cast(LongType) - 2L, lit(0L))

  /** deterministic hash-mod membership for corpus sampling: stable
    * across runs/engines (md5-derived 60-bit hash of `salt:doc_id`),
    * uniform across strata by construction — the sampling primitive a
    * 100 TB pipeline uses instead of rand() (reproducible, pushes into
    * the scan, no state). Keep rows where `hash % denom == 0` for a
    * ~1/denom sample. */
  def sampleHash(docId: Column, salt: String): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Md5Long60(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          concat(lit(salt + ":"), docId.cast(
            org.apache.spark.sql.types.StringType)))))

  /** PII scrubbing (pipeline hygiene pass): redact emails, US-style
    * phone numbers, and IPv4 addresses with typed placeholders, and
    * count the redactions. RE2-compatible patterns (no backrefs/
    * lookaround) so the same regexes run in any engine. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def scrubPii(t: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** redaction count, staged like the scrub itself so overlapping
    * matches aren't double-counted (an email whose domain looks like
    * an IPv4 is ONE redaction — the email pattern consumed it) */
  def piiCount(t: Column): Column = {
    val afterEmail = regexp_replace(t, EmailPattern, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhonePattern, "<PHONE>")
    size(regexp_extract_all(t, lit(EmailPattern), lit(0))).cast(LongType) +
      size(regexp_extract_all(afterEmail, lit(PhonePattern), lit(0)))
        .cast(LongType) +
      size(regexp_extract_all(afterPhone, lit(Ipv4Pattern), lit(0)))
        .cast(LongType)
  }
}
