package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction and URL handling — the privacy-scrub stage every
  * LLM training-data pipeline runs before anything else sees the text.
  * (The reference has no privacy stage; this extends the text-analysis
  * family the same way dedup/ANN extend its relational core.)
  *
  * All kernels are compositions of codegen'd `functions._` expressions
  * (regexp_replace / regexp_extract_all) — pure per-row map work, no
  * shuffles, no UDFs, so the scrub runs inside whole-stage codegen and
  * scales with the scan at 100 TB.
  *
  * Regex parity contract: the patterns use only explicit character classes
  * and bounded quantifiers, which Java's regex (Spark) and RE2 (DuckDB
  * oracle) interpret identically — no `\s`/`\w`/`\b` classes, whose
  * membership the two engines disagree on (see q21's n_regex_tokens note).
  */
object Privacy {

  /** Conservative email shape: local@domain.tld (2+ letter TLD). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** US-style 555 exchange numbers — the synthetic-fixture phone shape. */
  val PhonePattern = "555-[0-9]{4}"

  /** Dotted-quad IPv4 (no anchoring: redaction wants every occurrence). */
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** First `https?://` URL's host part ('' when the text has no URL). */
  val UrlHostPattern = "https?://([^/ ]+)"

  def emailCount(c: Column): Column = size(regexp_extract_all(c, lit(EmailPattern), lit(0)))
  def phoneCount(c: Column): Column = size(regexp_extract_all(c, lit(PhonePattern), lit(0)))
  def ipv4Count(c: Column): Column  = size(regexp_extract_all(c, lit(Ipv4Pattern), lit(0)))

  /** Mask every email/phone/IPv4 occurrence with typed placeholder tokens.
    * Replacement order (email → phone → IP) is part of the contract: the
    * placeholders contain no digits or '@', so later passes can never
    * re-match inside an earlier replacement.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** Host of the first URL in the text, or '' when none is present
    * (regexp_extract's no-match value on both engines).
    */
  def urlHost(c: Column): Column = regexp_extract(c, UrlHostPattern, 1)

  /** The fixtures' word-soup texts contain no PII, so the declared queries
    * plant some deterministically (the q42 syntheticMedia pattern): an
    * email on doc_id % 5 == 0, a phone on % 7 == 0, an IPv4 on % 11 == 0 —
    * a pure function of doc_id the DuckDB oracle rebuilds verbatim, giving
    * overlapping PII kinds (id 0 carries all three) and PII-free docs.
    */
  def withSyntheticPii(text: Column, docId: Column): Column = {
    val id = docId.cast("string")
    concat(
      text,
      when(docId % 5 === 0,
        concat(lit(" contact user"), id, lit("@example.com for details")))
        .otherwise(lit("")),
      when(docId % 7 === 0,
        concat(lit(" call 555-"), lpad((docId % 10000).cast("string"), 4, "0"),
          lit(" now"))).otherwise(lit("")),
      when(docId % 11 === 0,
        concat(lit(" from 10."), (docId % 256).cast("string"), lit(".0."),
          ((docId * 7) % 256).cast("string"))).otherwise(lit("")))
  }

  /** Synthetic URL twin of [[withSyntheticPii]]: docs with doc_id % 3 == 0
    * get an https URL on a www.siteN.example.com host, % 3 == 1 an http
    * URL on a blogN.test.org host, % 3 == 2 none.
    */
  def withSyntheticUrl(text: Column, docId: Column): Column = {
    val n = (docId % 10).cast("string")
    concat(
      text,
      when(docId % 3 === 0,
        concat(lit(" see https://www.site"), n, lit(".example.com/page"),
          docId.cast("string"), lit(" ok")))
        .when(docId % 3 === 1,
          concat(lit(" see http://blog"), n, lit(".test.org/a ok")))
        .otherwise(lit("")))
  }
}
