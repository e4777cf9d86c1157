package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for the large-scale training-data pipeline
  * extension (BASELINE.json north star): token counting, quality scoring,
  * language-ID heuristics, fingerprinting, shingling.
  *
  * Everything here is a composition of codegen'd `functions._` expressions —
  * no UDFs — so whole-stage codegen spans are preserved and the kernels are
  * sane at 100 TB (pure per-row map work, no shuffles).
  */
object TextFunctions {

  /** Whitespace tokens. The fixtures are single-space separated; the oracle
    * (DuckDB string_split) must use the same delimiter.
    */
  def tokens(c: Column): Column = split(c, " ")

  /** Enumerated Unicode whitespace (scalac resolves the \\u escapes, so
    * both regex engines receive literal characters) — identical
    * class membership in Java regex (Spark) and RE2 (the DuckDB oracle),
    * sidestepping both engines' divergent `\s` (Java: ASCII-only without
    * UNICODE_CHARACTER_CLASS; RE2: `[\t\n\f\r ]`). Covers the ASCII
    * controls plus NEL, NBSP, OGHAM, the U+2000-200A run, LS/PS, NNBSP,
    * MMSP and IDEOGRAPHIC SPACE.
    */
  val UnicodeWsChars: String =
    "\t\n\u000B\u000C\r \u0085\u00A0\u1680\u2000-\u200A\u2028\u2029\u202F\u205F\u3000"


  /** Unicode-aware tokens: split on RUNS of any [[UnicodeWsChars]] member,
    * empty fragments dropped (leading/trailing separators produce them
    * under split). The opt-in twin of [[tokens]] — the single-space
    * default is oracle-pinned across a dozen queries, so real-corpus
    * callers (tabs, newlines, NBSP) opt in per call instead of a default
    * flip; composing [[normalizeWs]] first is no longer load-bearing.
    */
  def tokensUnicode(c: Column): Column =
    filter(split(c, s"[$UnicodeWsChars]+"), t => t =!= "")

  def tokens(c: Column, unicode: Boolean): Column =
    if (unicode) tokensUnicode(c) else tokens(c)

  def tokenCount(c: Column): Column = size(tokens(c))

  def tokenCount(c: Column, unicode: Boolean): Column = size(tokens(c, unicode))

  /** Distinct token set — the unit for unigram Jaccard similarity. */
  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  /** Word n-gram shingles: ["a b c", "b c d", ...] via a slide over the
    * token array (transform + slice — single pass, no explode).
    */
  def shingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) < n, array(c)) // short doc: whole text as one shingle
      .otherwise(transform(
        sequence(lit(0), size(t) - n),
        i => array_join(slice(t, i + 1, lit(n)), " ")))
  }

  /** Whitespace/control normalization — the first cleaning pass of every
    * corpus pipeline: control characters (C0 range) become spaces, space
    * runs collapse to one, ends trimmed. ASCII-explicit classes only (the
    * Java-vs-RE2 parity contract; `\s`/`\p{Cntrl}` membership differs
    * between engines).
    */
  def normalizeWs(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "[\\x00-\\x1F]", " "), "  +", " "))

  /** Simple quality components (length, punctuation ratio, stopword ratio,
    * mean token length) + a weighted score in [0,1]-ish range, mirroring
    * heuristic LLM-corpus filters.
    */
  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[\\.,;:!\\?]", ""))).cast("double") /
      length(c)

  def stopwordRatio(c: Column): Column = stopwordRatio(c, unicode = false)

  def stopwordRatio(c: Column, unicode: Boolean): Column = {
    val t = tokens(c, unicode)
    size(filter(t, x => x.isin("the", "a", "and", "of", "to", "in"))).cast("double") /
      size(t)
  }

  def meanTokenLen(c: Column): Column = meanTokenLen(c, unicode = false)

  def meanTokenLen(c: Column, unicode: Boolean): Column = {
    val t = tokens(c, unicode)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t)
  }

  def qualityScore(c: Column): Column = qualityScore(c, unicode = false)

  /** `unicode` switches only the token-derived component (stopword
    * ratio); length and punctuation terms are character-level and
    * tokenizer-independent.
    */
  def qualityScore(c: Column, unicode: Boolean): Column =
    least(length(c).cast("double") / 500.0, lit(1.0)) * 0.4 +
      stopwordRatio(c, unicode) * 0.3 +
      (lit(1.0) - punctRatio(c)) * 0.3

  /** Language-ID by marker-token counting with a fixed-priority argmax.
    * The tie order (en > de > fr > es > zh) is part of the operator contract
    * so the DuckDB oracle can replicate it exactly.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "es" -> Seq("el", "la", "y", "es"),
    "zh" -> Seq("的", "是", "了", "在"))

  def langMarkerCount(c: Column, markers: Seq[String]): Column =
    size(filter(tokens(c), x => x.isin(markers.map(lit(_)): _*)))

  /** Argmax via array_max over (count, priority, lang) structs — each
    * marker count is evaluated ONCE. A when-chain comparing every count to
    * every other would embed (and re-evaluate) each lambda-bearing count
    * expression ~5x: HOFs are excluded from common-subexpression
    * elimination. Tie order: higher count wins; equal counts fall to the
    * earlier language in LangMarkers (en > de > fr > es > zh), encoded as
    * the negated index so lexicographic struct max implements it.
    */
  def langId(c: Column): Column = {
    val entries = LangMarkers.zipWithIndex.map { case ((lang, m), i) =>
      struct(langMarkerCount(c, m).as("cnt"), lit(-i).as("prio"), lit(lang).as("lang"))
    }
    val best = array_max(array(entries: _*))
    when(best.getField("cnt") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Whole-document fingerprint: md5 of the lowercased text — the exact
    * dedup key (identical on the DuckDB side).
    */
  def fingerprint(c: Column): Column = md5(lower(c))
}
