package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup-aware text extraction — the tag-level stage that runs
  * BEFORE line-level boilerplate removal on web corpora (the
  * CCNet/trafilatura pipeline order: strip script/style/comments, turn
  * block structure into line structure, drop remaining tags, decode
  * entities, THEN line-frequency dedup — `TextChunks.stripFrequentLines`).
  *
  * Deliberately a composition of codegen'd BUILT-INS (regexp_replace /
  * replace — custom-operator preference order (a)): the whole transform
  * is a fixed chain of regex rewrites, so a DuckDB oracle replays it
  * verbatim (q241) and whole-stage codegen fuses it with up/downstream
  * expressions. The regexes ARE the contract — "tag" means `<[^>]*>`
  * exactly, so hostile markup has defined, engine-agreed behavior
  * (HtmlSpec pins it):
  *
  *  - `<script ...>...</script>` / `<style ...>...</style>` drop with
  *    their CONTENT (case-insensitive, lazy, `(?s)`); unclosed at EOF
  *    drops to the end (the `|$` alternative). An attribute value
  *    containing `>` ends the open tag early — the regex contract.
  *  - `<!-- ... -->` comments drop; unclosed drops to the end. Comments
  *    strip AFTER script/style (a commented-out script stays gone) and
  *    BEFORE CDATA (a `<!--` inside CDATA text therefore opens a comment
  *    — pinned, not accidental).
  *  - `<![CDATA[ ... ]]>` unwraps to its character data (XML semantics).
  *  - Block-level tags (p, div, br, li, ul, ol, h1-h6, tr, td, th,
  *    table, thead, tbody, section, article, header, footer, nav,
  *    blockquote, pre, hr, form, title — opening, closing, or
  *    self-closing, attributes allowed) become NEWLINES, so document
  *    structure survives as line structure for the line-level stage.
  *  - Every remaining `<[^>]*>` tag drops. A stray `<` never followed by
  *    `>` is NOT a tag and survives as text.
  *  - Named entities decode LAST (after tags are gone, so a decoded
  *    `&lt;b&gt;` can never create a fresh tag): &lt; &gt; &quot;
  *    &apos; &nbsp; (to a plain space — token-friendly), and &amp;
  *    unconditionally last so `&amp;lt;` yields the literal `&lt;`.
  *    Numeric character references (`&#65;`) are left intact — regex
  *    replacement cannot compute codepoints on either engine, and the
  *    curation-grade named set covers the markup-significant cases.
  *
  * Map-only, zero shuffle, one pass per rewrite over the row's text;
  * at 100 TB this is scan-bound exactly like the other text kernels.
  */
object Html {

  private[graft] val BlockTags: String =
    "p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|section|article|" +
      "header|footer|nav|blockquote|pre|hr|form|title"

  /** The rewrite chain as (pattern, replacement) regex steps — shared
    * shape with the q241 oracle's DuckDB chain (which uses `\\1` instead
    * of `$1` and a 'g' option instead of Java's replace-all default).
    */
  private[graft] val RegexSteps: Seq[(String, String)] = Seq(
    // \z, not $: Java's default $ also matches BEFORE a final newline,
    // RE2's does not — \z means end-of-input on both engines
    ("(?is)<script\\b[^>]*>.*?(</script\\s*>|\\z)", ""),
    ("(?is)<style\\b[^>]*>.*?(</style\\s*>|\\z)", ""),
    ("(?s)<!--.*?(-->|\\z)", ""),
    ("(?s)<!\\[CDATA\\[(.*?)(\\]\\]>|\\z)", "$1"),
    (s"(?i)</?($BlockTags)\\b[^>]*>", "\n"),
    ("<[^>]*>", ""))

  /** Literal entity decodes, in application order (&amp; LAST). */
  private[graft] val EntitySteps: Seq[(String, String)] = Seq(
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""), ("&apos;", "'"),
    ("&nbsp;", " "), ("&amp;", "&"))

  /** Visible text of an HTML column, per the contract above. */
  def htmlExtract(c: Column): Column = {
    val stripped = RegexSteps.foldLeft(c) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }
    EntitySteps.foldLeft(stripped) { case (acc, (from, to)) =>
      // replace(): literal, codegen'd, identical builtin in DuckDB
      call_function("replace", acc, lit(from), lit(to))
    }
  }
}
