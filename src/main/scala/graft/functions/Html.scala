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
  *  - Entities decode LAST (after tags are gone, so a decoded
  *    `&lt;b&gt;` can never create a fresh tag): the named set (&lt;
  *    &gt; &quot; &apos; &nbsp; — the last to a plain space,
  *    token-friendly), the printable-ASCII numeric character references
  *    (`&#32;`-`&#126;` plus lowercase-hex twins `&#x20;`-`&#x7e;` — a
  *    web corpus hits these constantly), and the &-producing forms
  *    (&amp; &#38; &#x26;) unconditionally last so `&amp;lt;` yields
  *    the literal `&lt;`. Non-canonical numeric forms (leading zeros,
  *    uppercase X/hex, out-of-range codepoints) are left intact — see
  *    [[EntitySteps]] for the exact generated contract.
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
    // RE2's does not — \z means end-of-input on both engines.
    // [ \t\n\f\r], not \s: Java's \s includes U+000B (vertical tab),
    // RE2's does not (the TextFunctions.UnicodeWsChars divergence) —
    // the explicit class is the engine-agreed whitespace contract
    ("(?is)<script\\b[^>]*>.*?(</script[ \\t\\n\\f\\r]*>|\\z)", ""),
    ("(?is)<style\\b[^>]*>.*?(</style[ \\t\\n\\f\\r]*>|\\z)", ""),
    ("(?s)<!--.*?(-->|\\z)", ""),
    ("(?s)<!\\[CDATA\\[(.*?)(\\]\\]>|\\z)", "$1"),
    (s"(?i)</?($BlockTags)\\b[^>]*>", "\n"),
    ("<[^>]*>", ""))

  /** Literal entity decodes, in application order. The &-PRODUCING steps
    * (&amp;, &#38;, &#x26;) come unconditionally LAST so `&amp;lt;` /
    * `&#38;lt;` yield the literal `&lt;` — decoding the ampersand first
    * would cascade into a second decode, which is NOT HTML's (single-pass)
    * semantics for the common double-escaped case.
    *
    * Numeric character references decode for the PRINTABLE-ASCII range —
    * `&#32;`..`&#126;` and their lowercase-hex twins `&#x20;`..`&#x7e;`
    * (lowercase `x`, lowercase hex digits, no leading zeros — the
    * canonical serializer forms) — as a generated chain of literal
    * replaces, the one rewrite shape BOTH engines replay verbatim (regex
    * replacement cannot compute codepoints on either engine; a generated
    * literal chain can spell out a bounded codepoint range). Everything
    * else (`&#10;`, uppercase `&#X41;`, `&#065;`, out-of-range) is left
    * intact — the chain IS the contract, exactly like the tag regexes.
    */
  private[graft] val EntitySteps: Seq[(String, String)] = {
    val named = Seq(
      ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""), ("&apos;", "'"),
      ("&nbsp;", " "))
    val numeric = (32 to 126).filter(_ != '&'.toInt).flatMap { cp =>
      val ch = cp.toChar.toString
      Seq((s"&#$cp;", ch), (f"&#x$cp%x;", ch))
    }
    val ampLast = Seq(("&#38;", "&"), ("&#x26;", "&"), ("&amp;", "&"))
    named ++ numeric ++ ampLast
  }

  /** The entity chain as DuckDB SQL wrapped around `inner` — generated
    * from the SAME EntitySteps list the Column chain folds over, so the
    * q241/q244 oracles replay the identical rewrite by construction
    * (one Scala source of truth, two engine renderings). Rendered as a
    * list_reduce FOLD, not nested replace() calls: 201 steps nested
    * would blow DuckDB's 128-deep binder recursion cap, while the fold
    * is one flat list literal — semantics identical (left fold of
    * literal replaces, in EntitySteps order). Each list element encodes
    * one step as `to || from` (every `to` is a single ASCII char), so
    * the lambda is `replace(acc, x[2:], x[1])`.
    */
  private[graft] def entityChainSql(inner: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val elems = EntitySteps.map { case (from, to) => q(to + from) }
    s"list_reduce(list_prepend($inner, [${elems.mkString(", ")}]), " +
      "(acc, x) -> replace(acc, x[2:], x[1]))"
  }

  /** The WHOLE htmlExtract rewrite rendered as DuckDB SQL over `inner` —
    * the regex chain generated from the SAME RegexSteps the Column chain
    * folds over (every pattern is written in the RE2∩java.util.regex
    * common dialect — `\z` not `$`, explicit whitespace class not `\s`),
    * then the entity tail via [[entityChainSql]]. Rendering differences
    * are mechanical: Java's `$1` backref becomes RE2's `\1`, replace-all
    * becomes the 'g' option, and the block-tag newline renders as
    * chr(10) so the generated SQL stays newline-free.
    */
  private[graft] def htmlExtractSql(inner: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val rx = RegexSteps.foldLeft(inner) { case (acc, (pat, repl)) =>
      val r = repl match {
        case ""    => "''"
        case "$1"  => "'\\1'"
        case "\n"  => "chr(10)"
        case other => q(other)
      }
      s"regexp_replace($acc, ${q(pat)}, $r, 'g')"
    }
    entityChainSql(rx)
  }

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
