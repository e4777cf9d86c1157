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

  /** Literal entity decodes, in application order. The &-PRODUCING forms
    * (&amp;, &#38;, &#x26;) are NOT in this list — they decode after it
    * as ONE simultaneous regex pass ([[AmpFormsPattern]]), unconditionally
    * last, so `&amp;lt;` / `&#38;lt;` yield the literal `&lt;` AND the
    * double-escaped `&#38;amp;` yields the literal `&amp;` (a sequential
    * trio would cascade: its `&#38;`→`&` output feeds the later `&amp;`
    * step — exactly the re-decode the &-last ordering exists to prevent;
    * round-15 review catch).
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
    named ++ numeric
  }

  /** The &-producing forms as one simultaneous (regex replace-all) pass:
    * left-to-right, produced text never re-scanned — both engines' regex
    * replace semantics, so `&#38;amp;` → `&amp;`, never `&`. Runs LAST.
    */
  private[graft] val AmpFormsPattern: String = "&(amp|#38|#x26);"

  /** The entity chain as DuckDB SQL wrapped around `inner` — generated
    * from the SAME EntitySteps list the Column chain folds over, so the
    * q241/q244 oracles replay the identical rewrite by construction
    * (one Scala source of truth, two engine renderings). Rendered as a
    * list_reduce FOLD, not nested replace() calls: EntitySteps.size steps nested
    * would blow DuckDB's 128-deep binder recursion cap, while the fold
    * is one flat list literal — semantics identical (left fold of
    * literal replaces, in EntitySteps order). Each list element encodes
    * one step as `to || from` (every `to` is a single ASCII char), so
    * the lambda is `replace(acc, x[2:], x[1])`.
    */
  private[graft] def entityChainSql(inner: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val elems = EntitySteps.map { case (from, to) => q(to + from) }
    val folded = s"list_reduce(list_prepend($inner, [${elems.mkString(", ")}]), " +
      "(acc, x) -> replace(acc, x[2:], x[1]))"
    // the &-producing forms: ONE simultaneous regex pass, last (see
    // AmpFormsPattern — a sequential trio would cascade &#38;amp; to &)
    s"regexp_replace($folded, ${q(AmpFormsPattern)}, '&', 'g')"
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
    val decoded = org.apache.spark.sql.GraftColumnBridge.column(
      EntityChain(org.apache.spark.sql.GraftColumnBridge.expression(stripped)))
    regexp_replace(decoded, AmpFormsPattern, "&")
  }

  /** [[EntityChain]]'s kernel: the EXACT left fold of literal replaces
    * over [[EntitySteps]] — semantics identical to chaining Spark's
    * `replace` builtin EntitySteps.size times (HtmlSpec pins equality against that
    * naive fold on adversarial inputs, including the cascades where one
    * step's output forms a later step's pattern) — but &-ANCHORED: every
    * pattern starts with '&', so each step checks only the string's '&'
    * positions (a handful per document) instead of scanning the whole
    * text. The naive fold is EntitySteps.size full passes per document — a ~200×
    * read amplification that took q241 from 0.6 s to 4.6 s the round
    * the numeric range landed; this kernel pays one position scan plus
    * ~|amps|·|pattern| compares per step, and a full `String.replace`
    * only for the steps that actually fire (≤ the number of distinct
    * entity kinds present). The &-producing forms are NOT part of this
    * fold — htmlExtract applies [[AmpFormsPattern]] as one regex pass
    * after it.
    */
  def applyEntitySteps(text: String): String = {
    var s = text
    var amps = ampPositions(s)
    if (amps.length == 0) return s
    var k = 0
    while (k < StepsFrom.length) {
      val from = StepsFrom(k)
      var found = false
      var i = 0
      while (!found && i < amps.length) {
        if (s.startsWith(from, amps(i))) found = true
        i += 1
      }
      if (found) {
        // literal replace-all, left-to-right non-overlapping — the exact
        // builtin semantics the chain contract is defined by
        s = s.replace(from, StepsTo(k))
        amps = ampPositions(s) // a fired step can shift/consume/mint '&'s
      }
      k += 1
    }
    s
  }

  private[this] lazy val StepsFrom: Array[String] = EntitySteps.map(_._1).toArray
  private[this] lazy val StepsTo: Array[String] = EntitySteps.map(_._2).toArray

  private def ampPositions(s: String): Array[Int] = {
    var n = 0
    var i = s.indexOf('&')
    while (i >= 0) { n += 1; i = s.indexOf('&', i + 1) }
    val out = new Array[Int](n)
    var j = 0
    i = s.indexOf('&')
    while (i >= 0) { out(j) = i; j += 1; i = s.indexOf('&', i + 1) }
    out
  }
}

/** The entity tail of [[Html.htmlExtract]] as ONE native codegen
  * expression (custom-operator preference order (b)): result identical to
  * the EntitySteps.size-step builtin replace chain — [[Html.applyEntitySteps]] IS that
  * fold — at ~1 pass instead of one per step (scaladoc there). The q241/q244
  * oracles still replay the chain itself (Html.entityChainSql's
  * list_reduce fold), so the fusion is hash-gated against the contract
  * every round. Same StaticInvoke-shaped codegen as [[NormalizeText]].
  */
case class EntityChain(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, StringType}

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"EntityChain requires string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      Html.applyEntitySteps(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Html.applyEntitySteps($c.toString()))")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): EntityChain =
    copy(child = newChild)
}
