package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Pins Html.htmlExtract's regex CONTRACT on hostile markup — unclosed
  * tags/comments/CDATA, entities (named, double-encoded, numeric),
  * attribute edge cases, stray `<`. The happy path + DuckDB parity is
  * q241's oracle gate; this spec is where the defined-behavior corners
  * live.
  */
class HtmlSpec extends SparkSpecBase {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Html.htmlExtract(col("h"))).head().getString(0)

  test("script/style strip with content, case-insensitive, unclosed to EOF") {
    assert(extract("a<script>var x = 1 < 2;</script>b") == "ab")
    assert(extract("a<SCRIPT type=\"t\">x</ScRiPt >b") == "ab")
    assert(extract("a<style>p { color: red }</style>b") == "ab")
    // unclosed: drops to end of input — boilerplate never leaks through
    assert(extract("a<script>var x = 1;") == "a")
    assert(extract("a<style>p {}") == "a")
    // a closed script followed by text keeps the text (lazy, not greedy)
    assert(extract("<script>x</script>a<script>y</script>b") == "ab")
  }

  test("comments strip, unclosed to EOF, commented-out markup stays gone") {
    assert(extract("a<!-- hidden <b>bold</b> -->c") == "ac")
    assert(extract("a<!-- unclosed") == "a")
    // comments strip after script: a commented script is just a comment
    assert(extract("a<!--<script>x</script>-->b") == "ab")
  }

  test("CDATA unwraps to character data; unclosed unwraps to EOF") {
    assert(extract("a<![CDATA[x < y & z]]>b") == "ax < y & zb")
    assert(extract("a<![CDATA[tail") == "atail")
    // pinned order: a <!-- INSIDE CDATA text opens a comment (comments
    // strip before CDATA unwrap) — the documented, engine-agreed contract
    assert(extract("a<![CDATA[x<!--y]]>b") == "ax")
  }

  test("block tags become newlines; other tags vanish; stray < survives") {
    assert(extract("<p>a</p><div>b</div>") == "\na\n\nb\n")
    assert(extract("a<br/>b<BR>c") == "a\nb\nc")
    assert(extract("<span>a</span><em>b</em>") == "ab")
    assert(extract("<H2 class=\"x\">t</h2>") == "\nt\n")
    // the <[^>]*> contract: a bare < with a LATER > forms a "tag" and the
    // span drops (what a regex extractor does to unescaped comparisons —
    // valid HTML escapes them); with no > anywhere after, the < survives
    assert(extract("1 < 2 and 3 > 2") == "1  2")
    assert(extract("a < b") == "a < b")
    // malformed nesting: <div <span> is ONE tag per the <[^>]*> contract
    assert(extract("a<div <span>b") == "a\nb")
    // blockish prefix must not match: <preface> is not <pre>
    assert(extract("a<preface>b") == "ab")
  }

  test("entities: named set, &-producers last, double-encoding, numeric") {
    assert(extract("&lt;b&gt; &quot;q&quot; &apos;a&apos;") ==
      "<b> \"q\" 'a'")
    assert(extract("a&nbsp;b") == "a b")
    // &amp;lt; is an ENCODED &lt; — must yield the literal text "&lt;",
    // never a second decode round (and never a fresh tag)
    assert(extract("&amp;lt;script&amp;gt;") == "&lt;script&gt;")
    // decoded angle brackets appear AFTER tag stripping: no fresh tag
    assert(extract("&lt;script&gt;x&lt;/script&gt;") == "<script>x</script>")
    // printable-ASCII numeric refs DECODE (round-15): decimal + lowercase
    // hex twins, 32..126
    assert(extract("&#65;&#x41;") == "AA")
    assert(extract("&#32;&#x7e;&#126;") == " ~~")
    // the &-producing numeric forms behave like &amp;: last, no cascade
    assert(extract("&#38;lt;") == "&lt;")
    assert(extract("&#x26;gt;") == "&gt;")
    // non-canonical / out-of-range forms stay intact — the contract is
    // the generated literal chain, not a codepoint parser
    assert(extract("&#X41;&#065;&#10;&#200;&#x1f600;") ==
      "&#X41;&#065;&#10;&#200;&#x1f600;")
    assert(extract("&unknown;") == "&unknown;")
  }

  test("EntityChain kernel + amp pass equals the naive replace fold") {
    // the &-anchored kernel's CONTRACT is the sequential literal-replace
    // fold over EntitySteps followed by ONE simultaneous amp-forms regex
    // pass — pin equality on adversarial inputs, including cascades
    // where one step's output forms a later pattern
    def naive(s: String): String =
      Html.EntitySteps.foldLeft(s) { case (acc, (f, t)) => acc.replace(f, t) }
        .replaceAll(Html.AmpFormsPattern, "&")
    def full(s: String): String =
      Html.applyEntitySteps(s).replaceAll(Html.AmpFormsPattern, "&")
    val cases = Seq(
      "", "no entities here", "&", "&&", "&#", "&#;", "&amp;", "&amp;amp;",
      "&&#35;65;", // '#' output forms a LATER numeric pattern -> decodes on
      "&#38;#65;", // '&' output is the amp pass -> cannot cascade into numerics
      "&#38;lt;", "&#x26;gt;", "&lt;&#76;&#x4d;&gt;", "&#32;&#x7e;&#126;",
      "&#065;&#X41;&#10;&#200;&#x1f600;&unknown;",
      "a&nbsp;b&quot;c&apos;d", "&#3", "x&#35;65;y", "&#35;&#38;&#35;",
      "&#38;&#38;#65;", "&#38;amp;", "&#x26;amp;lt;", "trailing amp &")
    cases.foreach { s =>
      assert(full(s) == naive(s), s"kernel diverged on '$s'")
    }
    // the cascade pinned by value too: &#35; -> '#', minting &#65; -> 'A'
    assert(full("&&#35;65;") == "A")
    assert(extract("&&#35;65;") == "A")
    // the amp pass is SIMULTANEOUS: double-escaped ampersand decodes one
    // level, never cascades to a bare & (round-15 review catch)
    assert(extract("&#38;amp;") == "&amp;")
    assert(extract("&#x26;amp;") == "&amp;")
    assert(extract("&#38;lt;") == "&lt;")
  }

  test("composed page: structure to lines, boilerplate positions") {
    val page = "<html><head><title>T</title><script>s</script></head>" +
      "<body><h1>Head</h1><p>body text</p><!--c--><footer>f</footer></body></html>"
    assert(extract(page) == "\nT\n\nHead\n\nbody text\n\nf\n")
  }
}
