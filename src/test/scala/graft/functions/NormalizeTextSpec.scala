package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class NormalizeTextSpec extends SparkSpecBase {
  import spark.implicits._

  private def norm(s: String): String = NormalizeText.compute(s)

  test("NFC composes decomposed accents to one dedup key") {
    val composed = "café"           // é as one code point
    val decomposed = "café"        // e + combining acute
    assert(norm(composed) == norm(decomposed))
    assert(norm(decomposed) == "café")
  }

  test("ascii whitespace runs collapse, edges trim, case folds A-Z only") {
    assert(norm("  Hello\t\tWORLD \r\n") == "hello world")
    assert(norm("a\fb\nc") == "a b c")
    assert(norm(" \t\r\n") == "")
    // non-ascii uppercase is left alone (engine-dependent folding excluded)
    assert(norm("ÉTÉ Straße") == "ÉtÉ straße")
  }

  test("vertical tab is NOT whitespace (RE2 \\s parity with the oracle)") {
    // RE2's \s is [\t\n\f\r ] — no \x0B. A vertical tab must survive as a
    // literal char so Spark and DuckDB derive the same dedup key.
    val vt = 11.toChar.toString // \x0B, vertical tab
    assert(norm(s"a${vt}b") == s"a${vt}b")
    assert(norm(s"A $vt B") == s"a $vt b")
    // and it does not trim at the edges either
    assert(norm(s"${vt}x$vt") == s"${vt}x$vt")
  }

  test("expression matches the kernel over the fixture and preserves nulls") {
    val df = Seq(Some("  A  b́ "), None).toDF("text")
    val out = df.select(NormalizeText.normalizeText(col("text"))).collect()
    assert(out(0).getString(0) == "a b́".replace("b́", "b́"))
    assert(out(0).getString(0) == norm("  A  b́ "))
    assert(out(1).isNullAt(0))
    // corpus pass: expression output equals driver-side kernel on a sample
    val docs = graft.Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .limit(50).select(col("text"),
        NormalizeText.normalizeText(col("text")).as("norm"))
    docs.collect().foreach { r =>
      assert(r.getString(1) == norm(r.getString(0)))
    }
  }
}
