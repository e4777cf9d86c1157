package graft.functions

import org.apache.spark.sql.functions._

/** Bit-parity of the WordGramHashes kernel with the interpreted HOF chain
  * it replaces — on fixture docs and adversarial edges. Parity here is what
  * keeps q24/q38 Jaccard values AND q25's MinHash signatures unchanged.
  */
class WordGramHashesSpec extends graft.SparkSpecBase {
  import spark.implicits._

  private def hofGrams(c: org.apache.spark.sql.Column, n: Int) =
    array_sort(array_distinct(transform(
      TextFunctions.shingles(c, n), x => xxhash64(x))))

  private val edges = Seq(
    "",                       // empty: one empty-token gram
    "one",                    // single token
    "a b",                    // fewer tokens than n=3: whole-text fallback
    "a b c",                  // exactly n tokens
    "a  b c d",               // doubled space -> empty token mid-stream
    " leading and trailing ", // empty first/last tokens
    "dup dup dup dup dup",    // identical grams collapse via distinct
    "café naïve 中文 emoji😀 x" // multibyte UTF-8
  )

  test("kernel is bit-identical to the HOF formulation (n=1 and n=3)") {
    val fixture = graft.Tables.documents(spark, Sf0001).select($"text")
    val edge = edges.toDF("text")
    for (df <- Seq(fixture, edge); n <- Seq(1, 3)) {
      val both = df.select(
        WordGramHashes.wordGramHashes($"text", n).as("kernel"),
        hofGrams($"text", n).as("hof"))
      assert(both.filter($"kernel" =!= $"hof").count() == 0)
    }
  }

  test("null text yields null, not an empty gram set") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "a b c"))
      .toDF("id", "text")
      .select($"id", WordGramHashes.wordGramHashes($"text", 3).as("g"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(1) && !rows(1).isNullAt(1))
  }
}
