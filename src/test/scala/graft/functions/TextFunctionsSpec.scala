package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("shingles produce sliding word n-grams") {
    val out = Seq("a b c d").toDF("t")
      .select(TextFunctions.shingles($"t", 2).as("s"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("a b", "b c", "c d"))
  }

  test("shingles on short docs fall back to whole text") {
    val out = Seq("a b").toDF("t")
      .select(TextFunctions.shingles($"t", 3).as("s"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("a b"))
  }

  test("langId picks the marker-dominant language with fixed tie priority") {
    val df = Seq(
      "the cat and the dog is here",
      "der hund und die katze ist da",
      "le chat et la souris est la",
      "xyz qrs tuv").toDF("t")
      .select(TextFunctions.langId($"t").as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "de", "fr", "und"))
  }

  test("token stats basics") {
    val r = Seq("the quick the fox").toDF("t").select(
      TextFunctions.tokenCount($"t").as("n"),
      size(TextFunctions.tokenSet($"t")).as("nd"),
      TextFunctions.stopwordRatio($"t").as("sr")).collect()(0)
    assert(r.getInt(0) == 4 && r.getInt(1) == 3 && r.getDouble(2) == 0.5)
  }

  test("fingerprint is case-insensitive md5") {
    val r = Seq(("Hello World", "hello world")).toDF("a", "b")
      .select(TextFunctions.fingerprint($"a").as("fa"),
              TextFunctions.fingerprint($"b").as("fb")).collect()(0)
    assert(r.getString(0) == r.getString(1))
  }

  test("fnv1a matches the published test vector") {
    // FNV-1a 64 of empty string is the offset basis; of "a" is 0xaf63dc4c8601ec8c
    assert(SimHash64.fnv1a("") == 0xcbf29ce484222325L)
    assert(SimHash64.fnv1a("a") == 0xaf63dc4c8601ec8cL)
  }
}
