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

  test("winnowing fingerprints: identical docs match, near-dups overlap, unrelated don't") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val unrelated = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, nearDup), (4L, unrelated))
      .toDF("id", "t")
      .select($"id", WinnowFingerprint.winnow($"t").as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(2L)) // deterministic
    val overlapNear = fps(1L).intersect(fps(3L)).size.toDouble / fps(1L).size
    val overlapFar = fps(1L).intersect(fps(4L)).size.toDouble / fps(1L).size
    assert(overlapNear > 0.5, s"near-dup overlap $overlapNear")
    assert(overlapFar == 0.0)
    // shared-run guarantee: any common token run >= k+w-1 shares a fingerprint
    assert(fps(1L).intersect(fps(3L)).nonEmpty)
  }

  test("winnowing handles short and empty docs") {
    val df = Seq("", "a", "a b c").toDF("t")
      .select(WinnowFingerprint.winnow($"t", k = 5, w = 4).as("fp"))
    val out = df.collect().map(_.getSeq[Long](0))
    assert(out(0).isEmpty)
    assert(out(1).size == 1)
    assert(out(2).size == 1) // whole doc shorter than k -> one gram
  }

  test("fnv1a matches the published test vector") {
    // FNV-1a 64 of empty string is the offset basis; of "a" is 0xaf63dc4c8601ec8c
    assert(SimHash64.fnv1a("") == 0xcbf29ce484222325L)
    assert(SimHash64.fnv1a("a") == 0xaf63dc4c8601ec8cL)
  }

  test("tokensUnicode: splits on Unicode whitespace runs, drops empties") {
    def tok(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextFunctions.tokensUnicode($"t"))
        .head().getSeq[String](0)
    // tab, NBSP, ideographic space, NEL, thin space, CRLF, runs, ends
    assert(tok("a\tb c　d") == Seq("a", "b", "c", "d"))
    assert(tok("\t a  b  c\r\nd e ") == Seq("a", "b", "c", "d", "e"))
    assert(tok("") == Seq.empty)
    assert(tok(" \t 　 ") == Seq.empty)    // all-whitespace doc
    // the recovery property q142-q144 gate end-to-end: unicode tokens of
    // dirtied text equal plain tokens of the clean text
    val clean = "the quick brown fox"
    val dirty = "\t" + clean.replace(" ", "\u00A0") + " "
    assert(tok(dirty) == clean.split(" ").toSeq)
    // and the single-space tokenizer demonstrably fails on the same input
    val plain = Seq(dirty).toDF("t")
      .select(TextFunctions.tokens($"t")).head().getSeq[String](0)
    assert(plain.size != 4)
  }

  test("normalizeWs: C0 controls to spaces, runs collapsed, ends trimmed") {
    def norm(s: String): String =
      Seq(s).toDF("t").select(TextFunctions.normalizeWs($"t")).head().getString(0)
    assert(norm("\u0000a\t\tb   c  ") == "a b c")
    assert(norm("already clean") == "already clean")
    assert(norm(" \r\n\t ") == "")                  // all-dirt collapses away
    assert(norm("a\u000bb") == "a b")               // vertical tab is C0 too
  }
}
