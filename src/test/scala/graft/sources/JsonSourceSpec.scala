package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class JsonSourceSpec extends SparkSpecBase {
  import spark.implicits._

  test("jsonLines round-trip is lossless on hostile strings") {
    val rows = Seq(
      (1L, "plain text", "en"),
      (2L, "embedded\nnewline and\ttab", "en"),
      (3L, "\"quotes\" and \\backslash\\ and /slash/", "de"),
      (4L, "unicode: éü中文 😀 and NUL-adjacent ", "fr"),
      (5L, null, "en"))
    val df = rows.toDF("doc_id", "text", "lang")
    val path = "/tmp/graft_jsonl_roundtrip"
    Sinks.jsonLines(df, path)
    val back = JsonSource.jsonLines(spark, path, "doc_id LONG, text STRING, lang STRING")
    val got = back.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(got == rows.map(t => (t._1, Option(t._2), t._3)).toSet)
  }

  test("jsonLines partial schema reads only the declared fields") {
    val df = Seq((1L, "a", "en", 9L), (2L, "b", "de", 8L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val path = "/tmp/graft_jsonl_partial"
    Sinks.jsonLines(df, path)
    val back = JsonSource.jsonLines(spark, path, "doc_id LONG, lang STRING")
    assert(back.columns.toSeq == Seq("doc_id", "lang"))
    assert(back.count() == 2L)
  }
}
