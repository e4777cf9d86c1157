package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpecBase {
  import spark.implicits._

  private def redactOne(text: String): (String, Int, Int, Int) = {
    val r = Seq(text).toDF("t").select(
      Privacy.redactPii($"t"),
      Privacy.emailCount($"t"),
      Privacy.phoneCount($"t"),
      Privacy.ipv4Count($"t")).head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  test("each PII kind is masked and counted") {
    assert(redactOne("mail bob.smith+x@sub.example.co.uk end") ==
      ("mail <EMAIL> end", 1, 0, 0))
    assert(redactOne("call 555-0134 or 555-9999") ==
      ("call <PHONE> or <PHONE>", 0, 2, 0))
    assert(redactOne("host 192.168.1.200 down") ==
      ("host <IP> down", 0, 0, 1))
  }

  test("mixed PII in one text; placeholders never re-match") {
    val (red, e, p, ip) = redactOne("a@b.io 555-1234 10.0.0.1 done")
    assert(red == "<EMAIL> <PHONE> <IP> done")
    assert((e, p, ip) == (1, 1, 1))
    // idempotent: a second pass over already-redacted text changes nothing
    assert(redactOne(red)._1 == red)
  }

  test("PII-free text passes through untouched") {
    val t = "plain words only, nothing sensitive here."
    assert(redactOne(t) == (t, 0, 0, 0))
  }

  test("near-misses do not match") {
    // no TLD, letters in octets, short phone
    assert(redactOne("x@y 1.2.3 555-12 a.b.c.d")._1 == "x@y 1.2.3 555-12 a.b.c.d")
  }

  test("synthetic PII injection is a pure function of doc_id") {
    val df = Seq((0L, "base"), (7L, "base"), (11L, "base"), (1L, "base"))
      .toDF("doc_id", "text")
      .select($"doc_id", Privacy.withSyntheticPii($"text", $"doc_id").as("t2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 0 hits all three injectors (0 % 5 = 0 % 7 = 0 % 11 = 0)
    assert(df(0L) == "base contact user0@example.com for details call 555-0000 now from 10.0.0.0")
    assert(df(7L) == "base call 555-0007 now")
    assert(df(11L) == "base from 10.11.0.77")
    assert(df(1L) == "base")
  }

  test("urlHost extracts the first host; '' when absent") {
    val r = Seq("go https://a.example.com/x and http://b.org/y", "no links")
      .toDF("t").select(Privacy.urlHost($"t")).collect().map(_.getString(0))
    assert(r.toSeq == Seq("a.example.com", ""))
  }
}
