package graft.operators

import graft.SparkSpecBase

class SamplingSpec extends SparkSpecBase {

  private lazy val docs =
    graft.Tables.documents(spark, Sf001).select("doc_id", "lang", "source")

  test("hash sampling is deterministic, and 0/100 are exact bounds") {
    val s1 = Sampling.hashSample(docs, "doc_id", 30).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs, "doc_id", 30).collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    assert(Sampling.hashSample(docs, "doc_id", 100).count() == docs.count())
    assert(Sampling.hashSample(docs, "doc_id", 0).count() == 0L)
  }

  test("NULL ids get a defined bucket: pct=100 really keeps every row") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    assert(Sampling.hashSample(df, "doc_id", 100).count() == 3L)
    // and the NULL row's fate is deterministic at any rate
    val k30a = Sampling.hashSample(df, "doc_id", 30).collect().length
    val k30b = Sampling.hashSample(df, "doc_id", 30).collect().length
    assert(k30a == k30b)
  }

  test("stratified rates hold per stratum on the fixture") {
    val sample = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 100, "de" -> 50), defaultPct = 25)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = sample.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") == total("en")) // rate 100 keeps everything, exactly
    val deRatio = kept("de").toDouble / total("de")
    assert(deRatio > 0.3 && deRatio < 0.7, s"de keep ratio $deRatio")
    val restTotal = total.filterNot(k => Set("en", "de")(k._1)).values.sum
    val restKept = kept.filterNot(k => Set("en", "de")(k._1)).values.sum
    val restRatio = restKept.toDouble / restTotal
    assert(restRatio > 0.12 && restRatio < 0.38, s"default keep ratio $restRatio")
  }
}
