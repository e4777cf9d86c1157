package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.operators.{Dedup, Expectations}

/** The crawl-ingest twin (round-14 verdict ask #10): extract → validate →
  * near-dup-safe split must produce IDENTICAL rows over a MemoryStream and
  * over the same frame as a batch, a planted violation must quarantine
  * (never receive a split), and the plan must keep splitStreamMinhash's
  * no-broadcast contract through the composition.
  */
class WebIngestSpec extends SparkSpecBase {
  import spark.implicits._

  // wrap a doc in markup the extractor must strip; a trailing script
  // plants boilerplate that must NOT reach the split's shingle walk
  private def page(text: String): String =
    s"<html><body><p>$text</p><script>nav()</script></body></html>"

  private val rules = Seq(
    Expectations.Expect("tokens_min_3",
      size(split(col("text"), " ")) >= 3))

  test("MemoryStream ingest equals the batch run; violations quarantine") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull)
    val isNew = col("doc_id") >= 400
    val corpus = docs.filter(!isNew)
    val labels = Dedup.contractedComponents(
      Dedup.minhashLsh(corpus, shingleSize = 3, numHashes = 32, bands = 8,
        threshold = 0.5).select("doc_id_a", "doc_id_b"))
    val idx = Dedup.minhashSplitIndex(corpus, labels)
    // arrivals: real docs wrapped in markup + one planted violation (a
    // 2-token page) that must route to quarantine
    val arrivalRows = docs.filter(isNew).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), page(r.getString(1)))) :+
      ((99999L, page("too short")))
    val arrivals = arrivalRows.toSeq.toDF("doc_id", "html")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getSeq[String](4).toList, r.getString(5)))).toMap

    val batch = canon(WebIngest.ingest(arrivals, idx, rules, threshold = 0.5))
    assert(batch.contains(99999L))
    assert(batch(99999L)._5 == "quarantine")
    assert(batch(99999L)._3.isEmpty, "a quarantined page must carry no split")
    assert(batch(99999L)._4 == List("tokens_min_3"))
    val admits = batch.filter(_._2._5 == "admit")
    assert(admits.nonEmpty && admits.forall(_._2._3.nonEmpty))
    // the extractor did its job: a markup-matching arrival inherits its
    // corpus twin's cluster (the equal-shingle-set tier), so at least one
    // admit lands in a cluster smaller than its own id
    assert(admits.exists { case (id, (cl, _, _, _, _)) =>
      cl.exists(_.asInstanceOf[Long] < id)
    }, "no arrival matched its corpus near-dup through the markup wrap")

    val input = MemoryStream[(Long, String)]
    val q = WebIngest.ingest(input.toDF().toDF("doc_id", "html"),
        idx, rules, threshold = 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("web_ingest_stream").start()
    try {
      val (a, b) = arrivalRows.splitAt(arrivalRows.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      assert(canon(spark.table("web_ingest_stream")) == batch)
    } finally q.stop()
  }

  test("composed ingest keeps the no-broadcast contract") {
    val docs = graft.Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull)
    val isNew = col("doc_id") >= 400
    val corpus = docs.filter(!isNew)
    val labels = Dedup.contractedComponents(
      Dedup.jaccardPairs(corpus, 0.5).select("doc_id_a", "doc_id_b"))
    val arrivals = docs.filter(isNew)
      .select(col("doc_id"), concat(lit("<p>"), col("text"), lit("</p>")).as("html"))
    val out = WebIngest.ingest(arrivals,
      Dedup.minhashSplitIndex(corpus, labels), rules, threshold = 0.5)
    val plan = out.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastExchange"), s"corpus broadcast in plan:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"corpus broadcast join:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffled hash joins:\n$plan")
  }
}
