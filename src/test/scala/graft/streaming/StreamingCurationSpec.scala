package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stateless curation operators compose with Structured Streaming
  * UNCHANGED — the point of keeping them map-only (pure column
  * expressions + stream-static broadcast joins): the same code that
  * curates a 100 TB batch corpus admits documents incrementally.
  */
class StreamingCurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("resampleToMixture applies identically to a document stream") {
    implicit val sqlCtx = spark.sqlContext
    val weights = Seq(("a", 500000L), ("b", 1000000L)).toDF("source", "weight_ppm")
    val docs = (1L to 300L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    val batchKept = graft.operators.Sampling.resampleToMixture(
        docs.toDF("doc_id", "source"), "doc_id", "source", weights)
      .collect().map(_.getLong(1)).toSet

    val input = MemoryStream[(Long, String)]
    val q = graft.operators.Sampling.resampleToMixture(
        input.toDF().toDF("doc_id", "source"), "doc_id", "source", weights)
      .writeStream.outputMode("append")
      .format("memory").queryName("resample_stream").start()
    try {
      val (first, rest) = docs.splitAt(100)
      input.addData(first); q.processAllAvailable()
      input.addData(rest); q.processAllAvailable()
      val streamKept = spark.table("resample_stream")
        .collect().map(_.getLong(1)).toSet
      assert(streamKept == batchKept)
    } finally q.stop()
  }

  test("MisraGries summary keeps its guarantees across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    // n = 500, capacity 16 -> any term with count > 500/17 ~ 29 survives
    val toks = Seq.fill(300)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 80).map(i => s"n$i")
    val input = MemoryStream[String]
    val q = input.toDF().toDF("t")
      .agg(graft.functions.MisraGries.sketch(col("t"), 16).as("mg"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("mg_stream").start()
    try {
      val (a, b) = scala.util.Random.shuffle(toks).splitAt(250)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      val got = spark.table("mg_stream")
        .select(explode(col("mg")))
        .select(col("col.term"), col("col.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got.contains("hot") && got.contains("warm"),
        s"heavy items lost across batches: ${got.keySet}")
      got.foreach { case (t, e) =>
        assert(e <= truth(t), s"$t: est $e above truth ${truth(t)}") }
      assert(got.size <= 16)
    } finally q.stop()
  }

  test("heavyState fold from a real document stream recounts to q116's answer") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull).select("doc_id", "text")
    val exact = graft.queries.Signals.q116HeavyTokens(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(exact.nonEmpty)
    // stream the corpus in three uneven microbatches; fold the SAME
    // heavyState transition q154 replays, via foreachBatch
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    var state = Seq.empty[(String, Long)]
    var n = 0L
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val (st, nn) = graft.queries.Signals.heavyState(b, state, n, 8192)
        state = st; n = nn
      }.start()
    try {
      val (a, rest) = rows.splitAt(rows.length / 5)
      val (b, c) = rest.splitAt(rest.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      input.addData(c); q.processAllAvailable()
    } finally q.stop()
    assert(n == docs.select(explode(split(col("text"), " "))).count(),
      "streamed token count diverged from the corpus")
    // exact recount of the streamed state's candidates over the archive
    val cands = state.map(_._1)
    val got = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .join(broadcast(cands.toDF("term")), "term")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 2000L >= n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(got == exact, "streamed fold + recount diverged from q116")
  }

  test("slidingChunks applies identically to a document stream") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq((1L, (1 to 40).map(i => s"w$i").mkString(" ")),
                   (2L, "a b c"))
    val batch = graft.operators.TextChunks.slidingChunks(
        docs.toDF("doc_id", "text"), chunkSize = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(4))).toSet

    val input = MemoryStream[(Long, String)]
    val q = graft.operators.TextChunks.slidingChunks(
        input.toDF().toDF("doc_id", "text"), chunkSize = 32, stride = 24)
      .writeStream.outputMode("append")
      .format("memory").queryName("chunks_stream").start()
    try {
      input.addData(docs)
      q.processAllAvailable()
      val stream = spark.table("chunks_stream")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(4))).toSet
      assert(stream == batch)
    } finally q.stop()
  }
}
