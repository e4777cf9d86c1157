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
