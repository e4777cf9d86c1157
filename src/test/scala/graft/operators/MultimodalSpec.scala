package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  lazy val media = Multimodal.syntheticMedia(spark, Sf0001)

  test("withMediaMeta decodes format from magic bytes per partition") {
    val out = Multimodal.withMediaMeta(media, "payload")
    assert(out.schema("media_meta").dataType == Multimodal.MediaMetaSchema)
    val byFmt = out.groupBy(col("media_meta.format")).count()
      .collect().map(r => Option(r.getString(0)).getOrElse("raw") -> r.getLong(1)).toMap
    assert(byFmt.getOrElse("png", 0L) > 0)
    assert(byFmt.getOrElse("jpeg", 0L) > 0)
    assert(byFmt.getOrElse("raw", 0L) > 0) // unsniffable payloads flagged, not dropped
    val bad = out.filter(!col("media_meta.ok") && col("media_meta.format").isNotNull).count()
    assert(bad == 0)
  }

  test("decoded geometry is deterministic") {
    val a = Multimodal.withMediaMeta(media, "payload")
      .select("doc_id", "media_meta.width").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val b = Multimodal.withMediaMeta(media, "payload")
      .select("doc_id", "media_meta.width").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(a == b)
  }

  test("sampleChunks takes every k-th fixed-size chunk") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val df = Seq(Tuple1(payload)).toDF("bin")
      .select(Multimodal.sampleChunks(col("bin"), chunkSize = 10, everyK = 3).as("chunks"))
    val chunks = df.collect()(0).getSeq[Array[Byte]](0)
    assert(chunks.length == 4) // chunks 0,3,6,9 of 10
    assert(chunks.head.toSeq == payload.slice(0, 10).toSeq)
    assert(chunks(1).toSeq == payload.slice(30, 40).toSeq)
  }

  test("binary -> pseudo-embedding -> ANN composes end-to-end") {
    import org.apache.spark.sql.functions._
    val emb = Multimodal.pseudoEmbedding(media, "payload", dim = 16)
      .select(col("doc_id").as("vec_id"),
        transform(col("embedding"), _.cast("float")).as("embedding"))
    val topk = Similarity.bruteForceTopK(emb, k = 5, maxQueryId = 3)
    val rows = topk.collect()
    assert(rows.length == 15) // 3 queries x 5 neighbors
    // embeddings are deterministic functions of payload bytes
    val again = Multimodal.pseudoEmbedding(media, "payload", dim = 16)
      .select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val first = Multimodal.pseudoEmbedding(media, "payload", dim = 16)
      .select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again == first)
  }

  test("sampleChunks of an empty payload is an empty array") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Tuple1(Array.emptyByteArray)).toDF("bin")
      .select(Multimodal.sampleChunks(col("bin"), 10, 2).as("chunks"))
    assert(df.collect()(0).getSeq[Array[Byte]](0).isEmpty)
  }

  test("corrupt/empty payloads are flagged ok=false, not errors") {
    import spark.implicits._
    val df = Seq(Tuple1(Array.emptyByteArray)).toDF("payload")
    val out = Multimodal.withMediaMeta(df, "payload").select("media_meta.ok").collect()
    assert(!out(0).getBoolean(0))
  }
}
