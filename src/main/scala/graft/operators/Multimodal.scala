package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/video
  * payloads ride as opaque `binary` columns next to typed metadata; decode /
  * feature-extraction runs per-partition so a real decoder (JNI/FFI image
  * lib) would amortize its init cost across a batch of rows.
  *
  * The decode kernel itself is STUBBED — the container has no image/audio
  * libraries — behind `MediaDecoder`. The Spark-side contract is real and
  * tested: schemas, the mapPartitions batch shape, null/corrupt handling,
  * and partition sizing. Swapping in a real decoder changes one object.
  */
object Multimodal {

  /** Metadata emitted by decode: media geometry + integrity digest. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("ok", BooleanType, nullable = false)))

  /** Deterministic stand-in for an image decoder: sniffs magic bytes for
    * the format and fabricates geometry from a stable hash of the payload.
    * A production decoder replaces `decode` only.
    */
  object MediaDecoder {
    final case class Meta(nBytes: Int, format: Option[String],
                          width: Option[Int], height: Option[Int], ok: Boolean)

    def sniffFormat(bytes: Array[Byte]): Option[String] =
      if (bytes.length >= 8 &&
          (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
        Some("png")
      else if (bytes.length >= 3 &&
          (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) Some("jpeg")
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == 'F') Some("wav")
      else None

    def decode(bytes: Array[Byte]): Meta = {
      if (bytes == null || bytes.isEmpty) return Meta(0, None, None, None, ok = false)
      val fmt = sniffFormat(bytes)
      fmt match {
        case Some(f) =>
          // ??? real decode goes here; geometry fabricated deterministically
          val h = graft.functions.SimHash64.fnv1a(new String(bytes.map(b => (b & 0x7f).toChar)))
          Meta(bytes.length, Some(f),
            Some(16 + math.floorMod(h, 1024).toInt),
            Some(16 + math.floorMod(h >>> 32, 1024).toInt), ok = true)
        case None => Meta(bytes.length, None, None, None, ok = false)
      }
    }
  }

  /** Attach decoded metadata to a binary column. mapPartitions (not a
    * per-row UDF) so a native decoder initializes once per partition; the
    * output schema is explicit, not inferred.
    */
  def withMediaMeta(df: DataFrame, binaryCol: String,
                    metaCol: String = "media_meta"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(metaCol, MediaMetaSchema, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      // per-partition decoder init happens here in a real implementation
      rows.map { r =>
        val m = MediaDecoder.decode(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ Row(m.nBytes, m.format.orNull,
          m.width.map(Int.box).orNull, m.height.map(Int.box).orNull, m.ok))
      }
    }(enc)
  }

  /** Frame sampling for chunked payloads (video-style): every k-th
    * fixed-size chunk of the binary, as an array column — pure expressions,
    * no UDF.
    */
  def sampleChunks(bin: org.apache.spark.sql.Column, chunkSize: Int,
                   everyK: Int): org.apache.spark.sql.Column = {
    val nChunks = ceil(octet_length(bin).cast("double") / chunkSize).cast("int")
    // empty/null payload -> empty array, not a single empty chunk
    when(nChunks.isNull || nChunks === 0,
      array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.BinaryType)))
      .otherwise(filter(
        transform(sequence(lit(0), nChunks - 1),
          i => substring(bin, i * chunkSize + 1, lit(chunkSize))),
        (_, i) => i % everyK === 0))
  }

  /** Stubbed feature extraction: a deterministic pseudo-embedding from the
    * payload bytes (per-dimension FNV of payload + dim index, scaled to
    * [-1, 1]). A real model-inference kernel replaces the hash only — the
    * pipeline shape (binary -> array<double> -> ANN/near-dup search over
    * graft.operators.Similarity / Dedup) is the production contract and is
    * exercised end-to-end in MultimodalSpec.
    */
  def pseudoEmbedding(df: DataFrame, binaryCol: String, dim: Int,
                      embCol: String = "embedding"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(embCol, ArrayType(DoubleType, containsNull = false), nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      // model/session init would happen once per partition here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val base = graft.functions.SimHash64.fnv1a(
          if (bytes == null) "" else java.util.Base64.getEncoder.encodeToString(bytes))
        val emb = Array.tabulate(dim) { d =>
          val h = graft.functions.SimHash64.fnv1a(s"$base:$d")
          (h.toDouble / Long.MaxValue.toDouble)
        }
        Row.fromSeq(r.toSeq :+ emb.toSeq)
      }
    }(enc)
  }

  /** Demo corpus: fabricate binary payloads from the documents fixture
    * (PNG/JPEG magic headers + text bytes) — used by tests and the driver
    * has no binary fixture.
    */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)),
               col("text").cast("binary")))
        .when(col("doc_id") % 3 === 1,
          concat(lit(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)),
                 col("text").cast("binary")))
        .otherwise(col("text").cast("binary"))
        .as("payload"))
  }
}
