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

  /** Header-level image decoder over public container formats: PNG
    * dimensions from the IHDR chunk (PNG spec: 8-byte signature, then the
    * first chunk must be IHDR whose data starts with two big-endian u32s,
    * width then height), JPEG dimensions from the first SOFn marker segment
    * (JPEG/JFIF: 2-byte segments, each 0xFF marker + 2-byte big-endian
    * length; SOF payload is precision u8, height u16, width u16), WAV
    * validity from the RIFF/WAVE header. Pixel decoding (which needs a
    * codec library this container lacks) is out of scope — geometry and
    * integrity come from the real container bytes, and a corrupt or
    * truncated header flags `ok = false` instead of throwing.
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
      else if (bytes.length >= 8 && bytes(4) == 'f' && bytes(5) == 't' &&
          bytes(6) == 'y' && bytes(7) == 'p') Some("mp4")
      else None

    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

    /** PNG: signature (8) + IHDR chunk = length u32 (>= 13), type "IHDR",
      * then width u32 / height u32. CRCs are deliberately not verified —
      * geometry extraction reads the header, integrity of the pixel stream
      * is the (absent) codec's concern.
      */
    private def pngDims(b: Array[Byte]): Option[(Int, Int)] =
      if (b.length >= 24 && be32(b, 8) >= 13 &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = be32(b, 16); val h = be32(b, 20)
        // u32 in spec but capped at 2^31-1 ("PNG four-byte unsigned
        // integers are limited to the range 0..2^31-1")
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          Some((w.toInt, h.toInt))
        else None
      } else None

    /** JPEG: walk marker segments from offset 2 until a start-of-frame
      * (SOF0..15 minus DHT/JPG/DAC, which reuse the 0xCn space) yields the
      * geometry. Standalone markers (TEM, RSTn) have no length field; a
      * segment length below 2, a missing 0xFF, or hitting start-of-scan /
      * end of buffer first means the header is corrupt → None.
      */
    private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      var pos = 2
      while (pos + 1 < b.length) {
        if ((b(pos) & 0xff) != 0xff) return None
        // fill bytes: consecutive 0xFF before a marker are legal padding
        var p = pos
        while (p + 1 < b.length && (b(p + 1) & 0xff) == 0xff) p += 1
        if (p + 1 >= b.length) return None
        val marker = b(p + 1) & 0xff
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          // payload: len u16, precision u8, height u16, width u16
          if (p + 9 >= b.length) return None
          val h = be16(b, p + 5); val w = be16(b, p + 7)
          return if (w > 0 && h > 0) Some((w, h)) else None
        }
        if (marker == 0xda || marker == 0xd9) return None // SOS/EOI before SOF
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) pos = p + 2
        else {
          if (p + 3 >= b.length) return None
          val segLen = be16(b, p + 2)
          if (segLen < 2) return None
          pos = p + 2 + segLen
        }
      }
      None
    }

    /** WAV: RIFF magic + chunk size + "WAVE" form type. No geometry. */
    private def wavOk(b: Array[Byte]): Boolean =
      b.length >= 12 && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    /** ISO-BMFF (MP4): the top-level box walk must consume the buffer
      * exactly — every box a big-endian u32 size (>= 8) + 4-char type,
      * boxes tiling the file with no trailing garbage. The expression-side
      * twin is `graft.functions.Mp4Meta.topLevelBoxes`.
      */
    private def mp4Ok(b: Array[Byte]): Boolean = {
      var pos = 0L; var n = 0
      while (pos + 8 <= b.length) {
        val size = be32(b, pos.toInt)
        if (size < 8 || pos + size > b.length) return false
        n += 1; pos += size
      }
      n >= 1 && pos == b.length
    }

    def decode(bytes: Array[Byte]): Meta = {
      if (bytes == null || bytes.isEmpty) return Meta(0, None, None, None, ok = false)
      sniffFormat(bytes) match {
        case Some("png") =>
          val d = pngDims(bytes)
          Meta(bytes.length, Some("png"), d.map(_._1), d.map(_._2), d.isDefined)
        case Some("jpeg") =>
          val d = jpegDims(bytes)
          Meta(bytes.length, Some("jpeg"), d.map(_._1), d.map(_._2), d.isDefined)
        case Some("wav") =>
          Meta(bytes.length, Some("wav"), None, None, wavOk(bytes))
        case Some("mp4") =>
          Meta(bytes.length, Some("mp4"), None, None, mp4Ok(bytes))
        case _ => Meta(bytes.length, None, None, None, ok = false)
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

  /** Demo corpus: fabricate binary payloads from the documents fixture —
    * used by tests and the driver has no binary fixture. The headers are
    * REAL container bytes (PNG signature + IHDR chunk, JPEG SOI + JFIF APP0
    * + SOF0 segment) whose geometry is a pure function of doc_id
    * (width = 16 + doc_id % 1000, height = 16 + 7·doc_id % 1000), so
    * [[MediaDecoder]] round-trips them and an oracle can rebuild the
    * expected metadata arithmetically (the q62 synthetic-injection
    * pattern). One deterministic slice (doc_id % 12 == 0) is a TRUNCATED
    * PNG — magic only, no IHDR — pinning the corrupt-flags-not-fails
    * contract; the doc_id % 3 == 2 slice carries no header at all.
    * Big-endian length fields are built with unhex(lpad(hex(…))) so payload
    * assembly stays whole-stage-codegen expressions, no UDF.
    */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val w = lit(16L) + col("doc_id") % 1000
    val h = lit(16L) + (col("doc_id") * 7) % 1000
    def be32(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
    def be16(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 4, "0"))
    val pngMagic = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    // 8 magic + 25 IHDR chunk (len + type + 13 data + CRC) = 33 header bytes
    val png = concat(pngMagic,
      lit(Array[Byte](0, 0, 0, 13)), lit("IHDR".getBytes("US-ASCII")),
      be32(w), be32(h),
      lit(Array[Byte](8, 2, 0, 0, 0)), // bit depth 8, truecolor, defaults
      lit(Array[Byte](0, 0, 0, 0)),    // CRC — not validated by header parse
      col("text").cast("binary"))
    // 2 SOI + 18 APP0/JFIF + 19 SOF0 = 39 header bytes
    val jfif = Array[Byte](0xff.toByte, 0xe0.toByte, 0x00, 0x10,
      'J', 'F', 'I', 'F', 0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00)
    val sofHead = Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x11, 0x08)
    val sofTail = Array[Byte](0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    val jpeg = concat(lit(Array[Byte](0xff.toByte, 0xd8.toByte)),
      lit(jfif), lit(sofHead), be16(h), be16(w), lit(sofTail),
      col("text").cast("binary"))
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 12 === 0, concat(pngMagic, lit("XX".getBytes("US-ASCII"))))
        .when(col("doc_id") % 3 === 0, png)
        .when(col("doc_id") % 3 === 1, jpeg)
        .otherwise(col("text").cast("binary"))
        .as("payload"))
  }
}
