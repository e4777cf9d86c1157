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
    // sniffable-but-truncated payloads (the doc_id % 12 PNG slice carries
    // the signature and no IHDR) keep the sniffed format with ok = false —
    // flagged by the real parser, never thrown
    val bad = out.filter(!col("media_meta.ok") && col("media_meta.format").isNotNull)
      .select("doc_id").collect().map(_.getLong(0))
    assert(bad.nonEmpty && bad.forall(_ % 12 == 0))
  }

  test("header parser reads real PNG IHDR and JPEG SOF geometry") {
    // every intact payload's decoded geometry equals the planted formula —
    // a true container-byte round-trip, not a fabricated hash
    val out = Multimodal.withMediaMeta(media, "payload")
      .filter(col("media_meta.ok"))
      .select("doc_id", "media_meta.width", "media_meta.height").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 16 + (id % 1000).toInt, s"width of doc $id")
      assert(r.getInt(2) == 16 + ((id * 7) % 1000).toInt, s"height of doc $id")
    }
  }

  test("decoder handles hand-built container bytes and corrupt walks") {
    import Multimodal.MediaDecoder
    // minimal real PNG: signature + IHDR(640x480)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80.toByte, 0, 0, 0x01, 0xe0.toByte, 8, 6, 0, 0, 0)
    val m = MediaDecoder.decode(png)
    assert(m == MediaDecoder.Meta(png.length, Some("png"), Some(640), Some(480), ok = true))
    // JPEG whose SOF0 sits after a COM segment the walker must skip
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xfe.toByte, 0, 4, 'h', 'i', // COM, length 4
      0xff.toByte, 0xc0.toByte, 0, 11, 8, 0x01, 0x00, 0x02, 0x00, 1, 0x11, 0, 0)
    val j = MediaDecoder.decode(jpeg)
    assert(j.format.contains("jpeg") && j.width.contains(512) &&
      j.height.contains(256) && j.ok)
    // DHT (0xC4) must NOT be taken for a SOF; a zero segment length must
    // fail instead of looping
    val dhtOnly = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xc4.toByte, 0, 0)
    assert(!MediaDecoder.decode(dhtOnly).ok)
    // PNG signature with a non-IHDR first chunk: sniffed, not ok
    val noIhdr = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'X', 'X', 'X', 'X', 0, 0, 0, 1, 0, 0, 0, 1)
    val n = MediaDecoder.decode(noIhdr)
    assert(n.format.contains("png") && !n.ok && n.width.isEmpty)
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

  test("dhashBits: 64 bits, deterministic, 1-byte edit moves <= 1 bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Perceptual
    val body = ("abcdefgh" * 20).getBytes("US-ASCII") // 160-byte body
    val hdr = Array.fill[Byte](10)(0x7f)
    val edited = body.clone(); edited(0) = 'Z'
    val far = body.map(b => (255 - b).toByte) // inverted: differences flip
    val df = Seq(
      (1L, hdr ++ body), (2L, hdr ++ body), (3L, hdr ++ edited),
      (4L, hdr ++ far)).toDF("id", "bin")
      .select($"id", Perceptual.dhashBits($"bin", lit(10)).as("bits"))
    val bits = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bits.values.forall(b => b.length == 64 && b.forall(c => c == '0' || c == '1')))
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(bits(1L) == bits(2L))              // identical payloads
    assert(ham(bits(1L), bits(3L)) <= 1)      // first-body-byte edit
    assert(ham(bits(1L), bits(4L)) > 16)      // inversion flips comparisons
  }

  test("WavMeta round-trips a hand-built canonical PCM header") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.WavMeta
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val data = Array.fill[Byte](320)(0x40)
    val wav = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(16000) ++
      le32(16000 * 4) ++ le16(4) ++ le16(16) ++ "data".getBytes ++
      le32(data.length) ++ data
    val out = Seq((1L, wav), (2L, "not a wav at all".getBytes))
      .toDF("id", "bin")
      .select($"id", WavMeta.isCanonical($"bin").as("ok"),
        WavMeta.channels($"bin").as("ch"), WavMeta.sampleRate($"bin").as("sr"),
        WavMeta.bitsPerSample($"bin").as("bits"),
        WavMeta.durationSec($"bin").as("dur"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(1))
    assert(out(1L).getLong(2) == 2 && out(1L).getLong(3) == 16000 &&
      out(1L).getLong(4) == 16)
    assert(math.abs(out(1L).getDouble(5) - 320.0 / 64000.0) < 1e-12)
    assert(!out(2L).getBoolean(1)) // flagged, not failed
  }

  test("Mp4Meta round-trips a hand-built canonical ISO-BMFF container") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Mp4Meta
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val payload = Array.fill[Byte](200)(0x51)
    val ftyp = be32(20) ++ "ftyp".getBytes ++ "mp42".getBytes ++
      be32(0x200) ++ "mp41".getBytes
    val mvhd = be32(108) ++ "mvhd".getBytes ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(8000) ++ Array.fill[Byte](80)(0)
    val moov = be32(116) ++ "moov".getBytes ++ mvhd
    val mdat = be32(8 + payload.length) ++ "mdat".getBytes ++ payload
    val mp4 = ftyp ++ moov ++ mdat
    val out = Seq((1L, mp4), (2L, "definitely not an mp4 file".getBytes))
      .toDF("id", "bin")
      .select($"id", Mp4Meta.isCanonical($"bin").as("ok"),
        Mp4Meta.majorBrand($"bin").as("brand"),
        Mp4Meta.timescale($"bin").as("ts"), Mp4Meta.duration($"bin").as("dur"),
        Mp4Meta.durationSec($"bin").as("sec"),
        Mp4Meta.mdatBytes($"bin").as("nb"),
        Mp4Meta.topLevelBoxes($"bin").as("walk"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(1))
    assert(out(1L).getString(2) == "mp42")
    assert(out(1L).getLong(3) == 1000 && out(1L).getLong(4) == 8000)
    assert(math.abs(out(1L).getDouble(5) - 8.0) < 1e-12)
    assert(out(1L).getLong(6) == 200)
    val walk = out(1L).getStruct(7)
    assert(walk.getSeq[String](0) == Seq("ftyp", "moov", "mdat"))
    assert(walk.getSeq[Long](1) == Seq(20L, 116L, 208L))
    assert(walk.getBoolean(2)) // cursor lands exactly on buffer end
    assert(!out(2L).getBoolean(1) && !out(2L).getStruct(7).getBoolean(2))
    assert(out(2L).getStruct(7).getSeq[String](0).isEmpty)
    // JVM-side decoder agrees with the expression walk
    assert(Multimodal.MediaDecoder.decode(mp4) ==
      Multimodal.MediaDecoder.Meta(mp4.length, Some("mp4"), None, None, ok = true))
  }

  test("topLevelBoxes walks arbitrary tilings and parks on bad sizes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Mp4Meta
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, body: Array[Byte]) =
      be32(8 + body.length) ++ tpe.getBytes ++ body
    // non-canonical order and a free/skip box: still well-formed
    val odd = box("free", Array.fill[Byte](5)(0)) ++ box("mdat",
      Array.fill[Byte](30)(1)) ++ box("moov", Array.fill[Byte](12)(2))
    // declared size overruns the buffer: walk parks after the first box
    val overrun = box("ftyp", Array.fill[Byte](8)(0)) ++
      (be32(9999) ++ "mdat".getBytes ++ Array.fill[Byte](4)(0))
    // trailing garbage shorter than a box header: not well-formed
    val trailing = box("ftyp", Array.fill[Byte](8)(0)) ++ Array[Byte](1, 2, 3)
    val rows = Seq((1L, odd), (2L, overrun), (3L, trailing))
      .toDF("id", "bin")
      .select($"id", Mp4Meta.topLevelBoxes($"bin").as("w"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(rows(1L).getSeq[String](0) == Seq("free", "mdat", "moov"))
    assert(rows(1L).getBoolean(2))
    assert(rows(2L).getSeq[String](0) == Seq("ftyp") && !rows(2L).getBoolean(2))
    assert(rows(3L).getSeq[String](0) == Seq("ftyp") && !rows(3L).getBoolean(2))
    assert(!Multimodal.MediaDecoder.decode(overrun).ok)
    assert(!Multimodal.MediaDecoder.decode(trailing).ok)
    // the sniffer keys on a LEADING ftyp (the brand box convention); a
    // ftyp-first variant of the odd tiling decodes ok
    assert(Multimodal.MediaDecoder.decode(odd).format.isEmpty)
    val ftypFirst = box("ftyp", Array.fill[Byte](12)(0)) ++ odd
    assert(Multimodal.MediaDecoder.decode(ftypFirst).ok)
  }

  test("located parse decodes a NON-canonical container (free siblings, moved mvhd)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Mp4Meta
    def be32(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, body: Array[Byte]) =
      be32(8 + body.length) ++ tpe.getBytes ++ body
    val mvhdBody = be32(0) ++ be32(0) ++ be32(0) ++ be32(48000) ++ be32(96000) ++
      Array.fill[Byte](80)(0)
    // moov holds a free box BEFORE mvhd; top level holds a free box between
    // ftyp and moov and puts mdat in the middle — nothing at fixed offsets
    val moov = box("moov", box("free", Array.fill[Byte](11)(7)) ++
      box("mvhd", mvhdBody))
    val mp4 = box("ftyp", "isom".getBytes ++ be32(0x200) ++ "mp41".getBytes) ++
      box("free", Array.fill[Byte](3)(0)) ++
      box("mdat", Array.fill[Byte](77)(0x2a)) ++ moov
    val r = Seq((1L, mp4)).toDF("id", "bin").select(
      Mp4Meta.boxOffset($"bin", lit(1L),
        octet_length($"bin").cast("long") + 1L, "ftyp").as("ftyp"),
      Mp4Meta.mvhdOffset($"bin").as("mvhd"),
      Mp4Meta.mdatBytesLocated($"bin").as("nb"),
      Mp4Meta.topLevelBoxes($"bin").as("walk")).head()
    assert(r.getLong(0) == 1L)
    val mvhdPos = r.getLong(1)
    assert(mvhdPos > 0)
    val fields = Seq((1L, mp4)).toDF("id", "bin").select(
      Mp4Meta.timescaleAt($"bin", lit(mvhdPos)).as("ts"),
      Mp4Meta.durationAt($"bin", lit(mvhdPos)).as("dur"),
      Mp4Meta.verFlagsAt($"bin", lit(mvhdPos)).as("vf")).head()
    assert(fields.getLong(0) == 48000 && fields.getLong(1) == 96000 &&
      fields.getLong(2) == 0)
    assert(r.getLong(2) == 77)
    assert(r.getStruct(3).getSeq[String](0) == Seq("ftyp", "free", "mdat", "moov"))
    assert(r.getStruct(3).getBoolean(2))
    // canonical readers would read garbage here; the locate is the parser
    assert(!Seq((1L, mp4)).toDF("id", "bin")
      .select(Mp4Meta.isCanonical($"bin")).head().getBoolean(0))
  }

  test("q151 decodes generator arithmetic; q152 catalog counts reconcile") {
    import org.apache.spark.sql.functions._
    val meta = graft.queries.Media.q151VideoMeta(spark, Sf0001).collect()
    assert(meta.nonEmpty)
    meta.foreach { r =>
      val id = r.getLong(0)
      if (r.getBoolean(1)) { // valid slice: fields are doc_id arithmetic
        val expBrand = (id % 3) match {
          case 0 => "isom"; case 1 => "mp42"; case _ => "avc1" }
        assert(r.getString(2) == expBrand)
        assert(r.getInt(6) == 3 && r.getString(7) == "ftyp,moov,mdat")
        assert(r.getBoolean(8))
      } else {
        assert(id % 10 == 0)
        assert(r.getInt(6) == 0 && !r.getBoolean(8))
      }
    }
    val cat = graft.queries.Media.q152MediaCatalog(spark, Sf0001).collect()
      .map(r => (r.getString(0), Option(r.getString(1)).orNull,
        r.getBoolean(2)) -> r.getLong(3)).toMap
    val nDocs = graft.Tables.documents(spark, Sf0001).count()
    val nAscii = graft.Tables.documents(spark, Sf0001)
      .filter(length(col("text")) === octet_length(col("text")) &&
        length(col("text")) > 0).count()
    // each modality partitions its corpus: counts must sum back exactly
    assert(cat.filter(_._1._1 == "image").values.sum == nDocs)
    assert(cat.filter(_._1._1 == "audio").values.sum == nAscii)
    assert(cat.filter(_._1._1 == "video").values.sum == nAscii)
    assert(cat.keys.count(_._1 == "video") == 2) // mp4-ok + corrupt slices
    assert(cat(("video", "mp4", true)) > 0)
  }

  test("q145 pairs include every planted (original, variant) near-dup") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.Media.q145ImageDhash(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = out.filter { case (a, b, _) => b == a + 1000000000L }
    val eligible = graft.Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull && length(col("text")) > 0 &&
        length(col("text")) === octet_length(col("text")) &&
        col("doc_id") % 12 =!= 0 &&
        (col("doc_id") % 3 === 0 || col("doc_id") % 3 === 1)).count()
    assert(planted.length == eligible.toInt, "a planted near-dup pair was missed")
    assert(planted.forall(_._3 <= 1))
  }
}
