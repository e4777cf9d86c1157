package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.functions.{Mp4Meta, Perceptual, WavMeta}

/** q145: perceptual image near-dup (dHash, banded) over the synthetic
  * media corpus — the multimodal analog of q26/q55's SimHash text
  * near-dup, and the round-8 ask's last missing media operator.
  *
  * The corpus is Multimodal.syntheticMedia's REAL container payloads
  * (PNG signature + IHDR, JPEG SOI + JFIF + SOF0) whose bodies are the
  * document texts; the query filters to intact single-byte-per-char
  * payloads so the DuckDB oracle can replay every byte of the hash
  * arithmetic from `documents` alone (body byte at offset o == text
  * character o+1's codepoint; the header never enters the hash — dHash
  * samples the BODY, exactly where a real decoder reads pixels).
  *
  * Shape: per-image hash (pure codegen HOFs), 4x16 exact-match banding
  * (one shuffle on (band, slice) — never all-pairs), pair-distinct, then
  * the 64-position Hamming verify per candidate. Same scale posture as
  * q55: bucket population bounds the quadratic term; a boilerplate
  * mega-bucket is capped upstream by the q25 family's devices.
  */
object Media {

  def q145ImageDhash(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMedia(s, dir)
    val docs = graft.Tables.documents(s, dir)
      .filter(col("text").isNotNull && length(col("text")) > 0 &&
        // ASCII-only contract: char index == byte offset on both engines
        length(col("text")) === octet_length(col("text")) &&
        // intact PNG (%3==0 minus the %12==0 truncated slice) or JPEG (%3==1)
        col("doc_id") % 12 =!= 0 &&
        (col("doc_id") % 3 === 0 || col("doc_id") % 3 === 1))
      .select("doc_id")
    val headerLen = when(col("doc_id") % 3 === 0, lit(33)).otherwise(lit(39))
    val originals = media.join(docs, "doc_id")
      .select(col("doc_id"), headerLen.as("hdr"), col("payload"))
    // planted perceptual near-dups: a same-length single-byte body edit
    // (first body byte -> 'Z'), the image analog of a one-pixel touch-up:
    // it moves at most sample 0 of the 72-sample grid, so the pair's
    // Hamming distance is <= 1 — inside the radius where the 4x16
    // banding is pigeonhole-EXACT (<= 3 differing bits cannot dirty all
    // four bands). Fixture word-soup texts are otherwise far apart (the
    // nearest accidental candidate measured Hamming 20), so the gate
    // result is exactly the planted pairs + any true exact duplicates.
    val variants = originals.select(
      (col("doc_id") + 1000000000L).as("doc_id"), col("hdr"),
      concat(
        col("payload").substr(lit(1), col("hdr")),
        lit("Z").cast("binary"),
        col("payload").substr(col("hdr") + 2, octet_length(col("payload"))))
        .as("payload"))
    // px materialized as its own projection: dhashBitsFromPx reads the
    // 72-sample array 128 times, and only a real column boundary stops
    // Catalyst from re-inlining the sampling per read (13x on this query)
    val hashed = originals.unionByName(variants)
      .select(col("doc_id"),
        Perceptual.dhashPx(col("payload"), col("hdr")).as("px"))
      .select(col("doc_id"), Perceptual.dhashBitsFromPx(col("px")).as("bits"))
    val banded = hashed.select(col("doc_id"), col("bits"),
      posexplode(Perceptual.bandSlices(col("bits"))).as(Seq("band", "slice")))
    val a = banded.select(col("band"), col("slice"),
      col("doc_id").as("doc_id_a"), col("bits").as("bits_a"))
    val b = banded.select(col("band"), col("slice"),
      col("doc_id").as("doc_id_b"), col("bits").as("bits_b"))
    // q55's trap: Catalyst sizes the Generate output at its input bytes
    // and would broadcast the banded hashes (4x corpus rows — never
    // broadcast-able at scale); force the distributed hash join
    a.hint("shuffle_hash").join(b, Seq("band", "slice"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b", "bits_a", "bits_b").distinct()
      .withColumn("hamming", Perceptual.hammingBits(col("bits_a"), col("bits_b")))
      .filter(col("hamming") <= 3)
      .select("doc_id_a", "doc_id_b", "hamming")
  }

  // ------------------------------------------------------------- audio

  /** Little-endian field assembly for the synthetic WAV headers —
    * lpad(hex) gives big-endian hex; LE is the byte-pair reversal.
    * Static substring positions, whole-stage codegen throughout.
    */
  private def le16(c: Column): Column = {
    val h = lpad(hex(c), 4, "0")
    unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
  }
  private def le32(c: Column): Column = {
    val h = lpad(hex(c), 8, "0")
    unhex(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)))
  }

  /** Synthetic audio corpus: canonical 44-byte PCM WAV headers (REAL
    * container bytes, little-endian fields assembled by expression) over
    * the document texts as payload bytes — sample rate / channel count a
    * pure function of doc_id, so the oracle rebuilds every decoded field
    * arithmetically (the syntheticMedia device, completing the
    * image/audio modality pair). The doc_id % 10 == 0 slice carries raw
    * (non-WAV) bytes to exercise the corrupt-flags-not-fails contract.
    */
  private def syntheticWav(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir)
      .filter(col("text").isNotNull && length(col("text")) > 0 &&
        length(col("text")) === octet_length(col("text")))
    val sr = when(col("doc_id") % 4 === 0, 8000L)
      .when(col("doc_id") % 4 === 1, 16000L)
      .when(col("doc_id") % 4 === 2, 44100L).otherwise(48000L)
    val ch = lit(1L) + col("doc_id") % 2
    val blockAlign = ch * 2L
    val byteRate = sr * blockAlign
    val dataLen = octet_length(col("text")).cast("long")
    val wav = concat(
      lit("RIFF").cast("binary"), le32(dataLen + 36L),
      lit("WAVE").cast("binary"),
      lit("fmt ").cast("binary"), le32(lit(16L)), le16(lit(1L)), le16(ch),
      le32(sr), le32(byteRate), le16(blockAlign), le16(lit(16L)),
      lit("data").cast("binary"), le32(dataLen),
      col("text").cast("binary"))
    docs.select(col("doc_id"),
      when(col("doc_id") % 10 === 0, col("text").cast("binary"))
        .otherwise(wav).as("payload"))
  }

  /** q149: WAV metadata decode — every fmt-chunk field read back out of
    * the real header bytes (WavMeta expressions), invalid payloads
    * flagged with null fields, declared duration from the header's own
    * dataSize/byteRate.
    */
  def q149WavMeta(s: SparkSession, dir: String): DataFrame = {
    val p = col("payload")
    val valid = WavMeta.isCanonical(p)
    syntheticWav(s, dir).select(
      col("doc_id"), valid.as("valid"),
      when(valid, WavMeta.channels(p)).as("channels"),
      when(valid, WavMeta.sampleRate(p)).as("sample_rate"),
      when(valid, WavMeta.bitsPerSample(p)).as("bits"),
      when(valid, WavMeta.durationSec(p)).as("duration_sec"))
  }

  /** q150: frame-level audio feature extraction — the data chunk sliced
    * into 64-byte frames, every 2nd frame kept (Multimodal.sampleChunks,
    * the video frame-sampling kernel reused), per-frame byte count and
    * mean byte value (the stub for a real loudness/spectral feature; the
    * windowing arithmetic and per-frame aggregation shape are the
    * production contract). Pure codegen HOFs; one Generate, no UDF.
    */
  def q150AudioFrames(s: SparkSession, dir: String): DataFrame = {
    val wavs = syntheticWav(s, dir)
      .filter(WavMeta.isCanonical(col("payload")))
    val data = col("payload")
      .substr(lit(45), WavMeta.dataSize(col("payload")).cast("int"))
    val framed = wavs
      .select(col("doc_id"),
        posexplode(Multimodal.sampleChunks(data, chunkSize = 64, everyK = 2))
          .as(Seq("frame_pos", "frame")))
    framed.select(
      col("doc_id"), col("frame_pos"),
      octet_length(col("frame")).as("n_bytes"),
      (aggregate(
        transform(sequence(lit(1), octet_length(col("frame"))),
          i => conv(hex(substring(col("frame"), i, lit(1))), 16, 10).cast("long")),
        lit(0L), (acc, x) => acc + x).cast("double") /
        octet_length(col("frame"))).as("mean_val"))
  }

  // ------------------------------------------------------------- video

  /** Synthetic video corpus: canonical ISO-BMFF containers (REAL box
    * bytes — ftyp with a doc_id-keyed brand, moov/mvhd with a real unity
    * matrix and doc_id-keyed timescale, mdat carrying the text payload) so
    * the oracle rebuilds every decoded field arithmetically. Completes the
    * image/audio/video synthetic-media triad. The doc_id % 10 == 0 slice
    * carries raw (non-MP4) bytes for the corrupt-flags-not-fails contract.
    */
  private[queries] def syntheticMp4(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir)
      .filter(col("text").isNotNull && length(col("text")) > 0 &&
        length(col("text")) === octet_length(col("text")))
    def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
    val brand = when(col("doc_id") % 3 === 0, "isom")
      .when(col("doc_id") % 3 === 1, "mp42").otherwise("avc1")
    val timescale = when(col("doc_id") % 3 === 0, 600L)
      .when(col("doc_id") % 3 === 1, 1000L).otherwise(90000L)
    val dataLen = octet_length(col("text")).cast("long")
    val duration = dataLen * 40L // 40 ticks per payload byte, deterministic
    val ftyp = concat(be32(lit(20L)), lit("ftyp").cast("binary"),
      brand.cast("binary"), be32(lit(0x200L)), lit("mp41").cast("binary"))
    // mvhd v0 tail after duration: rate 1.0, volume 1.0, 10 reserved bytes,
    // unity matrix, 24 pre_defined bytes, next_track_id = 2  (80 bytes)
    val mvhdTail = lit(
      Array[Byte](0, 1, 0, 0, 1, 0) ++ Array.fill[Byte](10)(0) ++ // rate/vol/resv
        (Array[Byte](0, 1, 0, 0) ++ Array.fill[Byte](12)(0) ++     // unity matrix
          Array[Byte](0, 1, 0, 0) ++ Array.fill[Byte](12)(0) ++
          Array[Byte](0x40, 0, 0, 0)) ++
        Array.fill[Byte](24)(0) ++ Array[Byte](0, 0, 0, 2))       // pre_def/next
    val mvhd = concat(be32(lit(108L)), lit("mvhd").cast("binary"),
      be32(lit(0L)), be32(lit(0L)), be32(lit(0L)), // ver/flags, ctime, mtime
      be32(timescale), be32(duration), mvhdTail)
    val moov = concat(be32(lit(116L)), lit("moov").cast("binary"), mvhd)
    val mdat = concat(be32(dataLen + 8L), lit("mdat").cast("binary"),
      col("text").cast("binary"))
    docs.select(col("doc_id"),
      when(col("doc_id") % 10 === 0, col("text").cast("binary"))
        .otherwise(concat(ftyp, moov, mdat)).as("payload"))
  }

  /** q151: MP4 metadata decode by LOCATED parse — ftyp/moov/mvhd/mdat are
    * found by the general box walk (`Mp4Meta.boxOffset`/`mvhdOffset`), not
    * fixed offsets, so any legal top-level tiling (free/udta siblings,
    * non-canonical order) decodes identically; the synthetic corpus is
    * canonical so the oracle arithmetic is unchanged. Validity = the
    * top-level walk tiles the buffer exactly AND ftyp/mvhd are present
    * with mvhd version 0. Corrupt payloads flag (never throw): the walk
    * parks on the first bad size and every locate returns null.
    *
    * Each walk is materialized as its own projection before the field
    * reads reference it (the q145 lesson: multiply-referenced non-cheap
    * aliases must cross a Project boundary or Catalyst re-inlines them).
    */
  def q151VideoMeta(s: SparkSession, dir: String): DataFrame = {
    val p = col("payload")
    // ONE top-level walk per row; every top-level box position is then
    // pure array arithmetic over the materialized (types, sizes) pair —
    // only the moov-CHILD locate (mvhd) pays a second bounded walk
    val walked = syntheticMp4(s, dir).select(
      col("doc_id"), p, Mp4Meta.topLevelBoxes(p).as("walk"))
      .select(col("doc_id"), p, col("walk"),
        Mp4Meta.boxStartOffsets(col("walk.box_sizes")).as("starts"))
    def topPos(t: String): Column = {
      val idx = array_position(col("walk.box_types"), t)
      when(idx > 0, element_at(col("starts"), idx.cast("int")))
    }
    val located = walked.select(
      col("doc_id"), p, col("walk"),
      topPos("ftyp").as("ftyp_pos"),
      topPos("moov").as("moov_pos"),
      when(array_position(col("walk.box_types"), "mdat") > 0,
        element_at(col("walk.box_sizes"),
          array_position(col("walk.box_types"), "mdat").cast("int")) - 8L)
        .as("mdat_nb"))
      .select(col("doc_id"), p, col("walk"), col("ftyp_pos"), col("mdat_nb"),
        when(col("moov_pos").isNotNull,
          Mp4Meta.boxOffset(p, col("moov_pos") + 8L,
            col("moov_pos") + Mp4Meta.beU32(p, col("moov_pos")), "mvhd"))
          .as("mvhd_pos"))
    val flagged = located.select(
      col("doc_id"), p, col("ftyp_pos"), col("mvhd_pos"), col("mdat_nb"),
      col("walk"),
      (col("walk.well_formed") && col("ftyp_pos").isNotNull &&
        col("mvhd_pos").isNotNull &&
        Mp4Meta.verFlagsAt(p, col("mvhd_pos")) === 0L).as("valid"))
    flagged.select(
      col("doc_id"), col("valid"),
      when(col("valid"), Mp4Meta.fourCCAt(p, col("ftyp_pos") + 8L)).as("major_brand"),
      when(col("valid"), Mp4Meta.timescaleAt(p, col("mvhd_pos"))).as("timescale"),
      when(col("valid"), Mp4Meta.durationAt(p, col("mvhd_pos")).cast("double") /
        Mp4Meta.timescaleAt(p, col("mvhd_pos")).cast("double")).as("duration_sec"),
      when(col("valid"), col("mdat_nb")).as("mdat_bytes"),
      size(col("walk.box_types")).as("n_boxes"),
      array_join(col("walk.box_types"), ",").as("box_types"),
      col("walk.well_formed").as("well_formed"))
  }

  /** q152: cross-modality media catalog — the three synthetic corpora
    * (image PNG/JPEG, audio WAV, video MP4) unioned and pushed through the
    * ONE decode entry point (`Multimodal.withMediaMeta`, the mapPartitions
    * batch-decode contract), then rolled up per (modality, sniffed format,
    * integrity flag). The audit a 100 TB media lake runs nightly: row
    * counts and byte totals per container family, corrupt slices surfacing
    * as ok=false rows rather than job failures.
    */
  def q152MediaCatalog(s: SparkSession, dir: String): DataFrame = {
    val img = Multimodal.syntheticMedia(s, dir)
      .select(lit("image").as("modality"), col("payload"))
    val aud = syntheticWav(s, dir)
      .select(lit("audio").as("modality"), col("payload"))
    val vid = syntheticMp4(s, dir)
      .select(lit("video").as("modality"), col("payload"))
    Multimodal.withMediaMeta(img.unionByName(aud).unionByName(vid), "payload")
      .groupBy(col("modality"), col("media_meta.format").as("format"),
        col("media_meta.ok").as("ok"))
      .agg(count(lit(1)).as("n"),
        sum(col("media_meta.n_bytes").cast("long")).as("total_bytes"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q145_image_dhash" -> (q145ImageDhash _),
    "q149_wav_meta"    -> (q149WavMeta _),
    "q150_audio_frames" -> (q150AudioFrames _),
    "q151_video_meta"  -> (q151VideoMeta _),
    "q152_media_catalog" -> (q152MediaCatalog _))

  def oracles: Map[String, String] = Map(
    // every decoded MP4 field rebuilt from the generator's arithmetic (the
    // q149 device); the walk outputs pin the canonical ftyp/moov/mdat tiling
    // and that corrupt payloads park the cursor at box 0
    "q151_video_meta" ->
      """SELECT doc_id,
        |  doc_id % 10 <> 0 AS valid,
        |  CASE WHEN doc_id % 10 <> 0 THEN CASE CAST(doc_id % 3 AS INTEGER)
        |    WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42' ELSE 'avc1' END
        |  END AS major_brand,
        |  CASE WHEN doc_id % 10 <> 0 THEN CAST(CASE CAST(doc_id % 3 AS INTEGER)
        |    WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END AS BIGINT)
        |  END AS timescale,
        |  CASE WHEN doc_id % 10 <> 0 THEN CAST(length(text) * 40 AS DOUBLE) /
        |    CAST(CASE CAST(doc_id % 3 AS INTEGER)
        |      WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END AS DOUBLE)
        |  END AS duration_sec,
        |  CASE WHEN doc_id % 10 <> 0 THEN CAST(length(text) AS BIGINT)
        |  END AS mdat_bytes,
        |  CAST(CASE WHEN doc_id % 10 <> 0 THEN 3 ELSE 0 END AS INTEGER) AS n_boxes,
        |  CASE WHEN doc_id % 10 <> 0 THEN 'ftyp,moov,mdat' ELSE '' END AS box_types,
        |  doc_id % 10 <> 0 AS well_formed
        |FROM documents
        |WHERE text IS NOT NULL AND length(text) > 0
        |  AND length(text) = octet_length(encode(text))""".stripMargin,
    // the per-(modality, format, ok) rollup rebuilt from the three
    // generators' class arithmetic and header lengths (33/39 image, 44
    // audio, 144 video) — corrupt slices land as ok=false rows
    "q152_media_catalog" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text)) AS blen,
        |         length(text) = octet_length(encode(text)) AS is_ascii
        |  FROM documents),
        |r AS (
        |  SELECT 'image' AS modality,
        |    CASE WHEN doc_id % 12 = 0 OR doc_id % 3 = 0 THEN 'png'
        |         WHEN doc_id % 3 = 1 THEN 'jpeg' END AS format,
        |    doc_id % 12 <> 0 AND doc_id % 3 IN (0, 1) AS ok,
        |    CASE WHEN doc_id % 12 = 0 THEN 10
        |         WHEN doc_id % 3 = 0 THEN 33 + blen
        |         WHEN doc_id % 3 = 1 THEN 39 + blen
        |         ELSE blen END AS nb
        |  FROM b
        |  UNION ALL
        |  SELECT 'audio',
        |    CASE WHEN doc_id % 10 <> 0 THEN 'wav' END,
        |    doc_id % 10 <> 0,
        |    CASE WHEN doc_id % 10 <> 0 THEN 44 + blen ELSE blen END
        |  FROM b WHERE is_ascii AND blen > 0
        |  UNION ALL
        |  SELECT 'video',
        |    CASE WHEN doc_id % 10 <> 0 THEN 'mp4' END,
        |    doc_id % 10 <> 0,
        |    CASE WHEN doc_id % 10 <> 0 THEN 144 + blen ELSE blen END
        |  FROM b WHERE is_ascii AND blen > 0)
        |SELECT modality, format, ok, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(nb) AS BIGINT) AS total_bytes
        |FROM r GROUP BY modality, format, ok""".stripMargin,
    // the decoded fields must equal the generator's arithmetic (the q42
    // device: real bytes in between, rebuilt parameters out)
    "q149_wav_meta" ->
      """SELECT doc_id,
        |  doc_id % 10 <> 0 AS valid,
        |  CASE WHEN doc_id % 10 <> 0 THEN CAST(1 + doc_id % 2 AS BIGINT) END AS channels,
        |  CASE WHEN doc_id % 10 <> 0 THEN CAST(CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 44100
        |    ELSE 48000 END AS BIGINT) END AS sample_rate,
        |  CASE WHEN doc_id % 10 <> 0 THEN CAST(16 AS BIGINT) END AS bits,
        |  CASE WHEN doc_id % 10 <> 0 THEN CAST(length(text) AS DOUBLE) /
        |    CAST((CASE CAST(doc_id % 4 AS INTEGER)
        |      WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 44100
        |      ELSE 48000 END) * (1 + doc_id % 2) * 2 AS DOUBLE) END AS duration_sec
        |FROM documents
        |WHERE text IS NOT NULL AND length(text) > 0
        |  AND length(text) = octet_length(encode(text))""".stripMargin,
    // the frame windowing + per-frame mean replayed over the text bytes
    "q150_audio_frames" ->
      """WITH eligible AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0
        |    AND length(text) = octet_length(encode(text))
        |    AND doc_id % 10 <> 0),
        |f AS (
        |  SELECT doc_id, CAST(j AS INTEGER) AS j0,
        |    substr(text, CAST(j AS INTEGER) * 64 + 1, 64) AS seg
        |  FROM eligible, unnest(range(0, CAST(CEIL(length(text) / 64.0) AS INTEGER))) t(j)
        |  WHERE j % 2 = 0)
        |SELECT doc_id, CAST(j0 // 2 AS INTEGER) AS frame_pos,
        |  CAST(length(seg) AS INTEGER) AS n_bytes,
        |  CAST(list_aggregate(list_transform(range(1, length(seg) + 1), i ->
        |    ascii(substr(seg, CAST(i AS INTEGER), 1))), 'sum') AS DOUBLE)
        |    / length(seg) AS mean_val
        |FROM f""".stripMargin,
    // full replay of the hash arithmetic: sample grid from the text
    // characters (ASCII filter makes char == body byte), dHash bits,
    // band slices, pair join, Hamming verify
    "q145_image_dhash" ->
      """WITH eligible0 AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0
        |    AND length(text) = octet_length(encode(text))
        |    AND doc_id % 12 <> 0
        |    AND (doc_id % 3 = 0 OR doc_id % 3 = 1)),
        |eligible AS (
        |  SELECT doc_id, text FROM eligible0
        |  UNION ALL
        |  SELECT doc_id + 1000000000, 'Z' || substr(text, 2, length(text))
        |  FROM eligible0),
        |px AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 72), i -> ascii(substr(text,
        |      CAST(FLOOR(i * length(text) / 72.0) AS INTEGER) + 1, 1))) AS s
        |  FROM eligible),
        |bits AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(0, 64), k ->
        |      CASE WHEN s[CAST(FLOOR(k / 8.0) AS INTEGER) * 9
        |                   + CAST(k % 8 AS INTEGER) + 1]
        |              < s[CAST(FLOOR(k / 8.0) AS INTEGER) * 9
        |                   + CAST(k % 8 AS INTEGER) + 2]
        |           THEN '1' ELSE '0' END), '') AS bits
        |  FROM px),
        |banded AS (
        |  SELECT doc_id, bits, CAST(b AS INTEGER) AS band,
        |    substr(bits, CAST(b AS INTEGER) * 16 + 1, 16) AS slice
        |  FROM bits, unnest(range(0, 4)) AS t(b)),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |    a.bits AS bits_a, b.bits AS bits_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.slice = b.slice AND a.doc_id < b.doc_id)
        |SELECT doc_id_a, doc_id_b,
        |  CAST(list_aggregate(list_transform(range(1, 65), i ->
        |    CASE WHEN substr(bits_a, CAST(i AS INTEGER), 1)
        |            <> substr(bits_b, CAST(i AS INTEGER), 1)
        |         THEN 1 ELSE 0 END), 'sum') AS INTEGER) AS hamming
        |FROM pairs
        |WHERE CAST(list_aggregate(list_transform(range(1, 65), i ->
        |    CASE WHEN substr(bits_a, CAST(i AS INTEGER), 1)
        |            <> substr(bits_b, CAST(i AS INTEGER), 1)
        |         THEN 1 ELSE 0 END), 'sum') AS INTEGER) <= 3""".stripMargin)
}
