package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.functions.Perceptual

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
    val hashed = originals.unionByName(variants)
      .select(col("doc_id"),
        Perceptual.dhashBits(col("payload"), col("hdr")).as("bits"))
    val banded = hashed.select(col("doc_id"), col("bits"),
      posexplode(Perceptual.bandSlices(col("bits"))).as(Seq("band", "slice")))
    val a = banded.select(col("band"), col("slice"),
      col("doc_id").as("doc_id_a"), col("bits").as("bits_a"))
    val b = banded.select(col("band"), col("slice"),
      col("doc_id").as("doc_id_b"), col("bits").as("bits_b"))
    a.join(b, Seq("band", "slice"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b", "bits_a", "bits_b").distinct()
      .withColumn("hamming", Perceptual.hammingBits(col("bits_a"), col("bits_b")))
      .filter(col("hamming") <= 3)
      .select("doc_id_a", "doc_id_b", "hamming")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q145_image_dhash" -> (q145ImageDhash _))

  def oracles: Map[String, String] = Map(
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
