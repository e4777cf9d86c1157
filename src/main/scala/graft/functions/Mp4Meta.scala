package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType}

/** ISO-BMFF (MP4) container fields as pure codegen expressions — the video
  * counterpart of [[WavMeta]] (audio) and `Multimodal.MediaDecoder`'s
  * PNG/JPEG geometry walk (image), completing the modality triad.
  *
  * Layout parsed (public ISO/IEC 14496-12 box structure): every box is a
  * big-endian u32 size + 4-char type, children nested inside. Two access
  * paths, mirroring the WavMeta contract:
  *
  *  - [[isCanonical]] + the fixed-offset field readers cover the canonical
  *    synthetic layout `ftyp(20) moov(116){mvhd(108)} mdat(8+n)` — brand,
  *    timescale, duration, mdat payload size all at static offsets, every
  *    byte whole-stage codegen so a DuckDB oracle rebuilds them
  *    arithmetically.
  *  - [[topLevelBoxes]] is a REAL bounded box walk over arbitrary top-level
  *    layouts (any box order/count up to `maxBoxes`): an `aggregate` HOF
  *    threads the cursor through size fields, stopping cleanly at the end
  *    of the buffer and flagging (not throwing on) malformed sizes — the
  *    same corrupt-flags-not-fails contract as image decode.
  */
object Mp4Meta {

  /** Unsigned byte value at 1-based offset `pos`. */
  private def byteAt(bin: Column, pos: Column): Column =
    conv(hex(substring(bin, pos, lit(1))), 16, 10).cast("long")

  /** Big-endian u32 at 1-based offset (MP4 is big-endian throughout). */
  def beU32(bin: Column, pos1: Column): Column =
    byteAt(bin, pos1) * 16777216L + byteAt(bin, pos1 + 1) * 65536L +
      byteAt(bin, pos1 + 2) * 256L + byteAt(bin, pos1 + 3)

  def beU32(bin: Column, pos1: Int): Column = beU32(bin, lit(pos1))

  private def fourCC(bin: Column, pos1: Column): Column =
    substring(bin, pos1, lit(4)).cast("string")

  /** Canonical synthetic layout guard: ftyp at 1 (size 20), moov at 21
    * (size 116) wrapping a version-0 mvhd (size 108), mdat at 137 whose
    * declared size matches the remaining bytes.
    */
  def isCanonical(bin: Column): Column =
    octet_length(bin) >= 144 &&
      beU32(bin, 1) === 20L && fourCC(bin, lit(5)) === "ftyp" &&
      beU32(bin, 21) === 116L && fourCC(bin, lit(25)) === "moov" &&
      beU32(bin, 29) === 108L && fourCC(bin, lit(33)) === "mvhd" &&
      beU32(bin, 37) === 0L && // mvhd version 0 + zero flags
      fourCC(bin, lit(141)) === "mdat" &&
      // mdat declared size covers its header + everything after offset 144
      beU32(bin, 137) === octet_length(bin).cast("long") - 136L

  def majorBrand(bin: Column): Column = fourCC(bin, lit(9))
  def timescale(bin: Column): Column = beU32(bin, 49)
  def duration(bin: Column): Column = beU32(bin, 53)
  def nextTrackId(bin: Column): Column = beU32(bin, 133)
  def mdatBytes(bin: Column): Column = beU32(bin, 137) - 8L

  /** Declared duration in seconds — like WavMeta.durationSec, header fields
    * only, so a truncated payload still reports what the container CLAIMS.
    */
  def durationSec(bin: Column): Column =
    duration(bin).cast("double") / timescale(bin).cast("double")

  /** Walk the top-level box sequence: `array<struct<box_type, box_size>>`.
    *
    * The cursor state rides an `aggregate` accumulator
    * struct(pos, types, sizes, bad): each of the `maxBoxes` steps reads the
    * size/type pair at `pos` if at least a full 8-byte box header remains,
    * accepts the box when `8 <= size <= bytes-remaining`, otherwise sets
    * `bad` and parks the cursor. A walk that ends exactly at the buffer end
    * with no bad step is a well-formed top level. Pure codegen HOFs — the
    * bounded step count is what keeps this an expression rather than a
    * recursion (real containers have a handful of top-level boxes; raise
    * `maxBoxes` for exotic files).
    */
  def topLevelBoxes(bin: Column, maxBoxes: Int = 8): Column = {
    val n = octet_length(bin).cast("long")
    val init = struct(
      lit(1L).as("pos"),
      array().cast(ArrayType(org.apache.spark.sql.types.StringType, false)).as("types"),
      array().cast(ArrayType(org.apache.spark.sql.types.LongType, false)).as("sizes"),
      lit(false).as("bad"))
    val walked = aggregate(
      sequence(lit(1), lit(maxBoxes)),
      init,
      (acc, _) => {
        val pos = acc.getField("pos")
        val done = acc.getField("bad") || pos > n // parked or cleanly at end
        val size = beU32(bin, pos)
        val okBox = pos + 7L <= n && size >= 8L && pos + size - 1L <= n
        when(done, acc).otherwise(
          when(okBox, struct(
            (pos + size).as("pos"),
            concat(acc.getField("types"), array(fourCC(bin, pos + 4L))).as("types"),
            concat(acc.getField("sizes"), array(size)).as("sizes"),
            lit(false).as("bad")))
          .otherwise(struct(pos.as("pos"), acc.getField("types").as("types"),
            acc.getField("sizes").as("sizes"), lit(true).as("bad"))))
      })
    struct(
      walked.getField("types").as("box_types"),
      walked.getField("sizes").as("box_sizes"),
      (!walked.getField("bad") && walked.getField("pos") === n + 1L)
        .as("well_formed"))
  }
}
