package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}

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

  /** Public 4-char-code reader for located parses (e.g. the brand at
    * ftyp + 8). */
  def fourCCAt(bin: Column, pos1: Column): Column = fourCC(bin, pos1)

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

  /** 1-based offset of the first `boxType` box in the sequence spanning
    * [from1, end1): the generic locate used both at the top level
    * (`from1 = 1`, `end1 = octet_length + 1`) and for the children of a
    * container box like moov (`from1 = parent + 8`, `end1 = parent +
    * parent_size`). NULL when absent or when the tiling breaks before the
    * box is found — the locate never trusts a size field it cannot read.
    * Same bounded aggregate-HOF cursor as [[topLevelBoxes]].
    */
  def boxOffset(bin: Column, from1: Column, end1: Column, boxType: String,
                maxBoxes: Int = 8): Column = {
    val init = struct(from1.cast("long").as("pos"),
      lit(null).cast("long").as("found"))
    aggregate(
      sequence(lit(1), lit(maxBoxes)),
      init,
      (acc, _) => {
        val pos = acc.getField("pos")
        val found = acc.getField("found")
        val size = beU32(bin, pos)
        // bounds first: the conjunct guards the size read (false && null
        // is false under Kleene logic, so headerOk is never null)
        val headerOk = pos + 7L < end1 && size >= 8L && pos + size <= end1
        when(found.isNotNull, acc)
          .when(!headerOk,
            struct(end1.cast("long").as("pos"), lit(null).cast("long").as("found")))
          .when(fourCC(bin, pos + 4L) === boxType,
            struct(pos.as("pos"), pos.as("found")))
          .otherwise(
            struct((pos + size).as("pos"), lit(null).cast("long").as("found")))
      }).getField("found")
  }

  /** moov/mvhd located by WALK (not fixed offsets): returns the 1-based
    * mvhd box offset wherever moov sits in the top level and wherever
    * mvhd sits among moov's children — the general ISO-BMFF shape
    * (`free`/`udta` siblings, non-canonical order). NULL when absent.
    */
  def mvhdOffset(bin: Column): Column = {
    val n1 = octet_length(bin).cast("long") + 1L
    val moov = boxOffset(bin, lit(1L), n1, "moov")
    when(moov.isNotNull,
      boxOffset(bin, moov + 8L, moov + beU32(bin, moov), "mvhd"))
  }

  /** 1-based start offsets of each box in a [[topLevelBoxes]] size array:
    * offsets(i) = 1 + sum of the sizes before i. Pure array arithmetic —
    * the cheap way to locate several top-level boxes from ONE materialized
    * walk instead of re-walking per box type.
    */
  def boxStartOffsets(sizes: Column): Column =
    // sequence(1, 0) would run DESCENDING for an empty walk — guard it
    when(size(sizes) === 0, array().cast(ArrayType(LongType, false)))
      .otherwise(transform(sequence(lit(1), size(sizes)), i =>
        aggregate(slice(sizes, lit(1), i - 1), lit(1L), (a, x) => a + x)))

  /** mvhd version-0 fields read RELATIVE to a located box offset (the
    * fixed-offset readers above are these with pos = 29). */
  def timescaleAt(bin: Column, mvhdPos: Column): Column = beU32(bin, mvhdPos + 20L)
  def durationAt(bin: Column, mvhdPos: Column): Column = beU32(bin, mvhdPos + 24L)
  /** The full version+flags word (version<<24 | flags) — 0 for v0/no-flags. */
  def verFlagsAt(bin: Column, mvhdPos: Column): Column = beU32(bin, mvhdPos + 8L)

  /** mdat payload size via locate: declared box size minus the 8-byte
    * header, wherever mdat sits in the top level. NULL when absent. */
  def mdatBytesLocated(bin: Column): Column = {
    val n1 = octet_length(bin).cast("long") + 1L
    val mdat = boxOffset(bin, lit(1L), n1, "mdat")
    when(mdat.isNotNull, beU32(bin, mdat) - 8L)
  }

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
