package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical-WAV header fields as pure codegen expressions — the audio
  * counterpart of Multimodal.MediaDecoder's PNG/JPEG geometry walk.
  *
  * Layout parsed (the canonical 44-byte PCM header, public format): RIFF
  * magic (0) + chunk size (4) + WAVE (8) + "fmt " (12) + fmt size 16 (16)
  * + audio format (20, LE u16) + channels (22, LE u16) + sample rate
  * (24, LE u32) + byte rate (28, LE u32) + block align (32, LE u16) +
  * bits/sample (34, LE u16) + "data" (36) + data size (40, LE u32).
  * Files with extra chunks between fmt and data need the
  * MediaDecoder-style walk; [[isCanonical]] guards for exactly this
  * layout and the audio queries flag (not fail) anything else — the same
  * corrupt-flags-not-errors contract as image decode.
  *
  * Byte access is substring+hex+conv (whole-stage codegen; no UDF), so
  * the DuckDB oracle can rebuild every field arithmetically.
  */
object WavMeta {

  /** Unsigned byte value at 1-based offset `pos`. */
  private def byteAt(bin: Column, pos: Column): Column =
    conv(hex(substring(bin, pos, lit(1))), 16, 10).cast("long")

  def leU16(bin: Column, pos1: Int): Column =
    byteAt(bin, lit(pos1)) + byteAt(bin, lit(pos1 + 1)) * 256L

  def leU32(bin: Column, pos1: Int): Column =
    byteAt(bin, lit(pos1)) + byteAt(bin, lit(pos1 + 1)) * 256L +
      byteAt(bin, lit(pos1 + 2)) * 65536L + byteAt(bin, lit(pos1 + 3)) * 16777216L

  /** RIFF/WAVE magic + canonical fmt/data chunk placement + PCM format. */
  def isCanonical(bin: Column): Column =
    octet_length(bin) >= 44 &&
      substring(bin, 1, 4) === lit("RIFF").cast("binary") &&
      substring(bin, 9, 4) === lit("WAVE").cast("binary") &&
      substring(bin, 13, 4) === lit("fmt ").cast("binary") &&
      leU32(bin, 17) === 16L && leU16(bin, 21) === 1L &&
      substring(bin, 37, 4) === lit("data").cast("binary")

  def channels(bin: Column): Column = leU16(bin, 23)
  def sampleRate(bin: Column): Column = leU32(bin, 25)
  def byteRate(bin: Column): Column = leU32(bin, 29)
  def bitsPerSample(bin: Column): Column = leU16(bin, 35)
  def dataSize(bin: Column): Column = leU32(bin, 41)

  /** Duration in seconds: dataSize / byteRate (both headers' own fields —
    * a truncated payload still reports the DECLARED duration, which is
    * what an audit wants to reconcile against actual bytes).
    */
  def durationSec(bin: Column): Column =
    dataSize(bin).cast("double") / byteRate(bin).cast("double")
}
